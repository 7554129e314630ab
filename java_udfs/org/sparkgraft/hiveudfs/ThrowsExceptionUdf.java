package org.sparkgraft.hiveudfs;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;

/**
 * Always throws — exercises the NULL-on-throw contract
 * (java-udf.test blocks 12-13: select throws_exception() is NULL,
 * reference TestUdfException + be/src/exprs/hive-udf-call.cc).
 */
public class ThrowsExceptionUdf extends NullOnThrowUdf {
  @Override
  public ObjectInspector initialize(ObjectInspector[] args)
      throws UDFArgumentException {
    return PrimitiveObjectInspectorFactory.writableBooleanObjectInspector;
  }

  @Override
  protected Object evaluateOrThrow(DeferredObject[] args)
      throws Exception {
    throw new IllegalStateException("test exception from udf");
  }
}
