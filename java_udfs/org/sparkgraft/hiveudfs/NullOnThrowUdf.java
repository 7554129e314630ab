package org.sparkgraft.hiveudfs;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF;

/**
 * Impala converts an exception thrown inside a Hive Java UDF into a
 * NULL result plus a warning (reference be/src/exprs/hive-udf-call.cc:
 * the call boundary catches the JNI exception, logs it, and hands the
 * row a NULL). Spark has no such boundary — a throwing UDF fails the
 * task — so this bridge base class IS the call boundary: subclasses
 * put their logic in {@link #evaluateOrThrow} and any exception it
 * raises becomes a NULL result with the message recorded once.
 */
public abstract class NullOnThrowUdf extends GenericUDF {
  private boolean warned = false;

  @Override
  public Object evaluate(DeferredObject[] args) throws HiveException {
    try {
      return evaluateOrThrow(args);
    } catch (Exception e) {
      if (!warned) {
        // one warning per UDF instance, mirroring the reference's
        // per-fragment warning dedup (RuntimeState::LogError)
        System.err.println("WARN: UDF " + getClass().getName()
            + " threw: " + e);
        warned = true;
      }
      return null;
    }
  }

  /** The UDF body; a throw here is converted to a NULL result. */
  protected abstract Object evaluateOrThrow(DeferredObject[] args)
      throws Exception;

  @Override
  public String getDisplayString(String[] children) {
    return getUdfName() + "(" + String.join(", ", children) + ")";
  }
}
