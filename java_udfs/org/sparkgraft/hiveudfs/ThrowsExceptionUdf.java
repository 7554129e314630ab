package org.sparkgraft.hiveudfs;

import org.apache.hadoop.hive.ql.exec.UDF;

/** Always throws — exercises the engine's UDF-exception contract. */
public class ThrowsExceptionUdf extends UDF {
  public Boolean evaluate() {
    throw new IllegalStateException("test exception from udf");
  }
}
