package org.sparkgraft.hiveudfs;

import org.apache.hadoop.hive.ql.exec.UDF;

/**
 * Returns a value computed by ANOTHER class in the same jar — the
 * reference's import_nearby_classes contract (IMPALA-8016: the UDF
 * classloader must resolve sibling classes from the function's jar).
 */
public class CrossClassUdf extends UDF {
  public String evaluate(String ignored) {
    return GreetingHelper.greeting();
  }
}
