package org.sparkgraft.hiveudfs;

import org.apache.hadoop.hive.ql.exec.UDF;

/**
 * Doubles every 's' in the input (the reference's replace_string
 * behavior, pinned by java-udf.test's IMPALA-4266 regression block:
 * output strings used as grouping keys).
 */
public class DoubleSUdf extends UDF {
  public String evaluate(String s) {
    if (s == null) return null;
    return s.replace("s", "ss");
  }
}
