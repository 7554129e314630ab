package org.sparkgraft.hiveudfs;

import org.apache.hadoop.hive.ql.exec.UDF;

/**
 * Hive-bridge scalar UDF used by this repo's java-udf parity tests
 * (reference workload: QueryTest/java-udf.test). One class serves the
 * reference's `identity`, `identity_anytype` and `hive_add`
 * registrations — Hive's reflection resolver dispatches on argument
 * types: one-argument overloads are identity, two-argument numeric
 * overloads add, and multi-argument String overloads concatenate.
 * Original implementation against the public Hive UDF API.
 */
public class TestOpsUdf extends UDF {
  public Boolean evaluate(Boolean a) { return a; }
  public Byte evaluate(Byte a) { return a; }
  public Short evaluate(Short a) { return a; }
  public Integer evaluate(Integer a) { return a; }
  public Long evaluate(Long a) { return a; }
  public Float evaluate(Float a) { return a; }
  public Double evaluate(Double a) { return a; }
  public String evaluate(String a) { return a; }

  public Boolean evaluate(Boolean a, Boolean b) {
    if (a == null || b == null) return null;
    return a && b;
  }
  public Short evaluate(Short a, Short b) {
    if (a == null || b == null) return null;
    return (short) (a + b);
  }
  public Integer evaluate(Integer a, Integer b) {
    if (a == null || b == null) return null;
    return a + b;
  }
  public Float evaluate(Float a, Float b) {
    if (a == null || b == null) return null;
    return a + b;
  }
  public Double evaluate(Double a, Double b) {
    if (a == null || b == null) return null;
    return a + b;
  }
  public String evaluate(String a, String b) {
    if (a == null || b == null) return null;
    return a + b;
  }
  public String evaluate(String a, String b, String c) {
    if (a == null || b == null || c == null) return null;
    return a + b + c;
  }
}
