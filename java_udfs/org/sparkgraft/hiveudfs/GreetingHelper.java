package org.sparkgraft.hiveudfs;

/** Helper class loaded by CrossClassUdf (same-jar class loading). */
public class GreetingHelper {
  public static String greeting() { return "Hello"; }
}
