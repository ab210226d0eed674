package graft

import org.apache.spark.sql.SparkSession

/** Shared test session — one JVM-wide session across suites (sbt runs
  * suites sequentially in the forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(4, "graft-test")
}
