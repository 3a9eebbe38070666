package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run (guide: one session
  * per suite via lazy val; sharing across suites avoids repeated JVM-wide
  * Spark startup in `sbt -batch test`).
  */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
