package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (Spark startup
  * is ~5 s; per-suite sessions would dominate test time).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("graft-test", cpus = "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
