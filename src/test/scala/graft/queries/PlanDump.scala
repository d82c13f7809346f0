package graft.queries

// throwaway inspection main (not a test) — delete after use
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val p = Pipeline.exportPacked(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    val textScans = "ReadSchema:.*text".r.findAllIn(p).length
    println(s"SCANS=$scans TEXT_SCANS=$textScans")
    p.split('\n').filter(_.contains("ReadSchema")).foreach(l =>
      println(l.trim.take(200)))
  }
}
