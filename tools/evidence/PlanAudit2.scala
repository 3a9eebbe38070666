object PlanAudit2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("plan-audit2")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def audit(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = plan.split("\n").count(l => l.contains("Exchange") && !l.contains("Reused"))
      val reused = plan.split("\n").count(_.contains("ReusedExchange"))
      val codegen = plan.split("\n").count(_.contains("WholeStageCodegen"))
      val windows = plan.split("\n").count(_.contains("Window"))
      println(s"== $name: exchanges=$exchanges reused=$reused wscg=$codegen windows=$windows smj=${plan.contains("SortMergeJoin")}")
    }
    Seq("codec_auto_roundtrip", "dedup_verified", "dedup_minhash", "dedup_simhash", "encoded_sizes_exact", "stats_agg", "text_fingerprint").foreach(audit)
    spark.stop()
  }
}
