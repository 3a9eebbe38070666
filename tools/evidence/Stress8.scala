object Stress8 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val tokens = graft.sources.Tokens.synthetic(spark, 3200000, numPartitions = 256)
    val t0 = System.nanoTime()
    val s = graft.pipeline.EncodePipeline.run(spark, tokens,
      graft.pipeline.EncodePipeline.Config(outDir = out))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"STRESS tokens=${s.nTokens} parts=${s.committed} salts_auto wall=${secs}%.1f tok_per_sec=${s.nTokens / secs}%.0f bytes_per_token=${s.encodedBytes.toDouble / s.nTokens}%.4f")
    spark.stop()
  }
}
