/** Warm pipeline input-size curve (round 4): the bench's
  * `encode_pipeline` number is now best-of-N interleaved — i.e. a WARM
  * measurement that no longer pays one-time session/stage warmup — so the
  * r2 single-shot curve ("flat ~13M tok/s from 877M to 1.75B tokens")
  * needs a warm-measured counterpart. Runs the full pipeline (fresh tmp
  * sink per rep, best-of-2 per size, sizes interleaved) at 1×, 2×, 4× the
  * bench input and prints tokens/sec per size. Flat-or-rising tok/s across
  * a 4× input range is the scale evidence: per-run overhead amortizes and
  * no stage goes super-linear.
  */
object PipeWarm {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("pipe-warm")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes = Seq(200000L, 400000L, 800000L) // docs; bench pipe = 200k
    val best = scala.collection.mutable.Map.empty[Long, (Double, Long)]
    // warmup rep (not recorded): JIT + codegen + committer init
    runOnce(spark, 200000L)
    for (rep <- 1 to 2; n <- sizes) {
      val (secs, toks) = runOnce(spark, n)
      val cur = best.getOrElse(n, (Double.MaxValue, 0L))
      if (secs < cur._1) best(n) = (secs, toks)
      System.err.println(f"[pipewarm] rep=$rep docs=$n secs=$secs%.2f tok/s=${toks / secs / 1e6}%.2fM")
    }
    println("[pipewarm] RESULTS (best-of-2 interleaved, warm):")
    sizes.foreach { n =>
      val (secs, toks) = best(n)
      println(f"[pipewarm] docs=$n tokens=$toks secs=$secs%.2f tokens_per_sec=${toks / secs / 1e6}%.2fM")
    }
    spark.stop()
  }

  private def runOnce(spark: org.apache.spark.sql.SparkSession, nDocs: Long): (Double, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipewarm")
    try {
      val tokens = graft.sources.Tokens.synthetic(spark, nDocs,
        numPartitions = spark.sparkContext.defaultParallelism * 2)
      val t0 = System.nanoTime()
      val s = graft.pipeline.EncodePipeline.run(spark, tokens,
        graft.pipeline.EncodePipeline.Config(outDir = dir.toString,
          targetBinTokens = 1L << 20))
      ((System.nanoTime() - t0) / 1e9, s.nTokens)
    } finally {
      try org.apache.spark.network.util.JavaUtils.deleteRecursively(dir.toFile)
      catch { case _: Throwable => () }
    }
  }
}
