object DedupStress {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("dedup-stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // N synthetic docs (text = token words; SPARK_GRAFT_STRESS_DOCS,
    // default 50k) + 500-clone boilerplate cluster + N/50 near-dup pairs
    // (doc and its 1-word-dropped twin)
    val nDocs = sys.env.get("SPARK_GRAFT_STRESS_DOCS").map(_.toInt).getOrElse(50000)
    // id offsets scale with the corpus so twin/clone/base ranges can never
    // collide. Historical reproducibility: twinBase stays 700000 below
    // 175k docs and cloneBase stays 900000 up to 150k docs, so the
    // recorded 50k and 150k evidence corpora are unchanged; other sizes
    // get scaled (collision-free) offsets.
    val twinBase = math.max(700000L, 4L * nDocs)
    val cloneBase = math.max(900000L, 6L * nDocs)
    val base = graft.sources.Tokens.synthetic(spark, nDocs)
      .select(col("doc_id"), concat_ws(" ",
        expr("transform(tokens, x -> CAST(x AS STRING))")).as("text"))
    val boiler = base.filter(col("doc_id") === 123).select(col("text")).collect()(0).getString(0)
    val clones = spark.range(0, 500).select((col("id") + cloneBase).as("doc_id"), lit(boiler).as("text"))
    val twins = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + twinBase).as("doc_id"),
        expr("concat_ws(' ', slice(split(text, ' '), 1, size(split(text, ' ')) - 1))").as("text"))
    val docs = base.unionByName(clones).unionByName(twins)
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.verifiedPairs(docs, minJacPct = 80).cache()
    val nPairs = pairs.count()
    val t1 = System.nanoTime()
    // driverLimit = 0 forces the distributed star path (at 164k edges the
    // default would take the driver union-find shortcut)
    val cc = graft.ops.Dedup.connectedComponents(pairs.select("doc_a", "doc_b"), driverLimit = 0)
    val nClusters = cc.select("label").distinct().count()
    val nNodes = cc.count()
    val t2 = System.nanoTime()
    val ccDrv = graft.ops.Dedup.connectedComponents(pairs.select("doc_a", "doc_b"))
    val nClustersDrv = ccDrv.select("label").distinct().count()
    val t3 = System.nanoTime()
    println(f"DEDUPSTRESS docs=${docs.count()} pairs=$nPairs pairs_secs=${(t1-t0)/1e9}%.1f cc_nodes=$nNodes cc_clusters=$nClusters cc_secs=${(t2-t1)/1e9}%.1f cc_driver_clusters=$nClustersDrv cc_driver_secs=${(t3-t2)/1e9}%.1f")
    spark.stop()
  }
}
