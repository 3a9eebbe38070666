/** Distributed-CC scale evidence: a deterministic multi-million-edge graph
  * (random edges + planted deep paths + giant stars) run through BOTH
  * connectedComponents paths — the distributed large-star/small-star
  * rewiring (driverLimit = 0) and the driver union-find (driverLimit
  * = Long.MaxValue) — asserting label-for-label equality. Sizes via
  * SPARK_GRAFT_CC_EDGES (default 5M).
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("cc-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val nEdges = sys.env.get("SPARK_GRAFT_CC_EDGES").map(_.toLong).getOrElse(5000000L)
    val nNodes = nEdges / 5 * 2 // sparse enough to leave many components
    // deterministic mixed topology: random edges + a 100k-hop path (deep
    // diameter) + two 50k-member stars (degree skew)
    val rand = spark.range(nEdges).select(
      pmod(xxhash64(col("id")), lit(nNodes)).as("doc_a"),
      pmod(xxhash64(col("id") + nEdges), lit(nNodes)).as("doc_b"))
    val path = spark.range(100000).select(
      (col("id") + nNodes).as("doc_a"), (col("id") + nNodes + 1).as("doc_b"))
    val stars = spark.range(100000).select(
      (lit(nNodes) + 200000 + (col("id") % 2)).as("doc_a"),
      (col("id") + nNodes + 300000).as("doc_b"))
    val pairs = rand.unionByName(path).unionByName(stars)
      .filter(col("doc_a") =!= col("doc_b"))
    val t0 = System.nanoTime()
    val dist = graft.ops.Dedup.connectedComponents(pairs, driverLimit = 0)
      .persist()
    val nDist = dist.count()
    val kDist = dist.select("label").distinct().count()
    val t1 = System.nanoTime()
    val drv = graft.ops.Dedup.connectedComponents(pairs, driverLimit = Long.MaxValue)
      .persist()
    val kDrv = drv.select("label").distinct().count()
    val t2 = System.nanoTime()
    val mismatches = dist.withColumnRenamed("label", "l1")
      .join(drv.withColumnRenamed("label", "l2"), Seq("node"))
      .filter(col("l1") =!= col("l2")).count()
    println(f"CCSCALE edges=${pairs.count()} nodes=$nDist clusters=$kDist " +
      f"dist_secs=${(t1 - t0) / 1e9}%.1f driver_clusters=$kDrv driver_secs=${(t2 - t1) / 1e9}%.1f " +
      f"label_mismatches=$mismatches")
    spark.stop()
  }
}
