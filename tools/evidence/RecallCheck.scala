object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val lsh = graft.ops.Dedup.verifiedPairs(docs, minJacPct = 80)
    val allPairs = docs.select(col("doc_id").as("doc_a"))
      .crossJoin(docs.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    val exact = graft.ops.Dedup.jaccardVerify(docs, allPairs).filter(col("jac_pct") >= 80)
    val l = lsh.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"RECALL lsh=${l.size} exact=${e.size} missed=${(e -- l).size} extra=${(l -- e).size}")
    spark.stop()
  }
}
