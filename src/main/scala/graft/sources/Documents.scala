package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Multi-format document-table source (the reference exposes one logical
  * table over many physical acquisition formats; our engine's analog is a
  * schema-enforced reader over parquet/json/csv files). Reading with the
  * EXPLICIT schema — never inference — keeps types identical across
  * formats, so downstream token derivation and oracles are
  * format-agnostic; the row-validity filter drops null-keyed rows like
  * [[Tokens.fromDocuments]].
  */
object Documents {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  def read(spark: SparkSession, path: String, format: String): DataFrame = {
    val df = format match {
      case "parquet" => spark.read.parquet(path)
      case "json" => spark.read.schema(schema).json(path)
      case "csv" => spark.read.schema(schema)
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"").csv(path)
      case other => throw new IllegalArgumentException(s"unknown format '$other'")
    }
    df.filter(col("doc_id").isNotNull)
  }
}
