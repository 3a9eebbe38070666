package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format export of encoded tables (reference K1/K2:
  * crates/freeze/src/types/dataframes/export.rs:27-62 — parquet/csv/json
  * writers with per-format options). Binary columns (encoded blobs) are
  * hex-wrapped for the text formats (Spark's base64() MIME-chunks with
  * embedded newlines, which breaks CSV records) and restored on read, so
  * write∘read = identity for every format (the reference's
  * test_output_formats.py invariant).
  */
object Export {

  val Formats: Seq[String] = Seq("parquet", "csv", "json")

  private def binaryCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case StructField(n, BinaryType, _, _) => n }.toSeq

  /** Export with user-facing column-set selection (schemas.rs semantics —
    * see [[graft.ops.ColumnSelect]]): `defaults` is the dataset's ordered
    * default column set (all columns when empty), `columns` the
    * include/exclude/explicit spec applied against the frame's universe.
    */
  def write(df: DataFrame, path: String, format: String,
      compression: String, columns: graft.ops.ColumnSelect.Spec,
      defaults: Seq[String]): Unit = {
    val base = if (defaults.isEmpty) df.columns.toSeq else defaults
    write(graft.ops.ColumnSelect(df, base, columns), path, format, compression)
  }

  def write(df: DataFrame, path: String, format: String,
      compression: String = "snappy"): Unit = format match {
    case "parquet" =>
      df.write.mode("overwrite").option("compression", compression).parquet(path)
    case "csv" =>
      val cols = binaryCols(df)
      val textified = cols.foldLeft(df)((d, c) => d.withColumn(c, hex(col(c))))
      textified.write.mode("overwrite").option("header", "true")
        .option("compression", if (compression == "snappy") "gzip" else compression)
        .csv(path)
    case "json" =>
      val cols = binaryCols(df)
      val textified = cols.foldLeft(df)((d, c) => d.withColumn(c, hex(col(c))))
      textified.write.mode("overwrite")
        .option("compression", if (compression == "snappy") "gzip" else compression)
        .json(path)
    case other => throw new IllegalArgumentException(s"unknown format '$other'")
  }

  /** Read back with the original schema (binary columns restored; csv/json
    * read with the explicit schema so types roundtrip).
    */
  def read(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame = format match {
    case "parquet" => spark.read.parquet(path)
    case "csv" | "json" =>
      val textSchema = StructType(schema.fields.map {
        case StructField(n, BinaryType, nu, m) => StructField(n, StringType, nu, m)
        case f => f
      })
      val raw =
        if (format == "csv")
          spark.read.option("header", "true").schema(textSchema).csv(path)
        else spark.read.schema(textSchema).json(path)
      schema.fields.collect { case StructField(n, BinaryType, _, _) => n }
        .foldLeft(raw)((d, c) => d.withColumn(c, unhex(col(c))))
    case other => throw new IllegalArgumentException(s"unknown format '$other'")
  }
}
