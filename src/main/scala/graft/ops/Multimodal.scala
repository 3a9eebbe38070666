package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, flowing through batched decode / feature-extract / frame-sample
  * stages.
  *
  * The actual media codecs are NOT available in this container, so the
  * decode kernel is a clearly-marked deterministic fake ([[FakeMediaCodec]])
  * — but everything Spark-side is real and tested: the binary column, the
  * metadata struct schema, size-binned repartitioning so decode batches are
  * balanced, the batched per-partition execution shape, and the exploded
  * frame-sample output.
  */
object Multimodal {

  /** Media metadata derivable without decoding (portable; oracle-checkable):
    * byte length, content digest, and a deterministic fake geometry.
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("blob", col("text").cast("binary")) // stand-in payload bytes
      .select(
        col("doc_id"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        sha2(col("blob"), 256).as("sha"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").as("media_type"))
      .withColumn("width", expr("16 + n_bytes % 97").cast("long"))
      .withColumn("height", expr("16 + (n_bytes * 7) % 89").cast("long"))
      .withColumn("n_frames", expr("1 + n_bytes % 5").cast("long"))

  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Int, checksum: Long, features: Array[Float])

  /** Batched decode + feature-extract: size-binned repartition (balanced
    * decode batches regardless of blob-size skew), then per-partition
    * batched iteration — the Scala/Dataset analog of `mapInPandas` with
    * bounded batch shape.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = docs
      .withColumn("blob", col("text").cast("binary"))
      .withColumn("media_type",
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"))
      // spread decode work across the full shuffle parallelism: hashing
      // the unique doc_id scatters giant blobs uniformly (the previous
      // (media_type, size%8) key had only 24 distinct values, capping
      // decode at 24 tasks regardless of cluster size)
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("media_type"), col("blob"))
      .as[MediaRow]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // bounded batch shape
        FakeMediaCodec.decodeBatch(batch)
      }
    }
  }

  /** Resize planning: aspect-preserving target geometry under a max
    * dimension (the metadata half of an image-resize stage; the pixel
    * work itself belongs to the batched decoder). Pure integer
    * arithmetic — floor((dim × maxDim) / longest side) — so the plan is
    * identical across engines and oracle-checkable.
    */
  def resizePlan(docs: DataFrame, maxDim: Int = 64): DataFrame =
    mediaMeta(docs)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"))
      .withColumn("needs_resize",
        (greatest(col("width"), col("height")) > maxDim).cast("long"))
      .withColumn("new_width", expr(
        s"CASE WHEN greatest(width, height) <= $maxDim THEN width " +
          s"ELSE (width * $maxDim) DIV greatest(width, height) END"))
      .withColumn("new_height", expr(
        s"CASE WHEN greatest(width, height) <= $maxDim THEN height " +
          s"ELSE (height * $maxDim) DIV greatest(width, height) END"))

  /** Deterministic frame sampling: every `stride`-th frame index of the fake
    * geometry, exploded to one row per sampled frame.
    */
  def frameSample(docs: DataFrame, stride: Int = 2): DataFrame =
    mediaMeta(docs)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
}

/** STUB — stands in for an image/audio/video decoder, which is not
  * installed in this container. Deterministic pure function of the bytes so
  * tests and oracles are stable; swap `decodeBatch` for a real codec binding
  * (e.g. JavaCV / TwelveMonkeys) in production.
  */
object FakeMediaCodec extends Serializable {
  def decodeBatch(batch: Seq[Multimodal.MediaRow]): Seq[Multimodal.MediaFeatures] =
    batch.map { r =>
      var cks = 1469598103934665603L // FNV-1a over the payload
      var i = 0
      while (i < r.blob.length) {
        cks = (cks ^ (r.blob(i) & 0xffL)) * 1099511628211L
        i += 1
      }
      val features = Array.tabulate(8) { j =>
        ((cks >>> (j * 8)) & 0xff).toFloat / 255.0f
      }
      Multimodal.MediaFeatures(r.doc_id, r.media_type, r.blob.length, cks, features)
    }
}
