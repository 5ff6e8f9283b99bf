package graft.operators

import graft.util.Determinism
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video carried as opaque `binary`
  * columns with typed metadata, processed in batched per-partition passes.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * deterministic STUBS (clearly marked) — but the Spark-side contract is real
  * and tested: schema, batch shape (mapPartitions processes a partition as a
  * stream, the Scala analog of mapInPandas' batch iterator), partitioning, and
  * the metadata/feature output types a real decoder would produce.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true)
    )), nullable = true)
  ))

  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // STUB: a real pipeline emits decoded features (pixels/spectrogram);
      // here a deterministic 8-dim content hash stands in so the plumbing is
      // testable end-to-end without codecs.
      feature: Array[Float],
      frames_sampled: Int
  )

  /** Deterministic stand-in for decode + feature-extract (STUB — replace the
    * body with a real codec call; the signature and batching are the real
    * contract). One narrow pass, no shuffle.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition init cost (codec handles, model weights) goes here,
        // amortized over the batch — same shape as mapInPandas
        batch.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val h0 = Determinism.mix(id, bytes.length.toLong)
          val feat = Array.tabulate(8)(i =>
            (Determinism.mix64(h0 ^ i.toLong) % 1000L).toFloat / 1000f)
          val frames = kind match {
            case "video" => math.max(1, bytes.length / 1024)
            case "audio" => math.max(1, bytes.length / 4096)
            case _       => 1
          }
          MediaFeature(id, kind, bytes.length.toLong, feat, frames)
        }
      }
  }

  /** Media table derived deterministically from the documents table
    * (payload = UTF-8 text bytes, kind round-robins on doc_id) — gives the
    * multimodal plumbing an input that scales with the sf directory and whose
    * byte/frame arithmetic an SQL oracle can verify.
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Deterministic synthetic media table for tests/bench (payload = seeded
    * bytes; no external data).
    */
  def syntheticMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + math.floorMod(Determinism.mix(i, 1L), 4096L).toInt
      val payload = Array.tabulate(len)(j => (Determinism.mix(i, j.toLong) & 0xff).toByte)
      (i, kind, payload)
    }.toDF("media_id", "kind", "payload")
  }
}
