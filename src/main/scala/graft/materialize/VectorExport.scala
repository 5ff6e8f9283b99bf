package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-collection export sink — the engine's analog of the reference's
  * Qdrant export (ref:scripts/export_to_qdrant.py): select chunks with a
  * non-empty embedding, project the payload columns with coalesce
  * keep-existing id semantics, validate the collection's dimension, order by
  * chunk index, and upsert in batches.
  *
  * Physical target here is a Parquet "collection" directory (no vector server
  * in the sandbox); the batching shape (foreachPartition-style grouped
  * writes) is what a network sink would reuse.
  */
object VectorExport {

  val DefaultBatchSize = 256 // ref:scripts/export_to_qdrant.py:149

  /** P1+P2: exportable rows — non-empty embedding, projected payload with
    * coalesce(chunk_id, uid) (ref:scripts/export_to_qdrant.py:45-62).
    */
  def exportable(chunks: DataFrame): DataFrame =
    chunks
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(
        coalesce(col("chunk_uid")).as("chunk_id"),
        col("conv_id"),
        col("seq"),
        col("index"),
        col("checksum"),
        col("text"),
        col("embedding"))
      .orderBy("conv_id", "index") // ORDER BY chunk_index (O2)

  /** Dimension guard: every vector must have exactly `dim` components
    * (ref:scripts/export_to_qdrant.py create/validate + ref:src/cli/utils.py:14-48).
    * Throws on mismatch, like the reference's collection validation.
    */
  def validateDimension(df: DataFrame, dim: Int): Unit = {
    val bad = df.filter(size(col("embedding")) =!= dim).count()
    require(bad == 0, s"$bad vectors do not match collection dimension $dim")
  }

  /** The network-sink transport shape: stream every partition's rows to a
    * sink callback in batches of `batchSize` — exactly what the reference's
    * client does with its 256-point upsert batches
    * (ref:scripts/export_to_qdrant.py:65-83,235-269). Runs on the executors
    * (foreachPartition); returns the number of batches sent. The parquet
    * collection in [[upsert]] is the sandbox physical target; a real vector
    * server plugs in as `sendBatch`.
    */
  def pushBatched(rows: DataFrame, batchSize: Int = DefaultBatchSize)(
      sendBatch: Seq[org.apache.spark.sql.Row] => Unit): Long = {
    require(batchSize > 0)
    val acc = rows.sparkSession.sparkContext.longAccumulator("export_batches")
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.grouped(batchSize).foreach { b => sendBatch(b); acc.add(1) }
    }
    acc.value
  }

  /** Create-or-validate + upsert (MERGE by chunk_id keeps existing payload
    * fields when re-exporting — S6 semantics applied at the collection).
    */
  def upsert(spark: SparkSession, chunks: DataFrame, collectionDir: String, dim: Int): Long = {
    val rows = exportable(chunks)
    validateDimension(rows, dim)
    val existing =
      try Some(spark.read.parquet(collectionDir))
      catch { case _: Throwable => None }
    val merged = existing match {
      case Some(ex) if ex.columns.sameElements(rows.columns) =>
        Materializer.mergeUpsert(ex, rows, "chunk_id")
      case _ => rows
    }
    val n = merged.count()
    merged.write.mode(SaveMode.Overwrite).parquet(s"$collectionDir.tmp")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(collectionDir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$collectionDir.tmp"), p)
    n
  }
}
