package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a transcript-shaped table (BASELINE.json input_hint schema) from
  * the driver's `documents.parquet`, deterministically and SQL-expressibly:
  * every rule here is mirrored 1:1 by ANSI SQL in SparkEntry.oracleSql so the
  * DuckDB oracle can verify the derivation and everything downstream of it.
  *
  * One document becomes one conversation; its text is cut into fixed
  * 240-char turns. This gives the KG pipeline an input that SCALES with the
  * driver's sf directory (sf0.1 ≈ 600k lineitem rows → tens of thousands of
  * turns) — the seeded TranscriptGen remains the fixture for golden-triple
  * P/R tests.
  */
object TranscriptDeriver {

  val TurnChars = 240

  def turns(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs
      .select(
        concat(lit("conv-"), col("doc_id")).as("conv_id"),
        col("doc_id"),
        col("text").as("doc_text"),
        greatest(lit(1), ceil(length(col("text")) / lit(TurnChars.toDouble))).cast("int").as("n_turns")
      )
      .select(
        col("conv_id"),
        col("doc_id"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"),
        col("doc_text")
      )
      .select(
        col("conv_id"),
        col("turn_idx"),
        when(col("turn_idx") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        expr(s"substring(doc_text, turn_idx * $TurnChars + 1, $TurnChars)").as("text"),
        lit(null).cast("string").as("tool"),
        // ts is monotone per (conv_id, turn_idx); excluded from oracle-checked
        // outputs (timestamp tz semantics differ across engines).
        timestamp_seconds(lit(1700000000L) + col("doc_id") * 3600L + col("turn_idx") * 60L).as("ts")
      )
  }

  /** The DuckDB-dialect equivalent of [[turns]] as a CTE body (minus ts),
    * reused by every oracle statement that starts from derived turns.
    */
  def oracleTurnsCte: String =
    s"""turns AS (
       |  SELECT 'conv-' || doc_id AS conv_id,
       |         CAST(i AS INT) AS turn_idx,
       |         CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |         substr(text, CAST(i * $TurnChars + 1 AS BIGINT), $TurnChars) AS text
       |  FROM documents,
       |       LATERAL unnest(generate_series(0, CAST(greatest(1, ceil(length(text) / $TurnChars.0)) AS BIGINT) - 1)) AS t(i)
       |)""".stripMargin
}
