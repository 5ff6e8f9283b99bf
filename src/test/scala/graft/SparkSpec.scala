package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object SharedSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // Suites run CONCURRENTLY in the forked test JVM and share this one
    // session. Under the default FIFO scheduler a sub-second job (e.g. an
    // /ask round-trip in AskSpec's latency test) queues behind another
    // suite's multi-second job on all 4 cores; FAIR round-robins task
    // slots across concurrent jobs so short jobs schedule promptly.
    // Test-harness-only: production sessions (Bench/KgBuildMain) are
    // unaffected.
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()
}
