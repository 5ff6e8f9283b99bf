package graft

import graft.app.KgBuild
import graft.model.RunConfig
import graft.qa.QaEvaluator
import graft.source.TranscriptGen
import org.scalatest.funsuite.AnyFunSuite

/** The QA gate runs after every build; its cost budget is THREE actions
  * (one fused chunk pass, one nodes∪edges counts pass, one batched
  * anomaly-join action) — at corpus scale each extra action is another
  * full table scan. Pinned with AQE off so 1 action == 1 job and the
  * statusTracker job-group count is exact.
  */
class QaEvaluatorSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("evaluate runs exactly 3 Spark jobs (AQE off) and its values match the graph") {
    val turns = TranscriptGen.table(spark, 8L).toDF()
    val g = KgBuild.buildGraph(turns, RunConfig(runKey = "kg:qa-jobs"))
    // materialize inputs first so the counted jobs are ONLY the gate's
    val chunks = g.chunks.localCheckpoint()
    val checksums = g.turnChecksums.localCheckpoint()
    val nodes = g.nodes.localCheckpoint()
    val edges = g.edges.localCheckpoint()
    g.release()

    // AQE off: 1 action = 1 job. Broadcast thresholds off: a broadcast
    // build side would otherwise run its own (group-inherited) job per
    // join, triple-counting action 3 — the pin is about TABLE PASSES, and
    // a broadcast build is not an extra pass over the big tables.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val sc = spark.sparkContext
    val qa =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sc.setJobGroup("qa-gate-probe", "QaEvaluator job-count pin")
        QaEvaluator.evaluate(turns, checksums, chunks, nodes, edges)
      } finally {
        sc.clearJobGroup()
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      }
    val jobs = sc.statusTracker.getJobIdsForGroup("qa-gate-probe")
    assert(jobs.length == 3,
      s"QA gate must stay fused at 3 actions, ran ${jobs.length} jobs")

    // fusion must not change the gate's answers
    assert(qa.status == "pass")
    assert(qa.counts("label:Document") == 8L)
    assert(qa.counts("label:Chunk") == chunks.count())
    assert(qa.counts("rel:HAS_CHUNK") == chunks.count())
    assert(qa.anomalies.values.forall(_ == 0L))
    assert(qa.tokenHistogram.map(_._2).sum == chunks.count())
    assert(qa.tokenStats("total") > 0)
    spark.catalog.clearCache()
  }

  test("histogram from the fused pass equals a direct groupBy") {
    val turns = TranscriptGen.table(spark, 6L).toDF()
    val g = KgBuild.buildGraph(turns, RunConfig(runKey = "kg:qa-hist"))
    val chunks = g.chunks.localCheckpoint()
    val qa = QaEvaluator.evaluate(turns, g.turnChecksums, chunks, g.nodes, g.edges)
    val direct = chunks.groupBy(QaEvaluator.tokenBucket.as("bucket")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(qa.tokenHistogram == direct)
    g.release()
    spark.catalog.clearCache()
  }
}
