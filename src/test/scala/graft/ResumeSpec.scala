package graft

import java.nio.file.Files

import graft.app.KgBuild
import graft.materialize.Materializer
import graft.model.RunConfig
import graft.source.TranscriptGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Resume + rollback semantics (FIXTURES.md §7, SURVEY.md T5):
  * a killed run resumes without recomputing completed partitions and the
  * final output equals an uninterrupted run's.
  */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  val NumConvs = 12L
  lazy val cfg = RunConfig(runKey = "kg-build:resume-test", numPartitions = 4)

  private def tripleSet(dir: String): Set[(String, String, String)] = {
    val nodes = spark.read.parquet(s"$dir/nodes").dropDuplicates("id")
    val edges = spark.read.parquet(s"$dir/edges")
    KgBuild.tripleView(nodes, edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  test("kill-after-partial-run resumes only pending partitions; output identical") {
    val turns = TranscriptGen.table(spark, NumConvs).toDF().cache()
    val full = Files.createTempDirectory("graft-full").toString
    val part = Files.createTempDirectory("graft-part").toString

    // uninterrupted run
    val qaFull = KgBuild.run(spark, turns, cfg, full)
    assert(qaFull.status == "pass")

    // simulate a killed run: first pass only saw 2 of 4 partitions' convs
    val partIds = turns
      .withColumn("part_id", Materializer.partId("conv_id", cfg.numPartitions))
    val firstHalf = partIds.filter(col("part_id") < 2).drop("part_id")
    KgBuild.run(spark, firstHalf, cfg, part)
    val manifestAfterKill = spark.read.parquet(s"$part/_manifest")
      .filter(col("stage") === "nodes")
      .select("part_id").distinct().count()
    assert(manifestAfterKill == 2)

    // resume with the FULL input: completed partitions must be skipped
    KgBuild.run(spark, turns, cfg, part)
    val manifest = spark.read.parquet(s"$part/_manifest")
      .filter(col("stage") === "nodes")
      .groupBy("part_id").count()
    // each partition completed exactly once (no recompute of the first half)
    assert(manifest.filter(col("count") > 1).count() == 0)
    assert(manifest.count() == 4)

    assert(tripleSet(part) == tripleSet(full))
  }

  test("a changed input checksum invalidates the completed partition") {
    val turns = TranscriptGen.table(spark, 6L).toDF().cache()
    val dir = Files.createTempDirectory("graft-inval").toString
    KgBuild.run(spark, turns, cfg, dir)
    // mutate one conversation's text => its partition checksum changes
    val mutated = turns.withColumn("text",
      when(col("conv_id") === "conv-000002", concat(col("text"), lit(" EDITED")))
        .otherwise(col("text")))
    val checks = Materializer.inputChecksums(mutated, cfg.numPartitions)
    val done = Materializer.completedPartitions(spark, dir, "nodes", checks)
    val changedPartId = mutated.filter(col("conv_id") === "conv-000002")
      .select(Materializer.partId("conv_id", cfg.numPartitions).as("p"))
      .distinct().collect().head.getInt(0)
    assert(!done.collect().map(_.getInt(0)).contains(changedPartId))
  }

  test("per-partition metrics rows are written alongside the manifest") {
    val turns = TranscriptGen.table(spark, 8L).toDF().cache()
    val dir = Files.createTempDirectory("graft-metrics").toString
    KgBuild.run(spark, turns, cfg, dir)
    val metrics = spark.read.parquet(s"$dir/_metrics")
    assert(metrics.columns.toSet == Set("part_id", "rel_type", "rows", "run_key"))
    // metrics row totals agree with the materialized edge table
    val fromMetrics = metrics.groupBy("rel_type")
      .agg(sum("rows").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromEdges = spark.read.parquet(s"$dir/edges")
      .groupBy("rel_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromMetrics == fromEdges)
  }

  test("extreme long-conversation skew: a 10k-turn conversation completes and stays correct") {
    import spark.implicits._
    // one monster conversation + a few normal ones — the fused group pass
    // must handle the hot group in one task without spilling over limits
    val monster = graft.source.TranscriptGen.conversation(0L).map(_.turn) // ~hot conv
    val big = (0 until 10000).map { i =>
      val t = monster(i % monster.size)
      t.copy(conv_id = "conv-monster", turn_idx = i)
    }
    val normal = (1L to 4L).flatMap(c => graft.source.TranscriptGen.conversation(c).map(_.turn))
    val turns = (big ++ normal).toDF()
    val g = KgBuild.buildGraph(turns, cfg)
    val mism = graft.qa.QaEvaluator.checksumMismatches(turns, g.turnChecksums).count()
    assert(mism == 0)
    assert(g.chunks.filter(col("conv_id") === "conv-monster").count() > 100)
    assert(g.triples.count() > 0)
    spark.catalog.clearCache()
  }

  test("node write path is MERGE-clean on disk: recompute keeps content stable, no dup ids") {
    val turns = TranscriptGen.table(spark, 8L).toDF().cache()
    val dir = Files.createTempDirectory("graft-compact").toString
    KgBuild.run(spark, turns, cfg, dir)
    def snapshot() = spark.read.parquet(s"$dir/nodes")
      .drop("ingest_run_key") // re-stamped per run by MERGE (SET-on-match semantics)
      .collect().map(_.toString).sorted.toSeq
    val before = snapshot()
    // no duplicate (part_id, id) rows on disk — MERGE-clean without read-side dedupe
    assert(spark.read.parquet(s"$dir/nodes")
      .groupBy("part_id", "id").count().filter(col("count") > 1).count() == 0)
    // force full recompute: drop the completion manifest, rerun under a new key
    val fs = new org.apache.hadoop.fs.Path(s"$dir/_manifest")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_manifest"), true)
    KgBuild.run(spark, turns, cfg.copy(runKey = "kg-build:resume-test-rerun"), dir)
    assert(snapshot() == before, "recompute must leave node content unchanged")
    assert(spark.read.parquet(s"$dir/nodes")
      .groupBy("part_id", "id").count().filter(col("count") > 1).count() == 0)
  }

  test("rollback removes exactly the bad run's rows") {
    import spark.implicits._
    val turns = TranscriptGen.table(spark, 6L).toDF().cache()
    val dir = Files.createTempDirectory("graft-rb").toString
    KgBuild.run(spark, turns, cfg, dir)
    val before = spark.read.parquet(s"$dir/nodes").count()
    assert(before > 0)
    KgBuild.rollbackStage(spark, dir, "nodes", Seq(cfg.runKey).toDF("ingest_run_key"))
    assert(spark.read.parquet(s"$dir/nodes").count() == 0)
  }
}
