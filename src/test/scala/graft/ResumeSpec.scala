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

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listFiles(dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    if (!fs.exists(p)) Set.empty
    else {
      val it = fs.listFiles(p, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next().getPath.toString
      b.result()
    }
  }

  test("QA fail -> rollback -> retry -> pass: graph identical to an uninterrupted run") {
    val turns = TranscriptGen.table(spark, 10L).toDF().cache()
    val clean = Files.createTempDirectory("graft-gate-clean").toString
    val dir = Files.createTempDirectory("graft-gate").toString
    assert(KgBuild.run(spark, turns, cfg.copy(runKey = "kg:gate-clean"), clean).status == "pass")

    // force the gate to fail (thresholds an all-green graph can't meet)
    val qaBad = KgBuild.run(spark, turns, cfg.copy(runKey = "kg:gate-bad"), dir,
      graft.qa.QaEvaluator.QaThresholds(maxMissingEmbeddings = -1))
    assert(qaBad.status == "fail")
    // rollback ran: no row of the failed run survives in any stage, and the
    // partitioned stage dirs keep their part_id= layout (no bare data files
    // at the root that would break partition discovery on the retry)
    KgBuild.PartitionedStages.foreach { stage =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$stage")
      if (fsOf(dir).exists(p)) {
        fsOf(dir).listStatus(p).foreach { st =>
          assert(!(st.isFile && st.getPath.getName.endsWith(".parquet")),
            s"$stage: unpartitioned data file ${st.getPath} after rollback")
        }
        val remaining = try spark.read.parquet(p.toString)
          .filter(col("ingest_run_key") === "kg:gate-bad").count()
        catch { case _: Throwable => 0L } // empty dir = rolled back
        assert(remaining == 0, s"$stage still holds failed-run rows")
      }
    }
    // the failed run's completion markers are gone (retry must recompute)
    val manifest = spark.read.parquet(s"$dir/_manifest")
    assert(manifest.count() == 0, "rolled-back partitions kept completion rows")

    // retry into the SAME directory with sane thresholds
    val qa2 = KgBuild.run(spark, turns, cfg.copy(runKey = "kg:gate-retry"), dir)
    assert(qa2.status == "pass")
    assert(tripleSet(dir) == tripleSet(clean))
    assert(spark.read.parquet(s"$dir/nodes")
      .groupBy("part_id", "id").count().filter(col("count") > 1).count() == 0)
    // completedPartitions resolves every NON-EMPTY partition for a
    // same-input rerun (a hash partition with no conversations never gets a
    // manifest row)
    val checks = Materializer.inputChecksums(turns, cfg.numPartitions)
    val nonEmptyParts = turns
      .select(Materializer.partId("conv_id", cfg.numPartitions)).distinct().count()
    assert(Materializer.completedPartitions(spark, dir, "nodes", checks).count() ==
      nonEmptyParts)
  }

  test("targeted rollback: a 1-partition failed run rewrites only that partition") {
    import spark.implicits._
    val turns = TranscriptGen.table(spark, 12L).toDF().cache()
    val dir = Files.createTempDirectory("graft-rbtgt").toString
    assert(KgBuild.run(spark, turns, cfg.copy(runKey = "kg:tgt-a"), dir).status == "pass")

    // extra conversations confined to ONE partition: probe candidate ids
    val hotPart = 1
    val extraIds = (0 until 100).map(i => s"conv-extra-$i").toDF("conv_id")
      .withColumn("p", Materializer.partId("conv_id", cfg.numPartitions))
      .collect().filter(_.getInt(1) == hotPart).map(_.getString(0)).take(2).toSeq
    assert(extraIds.size == 2)
    val extraTurns = extraIds.zipWithIndex.flatMap { case (id, i) =>
      graft.source.TranscriptGen.conversation(100L + i).map(_.turn.copy(conv_id = id))
    }.toDF()
    val before = KgBuild.PartitionedStages.map { s =>
      s -> (0 until cfg.numPartitions).map(p => p -> listFiles(s"$dir/$s/part_id=$p")).toMap
    }.toMap

    // failed run touching only hotPart
    val qaBad = KgBuild.run(spark, turns.unionByName(extraTurns),
      cfg.copy(runKey = "kg:tgt-bad"), dir,
      graft.qa.QaEvaluator.QaThresholds(maxMissingEmbeddings = -1))
    assert(qaBad.status == "fail")

    // every untouched partition's files are bit-for-bit the same listing;
    // rollback cost scaled with the failed run, not the table
    KgBuild.PartitionedStages.foreach { s =>
      (0 until cfg.numPartitions).filter(_ != hotPart).foreach { p =>
        assert(listFiles(s"$dir/$s/part_id=$p") == before(s)(p),
          s"untouched partition $s/part_id=$p was rewritten")
      }
    }
    // no failed-run rows anywhere; touched partition's completion rows gone
    assert(spark.read.parquet(s"$dir/nodes")
      .filter(col("ingest_run_key") === "kg:tgt-bad").count() == 0)
    val manifest = spark.read.parquet(s"$dir/_manifest")
    assert(manifest.filter(col("run_key") === "kg:tgt-bad").count() == 0)
    assert(manifest.filter(col("part_id") === hotPart).count() == 0,
      "touched partition must lose ALL completion rows (MERGE re-stamp semantics)")

    // retry the same widened input: recomputes exactly hotPart, passes, and
    // matches a from-scratch run over the widened input
    val qa2 = KgBuild.run(spark, turns.unionByName(extraTurns),
      cfg.copy(runKey = "kg:tgt-retry"), dir)
    assert(qa2.status == "pass")
    val freshDir = Files.createTempDirectory("graft-rbtgt-fresh").toString
    assert(KgBuild.run(spark, turns.unionByName(extraTurns),
      cfg.copy(runKey = "kg:tgt-fresh"), freshDir).status == "pass")
    assert(tripleSet(dir) == tripleSet(freshDir))
  }

  test("mid-rollback crash: marker replay recovers — no false-complete partition, kept rows survive") {
    import spark.implicits._
    val turns = TranscriptGen.table(spark, 12L).toDF().cache()
    val dir = Files.createTempDirectory("graft-rbcrash").toString
    assert(KgBuild.run(spark, turns, cfg.copy(runKey = "kg:crash-a"), dir).status == "pass")

    // widen the input inside ONE partition so the "failed" run touches only it
    val hotPart = 1
    val extraIds = (0 until 100).map(i => s"conv-xtra-$i").toDF("conv_id")
      .withColumn("p", Materializer.partId("conv_id", cfg.numPartitions))
      .collect().filter(_.getInt(1) == hotPart).map(_.getString(0)).take(2).toSeq
    assert(extraIds.size == 2)
    val extraTurns = extraIds.zipWithIndex.flatMap { case (id, i) =>
      graft.source.TranscriptGen.conversation(200L + i).map(_.turn.copy(conv_id = id))
    }.toDF()
    val widened = turns.unionByName(extraTurns).cache()
    assert(KgBuild.run(spark, widened, cfg.copy(runKey = "kg:crash-bad"), dir)
      .status == "pass")

    // Simulate: QA declared kg:crash-bad failed and the compensating
    // rollback CRASHED mid-flight, at the worst reachable state under the
    // marker-first/manifest-first ordering:
    //   marker written, manifest invalidated, nodes fully swapped, and the
    //   edges swap interrupted BETWEEN delete and rename (kept rows exist
    //   only in edges.rbtmp). chunks/turn_checksums untouched.
    val badKeys = Seq("kg:crash-bad")
    val touched = spark.read.parquet(s"$dir/_manifest")
      .filter(col("run_key") === "kg:crash-bad")
      .select("part_id").distinct().collect().map(_.getInt(0)).toSeq.sorted
    assert(touched == Seq(hotPart))
    KgBuild.writeRollbackMarker(spark, dir, badKeys, touched)
    KgBuild.invalidateManifest(spark, dir, badKeys, touched)
    KgBuild.rollbackStagePartitions(spark, dir, "nodes",
      badKeys.toDF("ingest_run_key"), touched)
    val edgesPath = s"$dir/edges"
    val keptEdges = spark.read.parquet(edgesPath)
      .filter(col("part_id") === hotPart &&
        col("ingest_run_key") =!= "kg:crash-bad")
      .localCheckpoint() // detach from the files we are about to delete
    assert(keptEdges.count() > 0, "fixture: partition must hold kept good-run rows")
    keptEdges.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("part_id").parquet(s"$edgesPath.rbtmp")
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(s"$edgesPath/part_id=$hotPart"), true)

    // THE invariant the reordering buys: at every crash point, the touched
    // partition has NO surviving completion row (recompute, never skip)
    val midManifest = spark.read.parquet(s"$dir/_manifest")
    assert(midManifest.filter(col("part_id") === hotPart).count() == 0,
      "crash window exposed a false-complete partition")
    // and the crash really did leave half-cleaned stages behind
    assert(spark.read.parquet(s"$dir/chunks")
      .filter(col("ingest_run_key") === "kg:crash-bad").count() > 0)

    // next run replays the marker, restores the staged kept rows, recomputes
    val qa = KgBuild.run(spark, widened, cfg.copy(runKey = "kg:crash-retry"), dir)
    assert(qa.status == "pass")
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/_rollback_pending")))
    KgBuild.PartitionedStages.foreach { stage =>
      assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/$stage.rbtmp")),
        s"$stage.rbtmp left behind")
      assert(spark.read.parquet(s"$dir/$stage")
        .filter(col("ingest_run_key") === "kg:crash-bad").count() == 0,
        s"$stage still holds crashed-rollback run rows")
    }
    // full triple set: identical to an uninterrupted fresh run on the same input
    val freshDir = Files.createTempDirectory("graft-rbcrash-fresh").toString
    assert(KgBuild.run(spark, widened, cfg.copy(runKey = "kg:crash-fresh"), freshDir)
      .status == "pass")
    assert(tripleSet(dir) == tripleSet(freshDir))
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
    // a fully-rolled-back partitioned stage has no data files left at all
    // (the layout-preserving rewrite emits no partition dirs for zero rows)
    val remaining =
      try spark.read.parquet(s"$dir/nodes").count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(remaining == 0)
  }
}
