package graft

import java.nio.file.Files

import graft.materialize.{Materializer, VectorExport}
import graft.model.{ChunkProfile, RunConfig}
import graft.source.{FileSource, TranscriptGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MaterializerSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("mergeUpsert: MERGE-by-id keeps existing values, adds new rows (S6)") {
    val existing = Seq(
      ("n1", "old-name", Map("a" -> "1", "b" -> "2"))
    ).toDF("id", "name", "props")
    val incoming = Seq(
      ("n1", "new-name", Map("b" -> "99", "c" -> "3")), // matched: existing wins per key
      ("n2", "fresh", Map("x" -> "7")) // new: inserted
    ).toDF("id", "name", "props")
    val merged = Materializer.mergeUpsert(existing, incoming, "id")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getMap[String, String](2).toMap)).toMap
    assert(merged("n1")._1 == "old-name") // ON MATCH keeps existing scalar
    assert(merged("n1")._2 == Map("a" -> "1", "b" -> "2", "c" -> "3")) // map union, existing wins
    assert(merged("n2") == ("fresh", Map("x" -> "7"))) // ON CREATE inserts
  }

  test("mergeUpsert is idempotent") {
    val df = Seq(("n1", "v", Map("k" -> "1"))).toDF("id", "name", "props")
    val once = Materializer.mergeUpsert(df, df, "id")
    assert(once.count() == 1)
    val r = once.collect()(0)
    assert(r.getString(1) == "v" && r.getMap[String, String](2).toMap == Map("k" -> "1"))
  }

  test("vector export: dimension guard, payload projection, upsert (S10)") {
    val turns = TranscriptGen.table(spark, 4L).toDF()
    val g = graft.app.KgBuild.buildGraph(turns, RunConfig(runKey = "kg:vec"))
    val dir = Files.createTempDirectory("graft-vec").toString + "/collection"
    val n1 = VectorExport.upsert(spark, g.chunks, dir, graft.app.KgBuild.EmbeddingDim)
    assert(n1 > 0)
    // re-export is idempotent (upsert by chunk_id)
    val n2 = VectorExport.upsert(spark, g.chunks, dir, graft.app.KgBuild.EmbeddingDim)
    assert(n2 == n1)
    val coll = spark.read.parquet(dir)
    assert(coll.count() == n1)
    assert(coll.columns.contains("chunk_id") && coll.columns.contains("embedding"))
    // dimension guard trips on wrong dim
    val ex = intercept[IllegalArgumentException] {
      VectorExport.upsert(spark, g.chunks, dir + "2", 999)
    }
    assert(ex.getMessage.contains("dimension"))
    spark.catalog.clearCache()
  }

  test("file-mode source: deterministic order, blank files skipped (S1-S4)") {
    val dir = Files.createTempDirectory("graft-files")
    Files.writeString(dir.resolve("b.txt"), "Acme Corp launched HoverBoard X on 2020-01-01.")
    Files.writeString(dir.resolve("a.txt"), "Grace Hopper founded Initech in 1999.")
    Files.writeString(dir.resolve("blank.txt"), "   \n  ")
    val files = FileSource.readDirectory(spark, dir.toString)
    val paths = files.select("relative_path").collect().map(_.getString(0))
    assert(paths.sameElements(Array("a.txt", "b.txt"))) // sorted, blank skipped
    // file mode feeds the same pipeline via the transcript shape (S4)
    val g = graft.app.KgBuild.buildGraph(FileSource.asTurns(files), RunConfig(runKey = "kg:file"))
    val triples = g.triples.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(triples == Set(
      ("Grace Hopper", "FOUNDED", "Initech"),
      ("Acme Corp", "LAUNCHED", "HoverBoard X")))
    // single-file mode errors on missing path (S1)
    intercept[IllegalArgumentException] {
      FileSource.readFile(spark, dir.toString + "/missing.txt")
    }
    spark.catalog.clearCache()
  }

  test("pushBatched streams every partition in bounded batches (S10 transport shape)") {
    val rows = spark.range(1000).toDF("id").repartition(3)
    val batches = VectorExport.pushBatched(rows, 100) { b =>
      assert(b.nonEmpty && b.size <= 100, s"batch size ${b.size} out of bounds")
    }
    // >= ceil(1000/100) batches; at most one ragged batch extra per partition
    assert(batches >= 10 && batches <= 13, s"unexpected batch count $batches")
  }

  test("fetch by id strips nothing it shouldn't and filters exactly (R4)") {
    val turns = TranscriptGen.table(spark, 3L).toDF()
    val g = graft.app.KgBuild.buildGraph(turns, RunConfig(runKey = "kg:fetch"))
    val anyId = g.nodes.select("id").head().getString(0)
    val fetched = graft.operators.Retrieval.fetchById(g.nodes, anyId)
    assert(fetched.count() == 1)
    spark.catalog.clearCache()
  }
}
