package graft

import java.nio.file.Files

import graft.app.{AskMain, KgBuild}
import graft.model.RunConfig
import graft.source.TranscriptGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end serving path over MATERIALIZED tables: build to disk, then
  * hybrid search + doc enrichment + semantic context (ask_qdrant / MCP search
  * analog).
  */
class AskSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("ask returns top-k chunks with document and semantic context") {
    val dir = Files.createTempDirectory("graft-ask").toString
    val turns = TranscriptGen.table(spark, 15L).toDF()
    val qa = KgBuild.run(spark, turns, RunConfig(runKey = "kg:ask", numPartitions = 4), dir)
    assert(qa.status == "pass")

    val res = AskMain.ask(spark, dir, "Who founded Acme Corp?", topK = 5)
    val rows = res.collect()
    assert(rows.length == 5)
    // every match has a document (left-outer enrich always resolves here)
    assert(rows.forall(r => r.getAs[String]("document") != null))
    // scores are positive and sorted-able; fulltext hit on 'founded'/'Acme'
    assert(rows.forall(r => r.getAs[Double]("score") > 0))
    // at least one match carries semantic context (entities in the chunk)
    val withSem = rows.count(r =>
      !r.isNullAt(r.fieldIndex("semantic_nodes")) &&
        r.getSeq[String](r.fieldIndex("semantic_nodes")).nonEmpty)
    assert(withSem > 0, "expected semantic 1-hop context on some match")
    spark.catalog.clearCache()
  }
}
