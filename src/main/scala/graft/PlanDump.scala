package graft

import graft.app.KgBuild
import graft.model.RunConfig
import graft.operators.{Ann, Dedup, Retrieval}
import graft.source.{TranscriptDeriver, TranscriptGen}
import org.apache.spark.sql.functions._

/** Scratch diagnostics (not part of the driver contract): dump
  * explain("formatted") for the headline pipelines — the source for the plan
  * audit in PLANS.md.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== PLAN: $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    val turns = TranscriptGen.table(spark, 10L).toDF()
    val g = KgBuild.buildGraph(turns, RunConfig(runKey = "kg:plandump"))
    dump("kg_build_edges", g.edges)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    dump("lsh_topk", Ann.lshTopK(emb, emb.filter(col("vec_id") < 4), 5))
    val pqIdx = Ann.buildPqIndex(emb, m = 16, k = 32)
    dump("pq_query", Ann.pqQuery(pqIdx, emb, emb.filter(col("vec_id") < 4), 5, refine = 8))
    pqIdx.release()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("ngram_jaccard", Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8))
    val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id").cast("string").as("chunk_uid"), col("text"), col("embedding"))
    val qv = emb.filter(col("vec_id") === 0).select("embedding").collect()(0).getSeq[Float](0)
    dump("hybrid", Retrieval.hybridVec(corpus, qv, "spark join", 5))
    dump("derived_turns", TranscriptDeriver.turns(spark, sfDir))
    spark.stop()
  }
}
