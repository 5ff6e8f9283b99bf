package graft

import graft.app.{AskMain, KgBuild}
import graft.model.RunConfig
import graft.source.TranscriptGen
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scratch diagnostic (not driver contract): decomposes the serving-path
  * latency (full ask vs no-semantic vs hybrid-only vs expansion-only) against
  * a cached GraphView — the measurement behind the round-4 serving-budget
  * work: the hybrid match plan used to be re-evaluated once per consumer
  * subtree (~3x the corpus scan per request) before AskMain localized the
  * topK-row match set.
  */
object AskProfile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-askprof").toString
    val turns = TranscriptGen.table(spark, 10L).toDF()
    KgBuild.run(spark, turns, RunConfig(runKey = "kg:prof", numPartitions = 2), dir)
    val view = AskMain.loadGraph(spark, dir)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (i <- 1 to 5) t(s"full ask $i") {
      AskMain.ask(spark, view, "Who founded Acme Corp?", 3, true)
        .orderBy(col("score").desc).collect()
    }
    for (i <- 1 to 3) t(s"no-semantic ask $i") {
      AskMain.ask(spark, view, "Who founded Acme Corp?", 3, false)
        .orderBy(col("score").desc).collect()
    }
    for (i <- 1 to 3) t(s"hybrid-only $i") {
      graft.operators.Retrieval.hybrid(view.chunks, "Who founded Acme Corp?", 3,
        dim = KgBuild.EmbeddingDim).collect()
    }
    for (i <- 1 to 3) t(s"semexp-only $i") {
      val m = graft.operators.Retrieval.hybrid(view.chunks, "Who founded Acme Corp?", 3,
        dim = KgBuild.EmbeddingDim)
      graft.operators.Retrieval.semanticExpansion(m, view.nodes, view.edges).collect()
    }
    view.release()
    spark.stop()
  }
}
