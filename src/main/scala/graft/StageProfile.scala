package graft

import graft.chunk.ChunkStage
import graft.extract.Extractor
import graft.model.{ChunkProfile, RunConfig}
import graft.source.TranscriptGen
import org.apache.spark.sql.functions._

/** Scratch per-stage timing (not part of the driver contract). */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "200000").toLong
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val turns = TranscriptGen.table(spark, numConvs).toDF()
      time("gen+count")(turns.count())
      val turnsCached = turns.repartition(col("conv_id")).persist()
      time("repartition+persist")(turnsCached.count())
      time("chunks")(ChunkStage.chunks(turnsCached, ChunkProfile.text).count())
      val extracted = Extractor.extract(turnsCached).persist()
      time("extract")(extracted.count())
      time("mentions")(Extractor.mentions(extracted).count())
      time("relations")(Extractor.relations(extracted).count())
      time("turnOffsets")(ChunkStage.turnOffsets(turnsCached).count())
      time("turnToChunk")(ChunkStage.turnToChunk(
        ChunkStage.turnOffsets(turnsCached),
        ChunkStage.chunks(turnsCached, ChunkProfile.text)).count())
      time("fullBuild") {
        val g = graft.app.KgBuild.buildGraph(turns, RunConfig(runKey = "kg:prof"))
        g.edges.count() + g.relations.count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
