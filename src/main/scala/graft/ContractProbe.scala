package graft

import graft.app.KgBuild
import graft.model.{RunConfig, Triple}
import graft.operators.Ann
import graft.source.TranscriptGen
import org.apache.spark.sql.functions._

/** Scratch diagnostic (not driver contract): measures the accuracy-contract
  * values for the round-3 oracle expansion so thresholds are set from data.
  */
object ContractProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 8)
      def topSet(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
      val brute = topSet(Ann.bruteForceTopK(emb, queries, 5))
      def recalls(m: Map[Long, Set[Long]]) =
        brute.keys.toSeq.sorted.map(q =>
          (m.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
      for (bands <- Seq(4, 8, 16)) {
        val t0 = System.nanoTime()
        val lsh = topSet(Ann.lshTopK(emb, queries, 5, nBits = 32, bands = bands))
        println(s"[probe] $sf lsh bands=$bands recalls=${recalls(lsh)} " +
          s"sec=${(System.nanoTime()-t0)/1e9}")
      }
      for (nProbe <- Seq(4, 8)) {
        val t0 = System.nanoTime()
        val ivf = topSet(Ann.ivfTopK(emb, queries, 5, nCells = 16, nProbe = nProbe))
        println(s"[probe] $sf ivf nProbe=$nProbe recalls=${recalls(ivf)} " +
          s"sec=${(System.nanoTime()-t0)/1e9}")
      }
      for ((mSub, kCw, refine) <- Seq((8, 16, 8), (8, 32, 16), (16, 16, 8), (16, 32, 8), (16, 32, 16))) {
        val t0 = System.nanoTime()
        val pq = topSet(Ann.pqTopK(emb, queries, 5, m = mSub, nCodewords = kCw, refine = refine))
        println(s"[probe] $sf pq m=$mSub k=$kCw refine=$refine recalls=${recalls(pq)} " +
          s"sec=${(System.nanoTime()-t0)/1e9}")
      }
      for ((nProbe, refine) <- Seq((4, 8), (8, 8), (8, 16))) {
        val t0 = System.nanoTime()
        val ivfpq = topSet(Ann.ivfPqTopK(emb, queries, 5, nCells = 16, m = 16,
          nCodewords = 32, nProbe = nProbe, refine = refine))
        println(s"[probe] $sf ivfpq nProbe=$nProbe refine=$refine recalls=${recalls(ivfpq)} " +
          s"sec=${(System.nanoTime()-t0)/1e9}")
      }
      // exact cosine near-dup pair count at threshold 0.2
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      val t0 = System.nanoTime()
      val nExact = a.join(b, col("id_a") < col("id_b"))
        .filter(Ann.cosine(col("ea"), col("eb")) >= 0.2).count()
      println(s"[probe] $sf n_exact_neardup=$nExact in ${(System.nanoTime()-t0)/1e9}s")
      val found = Ann.cosineNearDupPairs(emb, 0.2, nBits = 32, bands = 2).count()
      println(s"[probe] $sf n_found_neardup=$found")
      spark.catalog.clearCache()
    }
    // synth triple P/R at 30 convs
    val turns = TranscriptGen.table(spark, 30L).toDF()
    val g = KgBuild.buildGraph(turns, RunConfig(runKey = "kg:probe"))
    val emitted = g.triples.collect()
      .map(r => Triple(r.getString(0), r.getString(1), r.getString(2))).toSet
    val golden = TranscriptGen.goldenTriples(30L)
    val tp = (emitted intersect golden).size
    println(s"[probe] synth30 emitted=${emitted.size} golden=${golden.size} tp=$tp " +
      s"P=${tp.toDouble/emitted.size} R=${tp.toDouble/golden.size}")
    g.release()
    spark.stop()
  }
}
