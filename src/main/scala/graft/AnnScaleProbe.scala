package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Scratch diagnostic (not driver contract): PQ vs IVFADC at a corpus size
  * where the compressed-domain scan DOMINATES (the sf tables' ~5k vectors
  * are fixed-overhead-bound, so q_ann_pq ≈ q_ann_ivfpq there). Generates a
  * deterministic synthetic embedding corpus (seeded hash-noise around
  * cluster centers, same shape as the sf generator), builds both indexes
  * once, then times repeated query batches — the build-once/query-many
  * serving shape. The expected effect: the IVFADC scan touches
  * ~nProbe/nCells of the codes, so its per-batch time falls while PQ's
  * full-corpus ADC scan grows linearly with |corpus|.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_ANN_N", "200000").toInt)
    val dim = 64
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic clustered corpus: 64 centers, per-component hash noise
    val corpus = spark.range(n.toLong).toDF("vec_id")
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(xxhash64(col("vec_id")), lit(64)) === pmod(j, lit(64))).cast("int") * lit(4.0f) +
            (pmod(xxhash64(col("vec_id"), j), lit(1000)).cast("float") / 500.0f - lit(1.0f)))
          .cast("array<float>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val queries = corpus.filter(col("vec_id") < 16).localCheckpoint()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annscale] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val pq = time(s"build PQ (n=$n)")(Ann.buildPqIndex(corpus, m = 16, k = 32))
    val ivfpq = time(s"build IVFADC (n=$n, nCells=64)")(
      Ann.buildIvfPqIndex(corpus, nCells = 64, m = 16, k = 32))
    (1 to 3).foreach { i =>
      time(s"PQ query batch $i (full ADC scan)")(
        Ann.pqQuery(pq, corpus, queries, 10, refine = 8).count())
      time(s"IVFADC query batch $i (nProbe=8/64)")(
        Ann.ivfPqQuery(ivfpq, corpus, queries, 10, nProbe = 8, refine = 8).count())
    }
    // recall parity at this scale (vs brute force, 16 queries)
    val brute = Ann.bruteForceTopK(corpus, queries, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (s intersect brute).size.toDouble / brute.size
    }
    println(f"[annscale] recall@10 pq=${recall(Ann.pqQuery(pq, corpus, queries, 10, refine = 8))}%.3f " +
      f"ivfpq=${recall(Ann.ivfPqQuery(ivfpq, corpus, queries, 10, nProbe = 8, refine = 8))}%.3f")

    // Loaded-from-disk serving shape: save the IVFADC index (cell-partitioned
    // parquet), load it UNCACHED so the probed-cell predicate is genuine
    // partition pruning, and time query batches against the on-disk inverted
    // list. This is the 100 TB path — codes never resident, nProbe/nCells of
    // the files opened per batch (PlanSpec pins the numFiles metric; this
    // reports the resulting latency at a scan-dominant corpus size).
    val idxDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "annscale-ivfpq").toString
    try {
      time(s"save IVFADC index (cell-partitioned)")(Ann.saveIvfPqIndex(ivfpq, idxDir))
      pq.release(); ivfpq.release()
      val loaded = Ann.loadIvfPqIndex(spark, idxDir) // cache = false
      (1 to 3).foreach { i =>
        time(s"LOADED IVFADC query batch $i (pruned)")(
          Ann.ivfPqQuery(loaded, corpus, queries, 10, nProbe = 8, refine = 8).count())
      }
      println(f"[annscale] recall@10 loaded=${
        recall(Ann.ivfPqQuery(loaded, corpus, queries, 10, nProbe = 8, refine = 8))}%.3f")
      loaded.release()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxDir)); ()
    }
    spark.stop()
  }
}
