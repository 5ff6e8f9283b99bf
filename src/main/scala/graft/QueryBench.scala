package graft

/** Scratch diagnostics (not part of the driver contract): time a named subset
  * of SparkEntry queries at a given sf dir. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 runMain graft.QueryBench q_ann_lsh q_dedup_ngram
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[qbench] $name FAILED: ${e.getMessage.take(200)}"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[qbench] $name%-28s ${dt}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
