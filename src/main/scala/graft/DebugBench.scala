package graft

import scala.jdk.CollectionConverters._

/** Scratch diagnostics for run-to-run degradation (not part of the driver
  * contract): prints per-build wall seconds, GC time delta, persisted RDD
  * count, and block-manager memory use.
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val numConvs = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "20000").toLong
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def codeCacheMb: Long = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.contains("CodeHeap")).map(_.getUsage.getUsed).sum / (1024 * 1024)
    (1 to 5).foreach { i =>
      val g0 = gcMs
      val (_, _, dt) = Bench.kgBuildOnce(spark, numConvs)
      val g1 = gcMs
      val rdds = spark.sparkContext.getPersistentRDDs.size
      val mem = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum / (1024 * 1024)
      println(f"[debug] build $i: ${dt}%.1f s, gc delta ${(g1 - g0) / 1000.0}%.1f s, jitTotal ${jitMs / 1000.0}%.1f s, codeCache ${codeCacheMb}MB, persistedRDDs=$rdds, blockMemUsedMB=$mem")
    }
    spark.stop()
  }
}
