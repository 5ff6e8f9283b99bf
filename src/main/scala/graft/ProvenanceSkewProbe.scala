package graft

import graft.app.KgBuild
import graft.link.EntityLinker
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the provenance chunk_uids aggregation under hot-entity skew —
  * the reducer-state scenario KgBuild.cappedProvenanceAgg exists for: a stop
  * entity's (canon, chunk_uid) pairs all hash to one reducer, and
  * collect_set's partial state is the set itself, so map-side combine cannot
  * bound what that reducer holds before the row cap applies.
  *
  * Corpus (deterministic, generated distributed): `hotPct`% of rows carry
  * one canon norm, the rest spread uniformly over `vocab` norms; every row
  * has a DISTINCT chunk_uid, so the hot group's uncapped set is hotPct% of
  * the whole corpus. Two strategies, each run twice in-JVM (trail emitted),
  * max single-task duration captured by a listener (the straggler is a
  * TASK-level phenomenon), plus a full-output checksum so the byte-parity
  * the PipelineSpec unit test pins at toy size is re-asserted at probe size:
  *   - single:   hot = None — the pre-round-5 plan, one hash aggregation;
  *   - targeted: hot keys measured via [[EntityLinker.heavyHitters]], their
  *               rows pre-aggregated per pmod(xxhash64(chunk_uid), S) bucket.
  * The uniform corpus (hotPct = 0) is the control: heavyHitters measures
  * flat, the targeted path collapses to the single-phase plan, and the two
  * entries price the detection pass itself.
  */
object ProvenanceSkewProbe {

  private final class MaxTaskListener extends SparkListener {
    @volatile var maxMs: Long = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
      if (d > maxMs) maxMs = d
    }
    def reset(): Unit = maxMs = 0L
  }

  /** SparkListener events are delivered asynchronously on the listener bus:
    * reading maxMs right after the action can miss late TaskEnd events, and
    * a late event from run N can land after reset() and contaminate run
    * N+1's measurement (round-5 advice). listenerBus/waitUntilEmpty are
    * private[spark] in Scala but public in bytecode, so a reflective drain
    * flushes the bus; the fallback is a bounded sleep.
    */
  private def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .fold(Thread.sleep(1000))(m => { m.invoke(bus); () })
    } catch { case _: Throwable => Thread.sleep(1000) }

  private def mentionTable(spark: SparkSession, rows: Long, vocab: Long, hotPct: Int): DataFrame =
    spark.range(rows).select(
      when(pmod(hash(col("id"), lit(7)), lit(100)) < hotPct, lit("ent-0"))
        .otherwise(concat(lit("ent-"), pmod(hash(col("id"), lit(13)), lit(vocab))))
        .as("canon_norm"),
      concat(lit("c"), col("id")).as("chunk_uid"),
      concat(lit("v"), pmod(col("id"), lit(100000L))).as("conv_id"))

  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_SKEW_ROWS").map(_.toLong).getOrElse(20000000L)
    val vocab = sys.env.get("SPARK_GRAFT_SKEW_VOCAB").map(_.toLong).getOrElse(1000000L)
    val hotPct = sys.env.get("SPARK_GRAFT_SKEW_HOTPCT").map(_.toInt).getOrElse(40)
    val cap = sys.env.get("SPARK_GRAFT_SKEW_CAP").map(_.toInt).getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MaxTaskListener
    spark.sparkContext.addSparkListener(listener)
    val parallelism = spark.sessionState.conf.numShufflePartitions

    def measure(name: String, df: DataFrame,
        hot: Option[org.apache.spark.sql.Column]): String = {
      val trail = (1 to 2).map { _ =>
        // drain BEFORE reset so a previous run's late TaskEnd events cannot
        // land after the reset and inflate this run's max
        drainListenerBus(spark.sparkContext)
        listener.reset()
        val t0 = System.nanoTime()
        // Force every group's capped array AND checksum it: parity between
        // strategies must hold on the bytes, not just the row count.
        val r = KgBuild.cappedProvenanceAgg(df,
            Seq(col("canon_norm") -> "canon_norm"), "chunk_uid",
            Seq("conv_id"), cap, hot, parallelism)
          .agg(count(lit(1)), sum(size(col("chunk_uids"))),
            sum(crc32(concat_ws(",", col("chunk_uids")))))
          .first()
        val dt = (System.nanoTime() - t0) / 1e9
        drainListenerBus(spark.sparkContext) // flush late TaskEnd events
        (dt, listener.maxMs / 1e3, (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      val (groups, uids, crc) = trail.head._3
      require(trail.forall(_._3 == trail.head._3), s"$name: unstable output")
      println(f"[prov] $name%-24s ${trail.map(_._1).min}%8.2f s warm  " +
        f"maxTask ${trail.map(_._2).min}%7.2f s  groups=$groups uids=$uids crc=$crc")
      s""""$name":{"warm_sec":${trail.map(_._1).min},"trail_sec":[${trail.map(_._1).mkString(",")}],""" +
        s""""max_task_sec":[${trail.map(_._2).mkString(",")}],"groups":$groups,"capped_uids":$uids,"crc_sum":$crc}"""
    }

    val results = Seq("hot" -> hotPct, "uniform" -> 0).flatMap { case (tag, pct) =>
      val df = mentionTable(spark, rows, vocab, pct)
      val t0 = System.nanoTime()
      val hotKeys = EntityLinker.heavyHitters(df, "canon_norm", parallelism)
      val detectSec = (System.nanoTime() - t0) / 1e9
      println(f"[prov] $tag%-8s heavyHitters -> ${hotKeys.size} keys in $detectSec%.2f s")
      val pred = if (hotKeys.isEmpty) None else Some(col("canon_norm").isin(hotKeys: _*))
      Seq(
        s""""${tag}_detect":{"warm_sec":$detectSec,"keys":${hotKeys.size}}""",
        measure(s"${tag}_single", df, None),
        measure(s"${tag}_targeted", df, pred))
    }
    println(s"""{"metric":"provenance-agg skew strategies","rows":$rows,"vocab":$vocab,""" +
      s""""hot_pct":$hotPct,"cap":$cap,"cpus":$cpus,${results.mkString(",")}}""")
    spark.stop()
  }
}
