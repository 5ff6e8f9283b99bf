package graft

import graft.link.EntityLinker
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the shuffled-regime entity-link join under hot-key skew — the
  * north_rule's "hot entities straggle a shuffled join" scenario, at a scale
  * where the canonical side genuinely cannot broadcast.
  *
  * Corpus (deterministic, generated distributed): PROBE mentions where
  * `hotPct`% of rows carry one norm and the rest spread uniformly over the
  * full canonical vocabulary; CANONICAL entities sized so the build side is
  * far past any broadcast threshold. Auto-broadcast is disabled outright so
  * the planner cannot quietly rescue the fixture the way it never could a
  * 10^8-entity table.
  *
  * Three strategies, each run twice in-JVM (trail emitted), with the max
  * single-task duration of each run captured by a listener — the straggler
  * is a TASK-level phenomenon, so wall-clock alone under-reports it at low
  * parallelism:
  *   - unsalted:  hotKeys = Some(Nil) — every probe row of the hot norm
  *                hashes to one reducer;
  *   - full-salt: hotKeys = None, salt = 8 (RunConfig default) — the
  *                historical regime: hot key split 8 ways, but the build
  *                side stages |canonical| x 8 rows;
  *   - targeted:  hotKeys = measured via [[EntityLinker.heavyHitters]],
  *                salt = 32 — hot key split across every core, build side
  *                stages |canonical| + |hot| x 31 rows.
  * A uniform corpus (hotPct = 0) is measured as the control: it prices the
  * pure overhead each salting scheme adds when there is no skew to fix.
  */
object SkewProbe {

  private final class MaxTaskListener extends SparkListener {
    @volatile var maxMs: Long = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
      if (d > maxMs) maxMs = d
    }
    def reset(): Unit = maxMs = 0L
  }

  private def probeTable(spark: SparkSession, rows: Long, vocab: Long, hotPct: Int): DataFrame =
    spark.range(rows).select(
      concat(lit("m"), col("id")).as("mention_id"),
      when(pmod(hash(col("id"), lit(7)), lit(100)) < hotPct, lit("ent-0"))
        .otherwise(concat(lit("ent-"), pmod(hash(col("id"), lit(13)), lit(vocab))))
        .as("norm"))

  private def canonicalTable(spark: SparkSession, vocab: Long): DataFrame =
    spark.range(vocab).select(
      concat(lit("ent-"), col("id")).as("norm"),
      concat(lit("ent-"), col("id")).as("canon_norm"),
      concat(lit("ENT-"), col("id")).as("canon_name"),
      lit("Entity").as("label"))

  def main(args: Array[String]): Unit = {
    val rows = sys.env.get("SPARK_GRAFT_SKEW_ROWS").map(_.toLong).getOrElse(20000000L)
    val vocab = sys.env.get("SPARK_GRAFT_SKEW_VOCAB").map(_.toLong).getOrElse(2000000L)
    val hotPct = sys.env.get("SPARK_GRAFT_SKEW_HOTPCT").map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val listener = new MaxTaskListener
    spark.sparkContext.addSparkListener(listener)

    val parallelism = spark.sessionState.conf.numShufflePartitions

    def measure(name: String, probe: DataFrame, canon: DataFrame,
        salt: Int, hotKeys: Option[Seq[String]]): String = {
      val trail = (1 to 2).map { _ =>
        listener.reset()
        val t0 = System.nanoTime()
        val n = EntityLinker.link(probe, "norm", "mention_id", canon, salt,
          broadcastBuild = false, hotKeys = hotKeys)
          .filter(col("canon_norm").isNotNull).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, listener.maxMs / 1e3, n)
      }
      val rowsLinked = trail.head._3
      println(f"[skew] $name%-28s ${trail.map(_._1).min}%8.2f s warm  " +
        f"maxTask ${trail.map(_._2).min}%7.2f s  linked=$rowsLinked")
      s""""$name":{"warm_sec":${trail.map(_._1).min},"trail_sec":[${trail.map(_._1).mkString(",")}],""" +
        s""""max_task_sec":[${trail.map(_._2).mkString(",")}],"linked":$rowsLinked}"""
    }

    val canon = canonicalTable(spark, vocab)
    val results = Seq("hot" -> hotPct, "uniform" -> 0).flatMap { case (tag, pct) =>
      val probe = probeTable(spark, rows, vocab, pct)
      val t0 = System.nanoTime()
      val hot = EntityLinker.heavyHitters(probe, "norm", parallelism)
      val detectSec = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $tag%-8s heavyHitters -> ${hot.size} keys in $detectSec%.2f s")
      Seq(
        s""""${tag}_detect":{"warm_sec":$detectSec,"keys":${hot.size}}""",
        measure(s"${tag}_unsalted", probe, canon, 1, Some(Nil)),
        measure(s"${tag}_fullsalt8", probe, canon, 8, None),
        measure(s"${tag}_targeted32", probe, canon, 32, Some(hot)))
    }
    println(s"""{"metric":"entity-link skew strategies","rows":$rows,"vocab":$vocab,""" +
      s""""hot_pct":$hotPct,"cpus":$cpus,${results.mkString(",")}}""")
    spark.stop()
  }
}
