package graft

import graft.link.EntityLinker
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew contract of the entity-link join: heavy-hitter detection, the three
  * salting regimes' value parity, and the build-side amplification bounds
  * that make targeted salting the 100 TB shape (|hot| x S staged rows, not
  * |canonical| x S).
  */
class LinkerSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // 60% of probe rows on one norm, the rest spread over 40 cold norms; one
  // norm ("missing") absent from the canonical side to pin left-join nulls.
  private def skewedProbe(): DataFrame =
    (0 until 1000).map { i =>
      val norm =
        if (i % 5 < 3) "acme corp"
        else if (i % 97 == 0) "missing"
        else s"ent-${i % 40}"
      (s"m$i", norm)
    }.toDF("mention_id", "norm")

  private def canonical(): DataFrame =
    (("acme corp" +: (0 until 40).map(i => s"ent-$i")))
      .map(n => (n, n, n.toUpperCase, "Entity"))
      .toDF("norm", "canon_norm", "canon_name", "label")

  private def resultSet(df: DataFrame): Set[(String, String, String)] =
    df.select(col("mention_id"), col("norm"),
        coalesce(col("canon_name"), lit("<null>")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("heavyHitters finds the straggler key and only it") {
    val hot = EntityLinker.heavyHitters(skewedProbe(), "norm", parallelism = 8)
    assert(hot == Seq("acme corp"))
  }

  test("heavyHitters is empty on a flat distribution and ignores nulls") {
    val flat = (0 until 400).map(i => (s"m$i", s"ent-${i % 40}"))
      .toDF("mention_id", "norm")
      .union(Seq(("mx", null: String)).toDF("mention_id", "norm"))
    assert(EntityLinker.heavyHitters(flat, "norm", parallelism = 8).isEmpty)
  }

  test("broadcast, full-salt, targeted-salt, and flat regimes agree row-for-row") {
    val probe = skewedProbe()
    val canon = canonical()
    val broadcastR = resultSet(EntityLinker.link(
      probe, "norm", "mention_id", canon, 4, broadcastBuild = true))
    val fullSalt = resultSet(EntityLinker.link(
      probe, "norm", "mention_id", canon, 4, broadcastBuild = false))
    val targeted = resultSet(EntityLinker.link(
      probe, "norm", "mention_id", canon, 4, broadcastBuild = false,
      hotKeys = Some(Seq("acme corp"))))
    val flat = resultSet(EntityLinker.link(
      probe, "norm", "mention_id", canon, 4, broadcastBuild = false,
      hotKeys = Some(Nil)))
    assert(broadcastR.size == 1000)
    assert(fullSalt == broadcastR)
    assert(targeted == broadcastR)
    assert(flat == broadcastR)
    // the missing norm rode through as an unlinked left-join row
    assert(broadcastR.exists { case (_, n, c) => n == "missing" && c == "<null>" })
  }

  test("build-side amplification: |canonical| x S full, |canonical| + |hot| x (S-1) targeted, |canonical| flat") {
    val canon = canonical() // 41 rows
    assert(EntityLinker.preparedBuild(canon, 4, None).count() == 41L * 4)
    assert(EntityLinker.preparedBuild(canon, 4, Some(Seq("acme corp"))).count() == 41L + 3)
    assert(EntityLinker.preparedBuild(canon, 4, Some(Nil)).count() == 41L)
  }

  test("broadcast-regime plan is salt-free: no explode, no shuffle of the probe") {
    val linked = EntityLinker.link(
      skewedProbe(), "norm", "mention_id", canonical(), 4, broadcastBuild = true)
    val p = linked.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Generate"), s"broadcast path must not explode a salt range:\n$p")
    assert(!p.contains("__salt"), s"broadcast path must not salt:\n$p")
  }
}
