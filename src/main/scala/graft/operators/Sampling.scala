package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: every row is
  * assigned to a named split (train/val/test/...) by hashing its ID — stable
  * under reruns, partition layout, input ordering, and cluster size. This is
  * what a 100 TB corpus needs instead of `randomSplit`, whose assignment
  * depends on the seed AND the partition iteration order, so the "same"
  * split silently changes whenever file layout or parallelism does.
  *
  * Two variants (same pattern as SimHash/fingerprint):
  *  - [[withSplit]]: xxhash64 scale path — codegen'd, no string churn;
  *  - [[withSplitMd5]]: first 8 hex chars of md5(id) parsed as a 32-bit
  *    integer — bit-identical cross-engine (DuckDB md5), used by the
  *    value-exact `q_train_split` oracle.
  */
object Sampling {

  private def assignment(u: Column, span: Double, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    // integer thresholds on the hash domain: no float per-row math, and the
    // split boundary is exactly reproducible in SQL
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val thresholds = cums.map(c => math.round(c * span))
    fractions.zip(thresholds).dropRight(1)
      .foldRight(lit(fractions.last._1)) { case (((name, _), t), acc) =>
        when(u < lit(t), name).otherwise(acc)
      }
  }

  /** Scale path: the signed xxhash64(id, seed) value is uniform over the
    * full long range, so split thresholds are laid out directly on
    * [Long.Min, Long.Max] (BigDecimal keeps the 2^64 span exact) and the
    * per-row work is one codegen'd hash + integer compares.
    */
  def withSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed: Int = 42): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val h = xxhash64(col(idCol), lit(seed))
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val span = BigDecimal(2).pow(64)
    val thresholds = cums.map(c =>
      (BigDecimal(Long.MinValue) + span * BigDecimal(c))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .min(BigDecimal(Long.MaxValue)).toLong)
    val expr = fractions.zip(thresholds).dropRight(1)
      .foldRight(lit(fractions.last._1)) { case (((name, _), t), acc) =>
        when(h < lit(t), name).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Token-budget batch packing for training-data assembly: assign each
    * document to a (shard, batch_in_shard) bucket such that a new batch
    * starts once the preceding documents of the shard (in deterministic id
    * order) have already filled `budget` tokens. Documents are never split,
    * so a batch overfills by at most one document — the price of keeping
    * the assignment a pure window cumsum instead of a sequential greedy
    * loop, which is what makes it deterministic AND parallel.
    *
    * Scale shape: the window partitions by shard = pmod(id, numShards), so
    * there is no single-partition exchange; numShards tunes parallelism
    * independently of batch size (shards are packed independently).
    */
  /** Ids must be UNIQUE and NUMERIC: the cumsum orders by id, so a duplicate
    * id would make "the preceding documents" ambiguous (a ROWS frame just
    * breaks ties nondeterministically), and a non-numeric id has no shard.
    * Both fail loudly at runtime (raise_error) instead of silently diverging
    * from the sequential contract: duplicates are ADJACENT in the window's
    * own (shard, id) order, so the uniqueness check is one lag() over the
    * already-required sort — no extra exchange.
    */
  def packBatches(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numShards: Int): DataFrame = {
    require(budget > 0 && numShards > 0)
    // ROWS frame, not the default RANGE frame: RANGE groups ORDER-BY ties
    // (duplicate ids) into one cumsum value, silently breaking one-row-at-a-
    // time packing; ROWS matches the DuckDB oracle's explicit ROWS frame.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wRow = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
    val idLong = col(idCol).cast("long")
    df.withColumn("shard",
        when(col(idCol).isNotNull && idLong.isNull,
          raise_error(concat(lit(s"packBatches: non-numeric id in '$idCol': "),
            col(idCol).cast("string"))).cast("long"))
          .otherwise(pmod(idLong, lit(numShards.toLong))))
      .withColumn("__cum_before",
        coalesce(sum(col(tokenCol)).over(w) - col(tokenCol), lit(0L)))
      .withColumn("__prev_id", lag(col(idCol), 1).over(wRow))
      // the guard lives INSIDE the consumed batch column (a standalone
      // guard column would be pruned before it could raise)
      .withColumn("batch_in_shard",
        when(col("__prev_id").isNotNull && col("__prev_id") === col(idCol),
          raise_error(concat(lit(s"packBatches: duplicate id in '$idCol': "),
            col(idCol).cast("string"))).cast("long"))
          .otherwise(floor(col("__cum_before") / budget).cast("long")))
      .drop("__cum_before", "__prev_id")
  }

  /** Oracle variant: u = first 8 hex chars of md5(CAST(id AS STRING)) as a
    * 32-bit integer — DuckDB computes the identical value, so per-row
    * assignments are value-exact cross-engine.
    */
  def withSplitMd5(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    df.withColumn("split", assignment(u, math.pow(2, 32), fractions))
  }
}
