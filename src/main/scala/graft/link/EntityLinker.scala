package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity linking: bind mention/relation norms to canonical entities via a
  * size-gated hash join against the canonical entity Dataset, with
  * HEAVY-HITTER-TARGETED salting in the shuffled regime
  * (BASELINE.json north_star; reference analog: extraction + resolver binding
  * at ref:pipelines/kg_ingest.yaml:69-77).
  *
  * Join strategy is SIZE-GATED by the caller, not hint-forced. The canonical
  * table is the union of the static gazetteer closure (tiny) and data-derived
  * candidate entities (unbounded — it grows with the corpus):
  *   - while the caller can bound the build side (KgBuild counts the
  *     candidate slice before linking), `broadcastBuild = true` plans a
  *     static BroadcastHashJoin — the probe side never shuffles, which is
  *     worth 2x wall-clock at high parallelism (an UNHINTED join is planned
  *     as SMJ until AQE's runtime stats arrive, and by then the probe side's
  *     shuffle map stages have already run; measured 43.9 s vs 20.9 s for
  *     the 5.5M-turn build at local[32]). A broadcast join partitions
  *     NOTHING, so hot keys cannot straggle it — the broadcast path
  *     therefore carries no salt at all (salting it would only multiply the
  *     broadcast payload and every task's hash table by S; at the 250k-row
  *     gate that is 160 MB vs 20 MB);
  *   - past the bound, `broadcastBuild = false` degrades to a shuffled join
  *     instead of a forced-broadcast OOM — which is when hot keys matter:
  *     "Acme Corp" in 10^9 mentions all hash to one reducer. Salting the
  *     probe side with pmod(hash(id), S) and exploding the build side xS
  *     bounds every physical key at |hot key| / S — but exploding the WHOLE
  *     build side multiplies the canonical shuffle by S (10^8 entities x 32
  *     = 3.2e9 staged rows at corpus scale), almost all of it for keys that
  *     were never hot. With `hotKeys` supplied (see [[heavyHitters]]), only
  *     the listed keys are salted on either side: probe rows on a cold key
  *     keep __salt = 0 and the build side stays 1 row per cold key, so the
  *     amplification is |hotKeys| x S (bounded small by construction)
  *     instead of |canonical| x S. AQE skew-join splitting stays layered on
  *     top as the runtime safety net either way.
  */
object EntityLinker {

  /** Probe-side keys hot enough to straggle a shuffled join: a reducer's
    * fair share is total/parallelism rows, so any key holding more than that
    * fills a whole reducer by itself. Returns at most `maxKeys` keys (the
    * heaviest first) — by construction at most `parallelism` keys can exceed
    * the threshold, so the driver-side collect is bounded either way.
    *
    * Cost: one partial-aggregated groupBy over the probe — the shuffle
    * carries one row per (partition, distinct key), not per probe row — plus
    * two jobs over the persisted (distinct-key-sized) count table. Callers
    * should invoke this only in the shuffled regime; under broadcast there
    * is nothing to straggle.
    */
  def heavyHitters(
      probe: DataFrame,
      key: String,
      parallelism: Int,
      maxKeys: Int = 64
  ): Seq[String] = {
    val counts = probe.filter(col(key).isNotNull).groupBy(col(key)).count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = counts.agg(sum("count")).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val threshold = math.max(total / math.max(parallelism, 1), 1L)
      counts.filter(col("count") > threshold)
        .orderBy(desc("count"), col(key)) // deterministic under count ties
        .limit(maxKeys)
        .select(col(key).cast("string"))
        .collect().map(_.getString(0)).toSeq
    } finally { counts.unpersist(); () }
  }

  /** Build side prepared for the shuffled regime. Package-visible so tests
    * can pin the amplification contract: full salting stages |canonical| x S
    * rows, targeted salting |canonical| + |hot| x (S-1).
    */
  private[graft] def preparedBuild(
      canonical: DataFrame,
      salt: Int,
      hotKeys: Option[Seq[String]]
  ): DataFrame = {
    val base = canonical.select(
      col("norm").as("__key"),
      col("canon_norm"),
      col("canon_name"),
      col("label").as("canon_label"))
    hotKeys match {
      case None =>
        base.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      case Some(hs) if hs.isEmpty =>
        base.withColumn("__salt", lit(0))
      case Some(hs) =>
        base.withColumn("__salt",
          explode(when(col("__key").isin(hs: _*), sequence(lit(0), lit(salt - 1)))
            .otherwise(sequence(lit(0), lit(0)))))
    }
  }

  /** @param probe     rows to link
    * @param probeKey  column name on probe holding the normalized surface
    * @param probeSaltSeed column whose hash spreads a hot key (e.g. mention_id)
    * @param canonical the canonical entity Dataset: (norm, canon_norm, canon_name, label)
    * @param salt      number of salt buckets (RunConfig.saltBuckets, or the
    *                  shuffle parallelism when salting is hot-key-targeted —
    *                  amplification is then bounded by |hotKeys| x salt)
    * @param broadcastBuild true ONLY when the caller has bounded the
    *                  canonical side (static dictionary, or a checked count
    *                  under RunConfig.broadcastCanonicalLimit); the broadcast
    *                  path is salt-free (nothing partitions, nothing straggles)
    * @param hotKeys   shuffled-regime skew contract: None = salt every key
    *                  (safe when the caller has not measured the probe);
    *                  Some(keys) = salt exactly these keys ([[heavyHitters]]),
    *                  Some(Nil) = measured flat, skip salting entirely
    */
  def link(
      probe: DataFrame,
      probeKey: String,
      probeSaltSeed: String,
      canonical: DataFrame,
      salt: Int,
      broadcastBuild: Boolean = true,
      hotKeys: Option[Seq[String]] = None
  ): DataFrame = {
    if (broadcastBuild) {
      val build = broadcast(canonical.select(
        col("norm").as("__key"),
        col("canon_norm"),
        col("canon_name"),
        col("label").as("canon_label")))
      probe.join(build, probe(probeKey) === build("__key"), "left").drop("__key")
    } else {
      val salted = hotKeys match {
        case None =>
          probe.withColumn("__salt", pmod(hash(col(probeSaltSeed)), lit(salt)))
        case Some(hs) if hs.isEmpty =>
          probe.withColumn("__salt", lit(0))
        case Some(hs) =>
          probe.withColumn("__salt",
            when(col(probeKey).isin(hs: _*),
              pmod(hash(col(probeSaltSeed)), lit(salt))).otherwise(lit(0)))
      }
      val build = preparedBuild(canonical, salt, hotKeys)
      salted
        .join(build,
          salted(probeKey) === build("__key") && salted("__salt") === build("__salt"),
          "left")
        .drop("__salt", "__key")
    }
  }
}
