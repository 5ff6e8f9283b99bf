package graft

import graft.app.KgBuild
import graft.model.{RunConfig, Triple}
import graft.qa.QaEvaluator
import graft.source.TranscriptGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden tests over the seeded synthetic transcript table
  * (FIXTURES.md §1/§3): triple P/R >= 0.95 vs the golden set known by
  * construction, the per-turn text-equality invariant, and QA invariants.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  val NumConvs = 40L
  lazy val turns = TranscriptGen.table(spark, NumConvs).toDF().cache()
  lazy val cfg = RunConfig(runKey = "kg-build:test-small", numPartitions = 8)
  lazy val g = KgBuild.buildGraph(turns, cfg)

  test("golden triple set matches the checked-in fixture (generator drift guard)") {
    val expected = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_triples_40.tsv")).getLines()
      .filter(_.nonEmpty)
      .map { l => val Array(s, p, o) = l.split("\t"); Triple(s, p, o) }
      .toSet
    assert(TranscriptGen.goldenTriples(NumConvs) == expected)
  }

  test("generator is deterministic") {
    val a = TranscriptGen.conversation(3L)
    val b = TranscriptGen.conversation(3L)
    assert(a == b)
    assert(TranscriptGen.conversation(0L).size > 5 * TranscriptGen.conversation(1L).size,
      "conversation 0 must be the hot/long one")
  }

  test("triple P/R >= 0.95 vs golden set (target: exact match)") {
    val golden = TranscriptGen.goldenTriples(NumConvs)
    val emitted = g.triples.collect()
      .map(r => Triple(r.getString(0), r.getString(1), r.getString(2))).toSet
    val tp = (emitted intersect golden).size.toDouble
    val precision = if (emitted.isEmpty) 0.0 else tp / emitted.size
    val recall = if (golden.isEmpty) 0.0 else tp / golden.size
    withClue(s"precision=$precision recall=$recall emitted=${emitted.size} golden=${golden.size} " +
      s"fp=${(emitted -- golden).take(5)} fn=${(golden -- emitted).take(5)}") {
      assert(precision >= 0.95 && recall >= 0.95)
    }
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering") {
    val mism = QaEvaluator.checksumMismatches(turns, g.turnChecksums).count()
    assert(mism == 0)
  }

  test("each operator (tool) turn yields exactly one INGESTED_BY edge") {
    val expected = TranscriptGen.operatorTurnCount(NumConvs)
    val got = g.edges.filter(col("rel_type") === "INGESTED_BY").count()
    assert(got == expected, s"expected $expected INGESTED_BY edges, got $got")
  }

  test("every chunk has a HAS_CHUNK edge (no orphans) and an embedding") {
    assert(QaEvaluator.orphanChunks(g.chunks, g.edges).count() == 0)
    assert(g.chunks.filter(col("embedding").isNull || size(col("embedding")) === 0).count() == 0)
    assert(g.chunks.filter(size(col("embedding")) =!= KgBuild.EmbeddingDim).count() == 0)
  }

  test("closed-world schema: every semantic edge matches an allowed pattern") {
    val patterns = graft.model.GraphSchema.default.patterns.map(p => s"${p._2}").toSet
    val preds = g.edges.select("rel_type").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(patterns + "HAS_CHUNK"))
    // subj/obj labels of semantic relations respect the pattern table
    val bad = g.relations.filter(
      !(col("pred") === "FOUNDED" && col("subj_label") === "Person" && col("obj_label") === "Company") &&
        !(col("pred") === "JOINED" && col("subj_label") === "Person" && col("obj_label") === "Company") &&
        !(col("pred") === "LAUNCHED" && col("subj_label") === "Company" && col("obj_label") === "Product"))
    assert(bad.count() == 0)
  }

  test("QA evaluation passes on a clean build") {
    val qa = QaEvaluator.evaluate(turns, g.turnChecksums, g.chunks, g.nodes, g.edges)
    withClue(qa.anomalies.toString) { assert(qa.status == "pass") }
    assert(qa.counts("label:Document") == NumConvs)
    assert(qa.counts("label:Chunk") == g.chunks.count())
    assert(qa.counts("rel:HAS_CHUNK") == g.chunks.count())
    assert(qa.tokenHistogram.map(_._2).sum == g.chunks.count())
  }

  test("QA fails on a corrupted checksum (gating fixture, FIXTURES.md §6)") {
    val corrupted = g.turnChecksums.withColumn("checksum",
      when(col("conv_id") === "conv-000001" && col("turn_idx") === 1, lit("deadbeef"))
        .otherwise(col("checksum")))
    val qa = QaEvaluator.evaluate(turns, corrupted, g.chunks, g.nodes, g.edges)
    assert(qa.status == "fail")
    assert(qa.anomalies("checksum_mismatches") == 1)
  }

  test("data-derived entities: a recurring out-of-dictionary surface becomes an __Entity__ node") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    val t = Seq(
      ("conv-x", 0, "user", "We met the team from Quantum Dynamics yesterday.", Option.empty[String], ts),
      ("conv-x", 1, "assistant", "Quantum Dynamics builds lab robots.", Option.empty[String], ts),
      ("conv-y", 0, "user", "A single mention of Hyperion Labs only.", Option.empty[String], ts)
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val g2 = KgBuild.buildGraph(t, RunConfig(runKey = "kg:ood", numPartitions = 2))
    val ents = g2.nodes.filter(array_contains(col("labels"), "__Entity__"))
      .select("name").collect().map(_.getString(0)).toSet
    assert(ents.contains("Quantum Dynamics"), s"got $ents")
    assert(!ents.contains("Hyperion Labs"), "below-support candidate must not become an entity")
    val qd = g2.nodes.filter(col("name") === "Quantum Dynamics").collect().head
    assert(qd.getAs[Map[String, String]]("props").contains("chunk_uids"))
    spark.catalog.clearCache()
  }

  test("chunk_uids provenance is capped deterministically (hot-entity row-size bound)") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    // one entity mentioned across 4 conversations => 4 distinct chunks; a
    // cap of 2 must keep exactly the FIRST 2 of the sorted uid set, so the
    // capped row is a prefix of the uncapped one (deterministic under
    // resume/MERGE).
    val t = (0 until 4).map(i =>
      (s"conv-$i", 0, "user", "Acme Corp shipped something.", Option.empty[String], ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    def uidsOf(cap: Int): Seq[String] = {
      val g = KgBuild.buildGraph(t,
        RunConfig(runKey = s"kg:cap$cap", numPartitions = 2,
          maxProvenanceChunkUids = cap))
      val row = g.nodes.filter(col("name") === "Acme Corp").collect().head
      val uids = ujsonArray(row.getAs[Map[String, String]]("props")("chunk_uids"))
      g.release(); spark.catalog.clearCache()
      uids
    }
    val full = uidsOf(10000)
    val capped = uidsOf(2)
    assert(full.size == 4, s"expected 4 provenance chunks, got $full")
    assert(capped == full.take(2), s"cap must keep the sorted prefix: $capped vs $full")
  }

  test("cappedProvenanceAgg: salted two-phase form is byte-identical to single-phase") {
    import spark.implicits._
    // skewed: key "hot" holds 500 distinct uids (each duplicated, so the
    // bucket-local collect_set dedup is exercised) and the cap of 16 must
    // keep exactly the sorted prefix; cold keys ride salt bucket 0.
    val hotUids = (0 until 500).map(i => ("hot", f"u$i%04d"))
    val rows = (hotUids ++ hotUids ++
      (0 until 10).map(i => ("cold", f"c$i%02d")) ++ Seq(("one", "z")))
      .toDF("k", "chunk_uid")
      .withColumn("conv_id", concat(lit("cv-"), col("chunk_uid")))
    def run(hot: Option[org.apache.spark.sql.Column]) =
      KgBuild.cappedProvenanceAgg(rows, Seq(col("k") -> "k"), "chunk_uid",
        Seq("conv_id"), 16, hot, 8).orderBy("k").collect().toSeq
    val single = run(None)
    val salted = run(Some(col("k") === "hot"))
    assert(single == salted, s"two-phase output diverged:\n$salted\nvs\n$single")
    val hotRow = salted.find(_.getString(0) == "hot").get
    assert(hotRow.getSeq[String](1) == (0 until 16).map(i => f"u$i%04d"),
      "cap must keep the globally smallest uids across salt buckets")
  }

  test("saltProvenance=false builds an identical graph (provenance-skew parity)") {
    // The salted two-phase provenance aggregation is a physical-plan
    // decision only: switching it off may not change a single node/edge row.
    // Both builds run under raised shuffle parallelism: the hot threshold is
    // total/parallelism, and at the suite's parallelism of 4 the 40-conv
    // corpus measures flat (hot set empty -> both sides would take the
    // identical single-phase plan and the parity would hold VACUOUSLY — the
    // round-5 advice finding). At 64 the hot entity provably crosses, and
    // the precondition assert below keeps the test honest if the corpus or
    // the measurement ever drifts flat again.
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "64")
    try {
      // floor 0: the absolute reducer-state floor (saltProvenanceFloor)
      // deliberately keeps toy-scale groups single-phase in production
      // config; the parity test wants the two-phase plan exercised
      val gSalted = KgBuild.buildGraph(turns, cfg.copy(saltProvenanceFloor = 0L))
      assert(gSalted.hotProvNorms.nonEmpty,
        "test corpus produced no hot canon norms — the two-phase path is not exercised")
      val g2 = KgBuild.buildGraph(turns, cfg.copy(saltProvenance = false))
      def cmp(df: org.apache.spark.sql.DataFrame) = df.columns.foldLeft(df) {
        case (d, c) if d.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
          d.withColumn(c, array_sort(map_entries(col(c))))
        case (d, _) => d
      }
      try {
        val (n1, n2) = (cmp(gSalted.nodes), cmp(g2.nodes))
        val (e1, e2) = (cmp(gSalted.edges), cmp(g2.edges))
        assert(n2.exceptAll(n1).isEmpty && n1.exceptAll(n2).isEmpty,
          "node sets diverge between salted and single-phase provenance aggregation")
        assert(e2.exceptAll(e1).isEmpty && e1.exceptAll(e2).isEmpty,
          "edge sets diverge between salted and single-phase provenance aggregation")
      } finally { gSalted.release(); g2.release() }
    } finally spark.conf.set(key, prev)
  }

  /** Minimal JSON string-array parse for the provenance prop (avoids a json lib). */
  private def ujsonArray(s: String): Seq[String] =
    s.stripPrefix("[").stripSuffix("]").split(",").toSeq
      .filter(_.nonEmpty).map(_.trim.stripPrefix("\"").stripSuffix("\""))

  test("case-variant of a dictionary entity folds into the gazetteer row (no duplicate canon)") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    // "GLOBEX INC" escapes the case-sensitive gazetteer scanner but
    // normalizes to the dictionary norm "globex inc"; recurring, it would
    // become a data-derived candidate whose norm COLLIDES with the gazetteer
    // canonical — without the anti-join the link fans out into two entity
    // nodes for one norm.
    val t = Seq(
      ("conv-cv", 0, "user", "We signed the deal with GLOBEX INC today.", Option.empty[String], ts),
      ("conv-cv", 1, "assistant", "GLOBEX INC confirmed the order.", Option.empty[String], ts)
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val g2 = KgBuild.buildGraph(t, RunConfig(runKey = "kg:casevar", numPartitions = 2))
    val globexNodes = g2.nodes
      .filter(array_contains(col("labels"), "__Entity__") && lower(col("name")).contains("globex"))
      .collect()
    assert(globexNodes.length == 1, s"expected one Globex node, got ${globexNodes.toSeq}")
    assert(globexNodes.head.getAs[String]("name") == "Globex",
      "colliding candidate must resolve to the gazetteer canonical name")
    g2.release()
  }

  test("GraphTables.release drops all cached intermediates") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(1700000000000L)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val t = Seq(("conv-r", 0, "user", "Alice founded Acme Corp in 2001.", Option.empty[String], ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val g2 = KgBuild.buildGraph(t, RunConfig(runKey = "kg:rel", numPartitions = 2))
    g2.edges.count()
    g2.release()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"release() leaked persistent RDDs: $leaked")
  }

  test("shuffled-link fallback (broadcastCanonicalLimit=0) builds an identical graph") {
    // The broadcast gate must be a pure physical-plan decision: tripping it
    // (limit 0 forces the shuffled-salted regime for every link join) may not
    // change a single output row vs the broadcast build above.
    val g2 = KgBuild.buildGraph(turns,
      cfg.copy(runKey = cfg.runKey, broadcastCanonicalLimit = 0L))
    // map<..> columns can't ride set ops; canonicalize to sorted entry arrays
    def cmp(df: org.apache.spark.sql.DataFrame) = df.columns.foldLeft(df) {
      case (d, c) if d.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.MapType] =>
        d.withColumn(c, array_sort(map_entries(col(c))))
      case (d, _) => d
    }
    try {
      val (n1, n2) = (cmp(g.nodes), cmp(g2.nodes))
      val (e1, e2) = (cmp(g.edges), cmp(g2.edges))
      assert(n2.exceptAll(n1).isEmpty && n1.exceptAll(n2).isEmpty,
        "node sets diverge between broadcast and shuffled link regimes")
      assert(e2.exceptAll(e1).isEmpty && e1.exceptAll(e2).isEmpty,
        "edge sets diverge between broadcast and shuffled link regimes")
    } finally g2.release()
  }

  test("degenerate inputs: empty corpus and null/blank texts build without error") {
    import spark.implicits._
    val ts0 = new java.sql.Timestamp(1700000000000L)
    // empty input with the right schema -> empty graph, no crash
    val empty = spark.emptyDataset[graft.model.Turn].toDF()
    val ge = KgBuild.buildGraph(empty, RunConfig(runKey = "kg:empty", numPartitions = 2))
    try {
      assert(ge.nodes.count() == 0 && ge.edges.count() == 0 && ge.triples.count() == 0)
    } finally ge.release()
    // null and blank texts flow through chunking/extraction as no-ops
    val degen = Seq(
      ("conv-d", 0, "user", null.asInstanceOf[String], Option.empty[String], ts0),
      ("conv-d", 1, "assistant", "   ", Option.empty[String], ts0),
      ("conv-d", 2, "user", "Ada Lovelace founded Globex in 2001.", Option.empty[String], ts0))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val gd = KgBuild.buildGraph(degen, RunConfig(runKey = "kg:degen", numPartitions = 2))
    try {
      val triples = gd.triples.collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(triples == Set(("Ada Lovelace", "FOUNDED", "Globex")), triples.toString)
    } finally gd.release()
  }

  test("semantic edges carry chunk_uids + document_checksum, merged on (src,dst,rel_type)") {
    val sem = g.edges.filter(col("props").getItem("document_checksum").isNotNull)
    assert(sem.count() > 0)
    // MERGE key uniqueness for semantic relations
    val dups = sem.groupBy("src", "dst", "rel_type").count().filter(col("count") > 1)
    assert(dups.count() == 0)
    val props = sem.limit(1).collect().head.getAs[Map[String, String]]("props")
    val uids = props("chunk_uids")
    assert(uids.startsWith("[") && uids.contains("\""), s"chunk_uids not a JSON array: $uids")
    assert(props("document_checksum").length == 64)
  }

  test("canonicalization collapses aliases: no two entity nodes share a canon name+label") {
    val dupes = g.nodes
      .filter(array_contains(col("labels"), "__Entity__"))
      .groupBy(col("name"), col("labels")).count()
      .filter(col("count") > 1)
    assert(dupes.count() == 0)
  }
}
