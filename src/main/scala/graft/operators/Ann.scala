package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the correctness baseline; the
  * scale path is random-hyperplane LSH bucketing, which turns the all-pairs
  * product into a co-partitioned equi-join on bucket signature — the same
  * shape the reference delegates to its vector index
  * (ref:scripts/create_vector_index.py:66-116 cosine semantics).
  */
object Ann {

  /** Cosine similarity of two array<float|double> columns — the native
    * Catalyst expression (primitive loop, whole-stage codegen); results are
    * bit-identical to [[cosineBuiltins]] and the DuckDB oracle (same
    * left-to-right double accumulation).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /** Builtin-composition form (zip_with + aggregate + sqrt) — kept as the
    * equivalence oracle for the native expression.
    */
  def cosineBuiltins(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Brute-force exact top-k: broadcast the (small) query set against the
    * corpus, score every pair, take k per query with a window. Exact, one
    * shuffle (the window's partition by query) — the evaluation baseline.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = c.join(broadcast(q))
      .withColumn("score", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Random-hyperplane signature: bit i = sign(dot(v, h_i)) with h_i a
    * deterministic pseudo-random hyperplane derived from (i, component index).
    * Native one-pass Catalyst expression (graft.functions.HyperplaneSignature).
    */
  def hyperplaneSignature(emb: Column, nBits: Int): Column =
    graft.functions.HyperplaneSignature.signature(emb, nBits)

  /** (id, band_idx, band_key) rows — signature computed ONCE per row, then
    * exploded into bands. Only ids and band keys travel into the candidate
    * join; embeddings are re-attached per surviving candidate afterwards
    * (shipping vectors through the exploded shuffle multiplies their bytes
    * ×bands for no benefit — the join only needs the keys).
    */
  private def bandKeys(df: DataFrame, idCol: String, idAs: String,
      nBits: Int, bands: Int): DataFrame = {
    val width = nBits / bands
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("bidx"),
        shiftright(col("__sig"), bi * width).bitwiseAND(lit((1L << width) - 1)).as("bkey"))
    }
    df.select(col(idCol).as(idAs),
      hyperplaneSignature(col("embedding"), nBits).as("__sig"))
      .select(col(idAs), explode(array(bandCols: _*)).as("band"))
      .select(col(idAs),
        col("band.bidx").as("band_idx"), col("band.bkey").as("band_key"))
  }

  /** LSH-bucketed ANN: corpus and queries are hashed to nBits-bit signatures;
    * candidates share a signature band; rerank candidates exactly and take
    * top-k. Recall is tuned by bands (more bands = more candidates); the
    * candidate join is an ids-only equi-join on (band_idx, band_key) with the
    * (small) query side broadcast, so it scales.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 32, bands: Int = 4): DataFrame = {
    require(nBits % bands == 0)
    val cBands = bandKeys(corpus, "vec_id", "vec_id", nBits, bands)
    val qBands = bandKeys(queries, "vec_id", "query_id", nBits, bands)
    val cands = cBands.join(broadcast(qBands), Seq("band_idx", "band_key"))
      .select("query_id", "vec_id").distinct()
    val scored = cands
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .withColumn("score", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Deterministic k-means coarse quantizer for [[ivfTopK]]: trained
    * driver-side on a seeded, order-deterministic sample (Lloyd iterations
    * with cosine assignment, lowest-index tie-break, stride init), so the
    * cell layout is reproducible run to run. At production scale the trainer
    * would sample via a fixed-hash predicate instead of limit(); the
    * centroid table stays tiny (nCells × dim) and broadcasts.
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, iters: Int = 8,
      sampleN: Int = 2048): Array[Array[Float]] = {
    require(nCells >= 1)
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    var cents = Array.tabulate(nCells)(i =>
      sample(((i.toLong * sample.length) / nCells).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Int](nCells)
      sample.foreach { v =>
        val c = nearestCell(cents, v)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
      }
      it += 1
    }
    cents
  }

  /** Index of the centroid with max cosine similarity (lowest index wins ties). */
  def nearestCell(cents: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      val n = math.min(cent.length, v.length)
      while (j < n) {
        dot += cent(j).toDouble * v(j); na += cent(j).toDouble * cent(j); nb += v(j).toDouble * v(j)
        j += 1
      }
      val s = if (na == 0.0 || nb == 0.0) -2.0 else dot / math.sqrt(na * nb)
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  private def probeCells(cents: Array[Array[Float]], v: Array[Float], nProbe: Int): Seq[Int] = {
    val scored = cents.indices.map { c =>
      val cent = cents(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      val n = math.min(cent.length, v.length)
      while (j < n) {
        dot += cent(j).toDouble * v(j); na += cent(j).toDouble * cent(j); nb += v(j).toDouble * v(j)
        j += 1
      }
      val s = if (na == 0.0 || nb == 0.0) -2.0 else dot / math.sqrt(na * nb)
      (s, c)
    }
    scored.sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)
  }

  /** A built IVF index: the coarse-quantizer centroids (tiny, driver-held,
    * ride task closures) and the materialized (vec_id, cell) assignment
    * table. Build once, query many times — the analog of the reference's
    * provision-once vector index (ref:scripts/create_vector_index.py:334-420).
    * Call [[IvfIndex.release]] when done to free the cached cell table.
    */
  final case class IvfIndex(centroids: Array[Array[Float]], cells: DataFrame) {
    def release(): Unit = { cells.unpersist(); () }
  }

  /** Build the IVF index: train the deterministic k-means quantizer, assign
    * every corpus vector to its nearest cell in ONE narrow pass, and
    * materialize the (vec_id, cell) table so repeated query batches pay only
    * the probe join — the index is never rebuilt per call. At 100 TB the cell
    * table would be written as a parquet table instead of cached; the shape
    * (narrow assignment pass + ids-only table) is the same.
    */
  def buildIvfIndex(corpus: DataFrame, nCells: Int = 16,
      iters: Int = 8, sampleN: Int = 2048): IvfIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(corpus, nCells, iters, sampleN)
    val cells = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, nearestCell(cents, v)) })
      .toDF("vec_id", "cell")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cells.count() // materialize the assignment pass once, at build time
    IvfIndex(cents, cells)
  }

  /** Query a prebuilt IVF index: each query probes its nProbe nearest cells
    * (driver-side against the tiny centroid table), candidates come from a
    * broadcast equi-join on cell id against the materialized assignment
    * table, and are reranked exactly. Recall is tuned by nProbe.
    */
  def ivfQuery(index: IvfIndex, corpus: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Size contract for this collect: `queries` is the probe batch, bounded
    // by the caller (thousands of rows, each dim floats) — never the corpus.
    // Corpus-side data stays distributed throughout.
    val qRows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val qCells = qRows.toSeq
      .flatMap { case (qid, v) => probeCells(index.centroids, v, nProbe).map(c => (qid, c)) }
      .toDF("query_id", "cell")
    val cands = index.cells.join(broadcast(qCells), Seq("cell"))
      .select("query_id", "vec_id").distinct()
    val scored = cands
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .withColumn("score", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Persist a built IVF index as two parquet tables (centroids + cell
    * assignments) — the provision-once analog of the reference's persistent
    * vector index (ref:scripts/create_vector_index.py:334-420): later JOBS
    * load and query without retraining or rescanning the corpus.
    */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.cells.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // partitioned by cell for the same reason as saveIvfPqIndex: the query's
    // probed-cell predicate becomes parquet partition pruning on reload
    index.cells.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** `cache = false` default: see [[loadIvfPqIndex]] — a plain scan keeps the
    * probed-cell filter a partition-pruning read (the 100 TB default).
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      cache: Boolean = false): IvfIndex = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
    val raw = spark.read.parquet(s"$path/cells")
    val cells =
      if (cache) raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw
    IvfIndex(cents, cells)
  }

  /** Persist / load a PQ index: codebooks (subspace, code, centroid) +
    * the (vec_id, code) table. Same provision-once contract as the IVF pair.
    */
  def savePqIndex(index: PqIndex, path: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    (for {
      (book, s) <- index.codebooks.zipWithIndex
      (cw, c) <- book.zipWithIndex
    } yield (s, c, cw)).toSeq
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    index.codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** PQ's ADC is a full scan either way (no cell structure), so `cache` is
    * purely the fits-in-memory/query-many trade — default off at scale.
    */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      cache: Boolean = false): PqIndex = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .as[(Int, Int, Array[Float])].collect()
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cws) => cws.sortBy(_._2).map(_._3) }.toArray
    val raw = spark.read.parquet(s"$path/codes")
    val codes =
      if (cache) raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw
    PqIndex(books, codes)
  }

  /** One-shot IVF ANN convenience: build the index, query it, release it.
    * For repeated query batches hold the [[IvfIndex]] and call [[ivfQuery]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val index = buildIvfIndex(corpus, nCells)
    // eager materialize (k rows per query) so the index can be released here
    val out = ivfQuery(index, corpus, queries, k, nProbe).localCheckpoint()
    index.release()
    out
  }

  // ---------------- Product quantization (PQ) ----------------

  /** A trained product quantizer: per-subspace codebooks (m × k × dim/m —
    * tiny, driver-held, ride task closures) and the materialized
    * (vec_id, code) table with code = m small ints. Build once, query many
    * times. This is the memory-scale path for ANN at 100 TB: the resident
    * working set is m log2(k)-bit codes per vector (64-dim float vectors:
    * 256 B → 4 B at m=8, k=16) scanned in the compressed domain; raw
    * embeddings are touched only to exact-rerank the tiny refined candidate
    * set. Call [[PqIndex.release]] when done to free the cached codes table.
    */
  final case class PqIndex(codebooks: Array[Array[Array[Float]]], codes: DataFrame) {
    def release(): Unit = { codes.unpersist(); () }
  }

  /** Deterministic per-subspace k-means (Lloyd, L2 on subvectors, stride
    * init over the vec_id-ordered sample, lowest-index tie-break) — same
    * bounded-sample training contract as [[kmeansCentroids]]: the sample is
    * a driver-side collect bounded by sampleN, never the corpus.
    */
  def trainPqCodebooks(corpus: DataFrame, m: Int, k: Int,
      iters: Int = 8, sampleN: Int = 2048): Array[Array[Array[Float]]] = {
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "empty corpus")
    trainPqOnVectors(sample, m, k, iters)
  }

  /** Index of the L2-nearest codeword (lowest index wins ties). */
  private def nearestCodeword(cents: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cw = cents(c)
      var d = 0.0
      var j = 0
      while (j < cw.length) { val t = cw(j).toDouble - v(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Build the PQ index: train the codebooks on the bounded sample, encode
    * every corpus vector in ONE narrow pass (m nearest-codeword searches per
    * vector), materialize the (vec_id, code) table. At 100 TB the codes
    * table would be written as a parquet table of byte arrays; the shape
    * (narrow encode pass + ids-and-codes-only table) is the same.
    */
  def buildPqIndex(corpus: DataFrame, m: Int = 8, k: Int = 16,
      iters: Int = 8, sampleN: Int = 2048): PqIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = trainPqCodebooks(corpus, m, k, iters, sampleN)
    val codes = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val sub = books(0)(0).length
        it.map { case (id, v) =>
          (id, Array.tabulate(books.length)(s =>
            nearestCodeword(books(s), java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))))
        }
      }
      .toDF("vec_id", "code")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count() // materialize the encode pass once, at build time
    PqIndex(books, codes)
  }

  /** Query a prebuilt PQ index via asymmetric distance computation (ADC):
    * per query, a (m × k) dot-product lookup table against the codebooks is
    * built driver-side; the compressed-domain scan scores every code with m
    * table adds (cos(q, x̂) via the subspace-orthogonal decomposition
    * dot(q,x̂) = Σ_s dot(q_s, cw_s), |x̂|² = Σ_s |cw_s|²), the top
    * k·refine candidates per query survive an ids-only window, and are
    * exact-reranked against the raw embeddings. Recall tunes with refine
    * (and codebook size k at build time).
    */
  def pqQuery(index: PqIndex, corpus: DataFrame, queries: DataFrame,
      k: Int, refine: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = index.codebooks
    val m = books.length
    val sub = books(0)(0).length
    // Query-independent codeword norms (m × k), shared by every query.
    val normTab = Array.tabulate(m) { s =>
      books(s).map { cw =>
        var n = 0.0; var j = 0
        while (j < cw.length) { n += cw(j).toDouble * cw(j); j += 1 }
        n
      }
    }
    // Size contract for this collect: `queries` is the probe batch, bounded
    // by the caller — never the corpus (same contract as ivfQuery).
    val qTabs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (qid, qv) =>
        var qn = 0.0; var j = 0
        while (j < qv.length) { qn += qv(j).toDouble * qv(j); j += 1 }
        val dotTab = Array.tabulate(m) { s =>
          books(s).map { cw =>
            var d = 0.0; var t = 0
            while (t < sub) { d += qv(s * sub + t).toDouble * cw(t); t += 1 }
            d
          }
        }
        (qid, dotTab, math.sqrt(qn))
      }
    val bc = spark.sparkContext.broadcast(qTabs)
    val approx = index.codes.as[(Long, Array[Int])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (vid, code) =>
          qs.iterator.map { case (qid, dotTab, qNorm) =>
            var d = 0.0; var n2 = 0.0; var s = 0
            while (s < code.length) {
              d += dotTab(s)(code(s)); n2 += normTab(s)(code(s)); s += 1
            }
            val score = if (qNorm == 0.0 || n2 == 0.0) -2.0 else d / (qNorm * math.sqrt(n2))
            (qid, vid, score)
          }
        }
      }
      .toDF("query_id", "vec_id", "approx")
    val wa = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("vec_id"))
    val cands = approx.withColumn("r", row_number().over(wa))
      .filter(col("r") <= k * refine)
      .select("query_id", "vec_id")
    val scored = cands
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .withColumn("score", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** One-shot PQ ANN convenience: build, query, release. For repeated query
    * batches hold the [[PqIndex]] and call [[pqQuery]].
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, nCodewords: Int = 16, refine: Int = 4): DataFrame = {
    val index = buildPqIndex(corpus, m, nCodewords)
    val out = pqQuery(index, corpus, queries, k, refine).localCheckpoint()
    index.release()
    out
  }

  // ---------------- IVF × PQ composition (IVFADC) ----------------

  /** IVF coarse cells + per-cell-residual PQ codes — the standard 100 TB ANN
    * layout (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011, §IV "IVFADC"): the coarse quantizer restricts the
    * compressed-domain scan to the nProbe probed cells (|corpus|·nProbe/nCells
    * codes instead of |corpus|), and the PQ codes quantize the RESIDUAL
    * v − centroid(cell), which carries far less variance than v itself, so
    * the same code budget yields tighter distance estimates than raw-vector
    * PQ. Tiny driver-held arrays (centroids, codebooks, per-cell correction
    * tables) ride task closures; the big table is ids+cell+codes only.
    */
  final case class IvfPqIndex(
      centroids: Array[Array[Float]], // nCells × dim
      codebooks: Array[Array[Array[Float]]], // m × k × (dim/m), residual space
      coded: DataFrame // (vec_id, cell, code)
  ) {
    def release(): Unit = { coded.unpersist(); () }
  }

  /** Per-subspace Lloyd k-means on explicit vectors (shared by the raw-PQ
    * and residual-PQ trainers; deterministic: stride init, lowest-index
    * tie-break).
    */
  private def trainPqOnVectors(sample: Array[Array[Float]], m: Int, k: Int,
      iters: Int): Array[Array[Array[Float]]] = {
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val vs = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      var cents = Array.tabulate(k)(i => vs(((i.toLong * vs.length) / k).toInt).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        vs.foreach { v =>
          val c = nearestCodeword(cents, v)
          counts(c) += 1
          var j = 0
          while (j < sub) { sums(c)(j) += v(j); j += 1 }
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(sub)(j => (sums(c)(j) / counts(c)).toFloat)
        }
        it += 1
      }
      cents
    }
  }

  private def residual(v: Array[Float], cent: Array[Float]): Array[Float] =
    Array.tabulate(v.length)(j => v(j) - cent(j))

  /** Build the IVFADC index: train the coarse quantizer, train the PQ
    * codebooks on the sample's RESIDUALS, then assign + encode every corpus
    * vector in ONE narrow pass. Same bounded-sample training contract as the
    * IVF/PQ builders (driver collect ≤ sampleN rows, never the corpus).
    */
  def buildIvfPqIndex(corpus: DataFrame, nCells: Int = 16, m: Int = 16,
      k: Int = 32, iters: Int = 8, sampleN: Int = 2048): IvfPqIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
    require(sample.nonEmpty, "empty corpus")
    val cents = kmeansCentroids(corpus, nCells, iters, sampleN)
    val books = trainPqOnVectors(
      sample.map(v => residual(v, cents(nearestCell(cents, v)))), m, k, iters)
    val sub = books(0)(0).length
    val coded = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val cell = nearestCell(cents, v)
        val r = residual(v, cents(cell))
        (id, cell, Array.tabulate(books.length)(s =>
          nearestCodeword(books(s),
            java.util.Arrays.copyOfRange(r, s * sub, (s + 1) * sub))))
      })
      .toDF("vec_id", "cell", "code")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    coded.count() // materialize the assign+encode pass once, at build time
    IvfPqIndex(cents, books, coded)
  }

  /** Query the IVFADC index. Per query: probe the nProbe nearest cells
    * (driver-side vs the tiny centroid table), then an ids-only broadcast
    * equi-join on cell RESTRICTS the compressed-domain scan to probed cells
    * BEFORE the ADC map (PlanSpec pins the join below the map). ADC for
    * cosine over residual codes decomposes as
    *   dot(q, x̂)  = dot(q, c) + Σ_s dot(q_s, cw_s)
    *   |x̂|²      = |c|² + Σ_s (2·dot(c_s, cw_s) + |cw_s|²)
    * with dot(q, c) per (query, cell) and the query-INDEPENDENT correction
    * table per (cell, subspace, code) both precomputed driver-side. Top
    * k·refine candidates per query survive an ids-only window, then exact
    * rerank against raw embeddings (broadcast query side).
    */
  def ivfPqQuery(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int = 8, refine: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = index.centroids
    val books = index.codebooks
    val m = books.length
    val sub = books(0)(0).length
    val cellNorm = cents.map { c =>
      var n = 0.0; var j = 0
      while (j < c.length) { n += c(j).toDouble * c(j); j += 1 }
      n
    }
    // query-independent per-cell correction: 2·dot(c_s, cw) + |cw|²
    val corrTab = Array.tabulate(cents.length) { cell =>
      Array.tabulate(m) { s =>
        books(s).map { cw =>
          var cross = 0.0; var n = 0.0; var t = 0
          while (t < sub) {
            cross += cents(cell)(s * sub + t).toDouble * cw(t)
            n += cw(t).toDouble * cw(t)
            t += 1
          }
          2.0 * cross + n
        }
      }
    }
    // Size contract for this collect: `queries` is the probe batch, bounded
    // by the caller — never the corpus (same contract as ivfQuery/pqQuery).
    val qRows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val qTabs: Map[Long, (Array[Array[Double]], Array[Double], Double)] =
      qRows.map { case (qid, qv) =>
        var qn = 0.0; var j = 0
        while (j < qv.length) { qn += qv(j).toDouble * qv(j); j += 1 }
        val dotTab = Array.tabulate(m) { s =>
          books(s).map { cw =>
            var d = 0.0; var t = 0
            while (t < sub) { d += qv(s * sub + t).toDouble * cw(t); t += 1 }
            d
          }
        }
        val qcDot = cents.map { c =>
          var d = 0.0; var t = 0
          val n = math.min(c.length, qv.length)
          while (t < n) { d += qv(t).toDouble * c(t); t += 1 }
          d
        }
        qid -> ((dotTab, qcDot, math.sqrt(qn)))
      }.toMap
    val cellQueries: Map[Int, Array[Long]] = qRows.toSeq
      .flatMap { case (qid, v) => probeCells(cents, v, nProbe).map(c => (c, qid)) }
      .groupBy(_._1).map { case (c, qs) => c -> qs.map(_._2).toArray }
    val probedCells = cellQueries.keys.toSeq.sorted
    val bc = spark.sparkContext.broadcast(qTabs)
    val bcCorr = spark.sparkContext.broadcast(corrTab)
    val bcCellNorm = spark.sparkContext.broadcast(cellNorm)
    val bcCellQ = spark.sparkContext.broadcast(cellQueries)
    // The cell restriction is a plain FILTER before any ADC work — no join
    // materialization, and when the persisted codes table is PARTITIONED BY
    // cell (saveIvfPqIndex) the same predicate becomes partition pruning:
    // unprobed cells are never read at all. Each surviving row is scored
    // only against the queries that probed its cell (broadcast map).
    val probed = index.coded
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id"), col("cell"), col("code"))
      .as[(Long, Int, Array[Int])]
    val approx = probed
      .mapPartitions { it =>
        val qs = bc.value; val corr = bcCorr.value; val cn = bcCellNorm.value
        val cq = bcCellQ.value
        it.flatMap { case (vid, cell, code) =>
          cq.getOrElse(cell, Array.empty[Long]).iterator.map { qid =>
            val (dotTab, qcDot, qNorm) = qs(qid)
            var d = qcDot(cell); var n2 = cn(cell); var s = 0
            while (s < code.length) {
              d += dotTab(s)(code(s)); n2 += corr(cell)(s)(code(s)); s += 1
            }
            val score =
              if (qNorm == 0.0 || n2 <= 0.0) -2.0 else d / (qNorm * math.sqrt(n2))
            (qid, vid, score)
          }
        }
      }
      .toDF("query_id", "vec_id", "approx")
    val wa = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("vec_id"))
    val cands = approx.withColumn("r", row_number().over(wa))
      .filter(col("r") <= k * refine)
      .select("query_id", "vec_id")
    val scored = cands
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .withColumn("score", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Persist / load an IVFADC index (centroids + codebooks + coded table) —
    * same provision-once contract as the IVF and PQ pairs. The coded table
    * is written PARTITIONED BY cell, so [[ivfPqQuery]]'s probed-cell filter
    * becomes parquet partition pruning on a loaded index: unprobed cells'
    * files are never opened — the on-disk analog of an inverted list.
    */
  def saveIvfPqIndex(index: IvfPqIndex, path: String): Unit = {
    val spark = index.coded.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    (for {
      (book, s) <- index.codebooks.zipWithIndex
      (cw, c) <- book.zipWithIndex
    } yield (s, c, cw)).toSeq
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    index.coded.write.mode("overwrite").partitionBy("cell").parquet(s"$path/coded")
  }

  /** `cache = false` (default) keeps the coded table a plain parquet scan,
    * so [[ivfPqQuery]]'s probed-cell predicate becomes genuine PARTITION
    * PRUNING — unprobed cells' files are never opened (PlanSpec pins the
    * scan's partitionFilters AND its files-read metric). This is the 100 TB
    * default: the codes of a web-scale corpus don't fit executor memory, and
    * the pruned scan reads nProbe/nCells of the index per batch. `cache =
    * true` trades that for an in-memory codes table — worth it only when the
    * whole index fits and query batches arrive continuously (a dedicated
    * serving cluster); note a CACHED relation is filtered per batch AFTER
    * materialization (InMemoryTableScan), not file-pruned.
    */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      cache: Boolean = false): IvfPqIndex = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
    val rows = spark.read.parquet(s"$path/codebooks")
      .as[(Int, Int, Array[Float])].collect()
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cws) => cws.sortBy(_._2).map(_._3) }.toArray
    val raw = spark.read.parquet(s"$path/coded")
    val coded =
      if (cache) raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw
    IvfPqIndex(cents, books, coded)
  }

  /** One-shot IVFADC convenience: build, query, release. For repeated query
    * batches hold the [[IvfPqIndex]] and call [[ivfPqQuery]].
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, m: Int = 16, nCodewords: Int = 32,
      nProbe: Int = 8, refine: Int = 8): DataFrame = {
    val index = buildIvfPqIndex(corpus, nCells, m, nCodewords)
    val out = ivfPqQuery(index, corpus, queries, k, nProbe, refine).localCheckpoint()
    index.release()
    out
  }

  /** Embedding-cosine near-duplicate pairs (training-data dedup by embedding):
    * ids-only LSH-bucketed self-join, embeddings re-attached per candidate
    * pair, exact cosine verify at threshold.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      nBits: Int = 32, bands: Int = 2): DataFrame = {
    require(nBits % bands == 0)
    val banded = bandKeys(corpus, "vec_id", "vec_id", nBits, bands)
    val a = banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_a"))
    val b = banded.select(col("band_idx"), col("band_key"), col("vec_id").as("id_b"))
    val pairs = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")), Seq("id_a"))
      .join(corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")), Seq("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
