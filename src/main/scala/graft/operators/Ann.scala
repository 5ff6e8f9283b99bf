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
