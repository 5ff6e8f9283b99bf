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
    * Computed with builtins so it stays inside codegen.
    */
  def hyperplaneSignature(emb: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      // h_i[j] in {-1, +1} from a hash of (i, j)
      val dot = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (v, j) => v.cast("double") *
            when(pmod(xxhash64(lit(i), j), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: corpus and queries are hashed to nBits-bit signatures;
    * candidates share a signature band; rerank candidates exactly and take
    * top-k. Recall is tuned by bands (more bands = more candidates); the join
    * is an equi-join on (band_idx, band_key) so it scales.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 32, bands: Int = 4): DataFrame = {
    require(nBits % bands == 0)
    val width = nBits / bands
    def withBands(df: DataFrame, idAs: String, embAs: String): DataFrame = {
      val sig = hyperplaneSignature(col("embedding"), nBits)
      val bandCols = (0 until bands).map { bi =>
        struct(lit(bi).as("bidx"),
          shiftright(sig, bi * width).bitwiseAND(lit((1L << width) - 1)).as("bkey"))
      }
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        explode(array(bandCols: _*)).as("band"))
        .select(col(idAs), col(embAs),
          col("band.bidx").as("band_idx"), col("band.bkey").as("band_key"))
    }
    val c = withBands(corpus, "vec_id", "embedding")
    val q = withBands(queries, "query_id", "q_emb")
    val cands = c.join(q, Seq("band_idx", "band_key"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("score", cosine(col("embedding"), col("q_emb")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }

  /** Embedding-cosine near-duplicate pairs (training-data dedup by embedding):
    * LSH-bucketed self-join, exact cosine verify at threshold.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      nBits: Int = 32, bands: Int = 2): DataFrame = {
    require(nBits % bands == 0)
    val width = nBits / bands
    val sig = hyperplaneSignature(col("embedding"), nBits)
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("bidx"),
        shiftright(sig, bi * width).bitwiseAND(lit((1L << width) - 1)).as("bkey"))
    }
    val banded = corpus
      .select(col("vec_id"), col("embedding"), explode(array(bandCols: _*)).as("band"))
      .select(col("vec_id"), col("embedding"),
        col("band.bidx").as("band_idx"), col("band.bkey").as("band_key"))
    val a = banded.select(col("band_idx"), col("band_key"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = banded.select(col("band_idx"), col("band_key"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
