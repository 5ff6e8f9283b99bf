package graft.functions

import graft.util.Determinism
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic feature-hash embeddings — the engine's stand-in for the
  * reference's OpenAI embedder (ref:src/fancyrag/embeddings.py:34-103;
  * dimension strictly validated per ref:src/cli/utils.py:14-48, default 1024
  * per ref:src/config/settings.py:26). The reference's own smoke stack uses a
  * deterministic embedding stub the same way (ref:Makefile:38).
  *
  * v[h(token) ^ i-fold] += 1 per token, then L2-normalize. Pure function of
  * the text, so embeddings are reproducible across runs/resume.
  */
object Embeddings {

  def embed(text: String, dim: Int): Array[Float] = {
    require(dim > 0)
    val v = new Array[Float](dim)
    var i = 0
    val n = text.length
    var start = -1
    def addToken(s: Int, e: Int): Unit = {
      var h = 0x9e3779b97f4a7c15L
      var j = s
      while (j < e) { h = Determinism.mix64(h ^ text.charAt(j).toLong); j += 1 }
      val idx = ((h >>> 1) % dim).toInt
      val sign = if ((h & 1L) == 0L) 1f else -1f
      v(idx) += sign
    }
    while (i <= n) {
      val ws = i == n || text.charAt(i).isWhitespace
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { addToken(start, i); start = -1 }
      i += 1
    }
    var norm = 0.0
    v.foreach(x => norm += x * x)
    val inv = if (norm == 0.0) 0f else (1.0 / math.sqrt(norm)).toFloat
    v.map(_ * inv)
  }

  /** Adds an `embedding: array<float>` column to a DataFrame with a text
    * column; narrow map, no shuffle, via the native [[EmbedText]] expression
    * (no UDF boundary in the hot pipeline). Dimension guard = fixed-size
    * output.
    */
  def withEmbedding(df: DataFrame, textCol: String, dim: Int): DataFrame =
    df.withColumn("embedding", EmbedText.embedText(col(textCol), dim))
}
