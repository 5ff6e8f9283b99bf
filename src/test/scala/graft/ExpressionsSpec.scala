package graft

import graft.functions.{Embeddings, EmbedText, HyperplaneSignature}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-2 native expressions: HyperplaneSignature (one-pass LSH
  * signature) and EmbedText (feature-hash embedder) — codegen path vs
  * interpreted kernel, determinism, null semantics.
  */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  lazy val vecs = (0L until 40L).map { i =>
    (i, Embeddings.embed(s"expr test $i topic ${i % 4}", 24))
  }.toDF("vec_id", "embedding")

  test("hyperplane signature: deterministic, stable across plans, 32-bit bound") {
    val a = vecs.withColumn("sig", HyperplaneSignature.signature(col("embedding"), 32))
      .select("vec_id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // second plan (different projection shape forces fresh codegen)
    val b = vecs.filter(col("vec_id") >= 0)
      .withColumn("x", lit(1))
      .withColumn("sig", HyperplaneSignature.signature(col("embedding"), 32))
      .select("vec_id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < (1L << 32)))
    // identical vectors share a signature; distinct topics produce >1 bucket
    assert(a.values.toSet.size > 1)
  }

  test("hyperplane signature: codegen result equals the interpreted kernel") {
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val viaPlan = vecs.withColumn("sig", HyperplaneSignature.signature(col("embedding"), 16))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { case (id, arr) =>
      val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
        arr, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))
      val interp = HyperplaneSignature(lit, 16).eval(null)
      assert(viaPlan(id) == interp, s"vec $id codegen/interp mismatch")
    }
  }

  test("embed_text expression equals the Scala embedder; null-safe") {
    val df = Seq((1L, "hello embedding world"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.withColumn("emb", EmbedText.embedText(col("text"), 16)).collect()
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getSeq[Float](2) == Embeddings.embed("hello embedding world", 16).toSeq)
    assert(got.find(_.getLong(0) == 2L).get.isNullAt(2))
  }

  test("nBits bounds are enforced") {
    intercept[IllegalArgumentException] {
      HyperplaneSignature(
        org.apache.spark.sql.GraftBridge.expression(col("embedding")), 65)
    }
  }
}
