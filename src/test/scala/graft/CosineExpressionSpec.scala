package graft

import graft.functions.{CosineSimilarity, Embeddings}
import graft.operators.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native CosineSimilarity Catalyst expression: bit-equality with the
  * builtin composition, SQL registration, null semantics, codegen execution.
  */
class CosineExpressionSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  lazy val vecs = (0L until 40L).map { i =>
    (i, Embeddings.embed(s"text $i topic ${i % 4}", 16))
  }.toDF("vec_id", "embedding")

  test("bit-identical to the builtin zip_with/aggregate composition") {
    val pairs = vecs.as("a").join(vecs.as("b"),
      col("a.vec_id") < col("b.vec_id"))
    val diff = pairs
      .withColumn("fast", Ann.cosine(col("a.embedding"), col("b.embedding")))
      .withColumn("slow", Ann.cosineBuiltins(col("a.embedding"), col("b.embedding")))
      .filter(col("fast") =!= col("slow")) // exact double comparison
      .count()
    assert(diff == 0)
  }

  test("self-similarity is ~1, null input yields null") {
    val r = vecs.withColumn("c", Ann.cosine(col("embedding"), col("embedding")))
      .agg(min("c"), max("c")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9 && math.abs(r.getDouble(1) - 1.0) < 1e-9)
    val n = vecs.withColumn("c",
      Ann.cosine(col("embedding"), lit(null).cast("array<float>")))
      .filter(col("c").isNull).count()
    assert(n == vecs.count())
  }

  test("mixed float/double arrays are supported") {
    val mixed = vecs.withColumn("d", transform(col("embedding"), _.cast("double")))
      .withColumn("c", Ann.cosine(col("embedding"), col("d")))
    assert(mixed.filter(abs(col("c") - 1.0) > 1e-9).count() == 0)
  }

  test("registered SQL function works") {
    CosineSimilarity.register(spark)
    vecs.createOrReplaceTempView("vecs_cos_test")
    val n = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM vecs_cos_test a JOIN vecs_cos_test b ON a.vec_id < b.vec_id
        |WHERE cosine_sim(a.embedding, b.embedding) > 0.99""".stripMargin).count()
    assert(n >= 0) // executes through the SQL path (parser + analyzer + codegen)
  }

  test("type check rejects non-array inputs") {
    val ex = intercept[Exception] {
      vecs.withColumn("c", Ann.cosine(col("vec_id"), col("embedding"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("cosine_sim") ||
      ex.getMessage.toLowerCase.contains("data type"))
  }
}
