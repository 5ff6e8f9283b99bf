package graft

import graft.qa.Sanitizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SanitizerSpec extends AnyFunSuite {

  test("sensitive keys are masked recursively (P6)") {
    val scrubbed = Sanitizer.scrub(Map(
      "api_key" -> "sk-abcdef123456789",
      "nested" -> Map("Authorization" -> "Bearer xyz", "ok" -> "keep"),
      "list" -> Seq(Map("password" -> "hunter2"), "plain")))
    val m = scrubbed.asInstanceOf[Map[String, Any]]
    assert(m("api_key") == "***")
    assert(m("nested").asInstanceOf[Map[String, Any]]("Authorization") == "***")
    assert(m("nested").asInstanceOf[Map[String, Any]]("ok") == "keep")
    assert(m("list").asInstanceOf[Seq[Any]].head.asInstanceOf[Map[String, Any]]("password") == "***")
  }

  test("token-shaped substrings in free text are redacted") {
    assert(Sanitizer.scrubText("auth: Bearer abc.def-123 rest") == "auth: *** rest")
    assert(Sanitizer.scrubText("key sk-0123456789abcdef end") == "key *** end")
    assert(Sanitizer.scrubText("no secrets here") == "no secrets here")
  }

  test("label cleanup: trim, drop empties, default __Entity__ (P4)") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val df = Seq(
      Seq(" Company ", ""),
      Seq("", "  "),
      Seq[String]()
    ).toDF("labels")
      .select(graft.materialize.Materializer.cleanLabels(col("labels")).as("out"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("Company"))
    assert(got(1) == Seq("__Entity__"))
    assert(got(2) == Seq("__Entity__"))
  }

  test("QA markdown report renders all sections") {
    val r = graft.qa.QaEvaluator.QaResult("pass",
      Map("label:Chunk" -> 3L), Map("orphan_chunks" -> 0L),
      Map("mean" -> 12.5), Seq("<=0064" -> 3L))
    val md = graft.qa.QaEvaluator.reportMarkdown(r)
    assert(md.contains("Status: **pass**"))
    assert(md.contains("label:Chunk") && md.contains("orphan_chunks"))
    assert(md.contains("<=0064"))
  }
}
