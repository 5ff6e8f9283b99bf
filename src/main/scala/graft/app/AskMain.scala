package graft.app

import graft.operators.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin query CLI over the materialized graph tables — reproduces the
  * reference's serving surface for demos (ref:scripts/ask_qdrant.py:101-245
  * and the MCP `search`/`fetch` tools, ref:src/fancyrag/mcp/runtime.py:353-417):
  * embed question → hybrid (vector + fulltext) top-k over chunks → document
  * enrichment (J5) → optional semantic 1-hop context (J6) → JSON lines out.
  *
  * Usage:
  *   spark-submit --class graft.app.AskMain graft.jar \
  *     --graph /tmp/kg --question "Who founded Acme Corp?" \
  *     --top-k 5 --include-semantic true
  */
object AskMain {

  final case class AskResult(df: DataFrame)

  /** Testable core: hybrid search + enrichment over materialized tables. */
  def ask(spark: SparkSession, graphDir: String, question: String,
      topK: Int = 5, includeSemantic: Boolean = true): DataFrame = {
    val chunks = spark.read.parquet(s"$graphDir/chunks").dropDuplicates("chunk_uid")
    val nodes = graft.materialize.Materializer.mergeRows(
      spark.read.parquet(s"$graphDir/nodes"), Seq("id"))
    val edges = graft.materialize.Materializer.mergeRows(
      spark.read.parquet(s"$graphDir/edges"), Seq("src", "dst", "rel_type"))
    val matches = Retrieval.hybrid(chunks, question, topK, dim = KgBuild.EmbeddingDim)
    val withDoc = Retrieval.withDocument(matches, chunks)
    if (!includeSemantic) withDoc
    else withDoc.join(
      Retrieval.semanticExpansion(matches, nodes, edges),
      Seq("chunk_uid"), "left_outer")
  }

  def main(args: Array[String]): Unit = {
    val a = KgBuildMain.parseArgs(args)
    val graphDir = a.getOrElse("graph", "/tmp/graft-kg-out")
    val question = a.getOrElse("question", "Who founded Acme Corp?")
    val topK = a.get("top-k").map(_.toInt).getOrElse(5)
    val includeSemantic = a.get("include-semantic").forall(_.toBoolean)
    // spark-submit injects spark.master via system property; default to
    // local mode for sandbox runs
    val spark = SparkSession.builder()
      .config("spark.master",
        sys.props.getOrElse("spark.master", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .appName("graft-ask")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = ask(spark, graphDir, question, topK, includeSemantic)
      .orderBy(col("score").desc).collect()
    val durMs = (System.nanoTime() - t0) / 1e6
    rows.foreach { r =>
      val sem =
        if (includeSemantic && !r.isNullAt(r.fieldIndex("semantic_nodes")))
          r.getSeq[String](r.fieldIndex("semantic_nodes")).mkString("[\"", "\",\"", "\"]")
        else "[]"
      println(
        s"""{"chunk_uid":"${r.getAs[String]("chunk_uid")}","score":${r.getAs[Double]("score")},""" +
          s""""document":"${Option(r.getAs[String]("document")).getOrElse("")}","semantic_nodes":$sem}""")
    }
    println(s"""{"matches":${rows.length},"duration_ms":$durMs,"question":${"\"" + question + "\""}}""")
    spark.stop()
  }
}
