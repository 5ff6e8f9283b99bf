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

  /** The MERGE-clean read view of a materialized graph. A serving process
    * loads it ONCE ([[loadGraph]], cached + warmed) so the per-request path
    * never re-reads or re-merges parquet — the analog of the reference
    * serving from a warm store instead of rebuilding its view per query.
    */
  final case class GraphView(chunks: DataFrame, nodes: DataFrame, edges: DataFrame) {
    def release(): Unit = { chunks.unpersist(); nodes.unpersist(); edges.unpersist(); () }
  }

  /** Uncached view — right for one-shot CLI queries. */
  def graphView(spark: SparkSession, graphDir: String): GraphView = GraphView(
    chunks = spark.read.parquet(s"$graphDir/chunks").dropDuplicates("chunk_uid"),
    nodes = graft.materialize.Materializer.mergeRows(
      spark.read.parquet(s"$graphDir/nodes"), Seq("id")),
    edges = graft.materialize.Materializer.mergeRows(
      spark.read.parquet(s"$graphDir/edges"), Seq("src", "dst", "rel_type")))

  /** Cached + eagerly warmed view — right for a long-lived serving session:
    * the parquet scan and MERGE collapse are paid at startup, keeping warm
    * request latency inside the serving budget (ref:docs/prd.md:35 NFR2).
    */
  def loadGraph(spark: SparkSession, graphDir: String): GraphView = {
    val v = graphView(spark, graphDir)
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = GraphView(
      v.chunks.persist(MEMORY_AND_DISK),
      v.nodes.persist(MEMORY_AND_DISK),
      v.edges.persist(MEMORY_AND_DISK))
    cached.chunks.count(); cached.nodes.count(); cached.edges.count()
    cached
  }

  /** Testable core: hybrid search + enrichment over a graph view. */
  def ask(spark: SparkSession, view: GraphView, question: String,
      topK: Int, includeSemantic: Boolean): DataFrame = {
    val hybrid = Retrieval.hybrid(view.chunks, question, topK, dim = KgBuild.EmbeddingDim)
    if (!includeSemantic) return Retrieval.withDocument(hybrid, view.chunks)
    // Size contract for this collect: the match set is exactly topK rows.
    // Localizing it means the downstream consumers (document enrich,
    // expansion anchor) reuse the result instead of re-running the hybrid
    // corpus scan once per plan subtree — the difference between one corpus
    // pass and three on the serving path's latency budget.
    val matches = spark.createDataFrame(
      java.util.Arrays.asList(hybrid.collect(): _*), hybrid.schema)
    Retrieval.withDocument(matches, view.chunks).join(
      Retrieval.semanticExpansion(matches, view.nodes, view.edges),
      Seq("chunk_uid"), "left_outer")
  }

  /** One-shot form reading the tables per call (CLI / tests). */
  def ask(spark: SparkSession, graphDir: String, question: String,
      topK: Int = 5, includeSemantic: Boolean = true): DataFrame =
    ask(spark, graphView(spark, graphDir), question, topK, includeSemantic)

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
