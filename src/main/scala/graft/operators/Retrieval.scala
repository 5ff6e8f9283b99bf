package graft.operators

import graft.functions.Embeddings
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval surface over the materialized chunk table — the engine's analog
  * of the reference's serving path (ref:src/fancyrag/mcp/runtime.py:30-233):
  * vector top-k (R1), fulltext top-k (R2), hybrid fusion with per-source
  * max-normalized scores (R3/A9/J9), and semantic 1-hop expansion (J6).
  * Index-free: brute-force at eval scale; the LSH path in [[Ann]] is the
  * scale-out variant.
  */
object Retrieval {

  /** R1: cosine top-k of chunks against an embedded query string. */
  def vectorTopK(chunks: DataFrame, queryText: String, k: Int, dim: Int): DataFrame = {
    val qv = Embeddings.embed(queryText, dim)
    val qCol = array(qv.map(v => lit(v.toDouble)): _*)
    chunks
      .withColumn("score_vector", Ann.cosine(col("embedding"), qCol))
      .orderBy(col("score_vector").desc, col("chunk_uid"))
      .limit(k)
      .select("chunk_uid", "text", "score_vector")
  }

  /** R2: fulltext scoring = query-token hit fraction weighted by inverse
    * chunk length (a TF-style proxy for the reference's Lucene index,
    * ref:scripts/create_fulltext_index.py:94-97).
    */
  def fulltextScore(textCol: Column, queryText: String): Column = {
    val qToks = queryText.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).distinct
    val toks = split(lower(textCol), "[^a-z0-9']+")
    val hits = qToks.map(t => when(array_contains(toks, t), 1.0).otherwise(0.0))
      .reduceOption(_ + _).getOrElse(lit(0.0))
    hits / (lit(1.0) + log1p(size(toks).cast("double")))
  }

  def fulltextTopK(chunks: DataFrame, queryText: String, k: Int): DataFrame =
    chunks
      .withColumn("score_fulltext", fulltextScore(col("text"), queryText))
      .filter(col("score_fulltext") > 0)
      .orderBy(col("score_fulltext").desc, col("chunk_uid"))
      .limit(k)
      .select("chunk_uid", "text", "score_fulltext")

  /** R3: hybrid fusion. Over-fetch k*ratio from each source
    * (ref:src/fancyrag/mcp/runtime.py:120-127), full-outer join per chunk
    * (J9), max-normalize per source (A9, 0-guarded), fuse, final top-k.
    */
  def hybrid(chunks: DataFrame, queryText: String, k: Int,
      ratio: Int = 4, dim: Int = 64): DataFrame = {
    val vec = vectorTopK(chunks, queryText, k * ratio, dim)
      .select(col("chunk_uid"), col("text").as("t_v"), col("score_vector"))
    val ft = fulltextTopK(chunks, queryText, k * ratio)
      .select(col("chunk_uid"), col("text").as("t_f"), col("score_fulltext"))
    val joined = vec.join(ft, Seq("chunk_uid"), "full_outer")
      .select(col("chunk_uid"), coalesce(col("t_v"), col("t_f")).as("text"),
        coalesce(col("score_vector"), lit(0.0)).as("score_vector"),
        coalesce(col("score_fulltext"), lit(0.0)).as("score_fulltext"))
    val vMax = greatest(max(col("score_vector")).over(), lit(1e-12))
    val fMax = greatest(max(col("score_fulltext")).over(), lit(1e-12))
    joined
      .withColumn("score",
        col("score_vector") / vMax + col("score_fulltext") / fMax)
      .orderBy(col("score").desc, col("chunk_uid"))
      .limit(k)
      .select("chunk_uid", "text", "score", "score_vector", "score_fulltext")
  }

  /** R4: fetch a node by id, with the embedding stripped from what the caller
    * sees (ref:src/fancyrag/mcp/runtime.py:40-43,63-74,236-272).
    */
  def fetchById(nodes: DataFrame, id: String): DataFrame =
    nodes.filter(col("id") === id).drop("embedding")

  /** J5: enrich matched chunks with their document (left outer — matches
    * without a known document survive; ref:scripts/ask_qdrant.py:43-57
    * OPTIONAL MATCH (doc:Document)-[:HAS_CHUNK]->(node)).
    */
  def withDocument(matches: DataFrame, chunks: DataFrame): DataFrame =
    matches.join(
      chunks.select(col("chunk_uid"), col("conv_id").as("document")),
      Seq("chunk_uid"), "left_outer")

  /** J6: 1-hop semantic expansion of matched chunks — entities mentioned in
    * the chunk plus their outgoing semantic relations, collected DISTINCT per
    * chunk (ref:scripts/ask_qdrant.py:259-292; ref:queries/hybrid_retrieval.cypher:1-29).
    */
  def semanticExpansion(matches: DataFrame, nodes: DataFrame, edges: DataFrame): DataFrame = {
    val entityNodes = nodes
      .filter(array_contains(col("labels"), "__Entity__"))
      .select(col("id").as("ent_id"), col("name").as("ent_name"),
        col("props").getItem("chunk_uids").as("chunk_uids_json"))
    // entity -> chunk binding via provenance chunk_uids
    val entChunks = entityNodes
      .select(col("ent_id"), col("ent_name"),
        explode(from_json(col("chunk_uids_json"),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
          .as("chunk_uid"))
    val semEdges = edges.filter(col("rel_type").isin("FOUNDED", "JOINED", "LAUNCHED"))
      .select(col("src"), col("rel_type"), col("dst"))
    matches.select("chunk_uid")
      .join(entChunks, Seq("chunk_uid"))
      .join(semEdges, col("ent_id") === col("src"), "left_outer")
      .groupBy("chunk_uid")
      .agg(
        collect_set(col("ent_name")).as("semantic_nodes"),
        collect_set(when(col("rel_type").isNotNull,
          struct(col("src"), col("rel_type"), col("dst")))).as("semantic_relationships"))
  }
}
