package graft.source

import java.sql.Timestamp

import graft.extract.Gazetteer
import graft.model.{Triple, Turn}
import graft.util.Determinism._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Seeded; same parameters always yield a byte-identical table. Turn texts are
  * instantiated from sentence templates over the gazetteer dictionaries so the
  * golden triple set is known by construction (SURVEY.md §7.5 hard part 1) —
  * the deterministic stand-in for the reference's LLM extraction corpus
  * (ref:sample.txt:1 "Alice founded Acme Corp in 2012. Bob joined in 2015.",
  * ref:docs/samples/pilot.txt:1 "Acme Corp launched GraphRAG Pilot ...").
  *
  * Skew is built in (north_rule: hot entities, long conversations):
  *   - conversation 0 is ~20x longer than the rest;
  *   - company group 0 ("Acme Corp") is drawn ~4x more often than uniform.
  *
  * Generation is DISTRIBUTED: `spark.range(numConvs).flatMap(conversation)` —
  * each conversation is a pure function of its index, so the table scales to
  * arbitrary row counts with no driver-side materialization.
  */
object TranscriptGen {

  final case class GoldenTurn(turn: Turn, triples: Seq[Triple])

  private val noise = Vector(
    "The weather outside was unremarkable today.",
    "Please summarize the previous discussion points.",
    "That makes sense, thanks for clarifying.",
    "Let me check the docs and get back to you.",
    "Nothing further to add at this time.",
    "Could you rephrase the last question?",
    "The meeting has been moved to next week."
  )

  private def pickSurface(groups: Seq[Seq[String]], g: Int, s: Long): (String, String) = {
    val group = groups(g)
    val surf = group(draw(group.size, s))
    (surf, group.head)
  }

  /** Hot-key draw for companies: ~1/4 of draws land on group 0. */
  private def drawCompany(parts: Long*): Int = {
    val r = draw(companiesSize * 4 / 3, parts: _*)
    if (r >= companiesSize) 0 else r
  }
  private val companiesSize = Gazetteer.companies.size

  def numTurns(convIdx: Long): Int = {
    val base = 5 + draw(46, convIdx, 1L)
    if (convIdx == 0L) base * 20 else base
  }

  /** Pure generation of one conversation: every turn's text, role, tool, ts
    * plus the golden entity triples that text encodes. Sequential lastCompany
    * state inside one conversation drives the JOINED-anaphora template
    * ("Bob joined in 2015." binds to the most recent prior company mention).
    */
  def conversation(convIdx: Long): Seq[GoldenTurn] = {
    val convId = f"conv-$convIdx%06d"
    val n = numTurns(convIdx)
    var lastCompany: Option[String] = None
    (0 until n).map { t =>
      val ts = new Timestamp(1700000000000L + convIdx * 3600000L + t * 60000L)
      val tmpl = if (t == 0) 9 else draw(10, convIdx, t.toLong, 7L)
      val role = if (t == 0) "system" else if (t % 2 == 1) "user" else "assistant"
      val yr = 1990 + draw(35, convIdx, t.toLong, 11L)
      tmpl match {
        case 0 | 1 =>
          val (pSurf, pCanon) = pickSurface(Gazetteer.persons, draw(Gazetteer.persons.size, convIdx, t.toLong, 2L), mix(convIdx, t.toLong, 3L))
          val (cSurf, cCanon) = pickSurface(Gazetteer.companies, drawCompany(convIdx, t.toLong, 4L), mix(convIdx, t.toLong, 5L))
          lastCompany = Some(cCanon)
          GoldenTurn(
            Turn(convId, t, role, s"$pSurf founded $cSurf in $yr.", None, ts),
            Seq(Triple(pCanon, "FOUNDED", cCanon)))
        case 2 | 3 =>
          val (cSurf, cCanon) = pickSurface(Gazetteer.companies, drawCompany(convIdx, t.toLong, 6L), mix(convIdx, t.toLong, 8L))
          val (prSurf, prCanon) = pickSurface(Gazetteer.products, draw(Gazetteer.products.size, convIdx, t.toLong, 9L), mix(convIdx, t.toLong, 10L))
          val mm = 1 + draw(12, convIdx, t.toLong, 12L)
          val dd = 1 + draw(28, convIdx, t.toLong, 13L)
          lastCompany = Some(cCanon)
          GoldenTurn(
            Turn(convId, t, role, f"$cSurf launched $prSurf on $yr%d-$mm%02d-$dd%02d.", None, ts),
            Seq(Triple(cCanon, "LAUNCHED", prCanon)))
        case 4 =>
          val (pSurf, pCanon) = pickSurface(Gazetteer.persons, draw(Gazetteer.persons.size, convIdx, t.toLong, 14L), mix(convIdx, t.toLong, 15L))
          val (cSurf, cCanon) = pickSurface(Gazetteer.companies, drawCompany(convIdx, t.toLong, 16L), mix(convIdx, t.toLong, 17L))
          lastCompany = Some(cCanon)
          GoldenTurn(
            Turn(convId, t, role, s"$pSurf joined $cSurf.", None, ts),
            Seq(Triple(pCanon, "JOINED", cCanon)))
        case 5 =>
          lastCompany match {
            case Some(cCanon) =>
              val (pSurf, pCanon) = pickSurface(Gazetteer.persons, draw(Gazetteer.persons.size, convIdx, t.toLong, 18L), mix(convIdx, t.toLong, 19L))
              GoldenTurn(
                Turn(convId, t, role, s"$pSurf joined in $yr.", None, ts),
                Seq(Triple(pCanon, "JOINED", cCanon)))
            case None =>
              GoldenTurn(Turn(convId, t, role, noise(draw(noise.size, convIdx, t.toLong, 20L)), None, ts), Nil)
          }
        case 6 =>
          val (oSurf, _) = pickSurface(Gazetteer.operators, draw(Gazetteer.operators.size, convIdx, t.toLong, 21L), mix(convIdx, t.toLong, 22L))
          val batch = draw(1000, convIdx, t.toLong, 23L)
          GoldenTurn(
            Turn(convId, t, "tool", s"Operator $oSurf ran the ingestion for batch $batch.", Some(oSurf), ts),
            Nil) // structural INGESTED_BY edge, validated by QA counts not golden P/R
        case _ =>
          GoldenTurn(Turn(convId, t, role, noise(draw(noise.size, convIdx, t.toLong, 24L)), None, ts), Nil)
      }
    }
  }

  /** Distributed transcript table. */
  def table(spark: SparkSession, numConvs: Long): Dataset[Turn] = {
    import spark.implicits._
    spark.range(numConvs).flatMap(i => conversation(i).map(_.turn))
  }

  /** Golden entity-triple set (driver-side; use only at test scale). */
  def goldenTriples(numConvs: Long): Set[Triple] =
    (0L until numConvs).flatMap(i => conversation(i).flatMap(_.triples)).toSet

  /** Count of operator (tool) turns — each must yield exactly one
    * (Chunk)-[:INGESTED_BY]->(Operator) edge (QA invariant).
    */
  def operatorTurnCount(numConvs: Long): Long =
    (0L until numConvs).map(i => conversation(i).count(_.turn.role == "tool").toLong).sum
}
