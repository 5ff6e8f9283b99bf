package graft.chunk

import graft.extract.Extractor
import graft.model.{ChunkProfile, Mention}
import graft.util.Determinism
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.storage.StorageLevel

/** Fused per-conversation pass: ONE shuffle (groupByKey on conv_id) computes
  * everything that is a pure function of a single conversation —
  * document assembly, chunking with offsets, turn→chunk assignment,
  * per-turn checksums, mention detection, and relation candidates with the
  * cross-turn anaphora resolved sequentially (the window rule W2 becomes a
  * running variable inside the sorted group).
  *
  * Before this fusion the same work took 5 separate exchanges of the full
  * turn set (documents groupBy, offsets window, turn→chunk range join,
  * anaphora window, checksum projection's downstream shuffle); at 2→8-core
  * scaling the shuffle fraction dominated. A conversation is a bounded unit
  * (BASELINE.json: long-conversation skew is handled by this boundedness plus
  * AQE), so the group fits in memory by construction.
  */
object ConvStage {

  final case class ChunkOut(
      chunk_uid: String, seq: Int, index: Int, text: String,
      checksum: String, start: Int, end: Int, turn_idxs: Seq[Int])

  final case class RelOut(
      turn_idx: Int, subj_norm: String, pred: String, obj_norm: String,
      chunk_uid: String) // chunk containing the supporting turn — free here,
                         // a (conv_id, turn_idx) shuffle join downstream

  final case class TurnChecksum(turn_idx: Int, checksum: String)

  /** A mention plus the chunk containing its turn — the same "provenance
    * rides out of the fused pass" trick RelOut uses: with the chunk_uid
    * attached HERE, entity-provenance aggregation downstream never joins
    * mentions back to a turn→chunk table (at 5.5M turns that join shuffled
    * two turn-scale tables on (conv_id, turn_idx)).
    */
  final case class MentionOut(m: Mention, chunk_uid: String)

  final case class ConvArtifacts(
      conv_id: String,
      n_turns: Int,
      doc_checksum: String,
      chunks: Seq[ChunkOut],
      mentions: Seq[MentionOut],
      rels: Seq[RelOut],
      turn_checksums: Seq[TurnChecksum],
      candidates: Seq[MentionOut]) // out-of-dictionary candidate mentions (X5)

  /** Pure per-conversation computation (unit-testable without Spark). */
  def perConversation(convId: String, turnsUnsorted: Seq[(Int, String)],
      profile: ChunkProfile): ConvArtifacts = {
    val turns = turnsUnsorted.sortBy(_._1)
    // ---- assembly + offsets (turns joined by "\n") ----
    val sb = new StringBuilder
    val offsets = new Array[Int](turns.size)
    var i = 0
    turns.foreach { case (_, text) =>
      offsets(i) = sb.length
      sb.append(text)
      sb.append('\n')
      i += 1
    }
    if (sb.nonEmpty) sb.setLength(sb.length - 1) // no trailing joiner
    val doc = sb.toString

    // ---- chunking ----
    val raw = Chunker.split(doc, profile.chunkSize, profile.overlap, profile.approximate)

    // ---- turn -> chunk assignment (first chunk covering the turn's start) --
    val assigned = Array.fill(turns.size)(-1)
    var ti = 0
    raw.foreach { rc =>
      while (ti < turns.size && offsets(ti) >= rc.start && offsets(ti) < rc.end) {
        assigned(ti) = rc.index
        ti += 1
      }
    }
    val chunkOuts = raw.map { rc =>
      val turnIdxs = turns.indices.collect {
        case k if assigned(k) == rc.index => turns(k)._1
      }
      ChunkOut(Chunker.chunkUid(convId, rc.index, rc.text), rc.index + 1,
        rc.index, rc.text, Determinism.sha256(rc.text), rc.start, rc.end, turnIdxs)
    }

    // ---- extraction + sequential anaphora (streaming-identical semantics) --
    // turn -> covering chunk uid, for relation provenance (already assigned
    // above; carrying it here saves downstream (conv_id, turn_idx) joins)
    val chunkOfTurn: Map[Int, String] = turns.indices.collect {
      case k if assigned(k) >= 0 => turns(k)._1 -> chunkOuts(assigned(k)).chunk_uid
    }.toMap
    val mentions = Seq.newBuilder[MentionOut]
    val rels = Seq.newBuilder[RelOut]
    val candidates = Seq.newBuilder[MentionOut]
    var lastCompany: Option[String] = None
    turns.foreach { case (turnIdx, text) =>
      val e = Extractor.extractTurn(convId, turnIdx, text)
      val cuid = chunkOfTurn.getOrElse(turnIdx, null)
      mentions ++= e.mentions.map(MentionOut(_, cuid))
      candidates ++= e.candidates.map(MentionOut(_, cuid))
      val companyHere = e.mentions.filter(_.label == "Company")
        .sortBy(_.begin).lastOption.map(_.norm)
      e.rels.foreach { r =>
        val obj = if (r.anaphora) lastCompany else r.obj_norm
        obj.foreach(o => rels += RelOut(turnIdx, r.subj_norm, r.pred, o,
          chunkOfTurn.getOrElse(turnIdx, null)))
      }
      if (companyHere.isDefined) lastCompany = companyHere
    }

    val checksums = turns.map { case (idx, text) =>
      TurnChecksum(idx, Determinism.sha256(text))
    }
    ConvArtifacts(convId, turns.size, Determinism.sha256(doc),
      chunkOuts, mentions.result(), rels.result(), checksums, candidates.result())
  }

  /** Distributed fused pass; persisted because five downstream tables explode
    * different fields of it.
    */
  def artifacts(turns: DataFrame, profile: ChunkProfile): Dataset[ConvArtifacts] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      // null text ≡ empty text, normalized at THIS single boundary: every
      // per-conversation consumer (assembly, chunker, extractor, checksums)
      // assumes non-null, and real transcript logs do carry null rows.
      // QaEvaluator.checksumMismatches applies the same coalesce so the
      // stored sha256("") round-trips.
      .select(col("conv_id"), col("turn_idx"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(String, Int, String)]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        Iterator.single(perConversation(conv, it.map(t => (t._2, t._3)).toSeq, profile))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
  }
}
