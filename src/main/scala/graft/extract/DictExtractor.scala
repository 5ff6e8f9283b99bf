package graft.extract

import graft.model.Mention
import graft.util.Determinism

/** Dictionary-driven mention scanner + same-turn relation rules, parametrized
  * by a closed extraction schema — the engine's configurable analog of the
  * reference's schema-driven LLM extractor (the closed node/relationship/
  * pattern world of ref:scripts/config/kg_schema.json:1-22 consumed at
  * ref:src/fancyrag/kg/pipeline.py:437-465).
  *
  * @param entries (surface, norm, label) dictionary rows. Matching is
  *                longest-surface-first at each word start, non-overlapping,
  *                with ASCII-alnum boundaries — O(words) via a first-word hash
  *                lookup instead of an NFA over the alternation (the
  *                extraction pass dominates pipeline cost at scale).
  * @param rules   ((subjLabel, connectorText, objLabel) -> predicate):
  *                consecutive mention pairs whose trimmed gap text equals
  *                connectorText emit a relation candidate.
  *
  * Serializable: instances are constructed driver-side and shipped into
  * mapPartitions tasks; the compiled lookup structures are @transient lazy so
  * each executor builds them once.
  */
final class DictExtractor(
    val entries: Seq[(String, String, String)],
    val rules: Map[(String, String, String), String]
) extends Serializable {

  @transient private lazy val surfaceToEntry: Map[String, (String, String)] =
    entries.map(e => e._1 -> (e._2, e._3)).toMap

  /** first-alnum-run -> candidate surfaces (longest first). */
  @transient private lazy val byFirstWord: Map[String, Array[String]] =
    surfaceToEntry.keys.toSeq
      .groupBy(_.takeWhile(DictExtractor.isWordChar))
      .map { case (fw, ss) => fw -> ss.sortBy(-_.length).toArray }

  def scanMentions(convId: String, turnIdx: Int, text: String): Seq[Mention] = {
    import DictExtractor.isWordChar
    val ms = Seq.newBuilder[Mention]
    val n = text.length
    var i = 0
    while (i < n) {
      if (isWordChar(text.charAt(i)) && (i == 0 || !isWordChar(text.charAt(i - 1)))) {
        // word start: extract the first alnum run
        var e = i
        while (e < n && isWordChar(text.charAt(e))) e += 1
        val fw = text.substring(i, e)
        var matched = false
        byFirstWord.get(fw) match {
          case Some(cands) =>
            var c = 0
            while (c < cands.length && !matched) {
              val s = cands(c)
              val end = i + s.length
              if (end <= n && text.startsWith(s, i) &&
                (end == n || !isWordChar(text.charAt(end)))) {
                val (norm, label) = surfaceToEntry(s)
                val id = Determinism.sha256(s"$convId:$turnIdx:$i").take(16)
                ms += Mention(conv_id = convId, turn_idx = turnIdx, mention_id = id,
                  surface = s, norm = norm, label = label, begin = i, end = end)
                i = end
                matched = true
              }
              c += 1
            }
          case None => ()
        }
        if (!matched) i = e // no match can start inside this alnum run
      } else i += 1
    }
    ms.result()
  }

  /** Same-turn relation candidates: consecutive mention pairs whose trimmed
    * connector text matches a rule.
    */
  def sameTurnRels(convId: String, turnIdx: Int, text: String,
      mentions: Seq[Mention]): Seq[Extractor.RelCand] = {
    val out = Seq.newBuilder[Extractor.RelCand]
    mentions.sliding(2).foreach {
      case Seq(a, b) =>
        val gap = text.substring(a.end, math.max(a.end, b.begin)).trim
        rules.get((a.label, gap, b.label)).foreach { pred =>
          out += Extractor.RelCand(convId, turnIdx, a.norm, pred, Some(b.norm), anaphora = false)
        }
      case _ => ()
    }
    out.result()
  }
}

object DictExtractor {
  @inline def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
}
