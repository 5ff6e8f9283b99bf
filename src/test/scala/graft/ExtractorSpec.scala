package graft

import graft.extract.{Extractor, Gazetteer}
import org.scalatest.funsuite.AnyFunSuite

/** Golden extraction tests on sentences modeled after the reference corpus
  * (ref:sample.txt:1, ref:docs/samples/pilot.txt:1).
  */
class ExtractorSpec extends AnyFunSuite {

  test("founded pattern -> FOUNDED triple candidate") {
    val e = Extractor.extractTurn("c", 1, "Alice Nguyen founded Acme Corp in 2012.")
    assert(e.mentions.map(_.label) == Seq("Person", "Company"))
    assert(e.rels.size == 1)
    val r = e.rels.head
    assert(r.pred == "FOUNDED" && r.subj_norm == "alice nguyen" && r.obj_norm == Some("acme corp"))
  }

  test("launched pattern -> LAUNCHED (pilot.txt shape)") {
    val e = Extractor.extractTurn("c", 1, "Acme Corp launched GraphRAG Pilot on 2024-03-01.")
    assert(e.rels == Seq(Extractor.RelCand("c", 1, "acme corp", "LAUNCHED", Some("graphrag pilot"), false)))
  }

  test("joined with explicit company -> JOINED") {
    val e = Extractor.extractTurn("c", 2, "Bob Marsh joined Globex Inc.")
    assert(e.rels.head.pred == "JOINED")
    assert(e.rels.head.obj_norm == Some("globex inc"))
  }

  test("anaphoric joined -> JOINED with no object, flagged") {
    val e = Extractor.extractTurn("c", 3, "Bob Marsh joined in 2015.")
    assert(e.rels == Seq(Extractor.RelCand("c", 3, "bob marsh", "JOINED", None, true)))
  }

  test("longest surface wins (Acme Corporation, not Acme)") {
    val e = Extractor.extractTurn("c", 1, "Ada Lovelace founded Acme Corporation in 1999.")
    assert(e.mentions.map(_.surface) == Seq("Ada Lovelace", "Acme Corporation"))
    assert(e.rels.head.obj_norm == Some("acme corporation"))
  }

  test("no false positives inside words or noise") {
    val e = Extractor.extractTurn("c", 1, "The weather outside was unremarkable today.")
    assert(e.mentions.isEmpty && e.rels.isEmpty)
    val e2 = Extractor.extractTurn("c", 1, "Macmeta is not ACMEish.")
    assert(e2.mentions.isEmpty)
  }

  test("operator turn -> Operator mention, no relation candidate") {
    val e = Extractor.extractTurn("c", 4, "Operator etl-daemon ran the ingestion for batch 7.")
    assert(e.mentions.map(_.label) == Seq("Operator"))
    assert(e.rels.isEmpty)
  }

  test("mention offsets are exact") {
    val t = "Say hi to Grace Hopper today."
    val e = Extractor.extractTurn("c", 1, t)
    val m = e.mentions.head
    assert(t.substring(m.begin, m.end) == "Grace Hopper")
  }

  test("normalization collapses case and whitespace") {
    assert(Gazetteer.normalize("  Acme    Corp ") == "acme corp")
  }

  test("fast scanner is equivalent to the alternation regex on the corpus") {
    // every turn of 25 seeded conversations + adversarial edge cases
    val corpus =
      (0L until 25L).flatMap(c => graft.source.TranscriptGen.conversation(c).map(_.turn))
        .map(t => (t.conv_id, t.turn_idx, t.text)) ++ Seq(
        ("x", 0, "Acme"), ("x", 1, "Acme Corp"), ("x", 2, "Acme Corporation!"),
        ("x", 3, "AcmeCorp"), ("x", 4, "xAcme Corp"), ("x", 5, "Acme Corpx"),
        ("x", 6, "etl-daemon ran"), ("x", 7, "the etl-daemonX ran"),
        ("x", 8, "Acme Corp Acme"), ("x", 9, ""), ("x", 10, "Globex Inc."),
        ("x", 11, "Globex Inc Globex International Globex"),
        ("x", 12, "ACME ACMEish ACME."), ("x", 13, "Vault-Tec or Vault Tec"),
        ("x", 14, "Monsters Inc and Monsters Incorporated"))
    corpus.foreach { case (c, t, text) =>
      val fast = Extractor.extractTurn(c, t, text).mentions
      val slow = Extractor.regexMentions(c, t, text)
      assert(fast == slow, s"mismatch on '$text': fast=$fast slow=$slow")
    }
  }

  test("candidate scan finds capitalized runs, skips gazetteer overlaps and single words") {
    val e = Extractor.extractTurn("c", 0,
      "Alice Nguyen met Quantum Dynamics near The Hague. Nothing else here.")
    assert(e.candidates.map(_.surface) == Seq("Quantum Dynamics", "The Hague"),
      e.candidates.map(_.surface).toString)
    assert(e.mentions.exists(_.norm == "alice nguyen"),
      "gazetteer surface must stay a mention, not a candidate")
    // offsets point at the matched substring
    e.candidates.foreach { m =>
      assert("Alice Nguyen met Quantum Dynamics near The Hague. Nothing else here."
        .substring(m.begin, m.end) == m.surface)
    }
    // single capitalized words and punctuation-broken runs don't qualify
    val e2 = Extractor.extractTurn("c", 1, "Weather today. Report: Summary, Notes")
    assert(e2.candidates.isEmpty, e2.candidates.toString)
  }
}
