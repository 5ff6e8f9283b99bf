package graft

import graft.util.Determinism
import org.scalatest.funsuite.AnyFunSuite

/** Pins the hot-path hash helpers to their published/reference values, so
  * encoding-level optimizations (table-lookup hex, thread-local digests)
  * cannot silently change a checksum the oracle or the resume manifest
  * depends on.
  */
class DeterminismSpec extends AnyFunSuite {

  test("sha256 matches the published SHA-256 test vectors (lowercase hex)") {
    assert(Determinism.sha256("") ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    assert(Determinism.sha256("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("sha256 equals the per-byte format reference on varied inputs") {
    def reference(s: String): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    }
    val cases = Seq("", "a", "conv-0:3:17", "unicode café 中文", "x" * 10000,
      "line1\nline2\ttab")
    cases.foreach(s => assert(Determinism.sha256(s) == reference(s)))
  }

  test("sha256 is reusable across calls on one thread (thread-local digest)") {
    val a = Determinism.sha256("abc")
    Determinism.sha256("other input")
    assert(Determinism.sha256("abc") == a)
  }
}
