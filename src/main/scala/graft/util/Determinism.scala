package graft.util

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic hashing helpers. Everything in the engine that needs
  * "randomness" (synthetic data, salting) derives from splitmix64 mixes of a
  * fixed seed so the same inputs always produce byte-identical outputs — the
  * property the reference gets from checksums where it matters
  * (ref:src/fancyrag/kg/pipeline.py:516-565) and that replaces its uuid4 ids.
  */
object Determinism {

  /** splitmix64 finalizer — a strong, allocation-free 64-bit mixer. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Combine several longs into one deterministic hash. */
  def mix(parts: Long*): Long = {
    var h = 0x51ab2ee5d4021a4eL // fixed seed
    parts.foreach { p => h = mix64(h ^ p) }
    h
  }

  /** Non-negative bounded draw. */
  def draw(bound: Int, parts: Long*): Int = {
    require(bound > 0)
    ((mix(parts: _*) >>> 1) % bound).toInt
  }

  /** Hex-encoded SHA-256 — matches Spark's sha2(col, 256) and DuckDB's
    * sha256() so checksums computed driver-side, executor-side, and
    * oracle-side all agree (per-turn text-equality invariant, BASELINE.json).
    *
    * Hot path: this runs once per turn, per chunk (uid + checksum), per doc,
    * and per mention in every build. The original per-byte f"%02x" encoding
    * spent 32 locale-aware String.format calls per digest — a measured
    * multi-second tax across the kg_* queries at sf0.1 (same pathology as
    * Dedup.simhashMd5's token hash) — so the hex encoding is a table lookup
    * and the MessageDigest instance is thread-local instead of re-resolved
    * through the JCA provider per call. Output bytes are unchanged
    * (lowercase hex; DeterminismSpec pins known vectors).
    */
  private val hexDigits = "0123456789abcdef".toCharArray
  private val sha256Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  def sha256(s: String): String = {
    val md = sha256Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
