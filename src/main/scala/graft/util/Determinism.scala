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
    */
  def sha256(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x")
      .mkString
  }
}
