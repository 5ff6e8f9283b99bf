package graft.qa

/** Secret scrubbing for log/report payloads — the engine's analog of the
  * reference's recursive sanitizer (ref:src/cli/sanitizer.py:37-47,106-215):
  * values under sensitive keys are masked, and bearer-token / key-shaped
  * substrings inside free text are redacted. Driver-side pure function (the
  * data plane never carries credentials).
  */
object Sanitizer {

  private val sensitiveKey =
    "(?i).*(api[-_]?key|token|secret|password|credential|authorization).*".r

  private val tokenPatterns = Seq(
    "(?i)bearer\\s+[A-Za-z0-9._\\-]+".r,
    "sk-[A-Za-z0-9]{8,}".r, // key-shaped credentials
    "(?i)basic\\s+[A-Za-z0-9+/=]{16,}".r
  )

  val Mask = "***"

  def scrubText(s: String): String =
    tokenPatterns.foldLeft(s)((acc, p) => p.replaceAllIn(acc, Mask))

  /** Filesystem-safe artifact name (F5): any run of characters outside
    * [A-Za-z0-9_.-] collapses to "-"
    * (ref:src/fancyrag/kg/pipeline.py:614-626).
    */
  def fsSafe(name: String): String = {
    val cleaned = name.replaceAll("[^A-Za-z0-9_.-]+", "-")
    if (cleaned.isEmpty) "artifact" else cleaned
  }

  /** Recursively scrub a nested structure of Map/Seq/String. */
  def scrub(v: Any): Any = v match {
    case m: Map[_, _] =>
      m.map { case (k, value) =>
        val key = String.valueOf(k)
        key -> (if (sensitiveKey.matches(key)) Mask else scrub(value))
      }
    case seq: Seq[_] => seq.map(scrub)
    case s: String   => scrubText(s)
    case other       => other
  }
}
