package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting. All built from codegen'd
  * builtins (no UDFs) so they run inside whole-stage codegen at scan speed.
  */
object TextAnalysis {

  /** Tiny high-frequency stopword lists per language (function-word n-gram
    * heuristic). Deliberately small: the signal is the RATIO of hits, not
    * coverage.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"),
    "es" -> Seq("el", "la", "los", "que", "es", "una", "por", "con", "para", "del")
  )

  // ASCII token classes only: the DuckDB oracle's RE2 lacks \uXXXX escapes,
  // so both engines share this exact pattern for value parity.
  private def tokens(textCol: Column): Column =
    split(lower(textCol), "[^a-z0-9']+")

  /** Stopword-hit count for one language over a tokens array. */
  def stopwordHits(toks: Column, lang: String): Column =
    aggregate(
      transform(toks, t =>
        when(t.isin(stopwords(lang): _*), 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** Language ID: argmax over per-language stopword-hit ratios; "und"
    * (undetermined) when nothing scores.
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    // one tokenize feeds all four language scorers (attribute reference, so
    // the per-language transforms don't each re-run the regex split)
    val toks = col("__lid_toks")
    val scored = stopwords.keys.toSeq.sorted.map { l =>
      struct(stopwordHits(toks, l).as("hits"), lit(l).as("lang"))
    }
    df.withColumn("__lid_toks", tokens(col(textCol)))
      .withColumn("lang_scores", array(scored: _*))
      .drop("__lid_toks")
      .withColumn("best", array_max(col("lang_scores")))
      .withColumn("lang_pred",
        when(col("best.hits") > 0, col("best.lang")).otherwise(lit("und")))
      .drop("lang_scores", "best")
  }

  /** Quality features + composite score: length, alpha ratio, punctuation
    * ratio, digit ratio, mean word length, stopword ratio (en). The composite
    * is a fixed linear blend — a deterministic analog of fasttext-style
    * quality classifiers used in corpus curation.
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    val alpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?'\"()-]", "")).cast("double")
    val digit = length(regexp_replace(t, "[^0-9]", "")).cast("double")
    val toks = col("__q_toks") // single tokenize, see withLangId
    val nToks = size(filter(toks, x => length(x) > 0)).cast("double")
    val sw = stopwordHits(toks, "en").cast("double")
    df.withColumn("__q_toks", tokens(t))
      .withColumn("n_chars", len.cast("long"))
      .withColumn("n_tokens", nToks.cast("long"))
      .withColumn("alpha_ratio", round(alpha / greatest(len, lit(1.0)), 6))
      .withColumn("punct_ratio", round(punct / greatest(len, lit(1.0)), 6))
      .withColumn("digit_ratio", round(digit / greatest(len, lit(1.0)), 6))
      .withColumn("stopword_ratio", round(sw / greatest(nToks, lit(1.0)), 6))
      // integer micro-units: floor(x*1e6 + 0.5) is bit-deterministic across
      // engines (round() half-up differs at double .5 boundaries)
      .withColumn("quality_score_ppm", floor(
        (least(nToks / 100.0, lit(1.0)) * 0.3 +
          col("alpha_ratio") * 0.3 +
          col("stopword_ratio") * 2.0 * 0.2 +
          (lit(1.0) - least(col("digit_ratio") * 5, lit(1.0))) * 0.2) * 1e6 + 0.5)
        .cast("long"))
      .drop("__q_toks")
  }

  /** Token counts: whitespace tokens and a BPE-ish estimate
    * (word pieces of <=4 chars + ceil(len/4) fallback, the reference's
    * estimate, ref:src/fancyrag/qa/evaluator.py:352-358).
    */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = size(filter(split(t, "\\s+"), x => length(x) > 0))
    // BPE-ish: alnum runs contribute ceil(len/4) pieces, other non-space
    // chars one piece each
    val pieces = aggregate(
      filter(split(t, "\\s+"), x => length(x) > 0),
      lit(0L),
      (acc, w) => acc +
        ceil(length(regexp_replace(w, "[^a-zA-Z0-9]", "")).cast("double") / 4).cast("long") +
        length(regexp_replace(w, "[a-zA-Z0-9]", "")).cast("long"))
    df.withColumn("n_ws_tokens", ws.cast("long"))
      .withColumn("n_bpe_tokens", pieces)
      .withColumn("n_est_tokens", greatest(lit(1), ceil(length(t) / 4)).cast("long"))
  }

  /** Rolling-hash document fingerprint (winnowing-lite): min xxhash64 over
    * all w-length character windows sampled via the token stream. Cheap,
    * order-sensitive, collision-resistant enough for grouping near-identical
    * boilerplate.
    */
  def withFingerprint(df: DataFrame, textCol: String, window: Int = 8): DataFrame = {
    // tokens are materialized through a projection first: HOF lambdas run
    // interpreted, and slice(toks, …) against a non-attribute `toks` inside
    // the per-window lambda re-runs the regex split once PER WINDOW — O(L²)
    // splits per row (same finding as Dedup.tokArray, measured 6x there)
    val toks = filter(split(lower(col(textCol)), "\\s+"), x => length(x) > 0)
    val tk = col("__fp_toks")
    val windows = transform(
      sequence(lit(0), greatest(size(tk) - window, lit(0))),
      i => xxhash64(array_join(slice(tk, i + 1, lit(window)), " ")))
    df.withColumn("__fp_toks", toks)
      .withColumn("fingerprint",
        when(size(tk) === 0, lit(0L)).otherwise(array_min(windows)))
      .drop("__fp_toks")
  }

  /** CCNet-style boilerplate-line removal: drop every LINE whose exact text
    * occurs in more than maxDf documents across the corpus (headers,
    * footers, nav chrome dominate crawled corpora; per-doc repeats count
    * once toward df). Returns (id, clean_text, n_kept_lines,
    * n_dropped_lines) for EVERY input doc — a doc whose lines are all
    * boilerplate keeps an empty clean_text rather than vanishing.
    *
    * Scale shape: posexplode → line-df groupBy (a vocab-sized aggregate
    * joined back, the same pattern as the n-gram df — never a window over
    * the full posting) → reassembly via sort_array(collect_list(struct)).
    * The df join is unhinted: AQE broadcasts the frequent-line table while
    * it is small and shuffles when the line vocabulary doesn't fit.
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int = 2): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val lineDf = lines.select("id", "line").distinct()
      .groupBy("line").agg(count(lit(1)).as("__df"))
    val kept = lines.join(lineDf, Seq("line")).filter(col("__df") <= maxDf)
    val rebuilt = kept.groupBy("id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_kept_lines"))
    df.select(col(idCol).as("id"),
      size(split(col(textCol), "\n", -1)).cast("long").as("__n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"),
        (col("__n_lines") - coalesce(col("n_kept_lines"), lit(0L))).as("n_dropped_lines"))
  }

  /** Same winnowing-lite fingerprint with an md5 window hash (hex-string min)
    * instead of xxhash64: md5 exists in both Spark and DuckDB, so this
    * variant is value-verifiable by the SQL oracle. Prefer [[withFingerprint]]
    * (xxhash64, no allocation) on the 100 TB path.
    */
  def withFingerprintMd5(df: DataFrame, textCol: String, window: Int = 8): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "\\s+"), x => length(x) > 0)
    val tk = col("__fp_toks") // see withFingerprint: lambda re-evaluation
    val windows = transform(
      sequence(lit(0), greatest(size(tk) - window, lit(0))),
      i => md5(array_join(slice(tk, i + 1, lit(window)), " ")))
    df.withColumn("__fp_toks", toks)
      .withColumn("fingerprint",
        when(size(tk) === 0, lit("0")).otherwise(array_min(windows)))
      .drop("__fp_toks")
  }
}
