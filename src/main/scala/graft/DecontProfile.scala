package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic (not driver contract): decomposes the decontamination
  * query's cost at a given SF — gram construction (string vs hashed chain),
  * eval-side distinct, the contamination join — to locate the dominant
  * stage behind the q_decontaminate/_hashed bench numbers.
  */
object DecontProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dprof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val toks = filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)
    val n = 8
    val sgrams = array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    val th = transform(toks, t => xxhash64(t))
    val hgrams = array_distinct(
      transform(sequence(lit(0), greatest(size(th) - n, lit(0))),
        i => aggregate(slice(th, i + 1, lit(n)), lit(42L), (acc, h) => xxhash64(acc, h))))
    val sgramsOf = (t: org.apache.spark.sql.Column) => array_distinct(
      transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
    val hgramsOf = (t: org.apache.spark.sql.Column) => {
      array_distinct(
        transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
          i => aggregate(slice(t, i + 1, lit(n)), lit(42L), (acc, h) => xxhash64(acc, h))))
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("tokenize only")(docs.select(size(toks).as("n")).agg(sum("n")).head.getLong(0))
      time("string grams build")(docs.select(size(sgrams).as("n")).agg(sum("n")).head.getLong(0))
      time("hashed grams build")(docs.select(size(hgrams).as("n")).agg(sum("n")).head.getLong(0))
      time("string explode+count")(docs.select(explode(sgrams).as("g")).count())
      time("hashed explode+count")(docs.select(explode(hgrams).as("g")).count())
      time("string 2step build")(docs.select(toks.as("__toks"))
        .select(size(sgramsOf(col("__toks"))).as("n")).agg(sum("n")).head.getLong(0))
      time("hashed 2step build")(docs.select(transform(toks, t => xxhash64(t)).as("__th"))
        .select(size(hgramsOf(col("__th"))).as("n")).agg(sum("n")).head.getLong(0))
      time("string full query")(graft.operators.Dedup.ngramContamination(
        docs, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 8).count())
      time("hashed full query")(graft.operators.Dedup.ngramContamination(
        docs, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 8,
        hashGrams = true).count())
    }
    spark.stop()
  }
}
