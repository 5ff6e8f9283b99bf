package graft

import java.nio.file.{Files, Paths}

/** Scratch diagnostics (not part of the driver contract; Bench.scala is the
  * frozen harness of record). Per-query noop-sink isolation (guide §1.4: the
  * noop write computes every column of every row without paying a sink) with
  * N warm in-JVM repetitions, plus optional formatted-plan dumps for the
  * plans/r06 deliverable.
  *
  * Usage:
  *   runMain graft.BenchExtra [--reps N] [--plans <dir> <suffix>] [query...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var reps = 3
    var plansDir: Option[String] = None
    var plansSuffix = "before"
    val confs = scala.collection.mutable.ArrayBuffer[String]()
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plansDir = Some(args(i + 1)); plansSuffix = args(i + 2); i += 3
        case "--conf" => confs += args(i + 1); i += 2
        case q => names += q; i += 1
      }
    }
    val spark = Bench.buildSession(cpus)
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    spark.sparkContext.setLogLevel("WARN")
    val sel = if (names.nonEmpty) names.toSeq else SparkEntry.queries.keys.toSeq.sorted
    plansDir.foreach(d => Files.createDirectories(Paths.get(d)))
    sel.foreach { name =>
      val fn = SparkEntry.queries(name)
      plansDir.foreach { d =>
        val df = fn(spark, sfDir)
        Files.write(Paths.get(d, s"${name}_$plansSuffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes("UTF-8"))
        spark.catalog.clearCache()
      }
      val ts = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"$name rep$r")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"[bx] $name FAILED: ${e.getMessage.take(200)}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(null)
        dt
      }
      println(f"[bx] $name%-28s min=${ts.min}%7.2f s  trail=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
