package graft.app

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal dependency-free HTTP serving face of the query path (R6): the
  * reference exposes `search`/`fetch` tools over MCP/HTTP
  * (ref:src/fancyrag/mcp/runtime.py:353-417); this serves the same two
  * operations from the JDK's built-in HttpServer, so the engine is
  * reachable over the wire without adding a single library. The server is a
  * thin single-node front — Spark behind it is the part that scales; in
  * production N stateless replicas of this front share one long-lived
  * session each.
  *
  *   GET /health                          -> {"status":"ok"}
  *   GET /ask?q=<question>&k=<n>&semantic=<bool>  -> JSON array of matches
  *   GET /fetch?id=<node id>              -> node row (embedding stripped)
  *
  * Usage: runMain graft.app.AskServer --graph /tmp/kg --port 8080
  */
object AskServer {

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Start the server (port 0 = ephemeral; read the bound port off the
    * returned server). One Spark session serves every request.
    */
  def start(spark: SparkSession, graphDir: String, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/ask", (ex: HttpExchange) =>
      try {
        val p = params(ex)
        val q = p.getOrElse("q", "")
        if (q.isEmpty) respond(ex, 400, """{"error":"missing q"}""")
        else {
          val k = p.get("k").map(_.toInt).getOrElse(5)
          val semantic = p.get("semantic").forall(_.toBoolean)
          val rows = AskMain.ask(spark, graphDir, q, k, semantic)
            .orderBy(col("score").desc).collect()
          val items = rows.map { r =>
            val sem =
              if (semantic && !r.isNullAt(r.fieldIndex("semantic_nodes")))
                r.getSeq[String](r.fieldIndex("semantic_nodes"))
                  .map(jsonEscape).mkString("[\"", "\",\"", "\"]")
              else "[]"
            s"""{"chunk_uid":"${r.getAs[String]("chunk_uid")}",""" +
              s""""score":${r.getAs[Double]("score")},""" +
              s""""document":"${jsonEscape(Option(r.getAs[String]("document")).getOrElse(""))}",""" +
              s""""semantic_nodes":$sem}"""
          }
          respond(ex, 200,
            s"""{"question":"${jsonEscape(q)}","matches":${items.mkString("[", ",", "]")}}""")
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
      })
    server.createContext("/fetch", (ex: HttpExchange) =>
      try {
        val p = params(ex)
        p.get("id") match {
          case None => respond(ex, 400, """{"error":"missing id"}""")
          case Some(id) =>
            val nodes = graft.materialize.Materializer.mergeRows(
              spark.read.parquet(s"$graphDir/nodes"), Seq("id"))
            val rows = graft.operators.Retrieval.fetchById(nodes, id)
              .select("id", "labels", "name").collect()
            val items = rows.map { r =>
              s"""{"id":"${jsonEscape(r.getAs[String]("id"))}",""" +
                s""""labels":${r.getSeq[String](1).map(jsonEscape).mkString("[\"", "\",\"", "\"]")},""" +
                s""""name":"${jsonEscape(r.getAs[String]("name"))}"}"""
            }
            respond(ex, 200, items.mkString("[", ",", "]"))
        }
      } catch {
        case e: Throwable =>
          respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
      })
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val a = KgBuildMain.parseArgs(args)
    val graphDir = a.getOrElse("graph", "/tmp/graft-kg-out")
    val port = a.get("port").map(_.toInt).getOrElse(8080)
    val spark = SparkSession.builder()
      .config("spark.master",
        sys.props.getOrElse("spark.master", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .appName("graft-ask-server")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark, graphDir, port)
    println(s"""{"serving":"http://localhost:${server.getAddress.getPort}","graph":"$graphDir"}""")
    Thread.currentThread.join() // serve until killed
  }
}
