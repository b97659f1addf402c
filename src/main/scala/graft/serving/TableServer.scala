package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame

import graft.api.GTable

/** Minimal HTTP serving face — the faust `@app.page(path)` views and
  * `@app.table_route(table, match_info)` key routing
  * (`/root/reference/faust/app/base.py:1218-1284`,
  * `faust/web/views.py:30-265`, router `faust/app/router.py:25-77`)
  * collapsed onto one JDK-builtin endpoint (zero new dependencies).
  *
  * Faust routes a key lookup to the worker OWNING the key's partition;
  * here every worker can answer any key — the snapshot (a
  * [[graft.streaming.ChangelogSink.readCompacted]] view or any
  * DataFrame) is partition-pruned/pushed-down storage, not local
  * memory, so there is no ownership to route around. That deletes the
  * router/assignor concepts while keeping the user-facing contract:
  * `GET /table/{name}/{key}` returns the table's row(s) for the key as
  * JSON.
  *
  * `page(path)(handler)` is the `@app.page` analog for custom views.
  *
  * Serving-path only — requests run a driver-side point lookup
  * (pruned scan). Not a data-plane operator; throughput scales with
  * the snapshot's pruning, not with this server.
  */
final class TableServer(port: Int = 0) {

  private case class Route(snapshot: () => DataFrame, keyCol: String,
                           numericKey: Boolean)

  private val tables = TrieMap.empty[String, Route]
  private val pages = TrieMap.empty[String, Map[String, String] => String]

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(null) // serve on the dispatcher thread; point lookups only

  /** Register a queryable table (the `@app.table_route` surface).
    * `numericKey = true` parses the path key segment as Long so the
    * pushed-down predicate matches integer key columns.
    */
  def serveTable(name: String, snapshot: () => DataFrame, keyCol: String,
                 numericKey: Boolean = false): TableServer = {
    tables.put(name, Route(snapshot, keyCol, numericKey))
    this
  }

  /** Register a custom view (the `@app.page` surface): handler gets
    * the query params, returns a response body.
    */
  def page(path: String)(handler: Map[String, String] => String): TableServer = {
    pages.put(path, handler)
    this
  }

  def start(): TableServer = {
    server.createContext("/table/", (ex: HttpExchange) => handleTable(ex))
    pages.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => handlePage(ex, handler))
    }
    server.start()
    this
  }

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handleTable(ex: HttpExchange): Unit =
    try {
      // path: /table/{name}/{key}
      ex.getRequestURI.getPath.stripPrefix("/table/").split("/", 2) match {
        case Array(name, rawKey) if tables.contains(name) && rawKey.nonEmpty =>
          val route = tables(name)
          val key: Any =
            if (route.numericKey) java.lang.Long.parseLong(rawKey) else rawKey
          val rows = GTable.lookup(route.snapshot(), route.keyCol, key)
          if (rows.isEmpty) respond(ex, 404, s"""{"error":"key not found"}""")
          else {
            val fields = rows.head.schema.fieldNames
            val body = rows.map { r =>
              fields.zipWithIndex.map { case (f, i) =>
                val v = r.get(i) match {
                  case null => "null"
                  case n: Number => n.toString
                  case b: Boolean => b.toString
                  case other => "\"" + other.toString
                    .replace("\\", "\\\\").replace("\"", "\\\"") + "\""
                }
                s""""$f":$v"""
              }.mkString("{", ",", "}")
            }.mkString("[", ",", "]")
            respond(ex, 200, body)
          }
        case _ => respond(ex, 404, s"""{"error":"unknown table"}""")
      }
    } catch {
      case e: Exception => respond(ex, 500,
        s"""{"error":"${e.getClass.getSimpleName}"}""")
    }

  private def handlePage(ex: HttpExchange,
                         handler: Map[String, String] => String): Unit =
    try {
      val params = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      respond(ex, 200, handler(params))
    } catch {
      case e: Exception => respond(ex, 500,
        s"""{"error":"${e.getClass.getSimpleName}"}""")
    }
}
