package graft.serve

import java.net.URLDecoder
import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The request/response plumbing shared by the HTTP facades
  * ([[HttpServe]], [[IntakeServe]]): query-param parsing, the
  * try→200/400/500 dispatch with JSON content type and the wildcard
  * CORS grant, and the plain JSON-array body rendering. One place, so
  * a fix to any of it (error mapping, headers, escaping) cannot
  * silently diverge between facades.
  */
private[serve] object Facade {

  def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  def handle(ex: HttpExchange)(body: Map[String, String] => String): Unit = {
    val (code, bytes) =
      try (200, body(params(ex)).getBytes("UTF-8"))
      catch {
        case e: NoSuchElementException =>
          (400, s"""{"error":"missing parameter: ${e.getMessage}"}""".getBytes("UTF-8"))
        case e: Exception =>
          (500, s"""{"error":"${e.getClass.getSimpleName}"}""".getBytes("UTF-8"))
      }
    ex.getResponseHeaders.set("Content-Type", "application/json")
    // flask_cors.CORS(app) parity (sample/main.py:11): browser clients
    // of the sample API rely on the wildcard CORS grant
    ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Rows as one well-formed JSON array. */
  def arrayJson(df: DataFrame): String =
    df.select(to_json(struct(df.columns.map(col): _*)))
      .as[String](Encoders.STRING)
      .collect()
      .mkString("[", ",", "]")
}
