package graft.serve

import java.net.URLDecoder
import com.sun.net.httpserver.HttpExchange
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The request/response plumbing shared by the HTTP facades
  * ([[HttpServe]], [[IntakeServe]]): query-param parsing, the
  * try→200/400/500 dispatch with JSON content type and the wildcard
  * CORS grant, JSON string escaping, and the plain JSON-array body
  * rendering. One place, so a fix to any of it (error mapping,
  * headers, escaping) cannot silently diverge between facades.
  */
private[serve] object Facade {

  def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  /** The shared escaper ([[graft.Jsons.escape]]) under the facade's
    * local name — every hand-rendered body here routes through it.
    */
  def jsonEscape(s: String): String = graft.Jsons.escape(s)

  def handle(ex: HttpExchange)(body: Map[String, String] => String): Unit = {
    val (code, bytes) =
      try (200, body(params(ex)).getBytes("UTF-8"))
      catch {
        // client errors → 400: a missing param (Map.apply), a
        // non-numeric/badly-shaped param (toLong/toFloat/toInt), or
        // invalid %-encoding (URLDecoder) are all the caller's input,
        // not a server fault
        case e: NoSuchElementException =>
          (400, s"""{"error":"missing parameter: ${jsonEscape(
            Option(e.getMessage).getOrElse(""))}"}""".getBytes("UTF-8"))
        case e @ (_: NumberFormatException | _: IllegalArgumentException) =>
          (400, s"""{"error":"bad request: ${jsonEscape(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))}"}"""
            .getBytes("UTF-8"))
        // a DP budget refusal (DpLedger.charge, the charge-then-release
        // wrapper) is neither a client fault nor a server fault — it is
        // the privacy policy answering "not anymore": 429, message
        // included (the ledger's refusal line carries only public
        // schedule state — spent/proposed/budget — never data). Matched
        // by TYPE so an unrelated IllegalStateException (a writer-path
        // fault) still reads as the 500 it is, and a refusal-message
        // rewording cannot silently break the 429 contract.
        case e: graft.operators.DpLedger.BudgetRefused =>
          (429, s"""{"error":"${jsonEscape(
            Option(e.getMessage).getOrElse("refused"))}"}""".getBytes("UTF-8"))
        case e: Exception =>
          (500, s"""{"error":"${jsonEscape(e.getClass.getSimpleName)}"}"""
            .getBytes("UTF-8"))
      }
    ex.getResponseHeaders.set("Content-Type", "application/json")
    // flask_cors.CORS(app) parity (sample/main.py:11): browser clients
    // of the sample API rely on the wildcard CORS grant
    ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Rows as one well-formed JSON array. Null-valued fields are KEPT
    * (`"quality_score":null`) — Spark's to_json drops them by default,
    * which made a field's presence depend on its value and broke
    * clients indexing into the object (and diverged from the
    * hand-rendered endpoints, which emit explicit nulls).
    */
  def arrayJson(df: DataFrame): String =
    df.select(to_json(struct(df.columns.map(col): _*),
        java.util.Collections.singletonMap("ignoreNullFields", "false")))
      .as[String](Encoders.STRING)
      .collect()
      .mkString("[", ",", "]")
}
