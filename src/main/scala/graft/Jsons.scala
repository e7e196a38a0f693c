package graft

/** RFC 8259 JSON string escaping — the ONE spelling every hand-rendered
  * JSON body uses (the serve facades' error/row bodies, the alert
  * transports' webhook payloads), so an escaping fix cannot silently
  * diverge between them. The common shorthands are emitted for
  * readability; all other control characters go to `\u00XX`.
  */
object Jsons {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  }
}
