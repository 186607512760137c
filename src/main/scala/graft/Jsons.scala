package graft

/** The one JSON string escaper (Verify's oracle dump and the
  * JdbcUpsert alert report both emit hand-built JSON — the container
  * has no JSON library on the compile classpath, and two private
  * copies of the escape table would drift). */
object Jsons {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
