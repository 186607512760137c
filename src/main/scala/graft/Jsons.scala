package graft

/** The one JSON string escaper (Verify's oracle dump and the
  * JdbcUpsert alert report both emit hand-built JSON — the container
  * has no JSON library on the compile classpath, and two private
  * copies of the escape table would drift). */
object Jsons {
  /** Fixed-decimal JSON number — Locale.ROOT always, since a JVM in a
    * comma-decimal locale (de_DE, fr_FR) would render `0,62` and
    * corrupt the document (the driver's json.load failing silently
    * zeroes the round's signal). Shared by Bench's per-query seconds
    * and Verify's recall artifact. */
  def num(v: Double, decimals: Int): String =
    // NaN/Infinity have no JSON spelling; `null` keeps the document
    // parseable instead of corrupting the whole artifact
    if (java.lang.Double.isFinite(v))
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
    else "null"

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
