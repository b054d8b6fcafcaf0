package graft

/** Minimal JSON output helpers for the mains' metric/manifest lines. */
object Json {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in interpolated content would otherwise make any
    * json.loads consumer fail. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
