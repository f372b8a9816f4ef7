package graft

/** One JSON string-escape shared by every hand-rolled artifact writer
  * (Bench's bench line, Verify's oracle_sql.json, VerifyExtras'
  * VERIFY_EXTRAS.json). The artifacts are machine-parsed by the driver —
  * a single unescaped quote/backslash/control char in an interpolated
  * value (e.g. an exotic sfDir path) invalidates the whole file and
  * zeroes the round's result, so every interpolated string goes through
  * here. */
private[graft] object JsonUtil {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
