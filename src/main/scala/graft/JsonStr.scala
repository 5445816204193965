package graft

/** JSON string escaping shared by the driver-contract mains
  * (Verify / VerifyOne / Bench): backslash, quote, and ALL control chars
  * (<0x20) — a tab or CR in builder-authored SQL or a multiline error
  * message must never make the driver's `json.load` fail. ONE copy, so a
  * fix to a missed edge cannot leave a second main emitting unparseable
  * output (the r10 single-line-output failure mode). */
private[graft] object JsonStr {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
