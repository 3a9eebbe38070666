package graft.util

/** The one JSON string escaper for hand-built report/commit JSON.
  * Covers backslash, quote, and ALL control characters below 0x20 —
  * Linux paths may legally contain newlines/tabs, and two hand-rolled
  * escapers that disagreed on control-char coverage already produced one
  * near-miss (an outDir with a raw newline would have emitted an invalid
  * `commits/<id>.json`).
  */
object JsonEsc {

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
