package graft.util

/** Human-friendly numeric literal parsing for config/env values (reference:
  * K/M/B block-count literals, crates/cli/src/parse/blocks.rs:325-363).
  * Accepts `12345`, `400k`/`400K`, `1.5M`, `2B` (decimal only with a
  * suffix); underscores are allowed as digit separators (`1_000_000`).
  */
object Parse {

  def count(s: String): Long = {
    val t = s.trim.replace("_", "")
    require(t.nonEmpty, "empty count literal")
    val (numPart, mult) = t.last.toUpper match {
      case 'K' => (t.dropRight(1), 1e3)
      case 'M' => (t.dropRight(1), 1e6)
      case 'B' => (t.dropRight(1), 1e9)
      case _   => (t, 1.0)
    }
    if (mult == 1.0) {
      // no suffix: plain integer only (a bare "1.5" is ambiguous — reject);
      // same non-negativity rule as the suffixed path, so a negative env
      // value fails fast instead of flowing into a job as a doc count
      val v = numPart.toLong
      require(v >= 0, s"count literal '$s' is not a non-negative integer")
      v
    } else {
      val v = numPart.toDouble * mult
      require(v >= 0 && v <= Long.MaxValue.toDouble && v == math.floor(v),
        s"count literal '$s' is not a non-negative integer")
      v.toLong
    }
  }
}
