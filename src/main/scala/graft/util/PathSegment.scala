package graft.util

/** The ONE path-segment allowlist used everywhere a user-supplied string
  * becomes part of an on-disk path (export subdirs, pipeline chunk labels,
  * multi-output names): `[A-Za-z0-9._-]+`, not a dot-segment. Allowlist
  * rather than blocklist — a blocklist was both over-inclusive (rejected
  * 'v1..v2') and under-inclusive (passed backslashes). Keep every caller
  * on this helper so a future tightening cannot silently diverge the
  * path-safety checks.
  */
object PathSegment {

  def isValid(s: String): Boolean =
    s.matches("[A-Za-z0-9._-]+") && s != "." && s != ".."

  /** Throws IllegalArgumentException (via require) when invalid; `what`
    * names the offending parameter in the message.
    */
  def validate(s: String, what: String): Unit =
    require(isValid(s),
      s"$what must be one path segment of [A-Za-z0-9._-] (and not '.'/'..'): '$s'")
}
