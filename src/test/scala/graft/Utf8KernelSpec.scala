package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Non-ASCII posture (r4 VERDICT #7): every text ORACLE leans on the
  * documented ASCII-documents condition of the gate data, but the kernels
  * themselves will meet multi-byte UTF-8 in any real corpus. These specs
  * pin each kernel's stated convention over mixed-script strings, so the
  * engine's answer on non-ASCII input is a tested fact:
  *
  *  - `char_fingerprint`: CODEPOINT convention — sum(pos · codepoint) mod
  *    1e9+7 with 1-based codepoint positions; a surrogate pair is ONE
  *    position, a combining mark is its OWN position (no normalization —
  *    "é" precomposed and "e"+U+0301 fingerprint differently, on purpose:
  *    the kernel pins bytes-on-the-wire content, not canonical text).
  *  - `shingle_hashes` (and the minhash family it mirrors): UTF-8 BYTE
  *    fold — FNV-1a over each word's UTF-8 bytes plus a 0x20 separator
  *    after every word. Multi-byte safe by construction; position and
  *    length never enter the hash.
  *  - `cut_spans`: the cleaned fingerprint is `char_fingerprint` (codepoint
  *    convention) over the single-space rejoin of surviving words, which
  *    may be arbitrary UTF-8.
  */
class Utf8KernelSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // Mixed-script fixture: Latin-1 accents, CJK, Arabic (RTL), an astral
  // (surrogate-pair) math alphabet, emoji, a decomposed combining mark,
  // and plain ASCII for the fast-path seam.
  private val mixed = Seq(
    "hello world",
    "héllo wörld",
    "日本語 テスト",
    "مرحبا بك",
    "𝔘𝔫𝔦 astral",
    "emoji 😀🚀 mix",
    "é composed́ marks",
    "")

  // Driver reference: exact codepoint walk, 1-based positions.
  private def refCharFp(s: String): Long = {
    var acc = 0L; var pos = 1L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc + pos * cp) % 1000000007L
      pos += 1
      i += Character.charCount(cp)
    }
    acc
  }

  // Driver reference: FNV-1a 64-bit wrap over "w1 w2 ... wn " UTF-8 bytes
  // (separator after EVERY word, nulls render empty).
  private def refFnv(words: Seq[String]): Long = {
    var h = 1469598103934665603L
    words.foreach { w =>
      Option(w).getOrElse("").getBytes("UTF-8").foreach { b =>
        h = (h ^ (b & 0xffL)) * 1099511628211L
      }
      h = (h ^ 0x20L) * 1099511628211L
    }
    h
  }

  test("char_fingerprint: codepoint convention over mixed scripts (kernel ≡ driver walk)") {
    graft.functions.GraftFunctions.register(spark)
    val got = mixed.toDF("t")
      .select(call_function("char_fingerprint", $"t")).as[Long].collect().toSeq
    assert(got == mixed.map(refCharFp))
    // surrogate pair = ONE position: the astral char's fingerprint is its
    // codepoint × 1, not two UTF-16 code units
    val astral = "𝔘" // U+1D518
    assert(refCharFp(astral) == 0x1D518L)
    assert(Seq(astral).toDF("t")
      .select(call_function("char_fingerprint", $"t")).as[Long].head() == 0x1D518L)
    // no normalization: precomposed ≠ decomposed (content-on-the-wire)
    val pre = "caf\u00e9"; val de = "cafe\u0301"
    val fps = Seq(pre, de).toDF("t")
      .select(call_function("char_fingerprint", $"t")).as[Long].collect()
    assert(fps(0) != fps(1))
    assert(fps.toSeq == Seq(refCharFp(pre), refCharFp(de)))
  }

  test("char_fingerprint: ASCII byte fast path agrees with the codepoint walk at the seam") {
    graft.functions.GraftFunctions.register(spark)
    // strings straddling the fast/slow routing: pure ASCII (fast), the
    // same with one trailing multi-byte char (slow), and DEL/0x7f edge
    val cases = Seq("abc", "abcé", "", "az", "xyz ")
    val got = cases.toDF("t")
      .select(call_function("char_fingerprint", $"t")).as[Long].collect().toSeq
    assert(got == cases.map(refCharFp))
    // and the documented SQL mirror holds beyond ASCII too (Spark's
    // substring/length are codepoint-based, ascii() yields the codepoint)
    val sqlFp = mixed.toDF("t").selectExpr(
      """aggregate(transform(sequence(1, length(t)),
        |  i -> CAST(i AS BIGINT) * ascii(substring(t, i, 1))),
        |  0L, (a, x) -> (a + x) % 1000000007)""".stripMargin)
      .as[Long].collect().toSeq
    assert(sqlFp == mixed.map(refCharFp))
  }

  test("shingle_hashes: UTF-8 byte-fold convention over mixed-script words") {
    graft.functions.GraftFunctions.register(spark)
    val docs: Seq[Seq[String]] = Seq(
      Seq("héllo", "wörld", "日本語", "café", "x"),
      Seq("𝔘𝔫", "😀", "plain"),
      Seq("مرحبا"))
    val n = 2
    val got = docs.toDF("words")
      .select(call_function("shingle_hashes", $"words", lit(n)))
      .as[Seq[Long]].collect().toSeq
    val want = docs.map { ws =>
      if (ws.length < n) Seq(refFnv(ws))
      else ws.sliding(n).map(refFnv).toSeq
    }
    assert(got == want)
    // the separator convention is part of the wire format: a single word
    // containing a space byte-aliases the two-word split — a DOCUMENTED
    // property of the 0x20 separator fold, pinned here so a change shows
    val alias = Seq(Seq("a b"), Seq("a", "b")).toDF("words")
      .select(call_function("shingle_hashes", $"words", lit(2)))
      .as[Seq[Long]].collect()
    assert(alias(0).toSeq == alias(1).toSeq)
  }

  test("cut_spans: cleaned fingerprint is the codepoint fold of the UTF-8 rejoin") {
    graft.functions.GraftFunctions.register(spark)
    val words = Seq("日本", "café", "bäd", "dup", "dup", "🚀")
    val n = 2
    val cuts = Seq(3L) // covers words 3,4 ("dup", "dup")
    val got = Seq((words, cuts)).toDF("words", "cuts")
      .select(call_function("cut_spans", $"words", $"cuts", lit(n)))
      .as[Seq[Long]].head()
    val keptWords = words.zipWithIndex.collect { case (w, i) if i < 3 || i > 4 => w }
    assert(got == Seq(2L, keptWords.length.toLong,
      refCharFp(keptWords.mkString(" "))))
    // all-covered doc → empty rejoin folds to 0 even when the words were
    // multi-byte
    val all = Seq((Seq("é", "ü"), Seq(0L))).toDF("words", "cuts")
      .select(call_function("cut_spans", $"words", $"cuts", lit(2)))
      .as[Seq[Long]].head()
    assert(all == Seq(2L, 0L, 0L))
  }
}
