package graft.codec

/** FSST-style string-symbol compression over the stringified id stream.
  *
  * A faithful simplified variant of FSST (Boncz/Neumann/Leis, VLDB'20 "FSST:
  * Fast Random Access String Compression"): a table of up to 254 byte-string
  * symbols (length 1..7) trained by iterative greedy re-encoding + adjacent
  * pair merging (the paper's bottom-up construction) on a deterministic
  * prefix sample; greedy longest-match encoding; escape byte 0xFF for
  * literals; unused symbols pruned from the serialized table (per-row blobs
  * make table bytes precious).
  *
  * Symbols are Long-packed keys (length in the top byte, ≤7 payload bytes
  * little-endian) looked up through primitive open-addressing maps — the
  * encode path allocates no boxed objects, which is what lets 32 encode
  * threads scale (boxed HashMaps collapsed under allocation pressure).
  *
  * Training is a pure function of the array prefix, so encoded bytes are
  * deterministic across parallelism levels (SURVEY.md §7 "Hard parts" #4).
  *
  * Stream form: each token rendered as decimal ASCII followed by ','
  * (including after the last token).
  *
  * Payload: varint nTokens | byte nSymbols | (byte len, bytes)* |
  *          varint encodedLen | encoded bytes.
  */
object FsstCodec extends Codec {
  val tag: Byte = 5
  val name = "fsst"

  private val Escape = 0xff
  private val MaxSymbols = 254 // codes 0..253; 0xFF = escape
  private val MaxSymLen = 7    // 7 bytes pack into a Long beside the length
  private val SampleBytes = 1024
  private val TrainIters = 4

  /** Render tokens to the decimal byte stream. */
  private[codec] def toStream(xs: Array[Int]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(xs.length * 6)
    var i = 0
    while (i < xs.length) { sb.append(xs(i)); sb.append(','); i += 1 }
    val s = sb.toString
    val out = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { out(i) = s.charAt(i).toByte; i += 1 }
    out
  }

  private[codec] def fromStream(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var i = 0
    var pos = 0
    while (i < n) {
      var neg = false
      if (bytes(pos) == '-') { neg = true; pos += 1 }
      var v = 0
      while (bytes(pos) != ',') { v = v * 10 + (bytes(pos) - '0'); pos += 1 }
      pos += 1 // skip ','
      out(i) = if (neg) -v else v
      i += 1
    }
    out
  }

  @inline private def pack(bytes: Array[Byte], off: Int, len: Int): Long = {
    var k = len.toLong << 56
    var j = 0
    while (j < len) { k |= (bytes(off + j) & 0xffL) << (j * 8); j += 1 }
    k
  }

  private def unpack(k: Long): Array[Byte] = {
    val len = (k >>> 56).toInt
    val out = new Array[Byte](len)
    var j = 0
    while (j < len) { out(j) = ((k >>> (j * 8)) & 0xff).toByte; j += 1 }
    out
  }

  /** Longest symbol match at `bytes(i)`: returns (len << 16) | code, or -1.
    * (codes < 2^16, len ≤ 7 — fits an Int.)
    */
  @inline private def matchAt(bytes: Array[Byte], i: Int, limit: Int,
      codeOf: LongIntMap): Int = {
    var len = math.min(MaxSymLen, limit - i)
    while (len >= 1) {
      val c = codeOf.getOrElse(pack(bytes, i, len), -1)
      if (c >= 0) return (len << 16) | c
      len -= 1
    }
    -1
  }

  /** Iterative FSST training: start from an empty table (all literals);
    * each round, greedily segment the sample with the current table, count
    * unit + merged-adjacent-pair gains on segment boundaries (no overlap
    * double-counting), keep the top [[MaxSymbols]] candidates. Ties broken
    * deterministically by (gain desc, len desc, packed key asc).
    * Returns packed symbol keys; code = array index.
    */
  private[codec] def trainPacked(stream: Array[Byte]): Array[Long] = {
    val limit = math.min(stream.length, SampleBytes)
    if (limit == 0) return Array.empty
    var codeOf = new LongIntMap(16)
    var table: Array[Long] = Array.empty
    val offs = new Array[Int](limit + 1)
    var iter = 0
    var converged = false
    while (iter < TrainIters && !converged) {
      // segment sample with current table
      var nUnits = 0
      var i = 0
      while (i < limit) {
        offs(nUnits) = i
        val m = matchAt(stream, i, limit, codeOf)
        i += (if (m < 0) 1 else m >>> 16)
        nUnits += 1
      }
      offs(nUnits) = limit
      // count gains of units and merged adjacent pairs
      val gains = new LongLongMap(1024)
      var u = 0
      while (u < nUnits) {
        val off = offs(u)
        val len = offs(u + 1) - off
        gains.addTo(pack(stream, off, len), if (len == 1) 1L else (len - 1).toLong)
        if (u + 1 < nUnits) {
          val mergedLen = offs(u + 2) - off
          if (mergedLen <= MaxSymLen)
            gains.addTo(pack(stream, off, mergedLen), (mergedLen - 1).toLong)
        }
        u += 1
      }
      // select top candidates (gain must amortize serialized table cost)
      val mKeys = new Array[Long](gains.size)
      val mGains = new Array[Long](gains.size)
      var m = 0
      var s = 0
      while (s < gains.keys.length) {
        if (gains.used(s)) {
          val k = gains.keys(s)
          val g = gains.vals(s)
          if (g >= 2L * (k >>> 56)) { mKeys(m) = k; mGains(m) = g; m += 1 }
        }
        s += 1
      }
      val idx = Array.range(0, m)
      // sort by (gain desc, len desc, key asc) — deterministic
      val sorted = idx.sortWith { (a, b) =>
        if (mGains(a) != mGains(b)) mGains(a) > mGains(b)
        else if ((mKeys(a) >>> 56) != (mKeys(b) >>> 56)) (mKeys(a) >>> 56) > (mKeys(b) >>> 56)
        else mKeys(a) < mKeys(b)
      }
      val n = math.min(m, MaxSymbols)
      val next = new Array[Long](n)
      var k = 0
      while (k < n) { next(k) = mKeys(sorted(k)); k += 1 }
      // fixed point: an identical table reproduces the identical
      // segmentation, gains and selection, so further iterations are
      // no-ops — stopping early is result-identical (this is the hot cost
      // of the selector's FSST probe, paid per row)
      converged = java.util.Arrays.equals(next, table)
      table = next
      codeOf = new LongIntMap(math.max(1, n) * 2)
      k = 0
      while (k < n) { codeOf.put(table(k), k); k += 1 }
      iter += 1
    }
    table
  }

  private def buildCodeOf(table: Array[Long]): LongIntMap = {
    val m = new LongIntMap(table.length * 2)
    var s = 0
    while (s < table.length) { m.put(table(s), s); s += 1 }
    m
  }

  /** Segment `bytes[0, limit)` into provisional codes: >=0 symbol code,
    * -(b+1) literal byte b.
    */
  private def toCodes(bytes: Array[Byte], limit: Int, codeOf: LongIntMap): Array[Int] = {
    val codes = new Array[Int](limit)
    var n = 0
    var i = 0
    while (i < limit) {
      val m = matchAt(bytes, i, limit, codeOf)
      if (m < 0) { codes(n) = -((bytes(i) & 0xff) + 1); i += 1 }
      else { codes(n) = m & 0xffff; i += m >>> 16 }
      n += 1
    }
    java.util.Arrays.copyOf(codes, n)
  }

  def encodePayload(xs: Array[Int], w: ByteWriter): Unit = {
    w.writeVarLong(xs.length.toLong)
    if (xs.isEmpty) { w.writeByte(0); w.writeVarLong(0L); return }
    val stream = toStream(xs)
    val table = trainPacked(stream)
    val codeOf = buildCodeOf(table)
    val codes = toCodes(stream, stream.length, codeOf)
    // prune unused symbols: removing never-matched symbols cannot change
    // greedy longest-match segmentation, so a stable remap is safe.
    val remap = new Array[Int](table.length)
    java.util.Arrays.fill(remap, -1)
    var c = 0
    while (c < codes.length) {
      if (codes(c) >= 0) remap(codes(c)) = 0
      c += 1
    }
    var nUsed = 0
    var s = 0
    while (s < table.length) {
      if (remap(s) == 0) { remap(s) = nUsed; nUsed += 1 }
      s += 1
    }
    w.writeByte(nUsed)
    s = 0
    while (s < table.length) {
      if (remap(s) >= 0) {
        val sym = unpack(table(s))
        w.writeByte(sym.length)
        w.writeBytes(sym)
      }
      s += 1
    }
    var encLen = 0
    c = 0
    while (c < codes.length) { encLen += (if (codes(c) >= 0) 1 else 2); c += 1 }
    w.writeVarLong(encLen.toLong)
    c = 0
    while (c < codes.length) {
      val code = codes(c)
      if (code >= 0) w.writeByte(remap(code))
      else { w.writeByte(Escape); w.writeByte(-code - 1) }
      c += 1
    }
  }

  def decodePayload(r: ByteReader): Array[Int] = {
    val n = r.readVarLong().toInt
    val nSymbols = r.readByte()
    val symbols = new Array[Array[Byte]](nSymbols)
    var s = 0
    while (s < nSymbols) {
      val len = r.readByte()
      val sym = new Array[Byte](len)
      System.arraycopy(r.buf, r.pos, sym, 0, len)
      r.pos += len
      symbols(s) = sym
      s += 1
    }
    val encLen = r.readVarLong().toInt
    val out = new ByteWriter(encLen * 2 + 8)
    var i = 0
    while (i < encLen) {
      val code = r.readByte()
      if (code == Escape) { out.writeByte(r.readByte()); i += 2 }
      else { out.writeBytes(symbols(code)); i += 1 }
    }
    fromStream(out.result(), n)
  }

  /** Estimated encoded bytes for the selector: train on the deterministic
    * prefix sample, code just the sample, extrapolate by stream length.
    */
  /** Decimal rendering length of one token (digits + sign). */
  @inline private def decLen(v: Int): Int =
    if (v == Int.MinValue) 11
    else {
      var n = if (v < 0) 2 else 1
      var x = math.abs(v) / 10
      while (x > 0) { n += 1; x /= 10 }
      n
    }

  /** Decimal stream length without materializing it (digits + separator
    * per token).
    */
  private def streamLength(xs: Array[Int]): Long = {
    var total = 0L
    var i = 0
    while (i < xs.length) { total += decLen(xs(i)) + 1; i += 1 }
    total
  }

  def probeSize(xs: Array[Int]): Long = {
    if (xs.isEmpty) return 4L
    // materialize only the training prefix: rendering a giant array's full
    // ~6 B/token stream just to read its length wasted most of the probe
    val totalLen = streamLength(xs)
    var nPrefix = 0
    var prefixLen = 0L
    while (nPrefix < xs.length && prefixLen < SampleBytes) {
      prefixLen += decLen(xs(nPrefix)) + 1
      nPrefix += 1
    }
    val stream = toStream(java.util.Arrays.copyOf(xs, nPrefix))
    val table = trainPacked(stream)
    val codeOf = buildCodeOf(table)
    val limit = math.min(stream.length, SampleBytes)
    val codes = toCodes(stream, limit, codeOf)
    var encLen = 0L
    val used = new IntHashSet(64)
    var tableCost = 2L
    var c = 0
    while (c < codes.length) {
      if (codes(c) >= 0) {
        encLen += 1
        if (used.add(codes(c))) tableCost += 1 + (table(codes(c)) >>> 56)
      } else encLen += 2
      c += 1
    }
    val ratio = encLen.toDouble / limit
    (ratio * totalLen + tableCost + Bytes.varLen(xs.length.toLong) + 4).toLong
  }
}
