package graft.codec

/** Primitive open-addressing int hash set/map — no boxing on the encode hot
  * path (ColumnStats distinct tracking, dictionary building). Linear
  * probing, power-of-two capacity, Fibonacci hashing. Not thread-safe;
  * instances are per-row locals.
  */
final class IntHashSet(initialCapacity: Int) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2) - 1) << 1
  private var mask = cap - 1
  private var keys = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  @inline private def slot(k: Int): Int = (k * -1640531527) & mask // 2^32/phi

  /** Returns true if newly added. */
  def add(k: Int): Boolean = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return false
      i = (i + 1) & mask
    }
    keys(i) = k
    used(i) = true
    n += 1
    if (n * 4 > cap * 3) grow()
    true
  }

  private def grow(): Unit = {
    val ok = keys; val ou = used
    cap <<= 1; mask = cap - 1
    keys = new Array[Int](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ou(i)) add(ok(i))
      i += 1
    }
  }
}

/** Primitive int→int map for dictionary building (values are dense ids). */
final class IntIntMap(initialCapacity: Int) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2) - 1) << 1
  private var mask = cap - 1
  private var keys = new Array[Int](cap)
  private var vals = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  @inline private def slot(k: Int): Int = (k * -1640531527) & mask

  def getOrElse(k: Int, default: Int): Int = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  def put(k: Int, v: Int): Unit = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; used(i) = true
    n += 1
    if (n * 4 > cap * 3) grow()
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used
    cap <<= 1; mask = cap - 1
    keys = new Array[Int](cap)
    vals = new Array[Int](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ou(i)) put(ok(i), ov(i))
      i += 1
    }
  }
}

/** Primitive long→int map (FSST symbol table lookups). */
final class LongIntMap(initialCapacity: Int) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2) - 1) << 1
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  @inline private def slot(k: Long): Int =
    ((k * -7046029254386353131L) >>> 40).toInt & mask

  def getOrElse(k: Long, default: Int): Int = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  def contains(k: Long): Boolean = getOrElse(k, Int.MinValue) != Int.MinValue

  def put(k: Long, v: Int): Unit = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; used(i) = true
    n += 1
    if (n * 4 > cap * 3) grow()
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[Int](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ou(i)) put(ok(i), ov(i))
      i += 1
    }
  }
}

/** Primitive long→long map with additive merge (FSST gain counting).
  * Exposes the backing arrays for allocation-free iteration.
  */
final class LongLongMap(initialCapacity: Int) {
  private var cap = Integer.highestOneBit(math.max(16, initialCapacity * 2) - 1) << 1
  private var mask = cap - 1
  var keys = new Array[Long](cap)
  var vals = new Array[Long](cap)
  var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  @inline private def slot(k: Long): Int =
    ((k * -7046029254386353131L) >>> 40).toInt & mask

  def addTo(k: Long, v: Long): Unit = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) { vals(i) += v; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; used(i) = true
    n += 1
    if (n * 4 > cap * 3) grow()
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ou(i)) addTo(ok(i), ov(i))
      i += 1
    }
  }
}
