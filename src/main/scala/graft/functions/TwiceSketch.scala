package graft.functions

/** Mergeable "seen at least twice" sketch: two Bloom-style bitmaps
  * (`once`, `twice`) over already-64-bit-hashed keys. `add` promotes a
  * key to `twice` when `once` already contains it; `merge` promotes
  * keys present in BOTH sides' `once` via a word-wise AND — so a key
  * occurring >= 2 times globally is ALWAYS `twice`-positive, no matter
  * how its occurrences scatter across partitions (no false negatives,
  * the property dedup13's pre-filter needs for exactness). False
  * positives are the usual Bloom kind and only ADMIT extra rows into
  * the exact aggregate downstream.
  *
  * Keys are assumed pre-hashed (xxhash64 output); the k probe
  * positions are derived by splitmix64 remixes, so no per-add string
  * hashing. Merging is a single in-place word loop — no copies, no
  * serialization round-trip (the reason this exists instead of a pair
  * of `org.apache.spark.util.sketch.BloomFilter`s, whose
  * `intersectInPlace` destroys an input you still need for the OR).
  *
  * Sizing: `create` targets `bitsPerKey` bits per expected distinct
  * key, clamped to `maxBytesPerArray` — at cluster scale the clamp
  * trades false-positive rate (less shuffle saved) for bounded
  * executor memory; correctness is unaffected.
  */
final class TwiceSketch(val numBits: Long, val numHashes: Int)
    extends Serializable {
  require(
    numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits"
  )
  private val mask: Long = numBits - 1
  val once: Array[Long] = new Array[Long]((numBits >> 6).toInt)
  val twice: Array[Long] = new Array[Long]((numBits >> 6).toInt)

  @inline private def remix(h0: Long): Long = {
    var z = h0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  // Kirsch-Mitzenmacher double hashing: positions h1 + i*h2 from two
  // independent remixes of the key. Remixing h ALONE (not h + i*c)
  // matters: an additive scheme lets keys that differ by a multiple of
  // the salt share probe positions wholesale (caught by SketchSpec's
  // structured-key test — 497/500 false positives before this form).
  // The position stays a LONG end to end: at the default 512 MB clamp
  // numBits = 2^32, so an Int-truncated position goes negative for
  // half of all probes and indexes out of bounds — exactly when the
  // clamp the mode exists for engages (round-13 review). Word index
  // p >>> 6 fits an Int for any numBits the arrays themselves can
  // represent.
  @inline private def pos(h1: Long, h2: Long, i: Int): Long =
    (h1 + i.toLong * h2) & mask

  @inline private def contains(bits: Array[Long], h: Long): Boolean = {
    val h1 = remix(h)
    val h2 = remix(h ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i)
      if ((bits((p >>> 6).toInt) & (1L << (p & 63L))) == 0L) return false
      i += 1
    }
    true
  }
  @inline private def set(bits: Array[Long], h: Long): Unit = {
    val h1 = remix(h)
    val h2 = remix(h ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i)
      bits((p >>> 6).toInt) |= 1L << (p & 63L)
      i += 1
    }
  }

  def add(h: Long): Unit =
    if (contains(once, h)) set(twice, h) else set(once, h)

  def mightTwice(h: Long): Boolean = contains(twice, h)

  /** In-place merge; both operands are partial aggregates owned by the
    * caller (treeAggregate combOp), so mutation is safe. */
  def merge(o: TwiceSketch): TwiceSketch = {
    require(
      o.numBits == numBits && o.numHashes == numHashes,
      "incompatible sketch shapes"
    )
    var i = 0
    val n = once.length
    while (i < n) {
      twice(i) |= o.twice(i) | (once(i) & o.once(i))
      once(i) |= o.once(i)
      i += 1
    }
    this
  }
}

object TwiceSketch {
  /** Size for ~`bitsPerKey` bits per expected distinct key (power-of
    * -two rounded), clamped to `maxBytesPerArray` per bitmap. */
  def create(
      expectedItems: Long,
      bitsPerKey: Int = 8,
      numHashes: Int = 3,
      maxBytesPerArray: Long = 512L << 20
  ): TwiceSketch = {
    val want = math.max(64L, expectedItems * bitsPerKey.toLong)
    val cap = maxBytesPerArray * 8L
    val bits = java.lang.Long.highestOneBit(math.min(want, cap) - 1) << 1
    new TwiceSketch(math.max(64L, bits), numHashes)
  }
}
