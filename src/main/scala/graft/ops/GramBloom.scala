package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-built Bloom filter over gram digest pairs, probed with codegen
  * expressions executor-side.
  *
  * The bitset rides into the plan as ONE array literal (a constant, not a
  * per-element expression tree — ~1.5 MB for 10M grams at 1% fpp), probed
  * with Kirsch-Mitzenmacher double hashing over the `graft_md5hh` digest
  * pair — one md5 digest serves all `kh` probes. Three deliberate
  * deviations from the textbook K-M spelling, each closing a measured
  * degradation:
  *
  *  - the bitset size is a POWER OF TWO and the stride FORCED ODD
  *    (`2·h2+1`), so gcd(stride, m) = 1 and all `kh` probe positions are
  *    distinct — naive `(h1 + i·h2) mod m` with m a multiple of 64
  *    cycles through a handful of positions whenever h2 shares factors
  *    with m (observed: 2 FPs in 600 probes at a nominal 1e-6);
  *  - probes carry the Dillinger-Manolios enhanced-double-hashing mix
  *    term `(i³−i)/6`: linear probe sequences are arithmetic
  *    progressions, and on a small filter the stride space mod m is so
  *    coarse that a non-member's AP aligns wholesale with a member's
  *    shifted AP (observed: still 1 FP in 600 at nominal 1e-6). The
  *    cubic term makes an alignment at shift j ≠ 0 impossible instead
  *    of ~kh/m likely, restoring the ideal-hash fpp.
  *
  * Shared by [[Curate.contaminationBloom]] (map-side shuffle prefilter)
  * and [[Curate.contaminationFlag]] (stateless streaming-safe
  * projection).
  */
private[graft] final case class GramBloom(words: Array[Long], mBits: Long, kh: Int) {

  /** Membership probe over a precomputed digest pair. */
  def mightContain(h1: Column, h2: Column): Column = {
    val bitset = lit(words)
    // h1 < 2^60, stride < 2^53, i < 16 → no signed overflow (ANSI-safe);
    // the stride spelling must stay in lockstep with `build`
    val stride = h2 * lit(2L) + lit(1L)
    (0 until kh).map { i =>
      val mix = (i.toLong * i * i - i) / 6 // enhanced double hashing (see class doc)
      val idx = pmod(h1 + lit(i.toLong) * stride + lit(mix), lit(mBits))
      val word = element_at(bitset, (shiftright(idx, 6) + 1).cast("int"))
      // functions.shiftright only takes a literal shift — the per-row
      // bit offset goes through the SQL builder instead
      call_function("shiftright", word, idx.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1
    }.reduce(_ && _)
  }

  /** Membership probe over a raw gram string (digests it first). */
  def mightContainGram(gram: Column): Column = {
    val hh = call_function("graft_md5hh", gram.cast("binary"))
    mightContain(element_at(hh, 1), element_at(hh, 2))
  }
}

private[graft] object GramBloom {

  /** Driver-bounded collect of `(h1, h2)` digest pairs for [[build]]:
    * LIMITS to the cap BEFORE collecting — the guard must bound what
    * reaches the driver, not inspect a heap that already blew; one row
    * past the cap proves the breach — then fails loudly with the
    * caller's contract message. The ONE implementation behind every
    * artifact loader (stripLinesFlag / stripSentencesFlag /
    * contamination grams) so the bound can never silently regress at
    * one site. */
  def collectPairs(pairs: org.apache.spark.sql.DataFrame, cap: Long,
                   overCapMessage: => String): Array[(Long, Long)] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val collected = pairs
      .limit(math.min(cap, Int.MaxValue - 1L).toInt + 1)
      .as[(Long, Long)].collect()
    require(collected.length <= cap, overCapMessage)
    collected
  }

  /** Build from collected digest pairs. Sizing: the textbook
    * m = −n·ln(fpp)/ln²2 bits rounded UP to a power of two (so the odd
    * stride is coprime with m — see the class doc; the round-up only ever
    * lowers the realised fpp), kh = (m/n)·ln 2 probes capped at 16.
    *
    * The 16-Kibit floor (2 KB — noise next to any plan) covers the one
    * residual correlation double hashing can't remove: two grams whose
    * (offset, stride) coincide mod m share their ENTIRE probe sequence,
    * a ~2n/m² event that ideal per-probe hashing wouldn't have. At the
    * textbook m ∝ n that floor only exceeds honest fpp for toy n
    * (measured: 1.9e-4 at n = 6, m = 256 — vs 1e-6 nominal); from the
    * floor up it is ≤ 2n/2²⁸ ≈ fpp for any n the driver could hold. */
  def build(pairs: Array[(Long, Long)], fpp: Double): GramBloom = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val n = math.max(pairs.length, 1)
    val ideal = math.max(16384.0, -n * math.log(fpp) / (math.log(2) * math.log(2)))
    val mBits: Long = java.lang.Long.highestOneBit(math.ceil(ideal).toLong * 2 - 1)
    val kh = math.max(1, math.min(16, math.round(mBits.toDouble / n * math.log(2)).toInt))
    val words = new Array[Long]((mBits / 64).toInt)
    pairs.foreach { case (h1, h2) =>
      val stride = 2L * h2 + 1L
      var i = 0
      while (i < kh) {
        val mix = (i.toLong * i * i - i) / 6
        val idx = java.lang.Math.floorMod(h1 + i.toLong * stride + mix, mBits)
        words((idx >> 6).toInt) |= (1L << (idx & 63).toInt)
        i += 1
      }
    }
    GramBloom(words, mBits, kh)
  }
}
