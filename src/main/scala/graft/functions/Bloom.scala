package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bloom-filter build/probe on top of the bitmap sketch — the
  * shuffle-reduction prefilter for selective joins where BOTH sides are
  * too big to broadcast. The filter itself is a [[BitmapAgg]] bitset
  * over k double-hashed positions (`h1 + i*h2 mod m`, Kirsch-Mitzenmacher),
  * so the build is one map-side-combinable aggregation producing a
  * kilobyte-scale Long array, and the probe is pure built-in column
  * expressions (`element_at` + `shiftleft` bit test) that stay inside
  * whole-stage codegen on the fact-table scan.
  *
  * At 100 TB the pattern is: build the filter on the selective side
  * (kilobytes even when that side has millions of rows with payload —
  * i.e. exactly when a broadcast-hash join is impossible), broadcast it,
  * and drop non-matching fact rows BEFORE the shuffle. No false
  * negatives, so the exact join afterwards makes the composition
  * result-identical to the plain join; false positives only cost a few
  * extra shuffled rows (rate ~ (1 - e^(-kn/m))^k).
  */
object Bloom {

  /** The k probe positions for `key`, identical on build and probe
    * sides: two independent 64-bit hashes (xxhash64 of the key, and of
    * the key under a salt) combined as `h1 + i*h2 mod numBits`
    * (Kirsch-Mitzenmacher). Each hash is reduced mod `numBits` BEFORE
    * the combination so the arithmetic stays far from Long range —
    * ANSI mode (Spark 4 default) rejects wrap-around overflow. */
  private[graft] def positions(key: Column, numBits: Int, k: Int): Seq[Column] = {
    require(k >= 1 && numBits > 0, "bloom needs k >= 1 and numBits > 0")
    val m = lit(numBits.toLong)
    val h1 = pmod(xxhash64(key), m)
    val h2 = pmod(xxhash64(lit("graft-bloom-h2"), key), m)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, m))
  }

  /** Aggregate: build the filter over `key` — k bitmap sketches of the
    * hash positions, OR-merged word-wise. One pass, map-side partials;
    * the result is an `Array[Long]` of `numBits/64` words. The
    * `zip_with` OR runs once per group on arrays, not per row. */
  def sketch(key: Column, numBits: Int, k: Int): Column =
    positions(key, numBits, k)
      .map(p => BitmapDistinct.bitmapSketch(p, numBits))
      .reduce((a, b) => zip_with(a, b, (x, y) => x.bitwiseOR(y)))

  /** Probe: true iff all k bits for `key` are set in `sketchCol` (a
    * one-row broadcast of [[sketch]]'s array). No false negatives.
    * Built entirely from codegen'd built-ins: shiftright for the word
    * index, shiftleft for the in-word mask, element_at (1-based) for
    * the lookup. */
  def mightContain(sketchCol: Column, key: Column, numBits: Int, k: Int): Column =
    positions(key, numBits, k).map { p =>
      val word = element_at(sketchCol, shiftright(p, 6).cast("int") + lit(1))
      val mask = call_function("shiftleft", lit(1L), (p % lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
}
