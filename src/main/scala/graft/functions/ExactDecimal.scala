package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact decimal rounding for cross-engine determinism.
  *
  * `round(double, s)` is NOT portable when the unrounded value is an
  * exact decimal rational (cents/n): the true value can sit exactly on a
  * half boundary (… .84025), where Spark rounds the binary double's
  * exact value (→ .8402, the double is just below the boundary) while
  * DuckDB rounds in decimal space (→ .8403). Caught by the sf0.1 oracle
  * sweep on quality_score; every ratio-valued output uses this helper
  * instead.
  *
  * The fix: never round a double. Compute round-half-up(p/q · 10^s)
  * entirely in integer space — k = (|p|·2·10^s + q) floorDiv (2q) — and
  * divide by 10^s only for display. Integer sums commute, so the result
  * is identical at any parallelism and in any engine.
  *
  * Bounds: |p|·2·10^s must stay below 2^53 (exact long-in-double);
  * with cent inputs and s ≤ 4 that allows |Σ| ≤ ~4.5e8 currency units
  * per group — revisit the scale factors if a single group ever exceeds
  * that.
  */
object ExactDecimal {

  /** 2-decimal column → exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** round-half-up(p / q, scale) as a double, exact-integer arithmetic.
    * `p` may be negative; `q` must be positive. */
  def halfUpRatio(p: Column, q: Column, scale: Int): Column = {
    val s = math.pow(10, scale.toDouble).toLong
    val sgn = when(p < 0, lit(-1L)).otherwise(lit(1L))
    val num = abs(p) * lit(2L * s) + q
    val den = q * lit(2L)
    // num − num%den is a multiple of den ⇒ the double division is exact
    val k = ((num - pmod(num, den)) / den).cast("long")
    (sgn * k).cast("double") / lit(s.toDouble)
  }

  /** DuckDB twin (integer floor-division `//` on BIGINT/HUGEINT). */
  def ddbHalfUpRatio(p: String, q: String, scale: Int): String = {
    val s = math.pow(10, scale.toDouble).toLong
    s"((CASE WHEN ($p) < 0 THEN -1 ELSE 1 END) * ((abs($p) * ${2 * s} + ($q)) // (2 * ($q)))) / $s.0"
  }

  /** DuckDB: 2-decimal expr → exact cents. */
  def ddbCents(c: String): String = s"round(($c) * 100)::BIGINT"

  // ------------------------------------------------- beyond-2^53 tier

  /** 2-decimal column → exact cents in Decimal(38,0) — for groups whose
    * scaled sum would overflow the long/double-exact range. */
  def centsBig(c: Column): Column = round(c * 100).cast("decimal(38,0)")

  /** [[halfUpRatio]] in Decimal(38,0) arithmetic: lifts the 2^53 bound
    * on the |p|·2·10^s intermediate to ~10^36, i.e. past any realistic
    * per-group sum (the sf100 ceiling documented in the README).
    * Identical results where both are in range (property-tested);
    * DuckDB's side needs no twin change — its integer sums widen to
    * HUGEINT (int128) automatically, so `ddbHalfUpRatio` already
    * computes exactly in this range. */
  def halfUpRatioBig(p: Column, q: Column, scale: Int): Column = {
    val s = math.pow(10, scale.toDouble).toLong
    val sgn = when(p < 0, lit(-1.0)).otherwise(lit(1.0))
    val pd = abs(p).cast("decimal(38,0)")
    val qd = q.cast("decimal(38,0)")
    val num = pd * lit(2L * s) + qd
    val den = qd * lit(2L)
    // num − (num mod den) is an exact multiple of den; the decimal
    // division result is integral, so no precision is lost before the
    // final double cast (k itself is a small rounded ratio)
    val k = ((num - pmod(num, den)) / den).cast("decimal(38,0)")
    sgn * k.cast("double") / lit(s.toDouble)
  }
}
