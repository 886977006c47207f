package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions for embedding similarity search over
  * `array<float>` columns — pure codegen'd array folds, no UDFs, no
  * linear-algebra library (zero extra dependencies).
  *
  * Determinism note: every sum folds in index order (`aggregate`, not a
  * shuffle-order groupBy sum), products are computed on `double`-cast
  * elements, and `sqrt` is IEEE correctly-rounded — so the DuckDB oracle
  * (`list_reduce` in the same order) produces bit-identical doubles.
  */
object VecFns {

  /** Elementwise double-cast. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length vectors, folded in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(v: Column): Column = dot(v, v)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance, folded in index order. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH signature (integer bucket in [0, 2^nPlanes)).
    *
    * Plane weights are a deterministic integer LCG of the (plane, dim)
    * index — w(j,i) = ((j*dim+i)*1103515245 + 12345) mod 2^31 − 2^30 —
    * exact in both engines (no float RNG to reproduce). Bit j is set iff
    * the vector's dot product with plane j is positive.
    */
  def rhpBucket(v: Column, dim: Int, nPlanes: Int): Column =
    aggregate(
      // bits MSB-first, folded as acc*2 + bit  ⇒  Σ bit_j · 2^j
      transform(sequence(lit(nPlanes - 1), lit(0), lit(-1)), j => {
        val dotJ = aggregate(
          sequence(lit(0), lit(dim - 1)),
          lit(0.0),
          (acc, i) => acc + element_at(v, i + lit(1)).cast("double") * planeWeight(j, i, dim))
        when(dotJ > 0.0, lit(1L)).otherwise(lit(0L))
      }),
      lit(0L), (acc, b) => acc * 2L + b)

  /** LCG plane weight as a double-valued Column (exact: |w| < 2^30). */
  private def planeWeight(j: Column, i: Column, dim: Int): Column =
    (((j * dim + i) * lit(1103515245L) + lit(12345L)) % lit(2147483648L) - lit(1073741824L))
      .cast("double")

  /** Corpus-sized hyperplane count for RHP-LSH bucketing.
    *
    * A FIXED bit width is a scale bug: 2^8 = 256 cells means candidate
    * pairs grow as N²/256 — invisible at sf0.1, a shuffle bomb at 100 TB.
    * The expected bucket occupancy is N/2^bits, so the width that holds
    * occupancy at `targetBucketSize` is bits = ⌈log₂(N / target)⌉ —
    * bucket count scales LINEARLY with the corpus and per-bucket
    * candidate work stays O(target²) regardless of N. Clamped to
    * [minBits, maxBits]: the floor keeps tiny corpora from degenerating
    * to a near-cross-join, the ceiling bounds signature cost (bits×dim
    * multiplies the per-row hashing work; 62 is the Long-signature hard
    * limit, 30 is already 10⁹ cells). The oracle queries pin bits = 8 so
    * the DuckDB twin stays byte-stable; production entry points should
    * derive bits from a corpus count. */
  def lshBitsFor(corpusCount: Long, targetBucketSize: Long = 64,
                 minBits: Int = 8, maxBits: Int = 30): Int = {
    require(targetBucketSize > 0, "targetBucketSize must be positive")
    require(minBits >= 1 && maxBits <= 62 && minBits <= maxBits,
      "bit bounds must satisfy 1 <= minBits <= maxBits <= 62")
    val ratio = math.max(1.0, corpusCount.toDouble / targetBucketSize.toDouble)
    val needed = math.ceil(math.log(ratio) / math.log(2.0)).toInt
    math.min(maxBits, math.max(minBits, needed))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle twins (same index-order folds).

  def ddbDot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range($dim), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE)), (x, y) -> x + y)"

  def ddbNorm(v: String, dim: Int): String = s"sqrt(${ddbDot(v, v, dim)})"

  def ddbL1(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range($dim), i -> abs($a[i+1]::DOUBLE - $b[i+1]::DOUBLE))), (x, y) -> x + y)"

  def ddbL2DistSq(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range($dim), i -> ($a[i+1]::DOUBLE - $b[i+1]::DOUBLE) * ($a[i+1]::DOUBLE - $b[i+1]::DOUBLE))), (x, y) -> x + y)"

  def ddbRhpBucket(v: String, dim: Int, nPlanes: Int): String =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range($nPlanes), j ->
       |  CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range($dim),
       |         i -> $v[i+1]::DOUBLE * (((j*$dim + i) * 1103515245 + 12345) % 2147483648 - 1073741824)::DOUBLE)),
       |         (x, y) -> x + y) > 0.0
       |       THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b)""".stripMargin
}
