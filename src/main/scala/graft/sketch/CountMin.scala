package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005) — point frequency estimates in FIXED memory.
  *
  * The exact token-frequency path (q62) shuffles on the token — a
  * vocabulary-sized key space that grows with the corpus. The sketch
  * maps every occurrence to `d` (row, bucket) cells with independent
  * hashes and counts per cell: the aggregation key space is d×w cells
  * REGARDLESS of vocabulary (1024 here), so the shuffle carries at most
  * d×w rows per map task after map-side combine — the fixed-memory
  * summary shape shared with HLL (q41) and SpaceSaving
  * (`operators.FrequentItems`). Estimates err only UPWARD (collisions
  * add, never subtract): `est(t) = min_j cms[j][h_j(t)] ≥ freq(t)`,
  * with overcount ≤ 2N/w at probability 1 − 2^−d per the paper.
  *
  * Sketches are MERGEABLE by cellwise addition (same (d, w, hash)
  * family) — the property that lets 1000 executors sketch
  * independently and reduce; spec-proven in CountMinSpec.
  *
  * Hashes are `((a_j·h + b_j) mod P) mod w` over the engine-exact
  * polynomial string hash ([[graft.functions.TextFns.polyHash]]), so
  * the DuckDB oracle reproduces every cell bit-exactly.
  */
object CountMin {

  val P: Long = 1000000007L
  val RowsA: Seq[Long] = Seq(23L, 29L, 31L, 37L)
  val RowsB: Seq[Long] = Seq(41L, 43L, 47L, 53L)
  def depth: Int = RowsA.size

  /** The d bucket indices of one hashed item (h assumed in [0, P)). */
  def bucketExprs(h: Column, w: Int): Seq[Column] =
    RowsA.zip(RowsB).map { case (a, b) => ((h * a + b) % P) % w }

  /** Build the d×w sketch from a column of item hashes: one occurrence
    * row per item, output (rw, bucket, cnt) — at most d×w rows. */
  def sketch(items: DataFrame, hCol: String, w: Int): DataFrame =
    items
      .select(posexplode(array(bucketExprs(col(hCol), w): _*)).as(Seq("rw", "bucket")))
      .groupBy("rw", "bucket").agg(count(lit(1)).as("cnt"))

  /** Cellwise merge of two sketches built with the same (d, w). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("rw", "bucket").agg(sum("cnt").as("cnt"))

  /** DuckDB twin of [[bucketExprs]] for row index expression `j`. */
  def ddbBucket(h: String, j: String, w: Int): String = {
    val aArr = RowsA.mkString("[", ", ", "]")
    val bArr = RowsB.mkString("[", ", ", "]")
    s"((($h) * ($aArr[$j + 1])::BIGINT + ($bArr[$j + 1])::BIGINT) % $P) % $w"
  }
}
