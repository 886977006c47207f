package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A layout sorted on one column skips scans filtered on THAT column and
  * nothing else; interleaving the bits of k columns into one sort key
  * gives every dimension locality ~N^(1/k): with F files, a z-ordered
  * write bounds each file's min–max span to ≈F^(-1/k) of every
  * dimension's range, so parquet min/max stats prune files for filters
  * on ANY clustered column — the lakehouse-standard layout for fact
  * tables queried along several axes.
  *
  * All arithmetic is integer bit manipulation on rank-scaled values
  * (IEEE-exact division only), so z-values are deterministic and
  * cross-engine reproducible (the DuckDB oracle computes them
  * bit-identically).
  *
  * Write path: `repartitionByRange(z)` (one range shuffle — the same
  * cost any global sort pays) + `sortWithinPartitions(z)` keeps row
  * groups tight inside each file. At 100 TB the shuffle is the price of
  * admission paid once at ingest; every later multi-dimensional scan
  * pays F^(-1/k) of the IO forever after.
  */
object ZOrder {

  /** Scale a non-negative long column from [mn, mx] to [0, 2^bits):
    * floor((v − mn) · (2^bits − 1) / (mx − mn)). Exact for ranges below
    * 2^(53−bits) (double mantissa); both engines round identically. */
  def scaleToBits(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val top = (1L << bits) - 1
    when(mx === mn, lit(0L))
      .otherwise(floor((v - mn).cast("double") * top / (mx - mn).cast("double")).cast("long"))
  }

  /** Morton interleave of k pre-scaled columns (each in [0, 2^bits)):
    * bit b of column i lands at position b·k + i. Pure codegen'd bit
    * arithmetic — k·bits shift/mask terms folded into one expression. */
  def zValue(scaled: Seq[Column], bits: Int = 16): Column = {
    require(scaled.nonEmpty && scaled.size * bits <= 63, "z-value must fit a long")
    val k = scaled.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- scaled.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ + _) // disjoint bit positions: + ≡ |
  }

  /** Min/max stats for the clustering columns in ONE aggregate pass,
    * joined back as a broadcast (no driver round-trip in the plan). */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int = 16, zCol: String = "z"): DataFrame = {
    val stats = df.agg(
      cols.flatMap(c => Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c"))).head,
      cols.flatMap(c => Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c"))).tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val scaled = cols.map(c => scaleToBits(col(c), col(s"__mn_$c"), col(s"__mx_$c"), bits))
    joined.withColumn(zCol, zValue(scaled, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Write `df` z-ordered by `cols` into `nFiles` parquet files. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bits: Int = 16): Unit =
    withZ(df, cols, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)
}
