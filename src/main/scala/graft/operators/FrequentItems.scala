package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Mergeable heavy-hitter summaries — the 100 TB path behind q62's exact
  * heavy-hitter query.
  *
  * The exact plan (explode → groupBy(token)) shuffles the full vocabulary;
  * fine while the vocab fits a shuffle, but a web-scale corpus has
  * billions of distinct tokens of which only the head matters. The
  * SpaceSaving summary (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams", ICDT 2005) keeps a
  * fixed-size counter table per partition and merges tables
  * associatively, so the only cross-partition traffic is P summaries of
  * `capacity` entries — no vocab-wide shuffle at all.
  *
  * Guarantees (standard SpaceSaving, preserved by the summary merge):
  *  - every item with true frequency > N/capacity is in the summary;
  *  - for each kept item: trueCount ≤ estCount ≤ trueCount + maxError.
  */
object FrequentItems {

  /** One SpaceSaving counter table. `merge` and `offer` maintain the
    * invariant table.size ≤ capacity. */
  final class SpaceSaving(val capacity: Int) extends Serializable {
    require(capacity > 0, "capacity must be positive")
    // token -> (estimated count, max overestimate)
    val table = new java.util.HashMap[String, (Long, Long)]()

    def offer(item: String, weight: Long = 1L): Unit = {
      val cur = table.get(item)
      if (cur != null) table.put(item, (cur._1 + weight, cur._2))
      else if (table.size < capacity) table.put(item, (weight, 0L))
      else {
        // evict the minimum-count entry; the newcomer inherits its count
        // as overestimate (the classical SpaceSaving replacement rule)
        var minKey: String = null
        var minVal = Long.MaxValue
        val it = table.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue._1 < minVal) { minVal = e.getValue._1; minKey = e.getKey }
        }
        table.remove(minKey)
        table.put(item, (minVal + weight, minVal))
      }
    }

    /** Minimum estimated count in this summary — the upper bound on the
      * true count of ANY item absent from it (an absent item was either
      * never seen, or evicted while its count was ≤ the then-minimum ≤
      * the current minimum). Zero while the table is not full: absence
      * then means a true count of exactly 0. */
    private def minEst: Long = {
      if (table.size < capacity) return 0L
      var m = Long.MaxValue
      val it = table.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v._1 < m) m = v._1 }
      m
    }

    /** Merge per Agarwal et al., "Mergeable Summaries": an item absent
      * from one summary is credited that summary's minimum estimate (its
      * true count there is bounded by it), with the whole credit also
      * added to the error term. This is what preserves BOTH guarantees
      * across partitions — est ≥ true (an item evicted on one partition
      * still gets ≥ its count there) and the > N/capacity recall (the
      * final trim keeps the capacity largest merged estimates). A naive
      * union-then-trim under-counts items evicted on one side. */
    def merge(other: SpaceSaving): SpaceSaving = {
      val out = new SpaceSaving(capacity)
      val thisMin = minEst
      val otherMin = other.minEst
      val it = table.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val o = other.table.get(e.getKey)
        if (o != null) out.table.put(e.getKey, (e.getValue._1 + o._1, e.getValue._2 + o._2))
        else out.table.put(e.getKey, (e.getValue._1 + otherMin, e.getValue._2 + otherMin))
      }
      val it2 = other.table.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (!table.containsKey(e.getKey))
          out.table.put(e.getKey, (e.getValue._1 + thisMin, e.getValue._2 + thisMin))
      }
      // trim back to capacity: drop the smallest merged estimates
      if (out.table.size > capacity) {
        val entries = new java.util.ArrayList(out.table.entrySet())
        entries.sort((a, b) => java.lang.Long.compare(b.getValue._1, a.getValue._1))
        out.table.clear()
        var i = 0
        while (i < capacity) {
          val e = entries.get(i)
          out.table.put(e.getKey, e.getValue)
          i += 1
        }
      }
      out
    }
  }

  /** Approximate heavy hitters of `itemCol` (a string column): top-k by
    * estimated count from per-partition SpaceSaving summaries of size
    * `capacity`. Returns (token, est_count, max_error) sorted by estimate
    * descending. Driver receives P summaries (≤ capacity entries each),
    * never the vocabulary. */
  def spaceSavingTopK(items: DataFrame, itemCol: String, k: Int, capacity: Int): Seq[(String, Long, Long)] = {
    val summaries = items.select(col(itemCol).cast("string"))
      .na.drop()
      .rdd.mapPartitions { it =>
        val ss = new SpaceSaving(capacity)
        it.foreach { case Row(s: String) => ss.offer(s) }
        Iterator.single(ss)
      }
    // tree merge, not a sequential driver fold: on a 10k-partition corpus
    // a flat fold makes the driver perform P merges in a row; treeAggregate
    // merges P^(1/depth) summaries per executor task per level and hands
    // the driver only the last level. Merge is associative+commutative
    // (Agarwal et al.), so any merge tree yields the same bounds.
    val depth = math.max(2,
      (math.log(math.max(summaries.getNumPartitions, 2).toDouble) / math.log(16.0)).ceil.toInt)
    val merged = summaries.treeAggregate(new SpaceSaving(capacity))(
      (a, b) => a.merge(b), (a, b) => a.merge(b), depth)
    import scala.jdk.CollectionConverters._
    merged.table.asScala.toSeq
      .map { case (tok, (est, err)) => (tok, est, err) }
      .sortBy { case (tok, est, _) => (-est, tok) }
      .take(k)
  }
}
