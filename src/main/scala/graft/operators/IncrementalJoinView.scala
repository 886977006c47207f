package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Incremental maintenance for a materialized JOIN view — the delta
  * algebra every nightly-ETL join MV runs on (the join sibling of the
  * partial-aggregate merge in q58).
  *
  * With `A = A₀ ∪ ΔA` and `B = B₀ ∪ ΔB` (insert-only deltas — the
  * append-only corpus case; deletes need the counting algorithm and a
  * tombstone column), the cross product partitions EXACTLY into four
  * disjoint terms:
  *
  *   A ⋈ B  =  (A₀ ⋈ B₀)  ∪  (ΔA ⋈ B₀)  ∪  (A₀ ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)
  *
  * The first term is the STORED view — read back, never recomputed. The
  * three delta terms each have a delta side that is batch-sized, so they
  * broadcast: per refresh the big tables are scanned once each (probe
  * side of a broadcast hash join, no shuffle), and history (the stored
  * view, by far the largest relation at 100 TB) is only appended to.
  * Disjointness is structural — a (a, b) pair lands in exactly one term
  * by which half each row arrived in — so no dedup pass is needed.
  *
  * `IncrementalJoinViewSpec` proves maintained ≡ recompute at row level
  * and asserts all three delta joins are BroadcastHashJoins; q95 hash-
  * proves the same algebra through the DuckDB oracle (whose SQL is the
  * blind full recompute).
  */
object IncrementalJoinView {

  /** The three delta terms of the insert-only join-MV refresh.
    * Broadcast hints go on the delta sides; Spark's planner keeps them
    * even above AQE. Column sets of `a0`/`deltaA` and `b0`/`deltaB`
    * must match (same projection as the stored view's build). */
  def deltaTerms(a0: DataFrame, deltaA: DataFrame,
                 b0: DataFrame, deltaB: DataFrame,
                 cond: Column): Seq[DataFrame] = Seq(
    broadcast(deltaA).join(b0, cond),
    a0.join(broadcast(deltaB), cond),
    broadcast(deltaA).join(deltaB, cond))

  /** Stored view ∪ delta terms = the maintained view. */
  def refresh(storedView: DataFrame,
              a0: DataFrame, deltaA: DataFrame,
              b0: DataFrame, deltaB: DataFrame,
              cond: Column): DataFrame =
    deltaTerms(a0, deltaA, b0, deltaB, cond)
      .foldLeft(storedView)(_ unionByName _)
}
