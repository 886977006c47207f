package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB posture (builder spec:
  * "skewed keys → salting or AQE skew-join"). AQE's skew-join split
  * covers sort-merge joins at runtime; these cover the two cases AQE
  * does not: a skewed aggregation key, and a skewed broadcast join where
  * one hot key floods a single task's probe side.
  *
  * Both are algebraic rewrites — results are provably identical to the
  * unsalted forms (property-tested in SkewFnsSpec), only the shuffle
  * layout changes: phase 1 spreads a hot key over `buckets` sub-keys,
  * phase 2 recombines.
  */
object SkewFns {

  /** Deterministic salt in [0, buckets): hash of the non-key columns, so
    * rows of one hot key scatter while identical rows still co-locate.
    * On a key-only projection (no non-key columns) there is nothing
    * deterministic to scatter by, so fall back to a random salt — still
    * uniform, and all callers recombine in a phase-2 aggregate/join, so
    * the result is unchanged (only its partition layout is). */
  private def salt(df: DataFrame, keyCols: Seq[String], buckets: Int): Column = {
    val others = df.columns.toSeq.filterNot(keyCols.contains).map(c => col(s"`$c`"))
    if (others.isEmpty) (rand(42) * buckets).cast("int")
    else pmod(hash(others: _*), lit(buckets))
  }

  /** Two-phase salted sum/count aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. Use when one group key holds a disproportionate
    * share of rows (a single reducer would be the straggler). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val keyRefs = keyCols.map(c => col(s"`$c`"))
    df.withColumn("_salt", salt(df, keyCols, buckets))
      .groupBy((keyRefs :+ col("_salt")): _*)
      .agg(sum(col(s"`$valueCol`")).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyRefs: _*)
      .agg(sum("_psum").as(s"${valueCol}_sum"), sum("_pcnt").as("n"))
  }

  /** Salted broadcast join: replicate the (small) right side across all
    * salt values and join on (key, salt) — a hot left key spreads over
    * `buckets` tasks instead of one. Inner-join semantics on `key`. */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
                          buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(big, Seq(key), buckets))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(broadcast(replicated), Seq(key, "_salt")).drop("_salt")
  }
}
