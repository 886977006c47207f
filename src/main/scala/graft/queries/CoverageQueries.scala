package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Surface-completeness batch: operators beyond the reference's own use
  * that a drop-in engine must still provide (ranking, cube/grouping
  * sets, set operations, percentiles, sketch aggregates).
  */
object CoverageQueries {

  /** Approximate distinct-count (HLL++), self-validating: the output
    * carries the exact count plus a boolean asserting the sketch landed
    * within 10% — the oracle computes the exact side and literal true,
    * so a drifting sketch fails the gate. Sketches are the 100 TB path
    * for cardinality (exact distinct = full shuffle; HLL = mergeable
    * fixed-size state). */
  def q41ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.05).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact") <= 0.10)
          .as("approx_ok"))

  val q41ApproxDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS approx_ok
      |FROM events GROUP BY 1""".stripMargin

  /** Ranking battery: rank / dense_rank / ntile / percent_rank (exact
    * rational doubles — identical in both engines). */
  def q42RankFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .filter(col("rnk") <= 20)
      .select("o_orderpriority", "o_orderkey", "rnk", "drnk", "quartile", "pct_rank")
  }

  val q42RankFuncsSql: String =
    """SELECT o_orderpriority, o_orderkey, rnk, drnk, quartile, pct_rank
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    rank()         OVER w AS rnk,
      |    dense_rank()   OVER w AS drnk,
      |    ntile(4)       OVER w AS quartile,
      |    percent_rank() OVER w AS pct_rank
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rnk <= 20""".stripMargin

  /** CUBE with grouping_id — the full grouping-sets lattice in one
    * shuffle. */
  def q43Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"),
        grouping_id(col("l_returnflag"), col("l_linestatus")).as("gid"))

  val q43CubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n,
      |  grouping(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** INTERSECT / EXCEPT (distinct set semantics), unioned with a tag. */
  def q44SetOps(spark: SparkSession, dir: String): DataFrame = {
    val auto = Tables.customer(spark, dir).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("c_custkey")
    val rich = Tables.customer(spark, dir).filter(col("c_acctbal") > 5000.0)
      .select("c_custkey")
    auto.intersect(rich).withColumn("op", lit("both"))
      .unionByName(auto.except(rich).withColumn("op", lit("auto_only")))
  }

  val q44SetOpsSql: String =
    """SELECT c_custkey, 'both' AS op FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |)
      |UNION ALL
      |SELECT c_custkey, 'auto_only' AS op FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |  EXCEPT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |)""".stripMargin

  /** Exact interpolated percentiles over cent-valued data (both engines
    * use the type-7 linear-interpolation definition; inputs are exact
    * cents so the interpolation arithmetic is identical). */
  def q45Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))

  val q45PercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.25), 4) AS p25,
      |  round(quantile_cont(value, 0.5),  4) AS p50,
      |  round(quantile_cont(value, 0.75), 4) AS p75,
      |  round(quantile_cont(value, 0.95), 4) AS p95
      |FROM events GROUP BY 1""".stripMargin

  /** ROBUST OUTLIER FENCE — Tukey IQR data cleaning per user (the
    * robust-statistics filter a metrics/training pipeline runs before
    * aggregating sensor-grade values): fences at q1 − 1.5·IQR and
    * q3 + 1.5·IQR, events outside them flagged, and the per-user
    * robust aggregate computed over the survivors.
    *
    * Cross-engine exactness is engineered, not hoped for: percentiles
    * run over integer CENTS, where the type-7 interpolation position
    * 0.25·(n−1) has a dyadic fractional part ({0, ¼, ½, ¾}) — so
    * `a + (b−a)·frac` is EXACT in IEEE doubles for any op order, and
    * the fence arithmetic (×1.5 on dyadic quarters) stays exact too.
    * Both engines therefore produce bit-identical fences and identical
    * boundary classifications — the float-boundary classify-flip
    * hazard (the q53-threshold lesson) is eliminated by construction
    * rather than margin-measured.
    *
    * 100 TB shape: one exact-percentile agg per user (user-keyed
    * shuffle) broadcast back over one streaming pass; at extreme
    * per-user cardinality swap in approx_percentile (q59's sketch) and
    * keep the same fence algebra. */
  def q109OutlierFence(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val fences = e.groupBy("user_id").agg(
        expr("percentile(cents, 0.25)").as("q1"),
        expr("percentile(cents, 0.75)").as("q3"))
      .select(col("user_id"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    e.join(broadcast(fences), Seq("user_id"))
      .withColumn("is_out", col("cents") < col("lo") || col("cents") > col("hi"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        // widen through decimal(38,0) like q100/q110: DuckDB's sum()
        // widens to HUGEINT automatically, so an extreme per-user cents
        // sum must not wrap on the Spark side only (then narrow back to
        // long to keep the published schema)
        sum(when(!col("is_out"), col("cents")).otherwise(0L)
          .cast("decimal(38,0)")).cast("long").as("kept_cents"))
  }

  val q109OutlierFenceSql: String =
    """WITH e AS (
      |  SELECT user_id, round(value * 100)::BIGINT AS cents FROM events
      |),
      |f AS (
      |  SELECT user_id,
      |    quantile_cont(cents, 0.25) AS q1,
      |    quantile_cont(cents, 0.75) AS q3
      |  FROM e GROUP BY user_id
      |),
      |fence AS (
      |  SELECT user_id,
      |    q1 - (q3 - q1) * 1.5 AS lo,
      |    q3 + (q3 - q1) * 1.5 AS hi
      |  FROM f
      |)
      |SELECT e.user_id,
      |  count(*)::BIGINT AS n,
      |  sum(CASE WHEN e.cents < fence.lo OR e.cents > fence.hi
      |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
      |  sum(CASE WHEN e.cents < fence.lo OR e.cents > fence.hi
      |      THEN 0 ELSE e.cents END)::BIGINT AS kept_cents
      |FROM e JOIN fence ON e.user_id = fence.user_id
      |GROUP BY e.user_id""".stripMargin

  /** GROUP-WISE Z-SCORE STANDARDIZATION — the feature-scaling transform
    * (normalize each value against its group's distribution) every
    * model-input pipeline runs. Exactness by the q100 recipe: the
    * sufficient statistics are INTEGER sums over cents (n, Σx, Σx²),
    * so mean = Σx/n and var = (nΣx² − (Σx)²)/(n(n−1)) are single IEEE
    * divisions of exactly-represented integers — both engines compute
    * the identical doubles, sqrt is correctly-rounded, and the z-score
    * rounds to 4 decimals for the cross-engine hash. Population of one
    * (n = 1) yields z = 0 by convention.
    *
    * 100 TB shape: one group-keyed agg (map-side combine) broadcast
    * back over one streaming pass — same two-pass shape as q109's
    * fence; no window over raw rows, no global sort. */
  def q110Zscore(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    // Σx and Σx² widen to decimal(38) BEFORE summing (cents² alone can
    // pass 2^63 per row at ~$30M values, and group sums certainly can at
    // corpus scale) — the DuckDB side widens to HUGEINT automatically,
    // so a long-typed Spark sum is the only overflow site. decimal →
    // double is round-to-nearest in both engines, so the final divisions
    // stay bit-identical.
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val stats = e.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(big(col("cents"))).as("sx"),
        sum(big(col("cents")) * big(col("cents"))).as("sxx"))
      .select(col("event_type"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean"),
        when(col("n") <= 1, lit(0.0)).otherwise(
          sqrt((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / (col("n").cast("double") * (col("n") - 1L).cast("double")))).as("sd"))
    e.join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        when(col("sd") === 0.0, lit(0.0))
          .otherwise(round((col("cents").cast("double") - col("mean")) / col("sd"), 4))
          .as("z"))
  }

  val q110ZscoreSql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, round(value * 100)::BIGINT AS cents
      |  FROM events
      |),
      |s AS (
      |  SELECT event_type,
      |    count(*)::BIGINT AS n, sum(cents) AS sx,
      |    sum(cents::HUGEINT * cents) AS sxx
      |  FROM e GROUP BY event_type
      |),
      |m AS (
      |  SELECT event_type,
      |    sx::DOUBLE / n::DOUBLE AS mean,
      |    CASE WHEN n <= 1 THEN 0.0
      |      ELSE sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
      |                / (n::DOUBLE * (n - 1)::DOUBLE)) END AS sd
      |  FROM s
      |)
      |SELECT e.event_id, e.event_type,
      |  CASE WHEN m.sd = 0.0 THEN 0.0
      |    ELSE round((e.cents::DOUBLE - m.mean) / m.sd, 4) END AS z
      |FROM e JOIN m ON e.event_type = m.event_type""".stripMargin

  /** Array/map/format scalar battery (SURVEY §2.8 array/map rows):
    * collect → sort → slice/element_at, map_from_entries + lookup,
    * regexp_extract_all, printf-style formatting. */
  def q46ArrayMap(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // (r15: an explicit width-pinning repartition on the group keys
      // was tried and REVERTED — it dropped the map-side combine and
      // widened the second aggregation's partial-row count, netting
      // slower; AQE's 4-wide choice here is fine because the work IS
      // proportional to bytes, unlike the q16/q144 compute-dense cases)
      // synthetic lineitem repeats line numbers per order → pre-aggregate
      // so the map key is unique (map_from_entries rejects duplicates)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(sum("l_quantity").as("qty"))
      .groupBy("l_orderkey")
      .agg(
        sort_array(collect_list(col("l_linenumber"))).as("lines"),
        map_from_entries(sort_array(collect_list(
          struct(col("l_linenumber"), col("qty"))))).as("qty_by_line"))
      .select(
        col("l_orderkey"),
        size(col("lines")).as("n_lines"),
        element_at(col("lines"), 1).as("first_line"),
        size(slice(col("lines"), 1, 2)).as("n_first_two"),
        element_at(col("qty_by_line"), element_at(col("lines"), 1)).as("first_qty"),
        format_string("order %d has %d lines", col("l_orderkey"), size(col("lines")))
          .as("label"),
        array_join(transform(col("lines"), l => l.cast("string")), ",").as("lines_csv"))

  val q46ArrayMapSql: String =
    """WITH pre AS (
      |  SELECT l_orderkey, l_linenumber, sum(l_quantity) AS qty
      |  FROM lineitem GROUP BY 1, 2
      |),
      |g AS (
      |  SELECT l_orderkey,
      |    list_sort(list(l_linenumber)) AS lines,
      |    map_from_entries(list_sort(list(struct_pack(k := l_linenumber, v := qty)))) AS qty_by_line
      |  FROM pre GROUP BY 1
      |)
      |SELECT l_orderkey,
      |  len(lines) AS n_lines,
      |  lines[1] AS first_line,
      |  len(lines[1:2]) AS n_first_two,
      |  qty_by_line[lines[1]][1] AS first_qty,
      |  printf('order %d has %d lines', l_orderkey, len(lines)) AS label,
      |  list_aggregate(list_transform(lines, x -> x::VARCHAR), 'string_agg', ',') AS lines_csv
      |FROM g""".stripMargin

  /** Deterministic stratified sampling — the training-pipeline "hold out
    * X% per stratum" op, keyed on an arithmetic hash (Knuth
    * multiplicative) so the sample is reproducible at any parallelism
    * and identical in the oracle (engine-builtin hashes differ). ~20%
    * per language stratum.
    *
    * doc_id is pre-modded by the prime 1000000007 before the multiply
    * (same guard as q66): (M−1)·2654435761 ≈ 2.7e18 stays inside Long,
    * while a raw id ≥ 2^33 would overflow under ANSI — the sf1 scaling
    * sweep caught exactly that (100 TB ids don't fit 33 bits). Identical
    * results for ids < M, so the sf0.01 oracle sample is unchanged. */
  def q49StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h",
        pmod(pmod(col("doc_id"), lit(1000000007L)) * 2654435761L, lit(100L)))
      .withColumn("sampled", col("h") < 20)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        min(when(col("sampled"), col("doc_id"))).as("first_sampled_id"))

  val q49StratifiedSampleSql: String =
    """SELECT lang,
      |  count(*) AS n_total,
      |  sum(CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 20 THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
      |  min(CASE WHEN ((doc_id % 1000000007) * 2654435761) % 100 < 20 THEN doc_id END) AS first_sampled_id
      |FROM documents
      |GROUP BY 1""".stripMargin

  /** Salted two-phase aggregation under the driver gate: the skew
    * rewrite (`SkewFns.saltedSumCount` — groupBy(key, salt) partial →
    * groupBy(key) final) proven value-identical to the plain single-pass
    * GROUP BY oracle. Sums are exact cents (longs commute), so equality
    * is exact at ANY salt bucket count / partitioning — the algebraic
    * guarantee the 100 TB skew story rests on. */
  def q52SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("qty_c", graft.functions.ExactDecimal.cents(col("l_quantity")))
    graft.functions.SkewFns.saltedSumCount(li, Seq("l_returnflag"), "qty_c", buckets = 16)
      .select(col("l_returnflag"), col("qty_c_sum").as("qty_cents"), col("n"))
  }

  val q52SaltedAggSql: String =
    s"""SELECT l_returnflag,
       |  sum(${graft.functions.ExactDecimal.ddbCents("l_quantity")})::BIGINT AS qty_cents,
       |  count(*)::BIGINT AS n
       |FROM lineitem
       |GROUP BY 1""".stripMargin

  /** Sketch quantiles — the production form at 100 TB: `approx_percentile`
    * merges fixed-size partials map-side, where an exact percentile sorts
    * every group. The benched query is deliberately SKETCH-ONLY plus a
    * RANK-ENVELOPE validation pass: the sketch values are joined back
    * (broadcast — group-cardinality rows) and each group counts how many
    * values fall at or below them, so `rank50_ok`/`rank99_ok` assert the
    * sketch's actual percentile rank lands within ±10 percentile points
    * (accuracy=1000 guarantees ±0.1 — two orders of slack, no flake). The
    * sketch itself is not bit-reproducible cross-engine, so the oracle
    * emits literal `true` for the booleans — NON-tautological: a sketch
    * whose rank drifts out of the envelope flips the Spark-side boolean
    * and hash-fails the gate. The strong ±5-rank validation against an
    * exact sort lives in SketchValidationSpec. The extra pass is one
    * re-scan + broadcast join — the price of a gated accuracy check, not
    * part of the production path. */
  def q59ApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_returnflag"), col("l_extendedprice"))
    val sk = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 1000)").as("ap"),
        count(lit(1)).as("n_items"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      .select(col("l_returnflag"), col("n_items"), col("mn"), col("mx"),
        element_at(col("ap"), 1).as("ap50"), element_at(col("ap"), 2).as("ap99"))
    li.join(broadcast(sk), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(
        max(col("n_items")).as("n_items"),
        max(col("mn")).as("mn"), max(col("mx")).as("mx"),
        max(col("ap50")).as("ap50"), max(col("ap99")).as("ap99"),
        sum(when(col("l_extendedprice") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") <= col("ap99"), 1L).otherwise(0L)).as("le99"))
      .select(col("l_returnflag"),
        col("n_items"),
        round(col("mn"), 4).as("price_min"),
        round(col("mx"), 4).as("price_max"),
        (col("ap50") >= col("mn") && col("ap50") <= col("ap99")).as("approx50_ok"),
        (col("ap99") >= col("ap50") && col("ap99") <= col("mx")).as("approx99_ok"),
        (col("le50") * 10000L >= col("n_items") * 4000L &&
          col("le50") * 10000L <= col("n_items") * 6000L).as("rank50_ok"),
        (col("le99") * 10000L >= col("n_items") * 9800L).as("rank99_ok"))
  }

  val q59ApproxQuantilesSql: String =
    """SELECT l_returnflag,
      |  count(*)::BIGINT AS n_items,
      |  round(min(l_extendedprice), 4) AS price_min,
      |  round(max(l_extendedprice), 4) AS price_max,
      |  true AS approx50_ok,
      |  true AS approx99_ok,
      |  true AS rank50_ok,
      |  true AS rank99_ok
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Salted broadcast join under the gate: the hot-key mitigation
    * (replicate the SMALL side across salt buckets, join on (key, salt)
    * so one skewed fact key spreads over `buckets` tasks) must be
    * result-invariant — the oracle is the plain join. The broadcast side
    * is the supplier dim (small by design: replication multiplies it by
    * `buckets`, which is only affordable for a genuine dim table). */
  def q60SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_suppkey", "l_quantity")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    graft.functions.SkewFns.saltedBroadcastJoin(li, sup, "l_suppkey", buckets = 16)
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n_items"),
        sum(graft.functions.ExactDecimal.cents(col("l_quantity"))).as("qty_cents"))
  }

  val q60SaltedJoinSql: String =
    s"""SELECT s_nationkey,
       |  count(*)::BIGINT AS n_items,
       |  sum(${graft.functions.ExactDecimal.ddbCents("l_quantity")})::BIGINT AS qty_cents
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Skew-robustness BENCH queries (q115/q116): q52/q60 prove the salted
  // plans CORRECT on the near-uniform driver keys; these two run the same
  // salted operators against a deliberately hot-keyed distribution, so
  // skew robustness shows up as a benched number in BENCH_r{N}.json every
  // round (the r9 verdict's ask), not only as SkewGateSpec's one-time
  // measured bound. The skew mapping is pure integer arithmetic shared
  // verbatim by both engines (Spark's hash() is Murmur3 — not available
  // in DuckDB — and pow() is libm-dependent, so neither can be the
  // cross-engine key function):
  //   h(id, mult) = ((id % 1000000007) * mult) % 1000000007   (q49's
  //     overflow-safe Knuth form; max product ≈ 2.7e18 < 2^63)
  //   hot  ⇔ h(id, 2654435761) % 1000003 < 200000     (≈20% of rows)
  //   tail =  999 // (1 + h(id, 2654435741) % 999)    (∈ [1, 999];
  //     P(key = k) ∝ 1/k(k+1) — a Zipf-2-ish tail where key 1 alone
  //     holds ~half the tail mass, integer-exact in both engines)
  // Net effect at sf0.1: key 0 ≈ 20k rows, key 1 ≈ 40k rows of 100k —
  // exactly the one-task-funnel regime the salted rewrites exist for.

  private def skewHash(id: Column, mult: Long): Column =
    pmod(pmod(id, lit(1000000007L)) * mult, lit(1000000007L))

  private def skewKeyOf(id: Column): Column =
    // 999/x for x ∈ [1, 999]: the double quotient of two ≤10-bit ints is
    // ≥ 1/999 away from the next integer unless exact, so cast-truncate
    // IS integer division here — matching the twin's `//` bit-exactly
    when(skewHash(id, 2654435761L) % 1000003L < 200000L, lit(0L))
      .otherwise((lit(999L) / (lit(1L) + skewHash(id, 2654435741L) % 999L)).cast("long"))

  private def ddbSkewKey(id: String): String =
    s"""CASE WHEN ((($id % 1000000007) * 2654435761) % 1000000007) % 1000003 < 200000
       | THEN 0
       | ELSE 999 // (1 + ((($id % 1000000007) * 2654435741) % 1000000007) % 999)
       | END""".stripMargin.replace("\n", "")

  /** Salted aggregation under a MEASURED hot key: events re-keyed to the
    * hot+Zipf distribution, then the SAME two-phase salted sum/count as
    * q52. The oracle is the plain relational GROUP BY — salting is an
    * algebraic identity, so the hash must match exactly; the bench value
    * is the point of the query (tracked per round against q52's
    * uniform-key twin). */
  def q115SkewedAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      skewKeyOf(col("event_id")).as("skew_key"),
      graft.functions.ExactDecimal.cents(col("value")).as("cents"))
    graft.functions.SkewFns.saltedSumCount(e, Seq("skew_key"), "cents", buckets = 16)
      .select(col("skew_key"), col("cents_sum").as("value_cents"), col("n"))
  }

  val q115SkewedAggSql: String =
    s"""SELECT ${ddbSkewKey("event_id")} AS skew_key,
       |  sum(${graft.functions.ExactDecimal.ddbCents("value")})::BIGINT AS value_cents,
       |  count(*)::BIGINT AS n
       |FROM events
       |GROUP BY 1""".stripMargin

  /** Salted broadcast join under the same measured hot key: the skewed
    * events probe a 1000-row key dimension through q60's
    * replicate-the-build-side rewrite — the hot key's probe rows spread
    * over 16 tasks instead of one. Oracle: the plain join + GROUP BY. */
  def q116SkewedJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_id"),
      skewKeyOf(col("event_id")).as("skew_key"),
      graft.functions.ExactDecimal.cents(col("value")).as("cents"))
    val dim = spark.range(1000).select(
      col("id").as("skew_key"), (col("id") % 7).as("grp"))
    graft.functions.SkewFns.saltedBroadcastJoin(e, dim, "skew_key", buckets = 16)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("value_cents"))
  }

  val q116SkewedJoinSql: String =
    s"""WITH e AS (
       |  SELECT ${ddbSkewKey("event_id")} AS skew_key,
       |    ${graft.functions.ExactDecimal.ddbCents("value")} AS cents
       |  FROM events
       |),
       |dim AS (SELECT range AS skew_key, range % 7 AS grp FROM range(1000))
       |SELECT dim.grp,
       |  count(*)::BIGINT AS n_events,
       |  sum(e.cents)::BIGINT AS value_cents
       |FROM e JOIN dim ON e.skew_key = dim.skew_key
       |GROUP BY 1""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_approx_quantiles" -> (q59ApproxQuantiles _),
    "q60_salted_join" -> (q60SaltedJoin _),
    "q52_salted_agg" -> (q52SaltedAgg _),
    "q49_stratified_sample" -> (q49StratifiedSample _),
    "q41_approx_distinct" -> (q41ApproxDistinct _),
    "q42_rank_funcs" -> (q42RankFuncs _),
    "q43_cube" -> (q43Cube _),
    "q44_set_ops" -> (q44SetOps _),
    "q45_percentiles" -> (q45Percentiles _),
    "q109_outlier_fence" -> (q109OutlierFence _),
    "q110_zscore" -> (q110Zscore _),
    "q115_skewed_agg" -> (q115SkewedAgg _),
    "q116_skewed_join" -> (q116SkewedJoin _),
    "q46_array_map" -> (q46ArrayMap _)
  )

  def sql: Map[String, String] = Map(
    "q59_approx_quantiles" -> q59ApproxQuantilesSql,
    "q60_salted_join" -> q60SaltedJoinSql,
    "q52_salted_agg" -> q52SaltedAggSql,
    "q49_stratified_sample" -> q49StratifiedSampleSql,
    "q41_approx_distinct" -> q41ApproxDistinctSql,
    "q42_rank_funcs" -> q42RankFuncsSql,
    "q43_cube" -> q43CubeSql,
    "q44_set_ops" -> q44SetOpsSql,
    "q45_percentiles" -> q45PercentilesSql,
    "q109_outlier_fence" -> q109OutlierFenceSql,
    "q110_zscore" -> q110ZscoreSql,
    "q115_skewed_agg" -> q115SkewedAggSql,
    "q116_skewed_join" -> q116SkewedJoinSql,
    "q46_array_map" -> q46ArrayMapSql
  )
}
