package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-executor parity harness — the one execution dimension
  * `local[32]` cannot test: with a real standalone cluster (separate
  * executor JVMs), every shuffle row crosses a serialization boundary,
  * broadcasts ride the torrent transport instead of a same-heap
  * reference, and task results deserialize on the driver. Every query in
  * the scale-audit tier is fixed-point-integer or exact-decimal, so the
  * cluster run must be HASH-IDENTICAL to local[32] — any divergence is a
  * serialization/ordering bug.
  *
  * Usage: `ClusterParity <masterUrl> <sfDir> <outJson> [nameRegex]`
  *   masterUrl: `local[32]` (baseline) or `spark://host:7077` (cluster)
  * Env: SPARK_GRAFT_EXEC_MEM / SPARK_GRAFT_EXEC_CORES size standalone
  * executors; SPARK_GRAFT_JAR ships the app classes to executor JVMs
  * (required for non-local masters).
  *
  * The result fingerprint is ORDER-INDEPENDENT — per-row xxhash64 over
  * the row's columns IN SORTED NAME ORDER, summed with wrapping Long
  * addition — because partition count and task scheduling (which differ
  * by design between the two runs) may legally permute row order; only
  * the multiset of rows is contractual. Identical JVM + hardware on both
  * sides makes float bit-patterns reproducible, so hashing doubles is
  * sound here (same-box protocol; cross-arch parity would compare the
  * rounded decimal forms instead).
  */
object ClusterParity {

  /** The scale-audit tier (BASELINE.md): dedup, graph fixed-point,
    * storage layouts, incremental stores, the derived-width levers, and
    * (r11) the serialization-sensitive additions — the dense
    * probe-broadcast ground-truth kernel (q92/q120: primitive-array
    * broadcasts + mapPartitions heaps) and IVF-PQ (q122: plan-literal
    * LUT reconstruction) + the drift-retrain loop (q123: store swaps). */
  val Tier: Seq[String] = Seq(
    "q23_exact_dedup", "q30_minhash_lsh", "q48_dedup_components",
    "q55_bucketed_join", "q56_bloom_pruned_join",
    "q79_pagerank", "q86_pagerank_directed", "q90_media_neardup",
    "q91_incremental_pagerank",
    "q92_ann_recall_sharded", "q117_ann_lsh_wide", "q118_ivf_scaled",
    "q120_recall_scaled", "q121_bucketed_scaled",
    "q122_ivfpq_ann", "q123_drift_retrain", "q124_ivfpq_incremental",
    "q125_ivfpq_residual", "q126_filestream_ivfpq", "q127_ivfpq_scaled",
    "q128_ivfpq_refine", "q129_ivfpq_delete",
    "q130_ivfpq_res_incremental", "q131_ivfpq_res_refine",
    "q132_ivfpq_filtered", "q133_ivfpq_production",
    "q134_filestream_ivfpq_res", "q135_ivfsq8_incremental",
    "q136_ivfsq8_scaled", "q140_dedup_delete_pagerank",
    "q141_opq_incremental", "q142_pq_drift_retrain")

  def fingerprint(df: DataFrame): (String, Long) = {
    val cols = df.columns.sorted.map(c => col(s"`$c`"))
    // decimal(38,0) sum: a plain Long sum of per-row xxhash64 overflows
    // (and throws under ANSI mode) on any non-trivial row count
    val r = df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")).as("hs"), count(lit(1)).as("n")).first()
    (if (r.isNullAt(0)) "0" else r.getDecimal(0).toBigInteger.toString, r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ClusterParity <masterUrl> <sfDir> <outJson> [nameRegex]")
    val Array(master, sfDir, outJson) = args.take(3)
    val nameRe = args.lift(3).map(_.r)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = graft.core.Sessions.builder(master, shuffleParts)
    sys.env.get("SPARK_GRAFT_EXEC_MEM").foreach(m => b = b.config("spark.executor.memory", m))
    sys.env.get("SPARK_GRAFT_EXEC_CORES").foreach(c => b = b.config("spark.executor.cores", c))
    sys.env.get("SPARK_GRAFT_JAR").foreach(j => b = b.config("spark.jars", j))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // corpus-derived shuffle width (floored at the pinned core count →
    // identical to the pinned layout at gate SFs; SPARK_GRAFT_CPUS still
    // raises the floor for the documented retry recipes)
    graft.core.Sessions.deriveShuffle(spark, sfDir, shuffleParts.toInt)
    // spill accounting for the memory-pressure gate: the sf10 small-
    // executor runs must PROVE the spill regime engaged (spilledBytes >
    // 0) while hashes stay identical — a "spill parity" claim without
    // this number would be unfalsifiable
    val memSpilled = new java.util.concurrent.atomic.AtomicLong()
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    // task-end events arrive ASYNCHRONOUSLY on the listener bus, so
    // sampling the counters right after an action can undercount (a
    // query that spilled could read 0, and its spill could be billed to
    // the next query). Drain by polling until the counters are stable
    // for two consecutive samples (bounded wait) — attribution remains
    // approximate by nature (best-effort listener delivery), which is
    // fine for this gate: the contract is spilledBytes > 0 on the heavy
    // rows plus the run-level totals, not exact per-query accounting.
    def drainSpillCounters(): Unit = {
      var prev = -1L
      var cur = memSpilled.get() + diskSpilled.get()
      var waited = 0
      while (prev != cur && waited < 2000) {
        Thread.sleep(100)
        waited += 100
        prev = cur
        cur = memSpilled.get() + diskSpilled.get()
      }
    }
    graft.core.Tables.lineitem(spark, sfDir).limit(1).count() // JVM/exec warm-up
    val queries = graft.SparkEntry.queries
    // an explicit regex selects from the FULL query inventory (so any
    // query can be parity-checked); no regex = the standard audit tier
    val names = nameRe match {
      case Some(re) => queries.keys.filter(re.findFirstIn(_).isDefined).toSeq.sorted
      case None     => Tier
    }
    val rows = names.map { name =>
      drainSpillCounters() // flush the previous query's late task-end events
      val t0 = System.nanoTime()
      val sp0 = memSpilled.get() + diskSpilled.get()
      val out =
        try {
          val (h, n) = fingerprint(queries(name)(spark, sfDir))
          val dt = (System.nanoTime() - t0) / 1e9
          drainSpillCounters()
          val sp = memSpilled.get() + diskSpilled.get() - sp0
          s""""$name":{"hash":"$h","rows":$n,"sec":${f"$dt%.3f"},"spilledBytes":$sp}"""
        } catch { case e: Throwable =>
          System.err.println(s"[parity] $name failed: ${e.getMessage}")
          s""""$name":{"error":"${e.getClass.getSimpleName}"}"""
        }
      spark.catalog.clearCache()
      // fingerprint() fully evaluated the plan — release any BlockTopK
      // probe broadcasts it captured (one leak per q92/q120-style query
      // per run otherwise)
      graft.ml.BlockTopK.releaseBroadcasts(spark)
      out
    }
    drainSpillCounters() // run-level totals: flush stragglers before emit
    val json = s"""{"master":"$master","sf":"$sfDir","memSpilledBytes":${memSpilled.get()},"diskSpilledBytes":${diskSpilled.get()},"queries":{${rows.mkString(",")}}}"""
    val w = new java.io.PrintWriter(outJson)
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
