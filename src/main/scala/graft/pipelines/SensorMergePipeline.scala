package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The sensor-CSV merge pipeline (SURVEY P2; ref:
  * utils/20251223-csv-to-separate-sensors.py + the Polars variant):
  * group exports by sensor, normalize each file, fold them in export-
  * timestamp order into one wide series via full-outer join + coalesce,
  * materializing `!A! col`-style conflict columns where overlapping
  * values disagree beyond tolerance.
  *
  * Non-standard semantics preserved (SURVEY §7.4 items 1-2):
  *  - the fold is order-dependent (conflict prefixes assigned in file
  *    order, advancing only when a file produces ≥1 conflict) → the
  *    per-sensor fold stays sequential on the driver building ONE lazy
  *    plan; parallelism comes from sensors being independent and from
  *    Spark executing each plan distributed.
  *  - conflict = both sides present AND outside `np.isclose`-style
  *    tolerance (|a−b| > atol + rtol·|b|), with NaN == NaN equal.
  *  - the pandas conflict-name spelling `"!A! <col>"` (trailing space
  *    after `!`) is canonical; the Polars variant's differing spelling is
  *    deliberately not reproduced.
  *
  * Scale: each file is read and normalized distributed; the fold joins
  * on `Timestamp` (shuffle per join, ≤ ~10 files per sensor → shallow
  * plan). A 100 TB variant with thousands of files per key would replace
  * the fold with a single union + groupBy(Timestamp) keep-priority agg —
  * provided conflict naming is relaxed to per-source instead of
  * per-file-order (documented trade-off, see mergeAllUnioned).
  */
object SensorMergePipeline {

  /** np.isclose(rtol=1e-5, atol=1e-9) with NaN==NaN equal
    * (ref: 20251223-csv-to-separate-sensors.py:108-121). */
  def tolerantEquals(a: Column, b: Column, rtol: Double = 1e-5, atol: Double = 1e-9): Column =
    (isnan(a) && isnan(b)) ||
      (abs(a - b) <= lit(atol) + lit(rtol) * abs(b))

  /** Conflict predicate for one shared column pair (both present AND not
    * tolerably equal; strings compare exactly via null-safe eq). */
  def isConflict(base: Column, inc: Column, numeric: Boolean): Column =
    if (numeric) base.isNotNull && inc.isNotNull && !tolerantEquals(base, inc)
    else base.isNotNull && inc.isNotNull && !(base <=> inc)

  private val TimestampFormats = Seq("yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd HH:mm:ss", "dd/MM/yyyy HH:mm:ss")

  /** Split one CSV header line into column names: minimal RFC-4180
    * (double-quote fields, `""` escapes) — enough for export headers,
    * which never nest separators deeper than that. Kept private-but-
    * testable: SensorMergePipelineSpec proves it byte-identical to what
    * `spark.read.csv` derives on every real export header. */
  private[pipelines] def splitCsvHeader(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '"' if inQ && i + 1 < line.length && line.charAt(i + 1) == '"' =>
          cur.append('"'); i += 1
        case '"' => inQ = !inQ
        case ',' if !inQ => out += cur.result(); cur.clear()
        case c => cur.append(c)
      }
      i += 1
    }
    out += cur.result()
    out.toSeq
  }

  /** First line of a file via the Hadoop FS API (any scheme), decoded
    * UTF-8; `readLine` drops the `\r` of CRLF exports. The UTF-8 BOM is
    * KEPT in the first name — matching `spark.read.csv`, whose header
    * inference leaves it in place (the reason the timestamp-column find
    * is a substring match). */
  private def headerColumns(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), java.nio.charset.StandardCharsets.UTF_8))
    val line = try reader.readLine() finally reader.close()
    if (line == null) Seq.empty else splitCsvHeader(line)
  }

  /** Normalize one export CSV (ref :52-85): find the timestamp column by
    * case-insensitive substring (BOM-safe), rename to `Timestamp`, parse,
    * drop null timestamps, dedupe duplicate timestamps keeping the last
    * input occurrence, best-effort-cast every other column to double
    * (errors→null, matching pd.to_numeric(errors='coerce')).
    * Returns None when no timestamp-like column exists (file skipped).
    *
    * The header is read ON THE DRIVER and handed to the reader as an
    * explicit all-string schema: `spark.read.csv` with header inference
    * launches a scan job per file just to learn the names, and at ~7
    * files per sensor those jobs dominated p2's construction time
    * (~1 s/run measured at sf0.1 — pure fixed cost, none of it data).
    * One driver-side first-line read per file replaces them; the data
    * scan still happens distributed, once, when the fold executes.
    * Duplicate header names fall back to the inference path (Spark
    * uniquifies them there; an explicit schema cannot).
    *
    * The explicit schema carries BOM-STRIPPED names: Spark's CSV header
    * validation compares the schema against the BOM-stripped file header,
    * so a BOM-kept schema name logs a spurious per-file mismatch `ERROR`
    * on every run (pure noise — enforceSchema applies the schema anyway).
    * The BOM is restored by a post-read rename so the resulting frame
    * stays byte-identical to what header inference produces (inference
    * keeps the BOM — the reason the timestamp find is a substring match). */
  def readNormalized(spark: SparkSession, path: String): Option[DataFrame] = {
    val names = headerColumns(spark, path)
    val deBom = names match {
      case h +: t => h.stripPrefix("\uFEFF") +: t
      case _ => names
    }
    val raw =
      if (names.nonEmpty && deBom.distinct.size == deBom.size) {
        val read = spark.read.option("header", "true")
          .schema(org.apache.spark.sql.types.StructType(deBom.map(n =>
            org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
          .csv(path)
        if (deBom.head != names.head) read.withColumnRenamed(deBom.head, names.head) else read
      } else spark.read.option("header", "true").csv(path)
    raw.columns.find(_.toLowerCase.contains("timestamp")).map { tsCol =>
      val renamed = raw.withColumnRenamed(tsCol, "Timestamp")
        .withColumn("_seq", monotonically_increasing_id())
        .withColumn("Timestamp",
          coalesce(TimestampFormats.map(f => try_to_timestamp(col("Timestamp"), lit(f))): _*))
        .filter(col("Timestamp").isNotNull)
      val keepLast = Window.partitionBy("Timestamp").orderBy(col("_seq").desc)
      val deduped = renamed
        .withColumn("_rn", row_number().over(keepLast))
        .filter(col("_rn") === 1)
        .drop("_rn", "_seq")
      deduped.columns.filterNot(_ == "Timestamp").foldLeft(deduped) { (df, c) =>
        df.withColumn(c, col(s"`$c`").cast("double")) // names may contain dots
      }
    }
  }

  /** Fold all of one sensor's files (already in export-timestamp order)
    * into the merged wide series (ref :147-223).
    *
    * Prefix letters are assigned DEFERRED: the fold builds one lazy plan
    * tagging every potential conflict column with its file index
    * (`!#3! col`); [[finalize]]'s single non-null-count pass then drops
    * the conflict-free ones and renumbers the surviving file indices to
    * letters in file order — byte-identical to the reference's eager
    * per-file probing (a letter advances exactly when a file produced
    * ≥1 conflict), but with ONE action instead of one per file. */
  def mergeSensor(spark: SparkSession, paths: Seq[String]): Option[DataFrame] = {
    val frames = paths.flatMap(p => readNormalized(spark, p))
    frames.headOption.map { head =>
      frames.tail.zipWithIndex.foldLeft(head) { case (acc, (next, i)) =>
        mergeStepProvisional(acc, next, i + 1)
      }
    }
  }

  /** One lazy fold step: full-outer align + coalesce fill, materializing a
    * provisional `!#<fileIdx>! col` for EVERY shared column — all-null
    * when that column had no conflicts — and performs no action.
    * Base-only columns (absent from the incoming file) pass through
    * unchanged, like the reference's pandas outer merge — a latent r2 bug
    * dropped them, masked because every real export of one sensor shares
    * all columns; caught by the mergeAllUnioned≡fold property spec. */
  def mergeStepProvisional(base: DataFrame, incoming: DataFrame, fileIdx: Int): DataFrame = {
    val shared = base.columns.toSeq.intersect(incoming.columns.toSeq).filterNot(_ == "Timestamp")
      .filterNot(_.startsWith("!"))
    val fresh = incoming.columns.toSeq.diff(base.columns.toSeq).filterNot(_ == "Timestamp")
    val b = base.as("b")
    val i = incoming.as("i")
    val joined = b.join(i, Seq("Timestamp"), "full_outer")
    def numeric(df: DataFrame, c: String) = df.schema(c).dataType == DoubleType
    val baseData = base.columns.toSeq.filterNot(c => c == "Timestamp" || c.startsWith("!"))
    val keepConflict = base.columns.toSeq.filter(_.startsWith("!"))
    val outCols: Seq[Column] =
      col("Timestamp") +:
        (baseData.map { c =>
          if (shared.contains(c)) coalesce(col(s"b.`$c`"), col(s"i.`$c`")).as(c)
          else col(s"b.`$c`").as(c)
        } ++
          keepConflict.map(c => col(s"b.`$c`")) ++
          fresh.map(c => col(s"i.`$c`").as(c)) ++
          shared.map { c =>
            val pred = isConflict(col(s"b.`$c`"), col(s"i.`$c`"),
              numeric(base, c) && numeric(incoming, c))
            when(pred, col(s"i.`$c`")).as(s"!#$fileIdx! $c")
          })
    joined.select(outCols: _*)
  }

  /** Final projection (ref :203-221): drop all-null columns (one agg
    * pass), order as Timestamp, regular columns, sorted conflict
    * columns; rows sorted by Timestamp.
    *
    * The fold is PERSISTED before the count action: finalize needs two
    * passes by construction (the column-drop decision is an aggregate of
    * the very frame being projected), and without the cache the second
    * pass would re-read and re-join every export file — the whole
    * pipeline, twice (measured ~2× on p2). The merged wide series is the
    * thing a caller is about to consume anyway; the cache is dropped by
    * the session's normal cache hygiene (clearCache between queries). */
  def finalize(df0: DataFrame): DataFrame = {
    val df = df0.persist()
    val dataCols = df.columns.toSeq.filterNot(_ == "Timestamp")
    val nonNullCounts: Map[String, Long] =
      if (dataCols.isEmpty) Map.empty
      else {
        val row = df.agg(
          count(col(s"`${dataCols.head}`")).as(dataCols.head),
          dataCols.tail.map(c => count(col(s"`$c`")).as(c)): _*).collect()(0)
        dataCols.zipWithIndex.map { case (c, idx) => c -> row.getLong(idx) }.toMap
      }
    val alive = dataCols.filter(nonNullCounts.getOrElse(_, 0L) > 0L)
    val (conflict, regular) = alive.partition(_.startsWith("!"))
    // renumber surviving provisional conflict tags (`!#i! col`) to the
    // reference's letters, in file order — see mergeSensor doc
    val prov = "^!#(\\d+)! (.*)$".r
    val fileIdxs = conflict.collect { case prov(i, _) => i.toInt }.distinct.sorted
    val letterOf = fileIdxs.zipWithIndex.map { case (i, k) => i -> ('A' + k).toChar }.toMap
    val renamed = conflict.map {
      case orig @ prov(i, c) => orig -> s"!${letterOf(i.toInt)}! $c"
      case orig => orig -> orig
    }
    val conflictCols = renamed.sortBy(_._2).map { case (orig, nw) => col(s"`$orig`").as(nw) }
    df.select((Seq("Timestamp") ++ regular).map(c => col(s"`$c`")) ++ conflictCols: _*)
      .orderBy("Timestamp")
  }

  /** Driver-side discovery: glob a directory of `{sensor}_export_{ts}.csv`
    * files, group by the regex-captured sensor name, order each group by
    * the embedded export timestamp (ref :23-41,260-272). */
  def discover(dir: String): Map[String, Seq[String]] = {
    val pat = "^(.+?)_export_(\\d{12}).*\\.csv$".r
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.flatMap { f =>
      f.getName match {
        case pat(sensor, ts) => Some((sensor, ts, f.getAbsolutePath))
        case _ => None
      }
    }.groupBy(_._1)
      .map { case (s, arr) => s -> arr.sortBy(_._2).map(_._3).toSeq }
  }

  /** Full pipeline: all sensors in `dir` → merged frame per sensor.
    * Sensors are independent; each fold builds one lazy plan executed by
    * Spark distributed. */
  def run(spark: SparkSession, dir: String): Map[String, DataFrame] =
    discover(dir).flatMap { case (sensor, paths) =>
      mergeSensor(spark, paths).map(m => sensor -> finalize(m))
    }

  /** Per-sensor CSV sink (ref :299-302): single header CSV per sensor,
    * filename sanitized like the reference (path-hostile chars → '_').
    * `coalesce(1)` matches the reference's one-file-per-sensor contract —
    * at 100 TB you would drop it and write a partitioned directory. */
  def writeCsv(merged: Map[String, DataFrame], outDir: String): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    merged.toSeq.sortBy(_._1).map { case (sensor, df) =>
      val safe = sensor.replaceAll("[^A-Za-z0-9 ()_.-]", "_")
      val target = s"$outDir/$safe"
      df.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(target)
      target
    }
  }

  /** The 100 TB shape: union all files tagged by source priority, ONE
    * shuffle on Timestamp — no N-deep join chain. Now carries FULL
    * conflict semantics (the r2 version had fill-only, flagged `weak`):
    *
    * For every column and every non-head file `s`, the aggregation also
    * computes (a) the winning value among sources `< s` (the fold's
    * "base so far" — min-priority non-null, via a (prio, value) struct
    * min) and (b) file `s`'s own value; a provisional `!#s! col` then
    * materializes where both exist and differ beyond tolerance — exactly
    * [[mergeStepProvisional]]'s predicate, so [[finalize]] renumbers the
    * surviving tags to the reference's letters identically and
    * `finalize(mergeAllUnioned(files)) == finalize(fold(files))`
    * column-for-column (property-tested in SensorMergePipelineSpec).
    *
    * Cost: `cols × (2·files−1)` aggregate expressions in one
    * hash-aggregate vs the fold's `files−1` sequential shuffle joins —
    * the winning trade wherever files-per-sensor is large. Assumes
    * normalized (all-double) inputs, as produced by [[readNormalized]]. */
  def mergeAllUnioned(frames: Seq[DataFrame]): DataFrame = {
    val tagged = frames.zipWithIndex.map { case (f, idx) =>
      f.withColumn("_prio", lit(idx))
    }
    val allCols = tagged.flatMap(_.columns).distinct.filterNot(Seq("Timestamp", "_prio").contains)
    val unioned = tagged.map { f =>
      val missing = allCols.diff(f.columns.toSeq)
      missing.foldLeft(f)((d, c) => d.withColumn(c, lit(null).cast("double")))
        .select((Seq("Timestamp", "_prio") ++ allCols).map(c => col(s"`$c`")): _*)
    }.reduce(_ unionByName _)
    def winnerUpTo(c: String, bound: Column): Column =
      min(when(col("_prio") < bound && col(s"`$c`").isNotNull,
        struct(col("_prio"), col(s"`$c`").as("v"))))
    val aggs: Seq[Column] = allCols.flatMap { c =>
      winnerUpTo(c, lit(frames.length)).as(s"_w! $c") +:
        (1 until frames.length).flatMap { s =>
          Seq(
            winnerUpTo(c, lit(s)).as(s"_b$s! $c"),
            max(when(col("_prio") === s, col(s"`$c`"))).as(s"_r$s! $c"))
        }
    }
    val grouped = unioned.groupBy("Timestamp").agg(aggs.head, aggs.tail: _*)
    val out: Seq[Column] = col("Timestamp") +:
      (allCols.map(c => col(s"`_w! $c`").getField("v").as(c)) ++
        allCols.flatMap { c =>
          (1 until frames.length).map { s =>
            val base = col(s"`_b$s! $c`").getField("v")
            val inc = col(s"`_r$s! $c`")
            when(isConflict(base, inc, numeric = true), inc).as(s"!#$s! $c")
          }
        })
    grouped.select(out: _*)
  }
}
