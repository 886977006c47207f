package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every table is a single parquet file per scale factor. At 100 TB these
  * would be multi-file partitioned datasets; nothing here assumes a single
  * file — `spark.read.parquet` takes directories and globs equally well.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalization to a real TimestampType (instant), whatever
    * the parquet generation produced:
    *  - TIMESTAMP(NANOS) → Spark 4 can only read it as Long (Sessions sets
    *    `spark.sql.legacy.parquet.nanosAsLong=true`); `div 1000` truncates
    *    ns→µs TOWARD ZERO — for pre-epoch (negative) nanos that differs
    *    from floor, but the testdata timestamps are all post-epoch, where
    *    the two agree (and agree with DuckDB's truncation).
    *  - naive µs under a session that still infers TIMESTAMP_NTZ (ours
    *    disables the inference at the scan — see [[Sessions]] — but the
    *    driver may hand us a foreign session): cast NTZ→instant. The cast
    *    is walltime-preserving ONLY under a UTC session TZ, so that
    *    precondition FAILS FAST here instead of being assumed — a foreign
    *    session that skipped Sessions.builder likely skipped the TZ conf
    *    too, which would silently shift every ts. (Not forced with
    *    conf.set: mutating the session TZ as a read side effect would
    *    silently re-time every other timestamp expression the caller's
    *    session evaluates — and the cast is lazy, so a set-then-restore
    *    cannot scope it either.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts is TIMESTAMP_NTZ under a non-UTC session timezone; the " +
            "walltime-preserving normalization requires spark.sql.session.timeZone=UTC " +
            "(use graft.core.Sessions.builder)")
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
