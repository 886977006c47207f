package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard config (SURVEY §7.1).
  *
  * UTC session TZ (oracle parity), AQE on (runtime re-plan / skew-join at
  * scale), shuffle partitions sized to the local core count rather than the
  * 200 default, and the legacy nanos flag so a TIMESTAMP(NANOS) parquet
  * `events.ts` column stays readable (see [[Tables.events]]).
  *
  * `inferTimestampNTZ` is OFF: the testdata parquet carries naive
  * (unannotated) timestamps, and DuckDB — the correctness oracle — reads
  * those as plain TIMESTAMP. With a UTC session TZ, reading them as
  * TimestampType (instant, walltime-as-UTC) is value-identical to the
  * oracle AND keeps `unix_micros`/interval arithmetic applicable, whereas
  * the Spark 4 default would surface TIMESTAMP_NTZ and break both. Doing
  * this at the scan (not a post-read cast) keeps parquet predicate
  * pushdown on timestamp columns intact.
  */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores.toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
