package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard config (SURVEY §7.1).
  *
  * UTC session TZ (oracle parity), AQE on (runtime re-plan / skew-join at
  * scale), shuffle partitions sized to the local core count rather than the
  * 200 default, and the legacy nanos flag so the `events` table's
  * TIMESTAMP(NANOS) parquet column is readable (see [[Tables.events]]).
  */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores.toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
