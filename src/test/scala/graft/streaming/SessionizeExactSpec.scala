package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q103's exact streaming sessionizer: batch parity at the operator
  * level plus the boundary-crossing property that makes the two-batch
  * replay a real test of cross-batch state. */
class SessionizeExactSpec extends SparkSpec {

  test("streamed sessions equal the batch q39 aggregate (operator parity)") {
    val streamed = graft.queries.SessionQueries
      .q103StreamingSessionize(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.SessionQueries.q39Sessionize(spark, sfDir)
      .select("user_id", "session_id", "n_events", "value_cents",
        "start_us", "end_us")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stream/batch diverge: ${(streamed diff batch).take(3)} vs ${(batch diff streamed).take(3)}")
  }

  test("the micro-batch split lands inside at least one session") {
    import spark.implicits._
    val ts = graft.core.Tables.events(spark, sfDir)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    val midUs = ts(ts.length / 2)
    val crossing = graft.queries.SessionQueries.q39Sessionize(spark, sfDir)
      .filter(col("start_us") <= midUs && col("end_us") > midUs).count()
    assert(crossing > 0,
      "no session spans the batch boundary — the replay would not test cross-batch state")
  }
}
