package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    ()
  }

  test("bucketUsage: watermarked tumbling 15-minute aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    in.addData(
      (ts("2024-01-01 00:01:00"), 1L, 1.0),
      (ts("2024-01-01 00:14:00"), 1L, 2.0),
      (ts("2024-01-01 00:16:00"), 1L, 4.0),
      (ts("2024-01-01 01:00:00"), 1L, 8.0)) // advances watermark past both windows
    val df = in.toDF().toDF("ts", "user_id", "value")
    runToMemory(StreamingOps.bucketUsage(df), "buckets")
    val rows = spark.sql("select * from buckets order by bucket_start").collect()
    // append mode emits only watermark-closed windows: 00:00 and 00:15
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("value_sum") == 3.0 && rows(0).getAs[Long]("n") == 2)
    assert(rows(1).getAs[Double]("value_sum") == 4.0)
  }

  test("dedup: watermarked dropDuplicates on (user_id, ts)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    in.addData(
      (ts("2024-01-01 00:01:00"), 1L, 1.0),
      (ts("2024-01-01 00:01:00"), 1L, 99.0), // duplicate key
      (ts("2024-01-01 00:01:00"), 2L, 5.0))
    runToMemory(StreamingOps.dedup(in.toDF().toDF("ts", "user_id", "value")), "deduped")
    val rows = spark.sql("select * from deduped").collect()
    assert(rows.length == 2)
    // keep-first semantics
    assert(rows.find(_.getAs[Long]("user_id") == 1L).get.getAs[Double]("value") == 1.0)
  }

  test("sessionize: gap-based sessions close on the next batch's out-of-gap event") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:10:00"), 2.0),
      (1L, ts("2024-01-01 02:00:00"), 4.0), // > 30 min gap → closes session 1
      (2L, ts("2024-01-01 00:00:00"), 7.0))
    val sessions = StreamingOps.sessionize(in.toDS(), gapMinutes = 30)
    runToMemory(sessions.toDF(), "sessions")
    val rows = spark.sql("select * from sessions").collect()
    // only user 1's first session is closed (user 2's and user 1's second stay open)
    assert(rows.length == 1)
    val s = rows(0)
    assert(s.getAs[Long]("user_id") == 1L)
    assert(s.getAs[Long]("n_events") == 2L)
    assert(s.getAs[Double]("value_sum") == 3.0)
    assert(s.getAs[Timestamp]("end_ts") == ts("2024-01-01 00:10:00"))
  }

  test("weightTxtStream: file-source incremental parse with AvailableNow") {
    val dir = java.nio.file.Files.createTempDirectory("wstream")
    java.nio.file.Files.writeString(dir.resolve("a.txt"),
      "h\nTime:08:00, Mon,2025-12-01\nWeight:90.0kg\nBMI:25.0\n")
    java.nio.file.Files.writeString(dir.resolve("b.txt"),
      "h\nTime:08:00, Tue,2025-12-02\nWeight:91.0kg\n")
    runToMemory(StreamingOps.weightTxtStream(spark, dir.toString), "weights")
    val rows = spark.sql("select * from weights").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("attribute")).count(_ == "Weight") == 2)
    assert(rows.map(_.getAs[String]("source_file_id")).toSet == Set("a.txt", "b.txt"))
  }

  test("syncStream: checkpointed upsert — restart never re-parses or duplicates") {
    val store = java.nio.file.Files.createTempDirectory("sstore")
    val cache = store.resolve("cache_out").toString
    val ckpt = store.resolve("ckpt").toString
    def put(name: String, date: String) =
      java.nio.file.Files.writeString(store.resolve(name),
        s"h\nTime:08:00, Mon,$date\nWeight:90.0kg\nBMI:25.0\n")
    put("a.txt", "2025-12-01")
    put("b.txt", "2025-12-02")
    StreamingOps.syncStream(spark, store.toString, cache, ckpt)
    assert(spark.read.parquet(cache).count() == 4)
    put("c.txt", "2025-12-03")
    StreamingOps.syncStream(spark, store.toString, cache, ckpt) // resume from checkpoint
    val after = spark.read.parquet(cache)
    assert(after.count() == 6)
    assert(after.select("source_file_id").distinct().count() == 3)
    // third run: no new files → no growth
    StreamingOps.syncStream(spark, store.toString, cache, ckpt)
    assert(spark.read.parquet(cache).count() == 6)
  }
}
