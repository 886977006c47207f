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

  test("tokenFreqStream: windowed counts ≡ batch explode+groupBy on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    in.addData(
      (ts("2024-01-01 00:10:00"), "spark spark scan"),
      (ts("2024-01-01 00:40:00"), "scan spark"),
      (ts("2024-01-01 02:00:00"), "later"))  // advances watermark past hour 0
    val df = in.toDF().toDF("ts", "text")
    runToMemory(StreamingOps.tokenFreqStream(df), "tokfreq")
    val got = spark.sql("select token, freq from tokfreq where window_start = timestamp '2024-01-01 00:00:00'")
      .as[(String, Long)].collect().toMap
    // batch twin on the hour-0 rows
    val batch = Seq("spark spark scan", "scan spark").toDF("text")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFns.tokens(org.apache.spark.sql.functions.col("text"))).as("token"))
      .groupBy("token").count().as[(String, Long)].collect().toMap
    assert(got == batch)
    assert(got("spark") == 3 && got("scan") == 2)
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

  test("asofEnrich: marks enrich readings, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AsofEvent]
    // batch 1: a mark, then a reading at equal ts (mark wins), one before any mark
    in.addData(
      AsofEvent(1L, ts("2024-01-01 09:00:00"), is_mark = false, 10.0), // no mark yet → null
      AsofEvent(1L, ts("2024-01-01 10:00:00"), is_mark = true, 5.0),
      AsofEvent(1L, ts("2024-01-01 10:00:00"), is_mark = false, 11.0)) // equal ts → 5.0
    val out = StreamingOps.asofEnrich(in.toDS())
    runToMemory(out.toDF(), "asof1")
    val r1 = spark.sql("select * from asof1").collect()
      .map(r => (r.getAs[Double]("value"), Option(r.get(r.fieldIndex("asof_value"))))).toMap
    assert(r1(10.0).isEmpty)
    assert(r1(11.0).contains(5.0))
    // batch 2: a later reading uses batch 1's mark from state
    in.addData(AsofEvent(1L, ts("2024-01-01 12:00:00"), is_mark = false, 12.0))
    runToMemory(out.toDF(), "asof2")
    val r2 = spark.sql("select * from asof2").collect()
      .map(r => (r.getAs[Double]("value"), Option(r.get(r.fieldIndex("asof_value"))))).toMap
    assert(r2(12.0).contains(5.0), "mark state must survive the batch boundary")
  }

  test("asofEnrich parity: in-order stream ≡ TemporalOps.asofJoin batch result") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      AsofEvent(1L, ts("2024-01-01 08:00:00"), is_mark = true, 1.0),
      AsofEvent(1L, ts("2024-01-01 09:00:00"), is_mark = false, 100.0),
      AsofEvent(1L, ts("2024-01-01 09:30:00"), is_mark = true, 2.0),
      AsofEvent(1L, ts("2024-01-01 10:00:00"), is_mark = false, 101.0),
      AsofEvent(2L, ts("2024-01-01 08:30:00"), is_mark = false, 200.0),
      AsofEvent(2L, ts("2024-01-01 09:00:00"), is_mark = true, 3.0),
      AsofEvent(2L, ts("2024-01-01 09:10:00"), is_mark = false, 201.0))
    val in = MemoryStream[AsofEvent]
    in.addData(events: _*)
    runToMemory(StreamingOps.asofEnrich(in.toDS()).toDF(), "asof_parity")
    val streamed = spark.sql("select * from asof_parity").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        Option(r.get(r.fieldIndex("asof_value"))))).toSet

    val df = events.toDF()
    val readings = df.filter(!col("is_mark")).select(col("user_id"), col("ts"), col("value"))
    val marks = df.filter(col("is_mark"))
      .select(col("user_id"), col("ts"), col("value").as("mark_value"))
    val batch = graft.operators.TemporalOps
      .asofJoin(readings, marks, Seq("user_id"), "ts", Seq("mark_value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        Option(r.get(r.fieldIndex("mark_value"))))).toSet
    assert(streamed == batch)
  }

  test("windowedStreamJoin: stream-stream time-bounded join ≡ batch join") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    imps.addData(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:05:00")),
      (3L, ts("2024-01-01 00:20:00")),
      (9L, ts("2024-01-01 02:00:00"))) // advances the impression watermark
    clicks.addData(
      (1L, ts("2024-01-01 00:04:00")),  // within window → joins
      (2L, ts("2024-01-01 00:30:00")),  // 25 min later → outside window
      (3L, ts("2024-01-01 00:20:30")),  // 30 s later → joins
      (7L, ts("2024-01-01 00:06:00")),  // no impression → drops
      (9L, ts("2024-01-01 02:30:00"))) // advances the click watermark
    val impDf = imps.toDF().toDF("imp_id", "imp_ts")
    val clickDf = clicks.toDF().toDF("click_imp_id", "click_ts")
    runToMemory(StreamingOps.windowedStreamJoin(impDf, clickDf), "attributed")
    val streamed = spark.sql("select imp_id, latency_s from attributed")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed == Seq((1L, 240L), (3L, 30L)))
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
