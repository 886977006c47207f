package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream–batch parity: the watermarked streaming aggregation must
  * produce exactly the batch answer once the stream drains — Structured
  * Streaming's core guarantee, asserted on real data (the reference
  * electricity readings replayed as a file stream). */
class StreamBatchParitySpec extends SparkSpec {

  test("streaming 15-min buckets over the electricity readings ≡ batch buckets") {
    import graft.pipelines.ElectricityPipeline
    val csv = "/root/reference/utils/For Pandas and Polars --- Electricity.csv"

    // batch truth: per-bucket reading counts (complete aggregation only —
    // append-mode streams emit a window exactly once, on watermark close)
    val batch = ElectricityPipeline.read(spark, csv)
      .withColumn("bucket", window(col("LocalDateTime"), "15 minutes")("start"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("P").as("p_sum"))

    // same source as a file stream, staged into its own directory (the
    // reference dir holds non-CSV files the source must not pick up)
    val stage = java.nio.file.Files.createTempDirectory("elecstream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(csv), stage.resolve("readings.csv"))
    val stream = spark.readStream
      .option("header", "true")
      .schema("Date STRING, Time STRING, P DOUBLE, OP DOUBLE")
      .csv(stage.toString)
      .filter(col("Date").isNotNull)
      .withColumn("LocalDateTime",
        to_timestamp(concat_ws(" ", col("Date"), col("Time")), "dd/MM/yyyy HH:mm:ss"))
      .withWatermark("LocalDateTime", "0 seconds")
      .groupBy(window(col("LocalDateTime"), "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum("P").as("p_sum"))
      .select(col("w.start").as("bucket"), col("n"), col("p_sum"))

    val q = stream.writeStream.format("memory").queryName("elec_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.sql("select * from elec_stream")
    val mism = batch.as("b").join(streamed.as("s"), Seq("bucket"), "full_outer")
      .filter(!(col("b.n") <=> col("s.n")) || !(col("b.p_sum") <=> col("s.p_sum")))
      .count()
    assert(mism == 0, "stream and batch aggregations must agree bucket-for-bucket")
    assert(streamed.count() == batch.count())
  }

  test("streaming corpus prep ≡ batch front-end on the documents table (id-ordered arrival)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    // id-ordered arrival, one synthetic minute apart
    in.addData(docs.zipWithIndex.map { case ((id, text), i) =>
      (id, text, java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(i.toLong)))
    }.toSeq)
    val stream = StreamingOps.corpusPrepStream(in.toDF().toDF("doc_id", "text", "ts"))
    val q = stream.writeStream.format("memory").queryName("corpus_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("select doc_id, pred_lang from corpus_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // batch truth: same filter, canonical MIN doc_id per content hash —
    // equal to first-arrival under id-ordered replay
    val batch = graft.queries.CorpusPrepQueries
      .scoreAndLang(graft.core.Tables.documents(spark, sfDir))
      .filter(col("quality_score") >= 0.7)
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .withColumn("canonical_id",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
      .filter(col("doc_id") === col("canonical_id"))
      .select("doc_id", "pred_lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    assert(streamed == batch,
      s"stream kept ${streamed.length} docs, batch kept ${batch.length}")
  }
}
