package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE applies U/D/I exactly and passes unmatched rows through") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "U", "b2", 22.0),  // update
      (3L, "D", null, 0.0),   // delete
      (9L, "I", "i", 90.0))   // insert
      .toDF("k", "op", "name", "v")
    val out = MergeInto.merge(base, changes, "k", Seq("name", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 10.0, "kept"),
      (2L, "b2", 22.0, "updated"),
      (4L, "d", 40.0, "kept"),
      (9L, "i", 90.0, "inserted")))
  }

  test("duplicate keys in the change set fail loudly (Delta multiple-matches semantics)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val changes = Seq(
      (2L, "U", "b2", 22.0),
      (2L, "U", "b3", 23.0)) // same key twice — would fan out base row 2
      .toDF("k", "op", "name", "v")
    val e = intercept[Exception] {
      MergeInto.merge(base, changes, "k", Seq("name", "v")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("MERGE precondition violated")),
      s"expected the duplicate-key guard to fire, got: $e")
    // duplicate I-rows for an absent key must fail too (both would insert)
    val dupIns = Seq((9L, "I", "x", 1.0), (9L, "I", "y", 2.0)).toDF("k", "op", "name", "v")
    val e2 = intercept[Exception] {
      MergeInto.merge(base, dupIns, "k", Seq("name", "v")).collect()
    }
    assert(messages(e2).exists(_.contains("MERGE precondition violated")))
  }

  test("empty change set is the identity merge (all rows kept)") {
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val changes = Seq.empty[(Long, String, String, Double)].toDF("k", "op", "name", "v")
    val out = MergeInto.merge(base, changes, "k", Seq("name", "v"))
    assert(out.count() == 1)
    assert(out.filter(col("merge_status") =!= "kept").isEmpty)
  }

  test("merge is idempotent — re-applying the same I/U/D change set changes nothing") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val changes = Seq((2L, "U", "b2", 22.0), (3L, "D", null, 0.0), (9L, "I", "i", 90.0))
      .toDF("k", "op", "name", "v")
    val once = MergeInto.merge(base, changes, "k", Seq("name", "v")).drop("merge_status")
    // the replayed insert hits its own earlier copy and must be a no-op
    // (insert-if-absent), the replayed delete finds nothing, the replayed
    // update overwrites with the same payload
    val twice = MergeInto.merge(once, changes, "k", Seq("name", "v")).drop("merge_status")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  private def snapState(root: String) =
    MergeInto.readSnapshot(spark, root).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq

  test("streaming CDC apply: two batches merge into the snapshot; replay is exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("cdc").toString + "/snap"
    def b(rows: (Long, String, String, Double)*) = rows.toDF("k", "op", "name", "v")
    // batch 0: bootstrap inserts
    MergeInto.applyBatch(b((1L, "I", "a", 10.0), (2L, "I", "b", 20.0)), root, "k", Seq("name", "v"))
    // batch 1: update + delete + insert
    val batch1 = b((1L, "U", "a2", 11.0), (2L, "D", null, 0.0), (3L, "I", "c", 30.0))
    MergeInto.applyBatch(batch1, root, "k", Seq("name", "v"))
    val afterTwo = snapState(root)
    assert(afterTwo == Seq((1L, "a2", 11.0), (3L, "c", 30.0)))
    // at-least-once replay of batch 1 (crash before the checkpoint commit)
    // must leave the snapshot equivalent
    MergeInto.applyBatch(batch1, root, "k", Seq("name", "v"))
    assert(snapState(root) == afterTwo)
  }

  test("snapshot commit protocol recovers every crash window") {
    val root = java.nio.file.Files.createTempDirectory("cdcr").toString + "/snap"
    def b(rows: (Long, String, String, Double)*) = rows.toDF("k", "op", "name", "v")
    MergeInto.applyBatch(b((1L, "I", "a", 10.0)), root, "k", Seq("name", "v"))
    MergeInto.applyBatch(b((2L, "I", "b", 20.0)), root, "k", Seq("name", "v"))
    val committed = snapState(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between pointer delete and rename: no _latest — fall back to
    // the highest _SUCCESS-committed version
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_latest"), false)
    assert(MergeInto.currentVersion(spark, root).contains(1L))
    assert(snapState(root) == committed)
    // crash mid-version-write: a partial v2 (no _SUCCESS) must be ignored
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/v2"))
    assert(MergeInto.currentVersion(spark, root).contains(1L))
    // torn pointer write (empty _latest): must fall back, not restart at v0
    val torn = fs.create(new org.apache.hadoop.fs.Path(s"$root/_latest"), true)
    torn.close()
    assert(MergeInto.currentVersion(spark, root).contains(1L))
    assert(snapState(root) == committed)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_latest"), false)
    // the replayed batch overwrites the partial version and commits it
    MergeInto.applyBatch(b((3L, "I", "c", 30.0)), root, "k", Seq("name", "v"))
    assert(MergeInto.currentVersion(spark, root).contains(2L))
    assert(snapState(root) == (committed :+ ((3L, "c", 30.0))))
  }

  test("applyStream drives applyBatch through foreachBatch (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdcs").toString
    val root = s"$dir/snap"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, Double)]
    in.addData((1L, "I", "a", 10.0), (2L, "I", "b", 20.0))
    val q = MergeInto.applyStream(
      in.toDF().toDF("k", "op", "name", "v"), root, "k", Seq("name", "v"),
      checkpoint = s"$dir/ckpt")
    q.processAllAvailable()
    in.addData((1L, "U", "a2", 11.0), (2L, "D", null, 0.0))
    q.processAllAvailable()
    q.stop()
    assert(snapState(root) == Seq((1L, "a2", 11.0)))
  }
}
