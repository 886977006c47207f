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

  test("empty change set is the identity merge (all rows kept)") {
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "v")
    val changes = Seq.empty[(Long, String, String, Double)].toDF("k", "op", "name", "v")
    val out = MergeInto.merge(base, changes, "k", Seq("name", "v"))
    assert(out.count() == 1)
    assert(out.filter(col("merge_status") =!= "kept").isEmpty)
  }

  test("merge is idempotent for U-only change sets (re-applying changes nothing)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val changes = Seq((2L, "U", "b2", 22.0)).toDF("k", "op", "name", "v")
    val once = MergeInto.merge(base, changes, "k", Seq("name", "v"))
    val twice = MergeInto.merge(once.drop("merge_status"), changes, "k", Seq("name", "v"))
    assert(once.drop("merge_status").exceptAll(twice.drop("merge_status")).isEmpty)
    assert(twice.drop("merge_status").exceptAll(once.drop("merge_status")).isEmpty)
  }
}
