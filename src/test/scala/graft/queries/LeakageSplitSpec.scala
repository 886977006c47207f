package graft.queries

import graft.SparkSpec

/** q101: the property that justifies splitting by component — no
  * near-dup edge may cross the train/holdout boundary. */
class LeakageSplitSpec extends SparkSpec {

  private lazy val split = TextQueries.q101LeakageSafeSplit(spark, sfDir)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("every document is assigned exactly one split") {
    val docs = graft.core.Tables.documents(spark, sfDir).count()
    assert(split.size.toLong == docs)
    assert(split.values.forall(v => v._2 == "train" || v._2 == "holdout"))
  }

  test("a component never straddles the boundary") {
    split.values.groupBy(_._1).foreach { case (comp, members) =>
      assert(members.map(_._2).toSet.size == 1,
        s"component $comp assigned to multiple splits")
    }
  }

  test("zero near-dup edges cross the split (no eval leakage)") {
    val crossing = TextQueries.nearDupEdges(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .count(r => split(r.getLong(0))._2 != split(r.getLong(1))._2)
    assert(crossing == 0, s"$crossing near-dup pairs leak across the split")
  }

  test("both splits are non-empty on the fixture corpus") {
    val sides = split.values.map(_._2).toSet
    assert(sides == Set("train", "holdout"),
      s"degenerate split: only $sides present")
  }
}
