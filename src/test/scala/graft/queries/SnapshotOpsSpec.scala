package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q105 corpus diff and q106 schema-evolution read. */
class SnapshotOpsSpec extends SparkSpec {

  test("q105: every status class is exercised and consistent with the slices") {
    val rows = TextQueries.q105CorpusDiff(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(rows.values.toSet),
      s"missing status classes: ${rows.values.toSet}")
    rows.foreach { case (id, st) =>
      val expected =
        if (id % 20 == 5) "added"
        else if (id % 20 == 11) "removed"
        else if (id % 20 == 3) "changed"
        else "unchanged"
      assert(st == expected, s"doc $id: $st != $expected")
    }
  }

  test("q106: the merged scan fills the pre-schema column with nulls") {
    val out = StorageQueries.q106SchemaEvolution(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("<pre-schema>"), s"no pre-schema group in $out")
    val evens = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 2 === 0).count()
    assert(out("<pre-schema>") == evens,
      "every gen-0 row must group under the null sentinel")
  }
}
