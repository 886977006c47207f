package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution on a long-lived parquet dataset — the ingest-side
  * reality at 100 TB: writers add columns over time, and readers must
  * take the union schema with nulls for files predating a column
  * (`mergeSchema`), while pruned scans keep reading only what the query
  * touches. */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("mergeSchema unions evolved writer schemas; old files null-fill new columns") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    // epoch 1: (id, v)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // epoch 2: writer adds a column (id, v, source)
    Seq((3L, 30.0, "s3"), (4L, 40.0, "s4")).toDF("id", "v", "source")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "source", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows(0).isNullAt(rows(0).fieldIndex("source")), "pre-evolution files null-fill")
    assert(rows(2).getAs[String]("source") == "s3")

    // column pruning still holds on the merged schema
    val pruned = merged.select("id").queryExecution.executedPlan.toString
    val read = pruned.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("id") && !read.contains("source"),
      s"pruned scan must not read evolved columns it doesn't need: $read")
  }

  test("filter on an evolved column is pushed down and matches only new-epoch rows") {
    val dir = java.nio.file.Files.createTempDirectory("evolve2").toString + "/t"
    Seq((1L, 1.0)).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, 2.0, "x")).toDF("id", "v", "source").write.mode("append").parquet(dir)
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
      .filter(col("source") === "x")
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(source"),
      s"evolved-column predicate must reach the scan:\n$plan")
  }
}
