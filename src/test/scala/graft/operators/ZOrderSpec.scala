package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits (known values)") {
    // a=0b11 → bits at positions 0,2; b=0b10 → bits at positions 3 (b=1→pos 1*2+1)
    val df = Seq((3L, 2L), (0L, 0L), (1L, 1L)).toDF("a", "b")
    val out = df.select(ZOrder.zValue(Seq(col("a"), col("b")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (a=11, b=10): pos0=a0=1, pos1=b0=0, pos2=a1=1, pos3=b1=1 → 0b1101 = 13
    // (a=01, b=01): pos0=1, pos1=1 → 3
    assert(out == Seq(13L, 0L, 3L))
  }

  test("z-ordered layout bounds EVERY dimension's per-file span; single sort does not") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey")
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val sDir = java.nio.file.Files.createTempDirectory("sort").toString
    ZOrder.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), zDir, nFiles = 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)

    def spanFractions(path: String): (Double, Double) = {
      val rd = spark.read.parquet(path).withColumn("f", input_file_name())
      val global = rd.agg(
        (max("l_partkey") - min("l_partkey")).cast("double").as("rp"),
        (max("l_suppkey") - min("l_suppkey")).cast("double").as("rs")).head()
      val perFile = rd.groupBy("f").agg(
        (max("l_partkey") - min("l_partkey")).cast("double").as("dp"),
        (max("l_suppkey") - min("l_suppkey")).cast("double").as("ds"))
        .agg(avg("dp").as("adp"), avg("ds").as("ads")).head()
      (perFile.getDouble(0) / global.getDouble(0),
       perFile.getDouble(1) / global.getDouble(1))
    }

    val (zp, zs) = spanFractions(zDir)
    val (sp, ss) = spanFractions(sDir)
    info(f"z-order spans: partkey=$zp%.2f suppkey=$zs%.2f; partkey-sort spans: partkey=$sp%.2f suppkey=$ss%.2f")
    // 16 files, 2 dims → each file should span ≈ 1/4 of each dimension
    assert(zp < 0.5 && zs < 0.5,
      f"z-order must bound both dimensions, got partkey=$zp%.2f suppkey=$zs%.2f")
    // the single-column sort bounds its own key tightly…
    assert(sp < 0.35)
    // …but leaves the other dimension unskippable (full range per file)
    assert(ss > 0.9, f"expected near-full suppkey span under partkey sort, got $ss%.2f")
  }

  test("writeZOrdered preserves row multiset") {
    val li = graft.core.Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("zmult").toString
    ZOrder.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), dir, nFiles = 8)
    val a = li.groupBy("l_partkey", "l_suppkey").count()
    val b = spark.read.parquet(dir).groupBy("l_partkey", "l_suppkey").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
