package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives: every build key passes the probe predicate") {
    val build = (0L until 5000L).filter(_ % 7 == 0).toDF("k")
    val bytes = BloomFns.buildKeyFilter(build, "k", expectedKeys = 1000, fpp = 0.01)
    val probe = (0L until 5000L).toDF("k")
    val kept = probe.filter(BloomFns.mightContain(spark, bytes, col("k")))
    val missed = build.join(kept, Seq("k"), "left_anti").count()
    assert(missed == 0, "bloom filters must have no false negatives")
  }

  test("prunes most non-matching rows (fpp holds within an order of magnitude)") {
    val build = (0L until 1000L).toDF("k")
    val bytes = BloomFns.buildKeyFilter(build, "k", expectedKeys = 1000, fpp = 0.01)
    val nonMatching = (1000000L until 1100000L).toDF("k")
    val fp = nonMatching.filter(BloomFns.mightContain(spark, bytes, col("k"))).count()
    assert(fp < 10000, s"expected ~1% false positives on 100k probes, got $fp")
  }

  test("derived sizing tracks the build side; a pinned capacity saturates (the sf100 q56 bug)") {
    // build side far above the old 2^18-keys-at-tiny-capacity regime in
    // miniature: 50k keys vs an explicit capacity of 256
    val build = (0L until 500000L by 10).toDF("k") // 50k keys
    val nonMatching = (1000000L until 1100000L).toDF("k")
    val saturated = BloomFns.buildKeyFilter(build, "k", expectedKeys = 256)
    val fpSat = nonMatching.filter(BloomFns.mightContain(spark, saturated, col("k"))).count()
    assert(fpSat > 90000, s"a 256-capacity filter over 50k keys should pass ~everything, got $fpSat")
    // default (-1) derives capacity from build.count(): fpp holds again
    val derived = BloomFns.buildKeyFilter(build, "k")
    val fpDer = nonMatching.filter(BloomFns.mightContain(spark, derived, col("k"))).count()
    assert(fpDer < 10000, s"derived sizing must restore ~1% fpp on 100k probes, got $fpDer")
  }

  test("semiPrune + inner join equals the plain join (false positives absorbed)") {
    val probe = (0L until 2000L).map(i => (i, i % 13)).toDF("k", "v")
    val build = (0L until 2000L).filter(_ % 5 == 0).toDF("bk")
    val viaBloom = BloomFns.semiPrune(probe, "k", build, "bk", expectedKeys = 500)
      .join(build, col("k") === col("bk")).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = probe.join(build, col("k") === col("bk")).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaBloom == plain)
  }

  test("expression survives codegen and interpreted eval identically") {
    val build = (0L until 100L).toDF("k")
    val bytes = BloomFns.buildKeyFilter(build, "k", expectedKeys = 100)
    val probe = (0L until 200L).toDF("k")
    val pred = BloomFns.mightContain(spark, bytes, col("k"))
    val viaCodegen = probe.filter(pred).count()
    val viaInterp = withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      probe.filter(pred).count()
    }
    assert(viaCodegen == viaInterp)
    assert(viaCodegen >= 100, "all 100 build keys must pass")
  }

  test("int keys work (widened to long)") {
    val build = (0 until 50).toDF("k")
    val bytes = BloomFns.buildKeyFilter(build.select(col("k").cast("long").as("k")), "k", 100)
    val probe = (0 until 100).toDF("k") // IntegerType probe column
    val kept = probe.filter(BloomFns.mightContain(spark, bytes, col("k"))).count()
    assert(kept >= 50)
  }
}
