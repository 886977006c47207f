package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExactDecimalSpec extends SparkSpec {

  import spark.implicits._

  test("halfUpRatio rounds exact half boundaries up — where double round() fails") {
    // 84025/100000 = 0.84025 exactly; its double is just BELOW the
    // boundary, so round(double, 4) gives 0.8402 — the bug this fixes
    val df = Seq(
      (84025L, 100000L, 4, 0.8403),
      (-84025L, 100000L, 4, -0.8403), // half-away-from-zero
      (1L, 3L, 4, 0.3333),
      (2L, 3L, 4, 0.6667),
      (5L, 2L, 0, 3.0),   // 2.5 → 3
      (15L, 2L, 0, 8.0),  // 7.5 → 8 (no banker's rounding)
      (0L, 7L, 4, 0.0)
    ).toDF("p", "q", "s", "expected")
    Seq(0, 4).foreach { s =>
      val rows = df.filter(col("s") === s)
        .withColumn("r", ExactDecimal.halfUpRatio(col("p"), col("q"), s))
        .collect()
      rows.foreach(r => assert(r.getAs[Double]("r") == r.getAs[Double]("expected"),
        s"p=${r.getLong(0)} q=${r.getLong(1)} scale=$s"))
    }
  }

  test("halfUpRatio agrees with BigDecimal HALF_UP on random rationals") {
    val rnd = new scala.util.Random(5)
    val cases = Seq.fill(300)((rnd.nextLong(2000000L) - 1000000L, rnd.nextLong(9999L) + 1L))
    val df = cases.toDF("p", "q")
      .withColumn("r", ExactDecimal.halfUpRatio(col("p"), col("q"), 4))
    df.collect().zip(cases).foreach { case (row, (p, q)) =>
      val expected = BigDecimal(p).setScale(20) ./ (BigDecimal(q))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("r") == expected, s"p=$p q=$q")
    }
  }

  test("cents: exact 2-decimal → integer") {
    val df = Seq(6.55, 0.01, 123.99, 650.5).toDF("v")
      .withColumn("c", ExactDecimal.cents(col("v")))
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(655L, 1L, 12399L, 65050L))
  }

  test("halfUpRatioBig ≡ halfUpRatio inside the long-safe range") {
    val rnd = new scala.util.Random(11)
    val cases = Seq.fill(200)((rnd.nextLong(2000000L) - 1000000L, rnd.nextLong(9999L) + 1L))
    val df = cases.toDF("p", "q")
      .withColumn("a", ExactDecimal.halfUpRatio(col("p"), col("q"), 4))
      .withColumn("b", ExactDecimal.halfUpRatioBig(col("p"), col("q"), 4))
    df.collect().foreach(r =>
      assert(r.getAs[Double]("a") == r.getAs[Double]("b"),
        s"p=${r.getLong(0)} q=${r.getLong(1)}"))
  }

  test("halfUpRatioBig is exact BEYOND 2^53 — the documented sf100 ceiling") {
    // p ~ 9e17 cents (≫ 2^53/2e4; the long path's |p|·2·10^4
    // intermediate would overflow 2^63 too); decimal(38,0) stays exact.
    // q scaled so the rounded ratio k stays double-exact — the claim
    // under test is the integer arithmetic, not double's range
    val cases = Seq(
      (900000000000000001L, 3000000000000000L), // ratio ≈ 300.0000000…03
      (9007199254740993L, 30000000000L),        // p just past 2^53
      (-900000000000000001L, 3000000000000000L))
    val df = cases.toDF("p", "q")
      .withColumn("r", ExactDecimal.halfUpRatioBig(col("p"), col("q"), 4))
    df.collect().zip(cases).foreach { case (row, (p, q)) =>
      val expected = (BigDecimal(p).setScale(20) / BigDecimal(q))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Double]("r") == expected, s"p=$p q=$q")
    }
  }
}
