package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, empties removed") {
    val out = Seq("a  b\tc", " x ", "").toDF("t")
      .select(TextFns.tokens(col("t"))).as[Seq[String]].collect()
    assert(out(0) === Seq("a", "b", "c"))
    assert(out(1) === Seq("x"))
    assert(out(2) === Seq.empty)
  }

  test("polyHash matches the arithmetic definition") {
    // "abc" → ((0*31+97)*31+98)*31+99 = 96354 (mod 1e9+7 no-op here)
    val out = Seq("abc").toDF("t").select(TextFns.polyHash(col("t"))).as[Long].collect()
    assert(out(0) === 96354L)
  }

  test("shingles: distinct word 3-grams; short docs yield empty") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(TextFns.shingles(col("t"), 3)).as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
  }

  test("minGramHash: min over all k-windows; null below k chars") {
    val out = Seq("abcd", "ab").toDF("t")
      .select(TextFns.minGramHash(col("t"), 3)).as[Option[Long]].collect()
    // windows of "abcd": abc=96354, bcd=(98*31+99)*31+100=97355 → min 96354
    assert(out(0) === Some(96354L))
    assert(out(1) === None)
  }

  test("minHash signature: componentwise min of affine-hashed set") {
    val out = Seq("x").toDF("t")
      .select(TextFns.minHashSignature(array(lit(10L), lit(20L)), 2)).as[Seq[Long]].collect()
    // h0: min(2*10+1, 2*20+1)=21 ; h1: min(3*10+12, 3*20+12)=42
    assert(out(0) === Seq(21L, 42L))
  }

  test("simHash32: single token yields its own low 32 bits pattern") {
    // one token: every bit of the hash wins its majority vote directly
    val df = Seq("x").toDF("t")
      .withColumn("hs", array(TextFns.polyHash(lit("abc"))))
      .select(TextFns.simHash32("hs")).as[Long].collect()
    assert(df(0) === 96354L)
  }

  test("hamming32 popcount of xor") {
    val out = Seq((0L, 15L)).toDF("a", "b")
      .select(TextFns.hamming32(col("a"), col("b"))).as[Long].collect()
    assert(out(0) === 4L)
  }
}
