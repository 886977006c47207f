package graft.expr

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Native text-hash expressions must be bit-identical to the HOF
  * definitions — the DuckDB oracle reproduces the HOF arithmetic, so any
  * drift here would silently break the correctness gate. Checked over the
  * real documents testdata plus adversarial strings. */
class TextExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, sfDir)

  test("poly_hash ≡ HOF polyHash on the documents corpus") {
    val mism = docs.select(
      NativeTextFns.polyHash(spark, col("text")).as("n"),
      TextFns.polyHash(col("text")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(mism == 0)
  }

  test("token_hashes ≡ HOF tokenHashes on the documents corpus") {
    val mism = docs.select(
      NativeTextFns.tokenHashes(spark, col("text")).as("n"),
      TextFns.tokenHashes(col("text")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(mism == 0)
  }

  test("min_gram_hash ≡ HOF minGramHash (incl. short-text null) on the corpus") {
    val mism = docs.select(
      NativeTextFns.minGramHash(spark, col("text"), 8).as("n"),
      TextFns.minGramHash(col("text"), 8).as("h"))
      .filter(!(col("n") <=> col("h"))).count()
    assert(mism == 0)
  }

  test("simhash32 ≡ HOF simHash32 on the corpus") {
    val mism = docs
      .withColumn("tok_hashes", TextFns.tokenHashes(col("text")))
      .select(
        NativeTextFns.simHash32(spark, col("tok_hashes")).as("n"),
        TextFns.simHash32("tok_hashes").as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(mism == 0)
  }

  test("adversarial strings: unicode, whitespace runs, short texts") {
    val data = Seq(
      "héllo wörld ñandú",           // multi-byte BMP
      "  leading and   runs\t\ttabs ", // whitespace shapes
      "ab",                           // shorter than k=8
      "exactly8!",                    // 9 chars
      "",                             // empty
      "a"
    ).toDF("text")
    val mism = data.select(
      NativeTextFns.polyHash(spark, col("text")).as("pn"),
      TextFns.polyHash(col("text")).as("ph"),
      NativeTextFns.tokenHashes(spark, col("text")).as("tn"),
      TextFns.tokenHashes(col("text")).as("th"),
      NativeTextFns.minGramHash(spark, col("text"), 8).as("gn"),
      TextFns.minGramHash(col("text"), 8).as("gh"))
      .filter(col("pn") =!= col("ph") || col("tn") =!= col("th") || !(col("gn") <=> col("gh")))
      .count()
    assert(mism == 0)
  }

  test("native min_gram_hash rolling recurrence matches brute force") {
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val s = scala.util.Random.alphanumeric.take(5 + rnd.nextInt(60)).mkString
      val k = 8
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val fast = TextHashKernels.minGramHash(u, k)
      val brute = if (s.length < k) Long.MinValue
        else s.sliding(k).map { w =>
          w.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
        }.min
      assert(fast == brute, s"mismatch for '$s'")
    }
  }
}

class ShingleMinHashSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def docs = graft.core.Tables.documents(spark, sfDir)

  test("shingle_hashes ≡ HOF shingleCombine on the corpus (values and order)") {
    val mism = docs
      .withColumn("th", TextFns.tokenHashes(col("text")))
      .select(
        NativeTextFns.shingleHashes(spark, col("th"), 3).as("n"),
        TextFns.shingleCombine(col("th"), 3).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(mism == 0)
  }

  test("minhash_sig ≡ HOF minHashSignature on the corpus (incl. empty-set nulls)") {
    val mism = docs
      .withColumn("th", TextFns.tokenHashes(col("text")))
      .withColumn("sh", TextFns.shingleCombine(col("th"), 3))
      .select(
        NativeTextFns.minHashSig(spark, col("sh")).as("n"),
        TextFns.minHashSignature(col("sh"), 8).as("h"))
      .filter(!(col("n") <=> col("h"))).count()
    assert(mism == 0)
  }
}
