package graft.queries

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def seqOf(word: String): String = word.toCharArray.mkString(" ")

  test("hand-computed corpus: argmax, tie rule, and greedy apply over two rounds") {
    // corpus: aaab ×2, ab ×3
    // round 1 pairs: "a a" from aaab = 2·2 = 4; "a b" = 2·1 + 3·1 = 5 → merge "a b"
    //   aaab: "a a a b" → "a a ab";  ab: "a b" → "ab"
    // round 2 pairs: "a a" = 2, "a ab" = 2 → tie → lexicographic min "a a"
    //   aaab: "a a ab" → "aa ab"
    val words = Seq(("aaab", 2L), ("ab", 3L)).toDF("word", "freq")
      .withColumn("seq", org.apache.spark.sql.functions.expr(
        "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), ' ')"))
    val r1 = TextQueries.bpeMergeRound(words)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(r1 == Map("aaab" -> "a a ab", "ab" -> "ab"))
    val r2 = TextQueries.bpeMergeRound(TextQueries.bpeMergeRound(words))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(r2 == Map("aaab" -> "aa ab", "ab" -> "ab"))
  }

  test("greedy replace is non-overlapping left-to-right (aaaa + merge 'a a' -> 'aa aa')") {
    val words = Seq(("aaaa", 1L)).toDF("word", "freq")
      .withColumn("seq", org.apache.spark.sql.functions.expr(
        "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), ' ')"))
    val out = TextQueries.bpeMergeRound(words)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("aaaa" -> "aa aa"))
  }

  test("single-symbol words pass through untouched") {
    val words = Seq(("a", 5L), ("bc", 1L)).toDF("word", "freq")
      .withColumn("seq", org.apache.spark.sql.functions.expr(
        "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), ' ')"))
    val out = TextQueries.bpeMergeRound(words)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("a" -> "a", "bc" -> "bc"))
  }
}
