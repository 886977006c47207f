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

  test("round-2 winner crossing a merged-symbol boundary does not merge inside the symbol") {
    // corpus: ab ×5, xbc ×4, abc ×1
    // round 1: (a,b) = 5+1 = 6; (x,b) = 4; (b,c) = 4+1 = 5 → merge "a b"
    //   ab → [ab]; xbc → [x,b,c]; abc → [ab, c]
    // round 2: (x,b) = 4; (b,c) = 4; (ab,c) = 1 → tie → "b c" < "x b" → merge "b c"
    //   the string "ab c" CONTAINS the substring "b c", but symbol-aligned
    //   apply must leave [ab, c] untouched (a substring replace would
    //   wrongly produce "abc", merging inside the round-1 symbol "ab")
    val words = Seq(("ab", 5L), ("xbc", 4L), ("abc", 1L)).toDF("word", "freq")
      .withColumn("seq", org.apache.spark.sql.functions.expr(
        "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), ' ')"))
    val r2 = TextQueries.bpeMergeRound(TextQueries.bpeMergeRound(words))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(r2 == Map("ab" -> "ab", "xbc" -> "x bc", "abc" -> "ab c"))
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
