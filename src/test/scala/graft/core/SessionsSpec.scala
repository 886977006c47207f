package graft.core

import graft.SparkSpec

/** Corpus-derived shuffle width ([[Sessions.partitionsFor]] /
  * [[Sessions.deriveShuffle]]) — VERDICT r13 ask #1b: the width is an
  * engine default now, not an env knob, and it must (a) reproduce the
  * pinned core-count layout exactly at the gate SFs so every oracle and
  * parity hash is unchanged, and (b) scale with input bytes beyond them
  * (the q127/q136 sf100 failure mechanism was the fixed 32-wide shuffle).
  */
class SessionsSpec extends SparkSpec {

  private val MiB = 1L << 20
  private val GiB = 1L << 30

  test("gate SFs floor at the core count — pinned layout, hashes unchanged") {
    // sf0.001 ≈ 0.5 MB, sf0.01 ≈ 2 MB, sf0.1 ≈ 17 MB on disk: all ≪ one
    // 256 MiB target partition, so the data term is 1 and cores win
    assert(Sessions.partitionsFor(500 * 1024, 32) == 32)
    assert(Sessions.partitionsFor(2 * MiB, 32) == 32)
    assert(Sessions.partitionsFor(17 * MiB, 32) == 32)
    assert(Sessions.partitionsFor(17 * MiB, 4) == 4)
    // the floor holds right up to cores × 256 MiB
    assert(Sessions.partitionsFor(32 * 256 * MiB, 32) == 32)
  }

  test("scale SFs derive from bytes at 256 MiB per partition") {
    // sf100's 16 GB corpus → 64 partitions on a 32-core box
    assert(Sessions.partitionsFor(16 * GiB, 32) == 64)
    // ceil, not floor: one byte over a boundary adds a partition
    assert(Sessions.partitionsFor(16 * GiB + 1, 32) == 65)
    // 100 TB → 409,600 wanted, capped at the 65,536 practical ceiling
    assert(Sessions.partitionsFor(100L * 1024 * GiB, 32) == 65536)
    // a wider box never narrows the width below its core count
    assert(Sessions.partitionsFor(16 * GiB, 256) == 256)
  }

  test("monotonic in input bytes") {
    val widths = Seq(0L, MiB, GiB, 8 * GiB, 16 * GiB, 64 * GiB, 1024 * GiB)
      .map(Sessions.partitionsFor(_, 32))
    assert(widths == widths.sorted)
  }

  test("deriveShuffle at a gate SF applies exactly the pinned core count") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val w = Sessions.deriveShuffle(spark, sfDir, 4)
      assert(w == 4)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
