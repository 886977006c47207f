package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver testdata: replicate every table
  * `factor`× under disjoint key ranges, preserving WITHIN-replica
  * structure exactly while keeping replicas from interacting — the local
  * stand-in for the next scale factor up (`sf0.1 ×10 ≈ sf1`), used for
  * the scaling-table bench (BASELINE.md): a query whose runtime grows
  * ≫linearly from sf0.1 to the replicated sf1 has a superlinear term the
  * toy scale hides.
  *
  * Replica isolation is deliberate per table family:
  *  - TPC-H keys (`custkey/suppkey/partkey/orderkey`) offset by replica —
  *    joins stay within replica, fan-outs replicate.
  *  - `documents.text`: every token gets a replica suffix `§r` (replica
  *    0 keeps the original; '§' never occurs in the ASCII base corpus,
  *    so the map is injective across ALL replicas INCLUDING replica 0 —
  *    a bare digit suffix would let a base token ending in a digit
  *    collide with a salted one). Each replica's internal
  *    shingle/similarity structure stays byte-equivalent to the base
  *    corpus while cross-replica shingle sets are disjoint (without
  *    this, every doc would be a 10-way cross-replica duplicate and the
  *    dedup-tier graphs would measure an artifact, not scale).
  *  - `embeddings.embedding`: per-(replica, dim) deterministic ±1 sign
  *    flips (replica 0 all +1). Signs cancel within a replica
  *    (s_i²=1 ⇒ all within-replica inner products are EXACTLY the base
  *    ones) while cross-replica sims pick up random signs and collapse
  *    to ordinary unrelated-pair levels (measured |cos| ≤ ~0.53 tail,
  *    centered near 0 — no exact-copy artifacts), like the id-offset
  *    graph replicas.
  *  - dimensions (`nation`, `region`) copy once — at any real scale the
  *    dimension tables stay broadcast-sized.
  */
object ScaleUp {

  private def replicate(base: DataFrame, factor: Int)(per: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => per(base, r)).reduce(_ unionByName _)

  /** Offset for replica r on a key column (1e9 clears every base key). */
  private def off(c: String, r: Int): Column = col(c) + lit(r * 1000000000L)

  /** splitmix64 finalizer — the sign-vector source. An LCG parity here is
    * a trap twice over: the low bit of ((r·64+i)·odd + odd) is independent
    * of r (r·64 is even), and even LCG HIGH bits of sequential seeds
    * correlate (measured 62/64 sign agreement between some replica
    * pairs). The splitmix mix keeps worst cross-replica sign agreement
    * ≤ 0.19 at factor 10 (measured), so cross-replica cosines stay far
    * under every similarity threshold in the suite. JVM Long multiply
    * wraps (unlike ANSI Column arithmetic), so signs are computed
    * driver-side per replica and shipped as a 64-int literal. */
  private def mix(x0: Long): Long = {
    var x = x0 * 0x9E3779B97F4A7C15L
    x ^= (x >>> 29); x *= 0xBF58476D1CE4E5B9L; x ^= (x >>> 32); x
  }

  private[tools] def signVector(r: Int, dim: Int): Array[Int] =
    Array.tabulate(dim)(i => if (((mix(r.toLong * dim + i) >>> 17) & 1L) == 1L) 1 else -1)

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // the '§' token-salt separator makes the word map injective for any
    // factor; the cap guards the 1e9 id-offset stride (replica keys must
    // stay below the next replica's range — base keys < 1e9, so offsets
    // stay disjoint for any factor here, and 1000 × 1e9 = 1e12 leaves
    // six orders of headroom under 2^63; the q49/fitSampled hash pre-mods
    // ids by 1e9+7 before multiplying, so replica ids ≥ 2^33 stay
    // overflow-safe under ANSI mode). 1000 = the sf100 build (r10).
    require(factor >= 1 && factor <= 1000, "factor must be in [1, 1000]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", replicate(read("customer"), factor) { (d, r) =>
      d.withColumn("c_custkey", off("c_custkey", r))
    })
    write("supplier", replicate(read("supplier"), factor) { (d, r) =>
      d.withColumn("s_suppkey", off("s_suppkey", r))
    })
    write("part", replicate(read("part"), factor) { (d, r) =>
      d.withColumn("p_partkey", off("p_partkey", r))
    })
    write("orders", replicate(read("orders"), factor) { (d, r) =>
      d.withColumn("o_orderkey", off("o_orderkey", r))
        .withColumn("o_custkey", off("o_custkey", r))
    })
    write("lineitem", replicate(read("lineitem"), factor) { (d, r) =>
      d.withColumn("l_orderkey", off("l_orderkey", r))
        .withColumn("l_partkey", off("l_partkey", r))
        .withColumn("l_suppkey", off("l_suppkey", r))
    })
    write("events", replicate(read("events"), factor) { (d, r) =>
      d.withColumn("event_id", off("event_id", r))
        .withColumn("user_id", off("user_id", r))
    })
    write("documents", replicate(read("documents"), factor) { (d, r) =>
      val salted =
        if (r == 0) d
        else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1§" + r.toString))
      salted.withColumn("doc_id", off("doc_id", r))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    write("embeddings", replicate(read("embeddings"), factor) { (d, r) =>
      val flipped =
        if (r == 0) d
        else d.withColumn("embedding",
          // ±1 per (replica, dim) from [[signVector]] — exact on floats
          zip_with(col("embedding"), lit(signVector(r, 64)),
            (x, s) => (x * s).cast("float")))
      flipped.withColumn("vec_id", off("vec_id", r))
        .withColumn("label", col("label") + lit(r * 100))
    })
    spark.stop()
  }
}
