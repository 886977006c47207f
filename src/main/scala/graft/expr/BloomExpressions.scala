package graft.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.{approx_count_distinct, call_function, col, lit}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the runtime-filtering pattern for
  * selective fact⨝dim joins at scale: build a compact bloom filter over
  * the (filtered) build-side keys, apply it to the probe side BEFORE the
  * join's shuffle, and let the exact join absorb the false positives.
  * With a selective build filter this drops the dominant cost — shuffling
  * probe rows that can never match — by the build side's selectivity
  * (here ~80% of lineitem bytes never enter the exchange).
  *
  * Spark ships this as an optimizer rule (`runtime.bloomFilter.enabled`)
  * gated on size thresholds; this expression is the explicit, always-on
  * form: `might_contain(key, <serialized filter>)`, a native codegen'd
  * expression (no UDF), with the filter bytes carried as a literal so the
  * task binary ships with the plan broadcast.
  *
  * Sizing is the scale knob: bits ≈ 1.44·n·log2(1/fpp), so 2^18 expected
  * keys at 1% fpp is ~460 KB — fine to embed; a 300M-key dim side wants
  * fpp relaxed (or the optimizer-rule variant) to bound plan size.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType | IntegerType, BinaryType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int|bigint, literal binary), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(l: Any, r: Any): Any = l match {
    case i: Int  => bloom.mightContainLong(i.toLong)
    case i: Long => bloom.mightContainLong(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // deserialize ONCE per task via a plan reference, not per row
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $bloomRef.mightContainLong((long) $key);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomFns {

  private def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("bloom_might_contain")
    if (!fr.functionExists(id)) {
      fr.registerFunction(id,
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
        { case Seq(k, b) => BloomMightContain(k, b) })
    }
  }

  /** Build a bloom filter over `build`'s `key` column (distributed
    * treeAggregate; only the filter reaches the driver — ~460 KB at the
    * 2^18 floor, ~1.2 MB per million keys at fpp 0.01).
    *
    * `expectedKeys < 0` (the default) SIZES THE FILTER FROM THE BUILD
    * SIDE (one count pass — build-time cost, the `kFor`/`lshBitsFor`
    * pattern): a capacity pinned at 2^18 saturates once the key set
    * outgrows it — at sf100's 30M urgent orders the old fixed default
    * passed essentially every probe row, silently degrading q56 to the
    * plain join plus per-row hash overhead (measured 141 s; the r10
    * sf100 sweep caught it). Results are unchanged either way — false
    * positives die in the exact join — which is precisely why the decay
    * is silent and the sizing must scale.
    *
    * The default sizes from `approx_count_distinct(key)` (±~2 % HLL), not
    * row count: [[semiPrune]] permits duplicated build keys, and sizing
    * from rows would oversize proportionally to the duplication factor.
    * Bloom capacity needs an UPPER bound, and HLL can err LOW (~±2 %
    * rsd) — an undersized filter silently pushes the effective
    * false-positive rate past the requested `fpp` — so the estimate is
    * inflated 10 % before sizing (≈5σ of HLL's error at the default
    * precision; a 10 % oversize costs ~10 % filter bytes, an undersize
    * breaks the documented fpp bound). Callers who already know the
    * cardinality pass `expectedKeys` and skip the extra build-side scan
    * entirely. */
  def buildKeyFilter(build: DataFrame, key: String,
                     expectedKeys: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val n = if (expectedKeys > 0) expectedKeys
            else math.max(1L << 18,
              (build.select(approx_count_distinct(col(key))).first().getLong(0)
                * 1.1).toLong)
    val bf = build.stat.bloomFilter(key, n, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `might_contain(keyCol)` predicate over a serialized filter. */
  def mightContain(spark: SparkSession, bfBytes: Array[Byte], keyCol: Column): Column = {
    register(spark)
    call_function("bloom_might_contain", keyCol, lit(bfBytes))
  }

  /** One-call form: prune `probe` to rows whose `probeKey` might appear in
    * `build`'s `buildKey` set. Sound for a subsequent INNER equi-join —
    * false positives survive the prune but die in the join; true matches
    * always pass (bloom filters have no false negatives). */
  def semiPrune(probe: DataFrame, probeKey: String,
                build: DataFrame, buildKey: String,
                expectedKeys: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val bytes = buildKeyFilter(build, buildKey, expectedKeys, fpp)
    probe.filter(mightContain(probe.sparkSession, bytes, col(probeKey)))
  }
}
