package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels — shared by interpreted eval and generated code
  * (codegen emits a call to these, keeping the generated method bodies
  * trivial while the loop runs as plain JVM code).
  *
  * All arithmetic matches [[graft.functions.TextFns]]'s HOF definitions
  * bit-for-bit (same 31/1e9+7 polynomial over codepoints, same token
  * split) — the DuckDB oracle twins keep passing unchanged.
  */
object TextHashKernels {
  final val Mod = 1000000007L

  /** acc = (acc*31 + codepoint) mod P over the string's codepoints —
    * identical to aggregate(split(s,''), ...) + ascii(). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Whitespace-token polynomial hashes (empty tokens skipped) —
    * identical to transform(filter(split(text,'\\s+'), _ =!= ''), polyHash). */
  def tokenHashes(s: UTF8String): ArrayData = {
    val toks = s.toString.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        var acc = 0L
        var j = 0
        while (j < t.length) {
          val cp = t.codePointAt(j)
          acc = (acc * 31L + cp) % Mod
          j += Character.charCount(cp)
        }
        out += acc
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Minimum over all k-codepoint windows of the window's polynomial
    * hash, computed with an O(n) rolling recurrence
    * h' = ((h − c₀·31^(k−1))·31 + c_k) mod P — bit-identical to
    * recomputing each window (modular arithmetic is exact), but k× less
    * work than the HOF form. Long.MinValue signals null (text shorter
    * than k). */
  def minGramHash(s: UTF8String, k: Int): Long = {
    val str = s.toString
    // codepoint array
    val cps = str.codePoints().toArray
    if (cps.length < k) return Long.MinValue
    var pow = 1L // 31^(k-1) mod P
    var i = 1
    while (i < k) { pow = (pow * 31L) % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31L + cps(i)) % Mod; i += 1 }
    var min = h
    i = k
    while (i < cps.length) {
      h = ((h - (cps(i - k) * pow) % Mod + Mod) % Mod * 31L + cps(i)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Distinct combined-hash n-gram shingles over token hashes —
    * identical to TextFns.shingleCombine (same fold, array_distinct's
    * first-occurrence order). */
  def shingleHashes(th: ArrayData, n: Int): ArrayData = {
    val len = th.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      var acc = 0L
      var k = 0
      while (k < n) { acc = (acc * 1000003L + th.getLong(i + k)) % Mod; k += 1 }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  private val MinHashA = Array(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L)
  private val MinHashB = Array(1L, 12L, 123L, 1234L, 12345L, 123456L, 1234567L, 12345678L)

  /** 8-permutation MinHash signature — identical to
    * TextFns.minHashSignature (null-valued mins only when the set is
    * empty, in which case each slot is null like array_min of []). */
  def minHashSig(set: ArrayData): ArrayData = {
    val n = set.numElements()
    val out = new Array[Any](MinHashA.length)
    if (n == 0) return new GenericArrayData(out) // all null slots
    var i = 0
    while (i < MinHashA.length) {
      val a = MinHashA(i); val b = MinHashB(i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * set.getLong(j) + b) % Mod
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash of a long-hash array: one pass, 32 counters —
    * identical to the nested-HOF majority vote (hashes are in [0,P) so
    * the `div/%` bit test equals a shift-mask). */
  def simHash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

private object TextExpr {
  val kernels = "graft.expr.TextHashKernels"

  def requireTypes(name: String, actual: Seq[DataType], expected: Seq[DataType]): TypeCheckResult =
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires ${expected.map(_.simpleString).mkString(", ")}, got " +
        actual.map(_.simpleString).mkString(", "))
}

/** poly_hash(string) → long. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "poly_hash"
  override def checkInputDataTypes(): TypeCheckResult = TextExpr.requireTypes(
    prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExpr.kernels}.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token_hashes(string) → array<long> (whitespace tokens, poly-hashed). */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_hashes"
  override def checkInputDataTypes(): TypeCheckResult = TextExpr.requireTypes(
    prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExpr.kernels}.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** min_gram_hash(string, k) → long (null when length < k). */
case class MinGramHash(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "min_gram_hash"
  override def checkInputDataTypes(): TypeCheckResult = TextExpr.requireTypes(
    prettyName, Seq(left.dataType, right.dataType), Seq(StringType, IntegerType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = left.eval(input)
    val k = right.eval(input)
    if (s == null || k == null) null
    else {
      val r = TextHashKernels.minGramHash(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])
      if (r == Long.MinValue) null else r
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) => {
      val r = ctx.freshName("r")
      s"""
         |long $r = ${TextExpr.kernels}.minGramHash($s, $k);
         |if ($r == Long.MIN_VALUE) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** simhash32(array<long>) → long. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash32 requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simHash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExpr.kernels}.simHash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration + Column helpers (same lazy session-scoped pattern as
  * [[NativeVecFns]]). */
object NativeTextFns {

  private def reg(spark: SparkSession, name: String,
                  builder: Seq[Expression] => Expression): Unit = {
    val fr = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!fr.functionExists(id)) {
      fr.registerFunction(id, new ExpressionInfo(classOf[PolyHash].getName, name), builder)
    }
  }

  def register(spark: SparkSession): Unit = {
    reg(spark, "poly_hash", { case Seq(c) => PolyHash(c) })
    reg(spark, "token_hashes", { case Seq(c) => TokenHashes(c) })
    reg(spark, "min_gram_hash", { case Seq(a, b) => MinGramHash(a, b) })
    reg(spark, "simhash32", { case Seq(c) => SimHash32(c) })
    reg(spark, "shingle_hashes", { case Seq(a, b) => ShingleHashes(a, b) })
    reg(spark, "minhash_sig", { case Seq(c) => MinHashSig(c) })
  }

  def polyHash(spark: SparkSession, c: Column): Column = {
    register(spark); call_function("poly_hash", c)
  }
  def tokenHashes(spark: SparkSession, c: Column): Column = {
    register(spark); call_function("token_hashes", c)
  }
  def minGramHash(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark); call_function("min_gram_hash", c, org.apache.spark.sql.functions.lit(k))
  }
  def simHash32(spark: SparkSession, c: Column): Column = {
    register(spark); call_function("simhash32", c)
  }
  def shingleHashes(spark: SparkSession, c: Column, n: Int): Column = {
    register(spark); call_function("shingle_hashes", c, org.apache.spark.sql.functions.lit(n))
  }
  def minHashSig(spark: SparkSession, c: Column): Column = {
    register(spark); call_function("minhash_sig", c)
  }
}

/** shingle_hashes(array<long>, n) → array<long> (distinct combined n-grams). */
case class ShingleHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (array<bigint>, int), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(th: Any, n: Any): Any =
    TextHashKernels.shingleHashes(th.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${TextExpr.kernels}.shingleHashes($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash_sig(array<long>) → array<long> of the 8 permutation minima. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    TextHashKernels.minHashSig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExpr.kernels}.minHashSig($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
