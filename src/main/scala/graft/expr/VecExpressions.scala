package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot inner loops of similarity
  * search (SURVEY §7.1 step 7; the builder's preference order (b): a
  * custom `Expression` with codegen beats a Scala UDF).
  *
  * The `zip_with` + `aggregate` higher-order-function formulation in
  * [[graft.functions.VecFns]] is semantically identical but evaluates the
  * lambda interpreted per element; these expressions compile to a tight
  * primitive loop inside whole-stage codegen. On the q31 brute-force
  * cosine join (4M pairs × 64 dims at sf0.1) the native loop is the
  * difference between an interpreted-HOF bottleneck and a scan-bound join.
  *
  * Summation is in index order over double-cast elements — bit-identical
  * to the HOF fold and the DuckDB oracle's `list_reduce`.
  *
  * Both expressions accept `array<float>` or `array<double>` on either
  * side (mixed OK — e.g. a float embedding against a double centroid).
  * Arrays of different lengths fold over the common prefix; null array →
  * null result; elements are assumed non-null (embedding vectors).
  */
abstract class VecFoldExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  protected def leftIsFloat: Boolean = elemType(left).contains(FloatType)
  protected def rightIsFloat: Boolean = elemType(right).contains(FloatType)

  protected def getLeft(a: ArrayData, i: Int): Double =
    if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
  protected def getRight(b: ArrayData, i: Int): Double =
    if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)

  protected def genGet(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot(a, b) = Σ a_i · b_i (double accumulation, index order). */
case class FloatVecDot(left: Expression, right: Expression) extends VecFoldExpression {

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += getLeft(a, i) * getRight(b, i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${genGet(a, i, leftIsFloat)} * ${genGet(b, i, rightIsFloat)};
         |}
         |${ev.value} = $sum;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_sq(a, b) = Σ (a_i − b_i)² (double accumulation, index order). */
case class FloatVecL2Sq(left: Expression, right: Expression) extends VecFoldExpression {

  override def prettyName: String = "vec_l2_sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { val d = getLeft(a, i) - getRight(b, i); sum += d * d; i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${genGet(a, i, leftIsFloat)} - ${genGet(b, i, rightIsFloat)};
         |  $sum += $d * $d;
         |}
         |${ev.value} = $sum;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l1(a, b) = Σ |a_i − b_i| (double accumulation, index order) — the
  * natural metric for histogram features (multimodal near-dup, where
  * cosine saturates on near-uniform histograms). */
case class FloatVecL1(left: Expression, right: Expression) extends VecFoldExpression {

  override def prettyName: String = "vec_l1"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += math.abs(getLeft(a, i) - getRight(b, i)); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += java.lang.Math.abs(${genGet(a, i, leftIsFloat)} - ${genGet(b, i, rightIsFloat)});
         |}
         |${ev.value} = $sum;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** rhp_bucket(v, nPlanes) — random-hyperplane LSH signature as an integer
  * bucket in [0, 2^nPlanes): bit j set iff Σ_i v_i·w(j,i) > 0, with the
  * same deterministic LCG plane weights as [[graft.functions.VecFns
  * .rhpBucket]] (w(j,i) = ((j·dim+i)·1103515245 + 12345) mod 2^31 − 2^30,
  * dim = the vector's length) — bit-identical to the HOF formulation and
  * the DuckDB oracle, but a tight primitive loop instead of nPlanes×dim
  * interpreted lambda calls. Signature cost dominates LSH blocking's
  * per-row work (the bucket join itself is cheap), so this is the hot
  * loop of q32/q53 at scale. */
case class RhpBucket(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "vec_rhp_bucket"
  override def dataType: DataType = LongType

  private def elemFloat: Option[Boolean] = left.dataType match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${left.dataType.simpleString}")
    else if (!right.foldable || !right.dataType.isInstanceOf[IntegerType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal int plane count")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val nPlanes: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.rhpBucket(l.asInstanceOf[ArrayData], elemFloat.get, nPlanes)

  // Call the mirror class's static forwarder (same pattern as TextExpr.kernels);
  // a `.MODULE$` reference does not exist on the mirror class and fails Janino
  // compilation, silently dropping the whole stage to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expr.VecKernels.rhpBucket($a, ${elemFloat.get}, $nPlanes);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** mat_vec(rFlat, x) — dense GEMV y = R·x with R a d×d matrix flattened
  * row-major as an `array<double>` plan literal and x an
  * `array<float|double>` of length d: y[i] = Σⱼ R[i·d+j]·x[j], summed
  * in ascending-j order with an explicit 0.0 init — bit-identical to
  * [[graft.ml.Opq.rotateColumn]]'s former `transform`+`aggregate`
  * higher-order-function formulation (and to the DuckDB oracle's
  * `list_reduce` fold), but a tight primitive loop instead of d²
  * interpreted lambda invocations per row (the r15 q141 StageProbe
  * finding: the probe-rotation projection dominated the search wall). */
case class MatVecMul(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "vec_matvec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def rightFloat: Option[Boolean] = right.dataType match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[ArrayType] ||
        left.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> matrix, got ${left.dataType.simpleString}")
    else if (rightFloat.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> vector, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.matVec(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], rightFloat.get)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, x) =>
      s"${ev.value} = graft.expr.VecKernels.matVec($m, $x, ${rightFloat.get});")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static vector kernels shared by interpreted eval and generated code
  * (codegen emits one call; the loop runs as plain JIT-compiled JVM
  * code — same pattern as [[TextHashKernels]]). */
object VecKernels {
  def matVec(m: ArrayData, x: ArrayData, xIsFloat: Boolean): ArrayData = {
    val d = x.numElements()
    val xs = new Array[Double](d)
    var j = 0
    while (j < d) {
      xs(j) = if (xIsFloat) x.getFloat(j).toDouble else x.getDouble(j)
      j += 1
    }
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val base = i * d
      var s = 0.0
      var k = 0
      while (k < d) { s += m.getDouble(base + k) * xs(k); k += 1 }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def rhpBucket(v: ArrayData, isFloat: Boolean, nPlanes: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var j = nPlanes - 1
    while (j >= 0) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val w = ((j.toLong * dim + i) * 1103515245L + 12345L) % 2147483648L - 1073741824L
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * w
        i += 1
      }
      sig = sig * 2L + (if (dot > 0.0) 1L else 0L)
      j -= 1
    }
    sig
  }
}

/** Session-scoped registration + Column helpers. Registration is
  * idempotent and done lazily at query-construction time so the
  * expressions work with ANY SparkSession the driver hands us (no
  * SparkSessionExtensions wiring required — though `GraftExtensions`
  * offers that path for spark.sql.extensions users). */
object NativeVecFns {

  private def reg(spark: SparkSession, name: String,
                  builder: Seq[Expression] => Expression): Unit = {
    val fr = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!fr.functionExists(id)) {
      fr.registerFunction(id,
        new ExpressionInfo(classOf[FloatVecDot].getName, name), builder)
    }
  }

  def register(spark: SparkSession): Unit = {
    reg(spark, "vec_dot", { case Seq(a, b) => FloatVecDot(a, b) })
    reg(spark, "vec_l2_sq", { case Seq(a, b) => FloatVecL2Sq(a, b) })
    reg(spark, "vec_l1", { case Seq(a, b) => FloatVecL1(a, b) })
    reg(spark, "vec_rhp_bucket", { case Seq(v, n) => RhpBucket(v, n) })
    reg(spark, "vec_matvec", { case Seq(m, x) => MatVecMul(m, x) })
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("vec_dot", a, b)
  }

  def norm(spark: SparkSession, v: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.sqrt(call_function("vec_dot", v, v))
  }

  def l2DistSq(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("vec_l2_sq", a, b)
  }

  def l1Dist(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("vec_l1", a, b)
  }

  def rhpBucket(spark: SparkSession, v: Column, nPlanes: Int): Column = {
    register(spark)
    call_function("vec_rhp_bucket", v, org.apache.spark.sql.functions.lit(nPlanes))
  }

  def matVec(spark: SparkSession, m: Column, x: Column): Column = {
    register(spark); call_function("vec_matvec", m, x)
  }
}
