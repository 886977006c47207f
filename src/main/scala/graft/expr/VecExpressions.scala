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
}
