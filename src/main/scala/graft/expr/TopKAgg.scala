package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Grow-bounded top-k buffer: keeps the k best (score desc, id asc)
  * pairs. Insertion is O(k) into a sorted array — k is small (≤ ~100).
  *
  * NaN scores are rejected at [[insert]] — NaN compares false under
  * both `>` and `==`, so a NaN admitted while the buffer was not yet
  * full would park at the tail and (as `scores(k-1)`) veto every later
  * genuinely-better candidate. Rejecting matches the NaN-LAST ordering
  * of the `row_number`-window form this aggregate replaced, with one
  * documented divergence: a group whose candidates are ALL NaN yields
  * an empty array here where the window would have emitted a NaN row. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** (s, id) better than (s2, id2) ⇔ higher score, ties → lower id. */
  @inline private def better(s: Double, id: Long, s2: Double, id2: Long): Boolean =
    s > s2 || (s == s2 && id < id2)

  def insert(s: Double, id: Long): Unit = {
    if (java.lang.Double.isNaN(s)) return
    if (size == k && !better(s, id, scores(k - 1), ids(k - 1))) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** top_k_by_score(score, id, k): aggregate keeping the k (score, id)
  * pairs with the highest score (ties by ascending id), returned as a
  * sorted array<struct<score:double, id:bigint>>.
  *
  * A `TypedImperativeAggregate`, so Catalyst runs it partial+final: each
  * map task reduces its slice to k rows before the shuffle — for the
  * brute-force cosine top-k this turns an all-pairs shuffle + window
  * sort (O(N²) rows moved) into a k·partitions shuffle. This is the
  * operator that makes exact top-k survive 100 TB.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "top_k_by_score"
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType
      && kExpr.foldable && kExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "top_k_by_score requires (double, bigint, foldable int)")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.mergeFrom(o); b }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      rows(i) = InternalRow(b.scores(i), b.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.size * 16)
    buf.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val out = new TopKBuffer(buf.getInt)
    val n = buf.getInt
    var i = 0
    // entries arrive in sorted order → inserts are O(1) shifts
    while (i < n) { out.insert(buf.getDouble, buf.getLong); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1), kExpr = c(2))
}

object TopKAgg {
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    val fid = FunctionIdentifier("top_k_by_score")
    if (!fr.functionExists(fid)) {
      fr.registerFunction(fid,
        new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
        { case Seq(s, i, k) => TopKByScore(s, i, k) })
    }
  }

  def topKByScore(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    register(spark)
    call_function("top_k_by_score", score, id, org.apache.spark.sql.functions.lit(k))
  }
}
