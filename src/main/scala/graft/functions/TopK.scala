package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** topk_by_score(score, id, k) — BOUNDED top-k aggregate (OPTIMIZATION
  * r6, VERDICT r5 #8: bound Ann.bruteTopK's rank input).
  *
  * A row ranks above another iff (score DESC, id ASC) — the exact
  * (row_number over score desc, neighbor_id) law bruteTopK graded with.
  * The aggregation buffer holds AT MOST k (score, id) pairs, so the
  * partial (map-side) aggregate reduces each partition to ≤ k rows per
  * group BEFORE the exchange — the shuffle into the final aggregate
  * carries ≤ k·partitions rows per group instead of every scored
  * candidate (the q212 TakeOrderedAndProject idea, as an aggregate).
  * Returns ARRAY<STRUCT<score BIGINT, neighbor_id BIGINT>> in final rank
  * order; callers posexplode to (rank, id, score). Deterministic: the
  * comparison is a total order (ids unique), so merge order is
  * irrelevant. */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression,
                       kExpr: Expression,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue
  require(kExpr.foldable, "topk_by_score: k must be a literal")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)

  private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Long, Long)], s: Long, id: Long): Unit = {
    if (buf.length < k) { buf += ((s, id)); () }
    else {
      // replace the current worst if the newcomer outranks it (k is small;
      // a linear scan beats heap bookkeeping at these sizes)
      var wi = 0
      var w = buf(0)
      var j = 1
      while (j < buf.length) {
        val c = buf(j)
        if (better(w._1, w._2, c._1, c._2)) { w = c; wi = j }
        j += 1
      }
      if (better(s, id, w._1, w._2)) buf(wi) = ((s, id))
    }
  }

  override def update(buf: ArrayBuffer[(Long, Long)], input: InternalRow)
      : ArrayBuffer[(Long, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    val sorted = buf.sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Long, Long)]
    var j = 0
    while (j < n) { buf += ((bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1), kExpr = c(2))
  override def prettyName: String = "topk_by_score"
}
