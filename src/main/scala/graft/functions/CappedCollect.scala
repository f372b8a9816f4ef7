package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard aggregation-buffer bound: accumulates at most
  * `cap + 1` elements per group and then stops ("collect-cap-and-poison").
  *
  * Built for posting-bucket construction in the dedup family
  * ([[graft.operators.Dedup]]): buckets are built with
  * `groupBy(key).agg(collect(...)).filter(size <= cap)`, where the size
  * filter is the degenerate-bucket safety valve (a Zipf-head stop-shingle
  * or boilerplate LSH band over a web corpus puts millions of ids behind
  * ONE key). With a plain `collect_list` the filter drops the mega-bucket
  * from the *output*, but the aggregation buffer has already materialized
  * the full posting list — the exact unbounded-buffer OOM pattern
  * [[BoundedMinK]] exists to kill. This aggregate never buffers more than
  * `cap + 1` elements (update and merge both stop inserting once the
  * buffer holds cap + 1), and an over-cap group surfaces as EXACTLY
  * `cap + 1` elements — strictly above the `size <= cap` filter, so the
  * bucket is dropped with identical query semantics. Under-cap groups
  * collect completely (merge never truncates a group whose true size
  * ≤ cap + 1 > size), so output rows are unchanged from `collect_list`.
  *
  * Element ORDER is whatever partial-aggregation order produces — same
  * non-determinism contract as `collect_list`; every consumer here
  * explodes the bucket into unordered pairs.
  */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap > 0, "cap must be positive")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length <= cap) super.update(buffer, input) else buffer

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = "capped_collect_list"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)
}

object CappedCollectList {
  /** Column wrapper: bounded-buffer collect_list (see class doc). */
  def cappedCollectList(c: Column, cap: Int): Column =
    GraftBridge.column(
      CappedCollectList(GraftBridge.expression(c), cap).toAggregateExpression())
}
