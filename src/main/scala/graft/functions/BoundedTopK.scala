package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate: the smallest `k` values of `child` under the
  * type's natural ascending ordering, returned as a sorted array.
  *
  * This is the partial-aggregation form of `row_number().over(partitionBy
  * (g).orderBy(o)) <= k`: the window shape shuffles EVERY candidate row to
  * its group's partition and sorts there — at q44b's 100× study point that
  * exact-scoring tail alone spilled ~100 GB — where an aggregate keeps a
  * k-element bound per group per MAP task, so the exchange carries at most
  * k rows per (partition, group). Callers encode "top" as a sort-key
  * struct whose ascending lexicographic order is the desired ranking
  * (e.g. `struct(-cos_sim, neighbor_id)` for cosine-descending with
  * id tie-breaks; double negation is order-exact under IEEE comparison,
  * NaN excluded by the caller's filters). Determinism matches the window
  * form term-for-term: same total order, same ties, same survivors.
  *
  * Buffer is a size-bounded max-heap (the worst retained value at the
  * root, O(log k) insert); merge folds heaps; spill serialization is one
  * UnsafeProjection row per element, length-prefixed. ObjectHashAggregate
  * executes it with map-side partials — the plan shape a 1000-executor
  * topk-per-key needs. */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  require(k >= 1, s"bounded_top_k needs k >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // max-heap: the LARGEST retained value sits at the head and is the
  // eviction candidate, so the heap holds the smallest k seen
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ordering)

  /** Defensive copy — Catalyst reuses the row backing `eval`'s result. */
  private def copyOf(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case x => x
  }

  private def offer(buffer: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buffer.size < k) buffer.enqueue(copyOf(v))
    else if (ordering.lt(v, buffer.head)) {
      buffer.dequeue()
      buffer.enqueue(copyOf(v))
    }

  override def update(buffer: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(buffer, v)
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[Any],
      other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(offer(buffer, _)) // already copies; offer copies again
    buffer                          // only on retain — harmless
  }

  override def eval(buffer: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buffer.toArray.sorted(ordering))

  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](child.dataType))

  override def serialize(buffer: mutable.PriorityQueue[Any]): Array[Byte] = {
    val rows = buffer.toArray.map(v => ser(InternalRow(v)).getBytes)
    val out = java.nio.ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    out.putInt(rows.length)
    rows.foreach { b => out.putInt(b.length); out.put(b) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val buffer = createAggregationBuffer()
    val n = in.getInt
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.getInt)
      in.get(b)
      val row = new UnsafeRow(1)
      row.pointTo(b, b.length)
      val v = child.dataType match {
        case s: StructType => row.getStruct(0, s.fields.length).copy()
        case t => row.get(0, t)
      }
      offer(buffer, v)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}

object BoundedTopK {
  /** The smallest `k` values of `e` (ascending array). Rank r is element
    * r−1 after `posexplode`. */
  def bounded_top_k(e: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(e), k).toAggregateExpression())
}
