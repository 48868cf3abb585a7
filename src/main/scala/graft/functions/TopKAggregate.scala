package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory exact top-k as a native AGGREGATE function:
  * `groupBy(key).agg(graft_top_k(value, k))` → the k LARGEST values
  * per group, sorted descending, as `array<valueType>`.
  *
  * Why an aggregate and not a window: the declarative form —
  * `row_number() OVER (PARTITION BY key ORDER BY v DESC) <= k` —
  * SORTS every partition in full: one wide exchange plus an
  * O(n log n) sort of ALL rows to keep k of them. This aggregate
  * keeps a k-element min-heap per group (O(n log k) work, O(k)
  * state), and because it's a [[TypedImperativeAggregate]] the
  * planner runs it as ObjectHashAggregate with map-side PARTIAL
  * aggregation: each input partition reduces to ≤ k values per group
  * BEFORE the shuffle — at 100 TB the exchange carries k·groups
  * values instead of every row. The classic "top-k per group without
  * paying for a total sort" building block (per-source best
  * documents, per-query best neighbors, per-day largest orders).
  *
  * Determinism contract: the OUTPUT VALUES are deterministic (the
  * k-largest multiset of a multiset is unique — ties at the boundary
  * keep exactly as many duplicates as fit); only which *source row*
  * supplied a tied value is undefined, and values are all this
  * aggregate returns. That is what makes it oracle-checkable while
  * `row_number`-with-ties is not.
  *
  * Supported value types: int, bigint, double, string (the orderable
  * atomic types the pipelines group-rank by). NULLs are skipped, an
  * all-NULL/empty group yields an empty array.
  */
case class TopKLargest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  @transient private lazy val ordering: Ordering[Any] = child.dataType match {
    case IntegerType => Ordering.Int.asInstanceOf[Ordering[Any]]
    case LongType => Ordering.Long.asInstanceOf[Ordering[Any]]
    case DoubleType => Ordering.Double.TotalOrdering.asInstanceOf[Ordering[Any]]
    case StringType => new Ordering[Any] {
      override def compare(a: Any, b: Any): Int =
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    }
    case t => throw new IllegalStateException(s"unsupported type $t")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DoubleType | StringType =>
      if (k >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports int/bigint/double/string values, got $t")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](math.min(k, 16), ordering) // min-heap: head = smallest kept

  private def offer(buf: java.util.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf.offer(v)
    else if (ordering.compare(v, buf.peek()) > 0) { buf.poll(); buf.offer(v) }
  }

  override def update(
      buf: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String values may be views over the current row's buffer —
      // copy before retaining beyond this call
      val owned = v match { case s: UTF8String => s.copy(); case other => other }
      offer(buf, owned)
    }
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[Any],
      other: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, ordering.reverse.asInstanceOf[java.util.Comparator[Any]])
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) it.next() match {
      case i: Int => out.writeInt(i)
      case l: Long => out.writeLong(l)
      case d: Double => out.writeDouble(d)
      case s: UTF8String =>
        val b = s.getBytes
        out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val v: Any = child.dataType match {
        case IntegerType => in.readInt()
        case LongType => in.readLong()
        case DoubleType => in.readDouble()
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len); in.readFully(b)
          UTF8String.fromBytes(b)
      }
      buf.offer(v) // deserialized buffers hold ≤ k values already
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLargest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLargest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKLargest =
    copy(child = newChildren.head)
}
