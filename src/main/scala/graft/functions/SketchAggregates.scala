package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst AGGREGATE tier (builder-brief preference (b)): a
  * KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the mergeable-sketch shape behind
  * theta sketches (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002; Dasgupta et al., the DataSketches theta
  * line). Complements the built-in HLL++ with an independently
  * implemented, mergeable, fixed-size state the engine fully owns.
  *
  * Estimator: keep the k smallest of the values' 63-bit hashes; with
  * the k-th smallest at t (uniform on (0,1] after scaling), the
  * distinct count ≈ (k−1)/t. Exact below k. Map-side partial
  * aggregation + a merge that unions two heaps — constant state per
  * group at any scale, the whole point at 100 TB.
  */
object SketchAggregates {

  /** Sorted bounded buffer of the k smallest hashes (distinct). */
  final class KmvBuffer(val k: Int) {
    // TreeSet keeps (hash → present) sorted; size capped at k
    val heap = new java.util.TreeSet[java.lang.Long]()
    def insert(h: Long): Unit = {
      if (heap.size < k) { heap.add(h); () }
      else if (h < heap.last()) {
        if (heap.add(h)) { heap.pollLast(); () }
      }
    }
    def merge(other: KmvBuffer): Unit = {
      val it = other.heap.iterator()
      while (it.hasNext) insert(it.next())
    }
    def estimate: Long =
      if (heap.size < k) heap.size.toLong
      else {
        // hashes uniform on [0, 2^63): t = kth/2^63; est = (k-1)/t
        val t = heap.last().toDouble / 9.223372036854776e18
        math.round((k - 1) / t)
      }
  }

  /** approx distinct count of `child` via a KMV sketch of size k. */
  case class KmvDistinct(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[KmvBuffer] {
    require(k >= 2, s"graft_kmv_distinct: need k >= 2, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_kmv_distinct"

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) {
        // 63-bit positive hash (sign bit cleared): the estimator wants
        // a uniform order statistic, not signed wraparound
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          v, child.dataType, 42L) & Long.MaxValue
        buf.insert(h)
      }
      buf
    }

    override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      buf.merge(other); buf
    }

    override def eval(buf: KmvBuffer): Any = buf.estimate

    override def serialize(buf: KmvBuffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 4 + buf.heap.size * 8)
      bb.putInt(buf.k).putInt(buf.heap.size)
      val it = buf.heap.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): KmvBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val buf = new KmvBuffer(bb.getInt())
      val n = bb.getInt()
      var i = 0
      while (i < n) { buf.heap.add(bb.getLong()); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  def kmvDistinct(c: Column, k: Int = 256): Column =
    Bridge.column(KmvDistinct(Bridge.expression(c), k).toAggregateExpression())
}
