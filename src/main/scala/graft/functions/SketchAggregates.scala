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

  /** Count-Min sketch + candidate heap — the heavy-hitters state
    * (Cormode & Muthukrishnan, "An improved data stream summary: the
    * count-min sketch and its applications", J. Algorithms 2005; the
    * CM-heap top-k variant from §4.1 of the same paper).
    *
    * `counters` is a d×w matrix of longs updated additively, so the
    * merged matrix is identical for any partitioning of the input —
    * the mergeable-summary property that makes the map-side partial
    * aggregation exact. The candidate map tracks up to `cap` suspected
    * heavy hitters; mid-stream estimates can go stale (classic CM-heap
    * laziness), so `eval`/`merge` re-estimate every candidate from the
    * final counters before ranking.
    */
  final class CmBuffer(val d: Int, val w: Int, val k: Int, val cap: Int) {
    val counters = new Array[Long](d * w)
    var total = 0L
    val candidates = new java.util.HashMap[String, java.lang.Long]()

    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function

    private def bucket(u: UTF8String, row: Int): Int = {
      // one independent hash function per row: distinct fixed seeds
      val h = XxHash64Function.hash(u, StringType, 1000003L * row + 7L)
      (((h % w) + w) % w).toInt
    }

    /** Point estimate from the CURRENT counters: min over the d rows. */
    def estimate(u: UTF8String): Long = {
      var e = Long.MaxValue
      var r = 0
      while (r < d) {
        val c = counters(r * w + bucket(u, r))
        if (c < e) e = c
        r += 1
      }
      if (e == Long.MaxValue) 0L else e
    }

    def insert(u: UTF8String): Unit = {
      total += 1
      var e = Long.MaxValue
      var r = 0
      while (r < d) {
        val idx = r * w + bucket(u, r)
        counters(idx) += 1
        if (counters(idx) < e) e = counters(idx)
        r += 1
      }
      val key = u.toString // copy out — eval's UTF8String buffer is reused
      if (candidates.containsKey(key) || candidates.size < cap) {
        candidates.put(key, e); ()
      } else {
        // full: evict the weakest candidate only if beaten. cap is
        // O(k) small, so the linear scan is constant work per row.
        var minKey: String = null
        var minEst = Long.MaxValue
        val it = candidates.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          if (en.getValue < minEst) { minEst = en.getValue; minKey = en.getKey }
        }
        if (e > minEst) { candidates.remove(minKey); candidates.put(key, e); () }
      }
    }

    /** Re-estimate `keys` against the current counters and keep the
      * strongest `limit`, ties broken by key for determinism. */
    def topBy(keys: java.util.Set[String], limit: Int): Seq[(String, Long)] = {
      val arr = new scala.collection.mutable.ArrayBuffer[(String, Long)](keys.size)
      val it = keys.iterator()
      while (it.hasNext) {
        val key = it.next()
        arr += ((key, estimate(UTF8String.fromString(key))))
      }
      arr.sortBy { case (key, est) => (-est, key) }.take(limit).toSeq
    }

    def merge(other: CmBuffer): Unit = {
      var i = 0
      while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
      total += other.total
      // union the candidate keys, re-rank against the MERGED counters
      // (pre-merge estimates are stale by construction), keep top cap
      val keys = new java.util.HashSet[String](candidates.keySet())
      keys.addAll(other.candidates.keySet())
      candidates.clear()
      topBy(keys, cap).foreach { case (key, est) =>
        candidates.put(key, est)
      }
    }
  }

  /** Top-k heavy hitters of a STRING column via a Count-Min sketch:
    * returns `array<struct<item string, est bigint>>`, strongest first
    * (est DESC, item ASC). Guarantees (seeds fixed, so deterministic
    * for a given dataset): est >= true count always; est <= true +
    * ε·N with probability 1−δ per item, ε = e/w, δ = e^−d. State is
    * d·w longs + cap strings per group regardless of input size.
    */
  case class CmTopK(
      child: Expression,
      k: Int,
      depth: Int = 5,
      width: Int = 8192,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[CmBuffer] {
    require(k >= 1, s"graft_cm_topk: need k >= 1, got $k")
    require(depth >= 1 && depth <= 16,
      s"graft_cm_topk: need 1 <= depth <= 16, got $depth")
    require(width >= 8, s"graft_cm_topk: need width >= 8, got $width")

    // candidate slack over k absorbs mid-stream eviction mistakes
    private val cap = math.max(4 * k, 64)

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("est", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_cm_topk"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_cm_topk: value must be STRING (cast first), got ${child.dataType.sql}")
    }

    override def createAggregationBuffer(): CmBuffer =
      new CmBuffer(depth, width, k, cap)

    override def update(buf: CmBuffer, input: InternalRow): CmBuffer = {
      val v = child.eval(input)
      if (v != null) buf.insert(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      buf
    }

    override def merge(buf: CmBuffer, other: CmBuffer): CmBuffer = {
      buf.merge(other); buf
    }

    override def eval(buf: CmBuffer): Any = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val top = buf.topBy(buf.candidates.keySet(), k).map { case (key, est) =>
        InternalRow(UTF8String.fromString(key), est)
      }
      new GenericArrayData(top.toArray[Any])
    }

    override def serialize(buf: CmBuffer): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.d); out.writeInt(buf.w)
      out.writeInt(buf.k); out.writeInt(buf.cap)
      out.writeLong(buf.total)
      var i = 0
      while (i < buf.counters.length) { out.writeLong(buf.counters(i)); i += 1 }
      out.writeInt(buf.candidates.size)
      val it = buf.candidates.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        // length-prefixed UTF-8, not writeUTF — candidate values can be
        // arbitrarily long strings (writeUTF caps at 64 KiB and throws)
        val kb = en.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(kb.length); out.write(kb)
        out.writeLong(en.getValue)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): CmBuffer = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = new CmBuffer(in.readInt(), in.readInt(), in.readInt(), in.readInt())
      buf.total = in.readLong()
      var i = 0
      while (i < buf.counters.length) { buf.counters(i) = in.readLong(); i += 1 }
      val n = in.readInt()
      i = 0
      while (i < n) {
        val kb = new Array[Byte](in.readInt())
        in.readFully(kb)
        val key = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
        buf.candidates.put(key, in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CmTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CmTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  def cmTopK(c: Column, k: Int, depth: Int = 5, width: Int = 8192): Column =
    Bridge.column(CmTopK(Bridge.expression(c), k, depth, width).toAggregateExpression())
}
