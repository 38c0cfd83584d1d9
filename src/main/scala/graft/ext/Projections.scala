package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import graft.functions.VectorExpressions

/** [extension] Linear projections over the embedding column: one-pass
  * distributed moment accumulation (mean + Gram matrix), a driver-side
  * symmetric eigensolver, and PCA / whitening projection — the
  * dimensionality-reduction step of an embedding-dedup / ANN pipeline
  * (SemDeDup's and faiss's OPQ/PCA pre-transforms both ride exactly
  * this: rotate then truncate before quantizing). No reference analog
  * (the reference has no vector tier).
  *
  * Scale shape: the moments ride ONE mergeable aggregate
  * ([[GramAggregate]], the KMV/CM discipline — map-side partial
  * per-task state, associative merge), so 100 TB of embeddings reduce
  * to a single d + d(d+1)/2 double buffer per task and ONE collected
  * row at the driver: collect is O(d²), never O(n). The O(d³) Jacobi
  * eigensolve happens once on the driver (d ≤ a few thousand — for
  * d=64 it is microseconds); the resulting k×d component matrix
  * broadcasts back as LITERALS inside k codegen'd `graft_dot`
  * expressions, so projection is a narrow, whole-stage-codegen'd map
  * with no shuffle and no per-row JVM object churn.
  */
object Projections {

  /** Mutable moment state: count, per-dim sum, upper-triangle sum of
    * products (row-major: (i,j) with j >= i at offset i*d - i(i-1)/2 + j-i).
    */
  final class GramBuffer(val dim: Int) {
    var n: Long = 0L
    val sum: Array[Double] = new Array[Double](dim)
    val upper: Array[Double] = new Array[Double](dim * (dim + 1) / 2)
    def add(v: ArrayData): Unit = {
      n += 1
      var i = 0
      var off = 0
      while (i < dim) {
        val xi = v.getDouble(i)
        sum(i) += xi
        var j = i
        while (j < dim) { upper(off) += xi * v.getDouble(j); j += 1; off += 1 }
        i += 1
      }
    }
    def merge(o: GramBuffer): Unit = {
      n += o.n
      var i = 0
      while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
      var k = 0
      while (k < upper.length) { upper(k) += o.upper(k); k += 1 }
    }
  }

  /** Aggregate an array<double> embedding column to
    * struct(n BIGINT, sum array<double>, upper array<double>): count,
    * per-dimension sums, upper-triangle second moments. Rows whose
    * array is NULL or shorter than `dim` are skipped (a truncated
    * embedding would silently corrupt every covariance entry).
    */
  case class GramAggregate(
      child: Expression,
      dim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[GramBuffer] {
    require(dim >= 1, s"graft_gram: need dim >= 1, got $dim")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("upper", ArrayType(DoubleType, containsNull = false), nullable = false)))
    override def prettyName: String = "graft_gram"

    override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

    override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        if (arr.numElements() >= dim) buf.add(arr)
      }
      buf
    }

    override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
      buf.merge(other); buf
    }

    override def eval(buf: GramBuffer): Any =
      new GenericInternalRow(Array[Any](buf.n,
        new GenericArrayData(buf.sum.clone()),
        new GenericArrayData(buf.upper.clone())))

    override def serialize(buf: GramBuffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 * (buf.sum.length + buf.upper.length))
      bb.putInt(buf.dim).putLong(buf.n)
      var i = 0
      while (i < buf.sum.length) { bb.putDouble(buf.sum(i)); i += 1 }
      var k = 0
      while (k < buf.upper.length) { bb.putDouble(buf.upper(k)); k += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): GramBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val buf = new GramBuffer(bb.getInt())
      buf.n = bb.getLong()
      var i = 0
      while (i < buf.sum.length) { buf.sum(i) = bb.getDouble(); i += 1 }
      var k = 0
      while (k < buf.upper.length) { buf.upper(k) = bb.getDouble(); k += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): GramAggregate =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): GramAggregate =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  def gramAgg(c: Column, dim: Int): Column =
    Bridge.column(GramAggregate(Bridge.expression(c), dim).toAggregateExpression())

  /** Collected corpus moments: count, mean vector, POPULATION
    * covariance matrix (cov = E[xxᵀ] − μμᵀ). One job, one O(d²) row
    * to the driver.
    */
  final case class Moments(n: Long, mean: Array[Double], cov: Array[Array[Double]])

  def moments(df: DataFrame, embCol: String, dim: Int): Moments = {
    val row = df
      .select(gramAgg(col(embCol).cast("array<double>"), dim).as("m"))
      .select(col("m.n"), col("m.sum"), col("m.upper"))
      .head()
    val n = row.getLong(0)
    require(n > 0, s"moments: no rows with a >= $dim-element $embCol")
    val sum = row.getSeq[Double](1).toArray
    val upper = row.getSeq[Double](2).toArray
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var off = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = upper(off) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        off += 1
      }
      i += 1
    }
    Moments(n, mean, cov)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix (Golub & Van
    * Loan §8.5): sweeps of 2×2 rotations zeroing each off-diagonal
    * entry; unconditionally convergent, O(d³) per sweep, ~6 sweeps to
    * machine precision. Driver-side by design — d is the EMBEDDING
    * dimension (64–4096), never the corpus size. Returns
    * (eigenvalues desc, eigenvectors as ROWS, orthonormal).
    */
  def symmetricEigen(m: Array[Array[Double]], maxSweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // scale-aware threshold: off-diagonal mass relative to the norm
    val frob = math.sqrt(a.map(_.map(x => x * x).sum).sum).max(java.lang.Double.MIN_NORMAL)
    var sweep = 0
    var off = java.lang.Double.MAX_VALUE
    while (sweep < maxSweeps && off > tol * frob) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > java.lang.Double.MIN_NORMAL) {
            // rotation angle: tan(2θ) = 2a_pq / (a_pp − a_qq)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off += 2.0 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      off = math.sqrt(off)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    (values, vectors)
  }

  /** Fitted PCA transform: mean, top-k eigenvalues (variance per
    * component, desc) and the k×d row-wise component matrix.
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  def fitPca(df: DataFrame, embCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"fitPca: need 1 <= k <= $dim, got $k")
    val m = moments(df, embCol, dim)
    val (values, vectors) = symmetricEigen(m.cov)
    PcaModel(m.mean, values.take(k), vectors.take(k))
  }

  /** Append `outCol`: the centered projection onto the model's
    * components — array(k) of codegen'd `graft_dot`s against LITERAL
    * component vectors (dot(x, cⱼ) − dot(μ, cⱼ), the constant folded
    * on the driver). `whiten = true` also divides by √λⱼ, giving
    * ~unit variance per coordinate (the PCA-whitening transform). A
    * narrow map: no shuffle, stays inside whole-stage codegen.
    */
  def pcaProject(df: DataFrame, embCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false,
      eps: Double = 1e-12): DataFrame = {
    val emb = col(embCol).cast("array<double>")
    val coords = model.components.zipWithIndex.map { case (comp, j) =>
      val centered = VectorExpressions.dot(emb, lit(comp)) -
        lit(comp.zip(model.mean).map { case (c, mu) => c * mu }.sum)
      if (whiten) centered / lit(math.sqrt(model.eigenvalues(j).max(0.0) + eps))
      else centered
    }
    df.withColumn(outCol, array(coords.toIndexedSeq: _*))
  }

  /** Oracle-exact quantized Gram matrix: elements quantized to
    * `floor(x·scale + 0.5)` BIGINT (floor on identical IEEE doubles —
    * portable across engines, unlike `round`, which Spark routes
    * through the shortest-decimal string), then the upper-triangle
    * pairwise product sums — integer arithmetic, so the result is
    * EXACT and independent of partitioning/summation order (SURVEY
    * §5.3 discipline: cross-row double sums never hash-match).
    * 1-based (i, j) to match SQL list indexing.
    *
    * Plan: quantize in the scan projection, two narrow generates
    * (n·d(d+1)/2 rows), then partial+final hash agg on (i, j) — the
    * shuffle carries at most tasks × d(d+1)/2 pre-aggregated rows, so
    * row amplification never crosses the wire. The production path
    * ([[moments]]) does the same reduction in one custom aggregate;
    * this formulation exists to be SQL-checkable.
    */
  def quantizedGram(df: DataFrame, embCol: String,
      scale: Double = 1e6): DataFrame = {
    val v = transform(col(embCol).cast("array<double>"),
      x => floor(x * lit(scale) + lit(0.5)).cast("long"))
    df.select(v.as("v"))
      .select(col("v"), posexplode(col("v")).as(Seq("i0", "xi")))
      .select(col("i0"), col("xi"),
        posexplode(slice(col("v"), col("i0") + lit(1), size(col("v")) - col("i0")))
          .as(Seq("j0", "xj")))
      .groupBy((col("i0") + lit(1)).cast("long").as("i"),
        (col("i0") + col("j0") + lit(1)).cast("long").as("j"))
      .agg(sum(col("xi") * col("xj")).as("s"))
      .orderBy("i", "j")
  }
}
