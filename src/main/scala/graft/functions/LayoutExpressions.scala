package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Space-filling-curve layout expressions (Morton/Z-order and Hilbert)
  * — split out of [[VectorExpressions]] in r12 (the >700-line file
  * discipline). Same design rationale: one fused pass per row instead
  * of a 64-node-per-dimension shift/or SQL expression tree.
  */
object LayoutExpressions {

  /** Morton bit-interleave of k long ranks (each in [0, 2^bits)): the
    * z-value whose sort order is the Z-order curve. Bit j of dimension
    * d lands at output bit j·k + d. One fused pass; no per-bit SQL
    * expression tree (64 shift/or nodes per dim would blow the codegen
    * method limit the same way the per-band HyperplaneSigs did).
    */
  case class InterleaveBits(children: Seq[Expression], bits: Int)
      extends Expression with CodegenFallback {
    private val k = children.size
    require(k > 0 && bits > 0 && bits * k <= 63,
      s"graft_interleave_bits: bits·dims must fit a long, got $bits × $k")
    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_interleave_bits"

    // analysis-time type check: a non-long child would otherwise throw
    // ClassCastException per row at eval
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (children.forall(_.dataType == LongType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint ranks, got " +
          children.map(_.dataType.simpleString).mkString(", "))

    override def eval(input: InternalRow): Any = {
      var z = 0L
      var d = 0
      while (d < k) {
        val v = children(d).eval(input)
        val rank = if (v == null) 0L else v.asInstanceOf[Long]
        // a rank past 2^bits would silently alias a small z-value and
        // corrupt the layout order — fail loudly instead
        if ((rank >>> bits) != 0L) throw new IllegalArgumentException(
          s"$prettyName: rank $rank does not fit $bits bits (dimension $d)")
        var j = 0
        while (j < bits) {
          if (((rank >>> j) & 1L) != 0L) z |= 1L << (j * k + d)
          j += 1
        }
        d += 1
      }
      z
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** 2-D Hilbert curve index of two long ranks in [0, 2^bits): the
    * classic xy2d construction (quadrant walk + rotate, as in the
    * public-domain Wikipedia/Hacker's-Delight formulation). Hilbert
    * ordering never jumps (adjacent curve positions are adjacent
    * cells), so partition bounding boxes are tighter than Morton's at
    * the same partition count — the locality refinement over
    * `InterleaveBits` for 2-dim layouts.
    */
  case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 31, // 2·bits must fit a long; 2*bits alone overflows Int for huge bits
      s"graft_hilbert_2d: need 0 < bits <= 31, got $bits")
    override def dataType: DataType = LongType
    // NULL rank → rank 0 (cluster at the curve origin), matching
    // InterleaveBits — not NULL-out, which would cluster rows under
    // NULL ordering instead
    override def nullable: Boolean = false
    override def prettyName: String = "graft_hilbert_2d"

    override def eval(input: InternalRow): Any = {
      val a = left.eval(input)
      val b = right.eval(input)
      nullSafeEval(if (a == null) 0L else a, if (b == null) 0L else b)
    }

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint ranks, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

    override def nullSafeEval(a: Any, b: Any): Any = {
      var x = a.asInstanceOf[Long]
      var y = b.asInstanceOf[Long]
      if ((x >>> bits) != 0L || (y >>> bits) != 0L)
        throw new IllegalArgumentException(
          s"$prettyName: rank ($x, $y) does not fit $bits bits")
      val n = 1L << bits
      var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        // rotate quadrant; the reflection uses the FULL side n (bits
        // above the current s are never re-read, and s-1-x would go
        // negative for x >= s)
        if (ry == 0L) {
          if (rx == 1L) {
            x = n - 1 - x
            y = n - 1 - y
          }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ------------------------------------------------- Column wrappers

  def interleaveBits(ranks: Seq[Column], bits: Int): Column =
    Bridge.column(InterleaveBits(ranks.map(Bridge.expression), bits))

  def hilbert2D(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertIndex2D(Bridge.expression(x), Bridge.expression(y), bits))
}
