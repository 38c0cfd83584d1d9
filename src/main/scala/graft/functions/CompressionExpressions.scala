package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-based text quality signal (r18): the DEFLATE size of a
  * document's UTF-8 bytes, and the derived compressibility ratio.
  * Highly repetitive text (boilerplate, template spam, keyword
  * stuffing, degenerate generation loops) compresses far below
  * natural prose, and near-random bytes (minified blobs, encoded
  * payloads, hex dumps) barely compress at all — so the ratio
  * separates three corpus-hygiene classes one scalar can't otherwise
  * see (the FineWeb/DataTrove-lineage "gzip ratio" filter; the same
  * signal family as the Gopher repetition rules, but robust to
  * paraphrase-level repetition the exact line/n-gram counters miss).
  *
  * Reference scope: the reference notebooks never touch text quality
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py` —
  * §8.2 crawl-extension surface, beside the Gopher/C4 rules in
  * [[graft.ext.TextAnalysis]]).
  *
  * Determinism: one `Deflater` per thread (reused via `reset()` —
  * per-row construction would pay a native allocation per document),
  * fixed level 6, `nowrap = true` (raw DEFLATE — no zlib header noise
  * on short docs). DEFLATE output for a fixed input/level/strategy is
  * stable for a given JDK's bundled zlib, but NOT contractual across
  * zlib versions — so gates band the ratio (class separation holds
  * with wide margins) rather than hashing exact sizes, and the oracle
  * restates the bands, never the bytes.
  *
  * Scale shape: per-row scalar inside whole-stage codegen (static
  * helper call — the [[HtmlEntityExpressions]] pattern); the signal
  * rides the corpus scan like every other quality rule, no shuffle.
  */
object CompressionExpressions {

  case class DeflateSize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_deflate_size"

    override def nullSafeEval(v: Any): Any =
      DeflateGear.size(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, in => s"graft.functions.DeflateGear.size($in)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Raw DEFLATE output size of the column's UTF-8 bytes (empty
    * string compresses to the 2-byte empty final block).
    */
  def deflateSize(text: Column): Column =
    Bridge.column(DeflateSize(Bridge.expression(text)))

  /** `floor(1000 · deflate_size / octet_length)` — compressed
    * per-mille of the original byte length; NULL for the empty
    * string (no length to be a ratio of). Typical bands (level 6):
    * single-token repetition ≲ 60, natural prose ~300-600, random
    * hex/base64 ≳ 550, with short-doc overhead pushing everything up.
    */
  def deflateRatioMilli(text: Column): Column = {
    val len = octet_length(text)
    when(len === 0, lit(null).cast("int"))
      .otherwise(floor(lit(1000L) * deflateSize(text).cast("long") / len)
        .cast("int"))
  }
}

/** The per-thread DEFLATE gear behind
  * [[CompressionExpressions.DeflateSize]]. Top-level object with no
  * companion class so Scala emits static forwarders callable from
  * generated code (the [[HtmlEntities]] note).
  */
object DeflateGear {
  private val local = new ThreadLocal[(Deflater, Array[Byte])] {
    override def initialValue(): (Deflater, Array[Byte]) =
      (new Deflater(6, true), new Array[Byte](8192))
  }

  def size(s: UTF8String): Int = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
