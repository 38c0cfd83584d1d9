package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // 64×64 uniform grid — shared fixture for the pruning-geometry tests
  private def grid = spark.range(64L * 64)
    .select((col("id") % 64).as("x"), expr("id div 64").as("y"))

  // per-partition (ymin, ymax) — the min/max footer stats a reader
  // would prune on for a y-only filter
  private def yRanges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select(col("y").cast("long"))
      .mapPartitions { it =>
        val ys = it.map(_.getLong(0)).toSeq
        if (ys.isEmpty) Iterator.empty else Iterator((ys.min, ys.max))
      }.collect().toSeq

  // average number of partitions a point filter on y must read
  private def avgPartitionsHit(ranges: Seq[(Long, Long)]): Double =
    (0L until 64L).map(y0 => ranges.count { case (lo, hi) => lo <= y0 && y0 <= hi })
      .sum.toDouble / 64

  test("interleaveBits: Morton encoding matches the reference definition") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L)).toDF("x", "y")
    val got = df.select(
      graft.functions.LayoutExpressions.interleaveBits(Seq(col("x"), col("y")), 4).as("z"))
      .as[Long].collect().toSeq
    // bit j of x → bit 2j; bit j of y → bit 2j+1
    def morton(x: Long, y: Long): Long =
      (0 until 4).foldLeft(0L)((z, j) =>
        z | ((x >> j & 1) << (2 * j)) | ((y >> j & 1) << (2 * j + 1)))
    assert(got == Seq(morton(0, 0), morton(1, 0), morton(0, 1), morton(1, 1), morton(3, 5)))
    assert(got(4) == ((1L << 0) | (1L << 2)   // x=3 → bits 0,1 → z bits 0,2
      | (1L << 1) | (1L << 5)))               // y=5 → bits 0,2 → z bits 1,5
  }

  test("z-layout bounds BOTH dimensions per partition; lexicographic sort does not") {
    val zRanges = yRanges(ZOrder.layout(grid, Seq("x", "y"), numFiles = 16, bits = 6))
    val lexRanges = yRanges(grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y"))

    // The pruning claim: a point filter on the NON-leading dimension
    // reads only the partitions whose y-range covers it. Partition
    // area is conserved by any layout; what z-order buys is balanced
    // per-dimension spans, i.e. fewer partitions hit per filter.
    val zHit = avgPartitionsHit(zRanges)
    val lexHit = avgPartitionsHit(lexRanges)
    assert(zRanges.nonEmpty)
    // lexicographic: every partition spans ~all of y → a y-filter reads
    // ~all 16 partitions; z-order: balanced spans → a fraction
    assert(lexHit > 12, s"expected near-total y overlap in lex layout, got $lexHit")
    assert(zHit < lexHit / 2,
      s"z-order y-pruning not better: z hits $zHit vs lex $lexHit of ${zRanges.size}")
  }

  test("hilbert2D: unit-step curve visiting every cell exactly once") {
    // d2xy reference (inverse walk) — independently recomputes the
    // curve; hilbert2D must be its inverse on the full 16x16 grid
    def d2xy(bits: Int, dIn: Long): (Long, Long) = {
      val n = 1L << bits
      var (x, y, d) = (0L, 0L, dIn)
      var s = 1L
      while (s < n) {
        val rx = 1L & (d / 2)
        val ry = 1L & (d ^ rx)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        x += s * rx
        y += s * ry
        d /= 4
        s *= 2
      }
      (x, y)
    }
    val bits = 4
    val cells = (0L until 256L).map(d2xy(bits, _))
    assert(cells.toSet.size == 256, "curve must visit every cell once")
    // adjacency: consecutive curve positions are grid neighbors
    cells.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps between ($x1,$y1) and ($x2,$y2)")
    }
    // round-trip through the expression
    val df = cells.zipWithIndex.map { case ((x, y), d) => (x, y, d.toLong) }
      .toDF("x", "y", "d")
    val got = df.select(col("d"),
      graft.functions.LayoutExpressions.hilbert2D(col("x"), col("y"), bits).as("h"))
      .filter(col("d") =!= col("h")).count()
    assert(got == 0, "hilbert2D disagrees with the d2xy reference walk")
  }

  test("hilbert layout prunes the non-leading dimension like z-order") {
    val hRanges = yRanges(ZOrder.hilbertLayout(grid, "x", "y", numFiles = 16, bits = 6))
    // same conservative bound as the Morton test: far below the
    // 16-partitions-always of a lexicographic layout
    assert(hRanges.nonEmpty && avgPartitionsHit(hRanges) < 8,
      s"hilbert y-pruning too weak: ${avgPartitionsHit(hRanges)} of ${hRanges.size}")
  }

  test("constant and NULL dimensions degrade gracefully") {
    val df = Seq((1L, Option(5L)), (2L, None), (3L, Option(7L)))
      .toDF("x", "y")
      .withColumn("c", lit(9)) // constant: hi == lo → rank 0
    val z = ZOrder.withZValue(df, Seq("x", "y", "c"), bits = 8)
    assert(z.count() == 3)
    assert(z.schema.fieldNames.contains("_z"))
    // all z-values defined, NULL y → rank 0 contribution only
    assert(z.select(col("_z")).as[Long].collect().forall(_ >= 0L))
  }
}
