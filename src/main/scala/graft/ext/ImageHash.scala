package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + near-duplicate pairing — the multimodal
  * sibling of the text near-dup family (`Dedup.minhashPairs` /
  * `SimHash64`): crawl-scale pipelines dedup images by a tiny
  * difference-hash of the downsampled picture, not by payload bytes
  * (the same picture re-encoded, re-compressed, or uniformly
  * re-exposed hashes identically; pairing is a band-bucket join on
  * hash fragments, never O(n²) pixel comparison).
  *
  * Reference scope: the reference pipelines
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`)
  * carry no media columns at all — this is part of the §8.2
  * training-data extension surface, built on the same JRE-only
  * decode stack as [[Multimodal.ImageIoDecoder]].
  *
  * dHash (difference hash), the standard recipe:
  *   1. decode → luminance grid (here: the red channel of the
  *      already-grayscale fixture; real photos would go through a
  *      luma transform first — [[Multimodal.ImageIoDecoder]] shows
  *      the 0.299/0.587/0.114 weights),
  *   2. box-downsample to a (w+1)×h grid of block SUMS (sums, not
  *      means — no division, so the integer arithmetic is exact and
  *      the DuckDB oracle can replay it term for term),
  *   3. bit(x,y) = 1 iff sum(x+1,y) > sum(x,y) — horizontal gradient
  *      signs, 64 bits from a 9×8 grid.
  *
  * Why dHash holds up at 100 TB: the hash is a per-row projection
  * inside one narrow `mapPartitions` pass (no shuffle), and pairing
  * shuffles only (band, value) keys — identical scale posture to the
  * MinHash band join, with per-bucket membership bounded by how many
  * images truly share a 16-bit hash fragment.
  */
object ImageHash {

  /** Number of 2×2 blocks across / down: 18×16 px → 9×8 sums → 8×8
    * comparison bits. Fixed because the hash width (64 bits, 4×16-bit
    * bands) is part of the pairing contract.
    */
  val GridW = 9
  val GridH = 8

  /** 64-bit dHash of one decoded image. The image must be exactly
    * (2·GridW)×(2·GridH) px — the gate fixtures are generated at that
    * size; arbitrary inputs go through [[Multimodal.resizeImages]]
    * first (real AreaAveraging resize), which is deliberately NOT
    * fused in here: resize semantics are pinned by their own gate
    * (q32 family) and fusing would hide which stage broke a hash.
    *
    * Bit layout: bit index = by·8 + bx, set iff the (bx+1,by) block
    * sum strictly exceeds the (bx,by) block sum. A uniform exposure
    * shift adds the same constant to every block sum, so every
    * comparison — and the hash — is invariant under it; that is the
    * "perceptual" part.
    */
  private[ext] def dHash64(payload: Array[Byte]): Long = {
    val img =
      try javax.imageio.ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload)))
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"ImageHash: payload is not a decodable image: ${e.getMessage}", e)
      }
    require(img != null, "ImageHash: payload is not a decodable image")
    dHashOfImage(img)
  }

  /** The hash core over an already-decoded image — shared by
    * [[dHash64]] and the fused [[imageDHashResized]] so the two paths
    * cannot drift.
    */
  private def dHashOfImage(img: java.awt.image.BufferedImage): Long = {
    require(img.getWidth == 2 * GridW && img.getHeight == 2 * GridH,
      s"ImageHash: expected ${2 * GridW}x${2 * GridH} px, " +
        s"got ${img.getWidth}x${img.getHeight} — resize first (Multimodal.resizeImages)")
    val sums = Array.ofDim[Long](GridW, GridH)
    var by = 0
    while (by < GridH) {
      var bx = 0
      while (bx < GridW) {
        var s = 0L
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            s += (img.getRGB(2 * bx + dx, 2 * by + dy) >> 16) & 0xFF
            dx += 1
          }
          dy += 1
        }
        sums(bx)(by) = s
        bx += 1
      }
      by += 1
    }
    var hash = 0L
    by = 0
    while (by < GridH) {
      var bx = 0
      while (bx < GridW - 1) {
        if (sums(bx + 1)(by) > sums(bx)(by)) hash |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** (idCol, payloadCol binary) → (idCol, dhash BIGINT). One narrow
    * mapPartitions projection — decode cost parallelizes by input
    * partition, nothing shuffles.
    */
  def imageDHash(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, dHash64(payload)) })
      .toDF(idCol, "dhash")
  }

  /** Single-decode resize→hash — the FUSED form of
    * `Multimodal.resizeImages(media, 18, 16)` → [[imageDHash]]: one
    * ImageIO decode, a nearest-neighbor rescale onto the 18×16
    * canvas (the identical Graphics2D call the resizer makes), and
    * the hash computed straight off the canvas — no PNG re-encode,
    * no second decode. Hash-IDENTICAL to the two-stage path
    * (ImageHashSpec parity pin: NN sampling and the lossless
    * intermediate make the canvas pixels equal), at roughly half the
    * decode CPU — the production choice when the image corpus
    * dominates and per-stage hashes are already pinned (r15 ADVICE).
    */
  def imageDHashResized(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img =
          try javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload)))
          catch {
            case e: java.io.IOException =>
              throw new IllegalArgumentException(
                s"ImageHash: payload is not a decodable image: ${e.getMessage}", e)
          }
        require(img != null, "ImageHash: payload is not a decodable image")
        val dst = new java.awt.image.BufferedImage(2 * GridW, 2 * GridH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, 2 * GridW, 2 * GridH, null)
        } finally g.dispose()
        (id, dHashOfImage(dst))
      }).toDF(idCol, "dhash")
  }

  /** The b-th 16-bit fragment of a 64-bit hash (b ∈ 0..3), as a
    * Column. Arithmetic shift then mask — sign extension from bit 63
    * is stripped by the AND, so band 3 is correct for negative longs.
    */
  def band16(hash: Column, b: Int): Column = band(hash, b, 16)

  /** The b-th `bits`-wide fragment of a 64-bit hash
    * (b ∈ 0 until 64/bits); same sign-safe shift-and-mask.
    */
  def band(hash: Column, b: Int, bits: Int): Column =
    shiftright(hash, bits * b)
      .bitwiseAND(lit(if (bits == 64) -1L else (1L << bits) - 1))

  /** Hamming distance between two 64-bit hashes, computed band-wise
    * (4 × bit_count over non-negative 16-bit ints) so the SAME
    * expression is replayable in engines whose BIGINT shifts trap on
    * the sign bit. The bands partition the 64 bits, so the sum IS the
    * full Hamming distance.
    */
  def hamming64(a: Column, b: Column): Column =
    (0 until 4).map(i => bit_count(band16(a, i).bitwiseXOR(band16(b, i))))
      .reduce(_ + _)

  /** Near-duplicate image pairs by banded dHash: hashes agreeing on at
    * least one of the 64/`bandBits` bands meet in a bucket join, and
    * candidates are kept iff full Hamming ≤ `maxHamming`. Guarantees
    * every pair within distance (nBands − 1) is found (≤ nBands−1
    * differing bits → some band is clean — the pigeonhole bound the
    * MinHash banding shares); pairs past that are found iff their
    * differing bits leave a band intact. Output: (id_a, id_b, hamming),
    * id_a < id_b, each pair once.
    *
    * Scale: the only shuffle is the (band, value) bucket key; a bucket
    * holds just the images sharing that exact fragment, and the
    * join output is verified per candidate — never materializing an
    * all-pairs frame. Hash-fragment skew (e.g. millions of solid-white
    * thumbnails sharing every band) is real dup structure, the same
    * story as the MinHash band join's hot buckets.
    *
    * `bandBits` is the corpus-size dial: RANDOM (non-dup) hashes
    * collide on a `bandBits`-wide fragment with probability 2^-bits,
    * so expected accidental candidates grow ~ nBands · n² / 2^bits —
    * 16-bit bands saturate around 10⁶ images (measured in SCALE.md:
    * the candidate count, not the dup structure, dominates the wall),
    * while 32-bit bands hold accidental candidates near zero at the
    * price of the guarantee dropping to distance ≤ 1 (2 bands).
    * Pick the widest band whose pigeonhole guarantee still covers the
    * distance you must not miss.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int,
      idCol: String = "media_id", bandBits: Int = 16,
      eager: Boolean = false): DataFrame = {
    require(Set(8, 16, 32).contains(bandBits),
      s"ImageHash.nearDupPairs: bandBits must be 8, 16, or 32, got $bandBits")
    val nBands = 64 / bandBits
    require(maxHamming >= 0 && maxHamming <= 4 * bandBits,
      s"ImageHash.nearDupPairs: maxHamming must be in [0, ${4 * bandBits}], " +
        s"got $maxHamming (past it a single clean band no longer implies similarity)")
    // cache the (id, dhash) projection: the self-join reads it twice,
    // and the upstream is typically the DECODE pass — without the
    // cache every image decodes once per join side (measured 2× wall
    // on the 16× ScaleCheck corpus). 16 bytes/row; eager count so the
    // two sides never race the fill (the Dedup.minhashPairs
    // discipline). With eager=false the returned frame stays lazy over
    // this plan and the cache lives for the session; eager=true
    // materializes the result (localCheckpoint) and unpersists the
    // snapshot before returning — the mode for sweep harnesses like
    // ScaleCheck that call this many times per session and would
    // otherwise accumulate cached partitions (r14 ADVICE).
    val snap = hashes.select(col(idCol).cast("long").as("id"),
      col("dhash").cast("long").as("dhash")).cache()
    snap.count()
    // the (band, value) rows per image are a prebuilt struct
    // array — shiftright takes a literal shift, and prebuilding keeps
    // the band extraction inside the same codegen'd projection as the
    // explode
    val bands = snap.select(col("id"), col("dhash"),
        explode(array((0 until nBands).map(i =>
          struct(lit(i).as("band"),
            band(col("dhash"), i, bandBits).as("bval"))): _*)).as("bv"))
      .select(col("id"), col("dhash"),
        col("bv.band").as("band"), col("bv.bval").as("bval"))
    val a = bands.select(col("id").as("id_a"), col("dhash").as("h_a"),
      col("band"), col("bval"))
    val b = bands.select(col("id").as("id_b"), col("dhash").as("h_b"),
      col("band"), col("bval"))
    val pairs = a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b")
      .distinct()
      .withColumn("hamming", hamming64(col("h_a"), col("h_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
    if (!eager) pairs
    else {
      val out = pairs.localCheckpoint(true)
      snap.unpersist()
      out
    }
  }
}
