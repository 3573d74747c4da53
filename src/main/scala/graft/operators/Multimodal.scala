package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines.
  *
  * Media (image/audio/video) travels as an opaque `binary` payload column
  * plus a typed metadata struct — the schema pattern a 100 TB multimodal
  * corpus needs (payloads stay columnar/compressed in parquet; metadata
  * is filterable/prunable without touching bytes).
  *
  * Two operations, both real:
  *
  *  - [[decodeMedia]] — the DECODE entry point. Hand-parsed BMP and WAV
  *    PCM, PNG and JPEG via the JDK's `javax.imageio` codec (the two
  *    image codecs a bare JVM ships), and a documented byte-fold
  *    fallback (`format = "opaque"`) for anything else — one bad or
  *    unknown payload degrades, never fails the task.
  *  - [[byteFingerprint]] — the codec-free OPAQUE-PAYLOAD fingerprint:
  *    byte count/sum, head hex, and a stride-sampled byte sum. Not a
  *    decode and not pretending to be one — it's the cheap
  *    integrity/identity pass you run on payloads you can't (or won't)
  *    decode, and its stride loop exercises the frame-sampler access
  *    pattern end-to-end.
  *
  * Shared shape: binary+metadata schema, typed `Dataset` encoder
  * boundary, per-partition batch iteration (`mapPartitions`, the Scala
  * analog of a vectorized batch-UDF) so codec init amortizes per
  * partition and payloads never leave the executor.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String,
    width: Int, n_frames: Int)

  /** Codec-free payload fingerprint (deterministic byte statistics). */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
    head_hex: String, frame_sum: Long, n_sampled: Int)

  /** Wrap a text column as a media payload (UTF-8 bytes) with metadata —
    * the test-fixture producer; a real pipeline lands actual image/audio
    * bytes in the same shape.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      length(col(textCol)).cast("int").as("width"),
      greatest(lit(1), (length(col(textCol)) / 16).cast("int")).as("n_frames"))

  /** Opaque-payload fingerprint: per-partition batch iteration over raw
    * payload bytes, NO codec — total byte count, full byte sum, hex of
    * the first 8 bytes, and a stride-`frameStride` sampled byte sum.
    * This is the identity/integrity pass for payloads you don't decode
    * (dedup keys, corruption screens, stride-access warming); for
    * actual decoding use [[decodeMedia]], which parses
    * BMP/PNG/JPEG/WAV and falls back to an equivalent byte-fold only
    * for formats it cannot parse.
    */
  def byteFingerprint(ds: Dataset[MediaRow], frameStride: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // batch shape: one iterator per partition, mirroring decodeMedia's
      // amortize-init-per-partition discipline.
      rows.map { r =>
        val b = r.payload
        var sum = 0L
        var i = 0
        while (i < b.length) { sum += b(i) & 0xff; i += 1 }
        var fsum = 0L
        var n = 0
        var j = 0
        while (j < b.length) { fsum += b(j) & 0xff; n += 1; j += frameStride }
        val head = b.take(8).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, b.length.toLong, sum, head, fsum, n)
      }
    }
  }

  /** Real-decode output: one row per media payload, format-specific
    * fields zeroed where they don't apply. `mean_value` is the mean
    * pixel-channel byte (BMP), the mean ABSOLUTE PCM amplitude (WAV), or
    * the mean payload byte (opaque fallback); `rms` is the root mean
    * square on the same scale.
    */
  case class DecodedMedia(doc_id: Long, format: String, width: Int,
    height: Int, channels: Int, sample_rate: Int, n_samples: Long,
    mean_value: Double, rms: Double, n_bytes: Long)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Uncompressed 24/32-bpp bottom-up-or-top-down BMP (BITMAPINFOHEADER,
    * the format every producer can emit): header fields + mean/RMS over
    * all pixel-channel bytes, honoring the 4-byte row padding. Returns
    * None when the payload isn't a parseable BMP of that shape.
    */
  private def decodeBmp(id: Long, b: Array[Byte]): Option[DecodedMedia] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = i32(b, 10)
    val width = i32(b, 18)
    val height = i32(b, 22) // negative = top-down; row order is stats-irrelevant
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (width <= 0 || height == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    // ALL sizing arithmetic in Long: a hostile/corrupt header can put
    // width·bpp near 2^31, and an Int wrap here would turn the bounds
    // check into an out-of-bounds crash instead of the documented None
    // (these decoders feed messy corpora; one bad file must not fail
    // the task). The height bound DIVIDES rather than multiplying:
    // rowBytesL·absH can itself exceed Long.MaxValue (width=2^30,
    // bpp=32, height=Int.MinValue → 2^63 wraps negative and would slip
    // a product-form guard), so compare absH against the row capacity
    // of the buffer instead — division cannot overflow.
    val absH = math.abs(height.toLong)
    val bytesPerPx = bpp / 8
    val rowBytesL = ((width.toLong * bytesPerPx + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOff < 0 || dataOff > b.length ||
      absH > (b.length.toLong - dataOff) / rowBytesL) return None
    val rowBytes = rowBytesL.toInt // ≤ b.length after the guard
    val nRows = absH.toInt // ≤ b.length / rowBytesL ≤ b.length / 4
    var sum = 0.0; var sq = 0.0
    var row = 0
    while (row < nRows) {
      val base = dataOff + row * rowBytes
      var i = 0
      val nb = width * bytesPerPx
      while (i < nb) {
        val v = (b(base + i) & 0xff).toDouble
        sum += v; sq += v * v; i += 1
      }
      row += 1
    }
    val n = width.toLong * absH * bytesPerPx
    Some(DecodedMedia(id, "bmp", width, absH.toInt, bytesPerPx, 0,
      width.toLong * absH, sum / n, math.sqrt(sq / n), b.length.toLong))
  }

  private val pngSig =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val jpegSig = Array(0xff, 0xd8, 0xff).map(_.toByte)
  /** ImageIO's default stream cache is a TEMP FILE per decode — pure
    * overhead when the payload is already a byte array in memory.
    * JVM-global, set once per executor.
    */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def hasSig(b: Array[Byte], sig: Array[Byte]): Boolean = {
    if (b.length < sig.length) return false
    var s = 0
    while (s < sig.length) { if (b(s) != sig(s)) return false; s += 1 }
    true
  }

  /** PNG / JPEG via `javax.imageio` — the two real image codecs a bare
    * JVM ships (PNG landed round 11; JPEG round 12, same discipline).
    * Signature check first (cheap reject for the common non-match
    * case), then a full decode and stats over every pixel-channel
    * sample from the raster: 8-bit images land on the same 0-255 scale
    * as the BMP path; 16-bit PNGs on 0-65535 (the raster's native
    * sample scale). `channels` is the raster band count (1 gray,
    * 2 gray+alpha, 3 RGB, 4 RGBA); palette (indexed-color) PNGs are
    * resolved THROUGH the color table to RGB (channels = 3) — their
    * raster band holds palette indices, which are not pixel statistics.
    * Returns None for unrecognized payloads AND for corrupt/truncated
    * files (ImageIO errors are caught): these decoders feed messy
    * corpora, so one bad file degrades to the opaque fallback instead
    * of failing the task.
    */
  private def decodeImage(id: Long, b: Array[Byte]): Option[DecodedMedia] = {
    val fmt =
      if (hasSig(b, pngSig)) "png"
      else if (hasSig(b, jpegSig)) "jpeg"
      else return None
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val indexed = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
      var sum = 0.0; var sq = 0.0
      val (bands, n) =
        if (indexed) {
          // palette PNG (color type 3): the raster's single band holds
          // COLOR-TABLE INDICES, not pixel values — resolve through the
          // palette to RGB so an all-white image doesn't report the
          // stats of "palette entry 0". Row-at-a-time RGB transfer.
          val buf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, buf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = buf(x)
              var c = 0
              while (c < 3) {
                val v = ((rgb >> (16 - 8 * c)) & 0xff).toDouble
                sum += v; sq += v * v; c += 1
              }
              x += 1
            }
            y += 1
          }
          (3, w.toLong * h * 3)
        } else {
          val raster = img.getRaster
          val bd = raster.getNumBands
          if (bd <= 0) return None
          // row-at-a-time so the transfer buffer stays O(width·bands),
          // not O(pixels) — the per-partition iteration already
          // amortizes the decoder, the stats pass should not rebuffer
          // the whole image
          val buf = new Array[Int](w * bd)
          var y = 0
          while (y < h) {
            raster.getPixels(0, y, w, 1, buf)
            var j = 0
            val nb = w * bd
            while (j < nb) { val v = buf(j).toDouble; sum += v; sq += v * v; j += 1 }
            y += 1
          }
          (bd, w.toLong * h * bd)
        }
      Some(DecodedMedia(id, fmt, w, h, bands, 0, w.toLong * h,
        sum / n, math.sqrt(sq / n), b.length.toLong))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** RIFF/WAVE PCM (format tag 1, 8/16-bit): walks the chunk list to
    * `fmt ` and `data`, then folds mean-|amplitude| and RMS over the
    * samples (16-bit LE signed, or 8-bit unsigned biased 128 — the two
    * PCM encodings the WAV spec defines for those widths). Returns None
    * for non-WAV / non-PCM payloads.
    */
  private def decodeWav(id: Long, b: Array[Byte]): Option[DecodedMedia] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var off = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length) {
      val tag = new String(b, off, 4, "US-ASCII")
      val len = i32(b, off + 4)
      // Long arithmetic: a corrupt len near 2^31 would wrap `off+8+len`
      // negative and sail past this guard into an out-of-bounds read
      if (len < 0 || off.toLong + 8L + len > b.length) return None
      tag match {
        case "fmt " =>
          if (len < 16 || u16(b, off + 8) != 1) return None // PCM only
          channels = u16(b, off + 10)
          sampleRate = i32(b, off + 12)
          bits = u16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => // skip LIST/fact/etc.
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (channels <= 0 || sampleRate <= 0 || dataOff < 0 ||
      (bits != 8 && bits != 16)) return None
    val bytesPerSample = bits / 8
    val n = dataLen / bytesPerSample
    var sumAbs = 0.0; var sq = 0.0
    var i = 0
    while (i < n) {
      val v: Double =
        if (bits == 16) u16(b, dataOff + i * 2).toShort.toDouble
        else ((b(dataOff + i) & 0xff) - 128).toDouble
      sumAbs += math.abs(v); sq += v * v; i += 1
    }
    val nn = math.max(1, n)
    Some(DecodedMedia(id, "wav", 0, 0, channels, sampleRate,
      n.toLong / channels, sumAbs / nn, math.sqrt(sq / nn), b.length.toLong))
  }

  /** THE decode entry point — every format a bare JVM can parse: BMP
    * pixel stats and WAV PCM stats from hand-parsed headers, PNG and
    * JPEG via the JDK's javax.imageio codec, no external library —
    * falling back to the deterministic byte-fold ONLY for formats none
    * of the codecs recognize (`format = "opaque"`). Typed Dataset in,
    * per-partition iteration (codec init amortizes per partition),
    * typed Dataset out; payloads never leave the executor.
    */
  def decodeMedia(ds: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        decodeBmp(r.doc_id, b).orElse(decodeImage(r.doc_id, b))
          .orElse(decodeWav(r.doc_id, b)).getOrElse {
          var sum = 0.0; var sq = 0.0
          var i = 0
          while (i < b.length) {
            val v = (b(i) & 0xff).toDouble; sum += v; sq += v * v; i += 1
          }
          val n = math.max(1, b.length)
          DecodedMedia(r.doc_id, "opaque", 0, 0, 0, 0, b.length.toLong,
            sum / n, math.sqrt(sq / n), b.length.toLong)
        }
      }
    }
  }

  // =====================================================================
  // Image perceptual hashing (dHash) — near-dup for the image modality
  // =====================================================================

  /** (doc_id, dhash) output row of [[imageDHash]]. */
  case class ImageHash(doc_id: Long, dhash: Long)

  /** Fixed-point luma (ITU-R BT.601 weights ×1000): 299R + 587G + 114B.
    * Integer, so every grid comparison downstream is exact and
    * engine-replayable — no float rounding can flip a hash bit.
    */
  @inline private def luma1000(r: Int, g: Int, b: Int): Long =
    299L * r + 587L * g + 114L * b

  /** Box-pool an image's luma into a `gw`×`gh` grid (cell (gr,gc) covers
    * rows [gr·h/gh, (gr+1)·h/gh) × cols [gc·w/gw, (gc+1)·w/gw), integer
    * bounds) and emit the difference hash: bit (row · (gw−1) + c) set iff
    * the cell MEAN strictly increases from column c to c+1. Means are
    * compared by cross-multiplication — exact integer arithmetic at
    * ANY size (Long products up to ~2.9M px per cell, BigInt beyond).
    * Returns None when the image is smaller than the grid.
    */
  private def dhashFromLuma(w: Int, h: Int, gw: Int, gh: Int,
      lum: (Int, Int) => Long): Option[Long] = {
    if (w < gw || h < gh) return None
    val sums = Array.ofDim[Long](gh, gw)
    val counts = Array.ofDim[Long](gh, gw)
    var gr = 0
    while (gr < gh) {
      val y0 = gr * h / gh; val y1 = (gr + 1) * h / gh
      var gc = 0
      while (gc < gw) {
        val x0 = gc * w / gw; val x1 = (gc + 1) * w / gw
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lum(x, y); x += 1 }
          y += 1
        }
        sums(gr)(gc) = s
        counts(gr)(gc) = (y1 - y0).toLong * (x1 - x0)
        gc += 1
      }
      gr += 1
    }
    var hash = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        // exact mean comparison by cross-multiplication. Long products
        // are safe while 255000·A² < 2^63, i.e. cell area A ≤ ~2.9M px
        // (≈ 0.2-gigapixel images at the 9×8 grid); above that, exact
        // arithmetic continues in BigInt — 64 comparisons per image is
        // noise next to the decode, and the oracle replay (HUGEINT on
        // the DuckDB side) stays bit-identical at any size.
        val ca = counts(r)(c); val cb = counts(r)(c + 1)
        val gt =
          if (math.max(ca, cb) <= 2900000L)
            sums(r)(c + 1) * ca > sums(r)(c) * cb
          else BigInt(sums(r)(c + 1)) * ca > BigInt(sums(r)(c)) * cb
        if (gt) hash |= 1L << (r * (gw - 1) + c)
        c += 1
      }
      r += 1
    }
    Some(hash)
  }

  /** BMP pixel accessor for the same header shape [[decodeBmp]] accepts
    * (uncompressed 24/32-bpp BITMAPINFOHEADER): (width, height,
    * luma(x, y)) with y counted from the TOP row regardless of the
    * file's bottom-up/top-down storage order. Pixel bytes are BGR.
    */
  private def bmpLumaAccessor(b: Array[Byte]): Option[(Int, Int, (Int, Int) => Long)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = i32(b, 10)
    val width = i32(b, 18)
    val height = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (width <= 0 || height == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val absH = math.abs(height.toLong)
    val bytesPerPx = bpp / 8
    val rowBytesL = ((width.toLong * bytesPerPx + 3) / 4) * 4
    if (dataOff < 0 || dataOff > b.length ||
      absH > (b.length.toLong - dataOff) / rowBytesL) return None
    val rowBytes = rowBytesL.toInt
    val hh = absH.toInt
    val topDown = height < 0
    val lum = (x: Int, y: Int) => {
      val bufRow = if (topDown) y else hh - 1 - y
      val o = dataOff + bufRow * rowBytes + x * bytesPerPx
      luma1000(b(o + 2) & 0xff, b(o + 1) & 0xff, b(o) & 0xff)
    }
    Some((width, hh, lum))
  }

  /** PNG/JPEG pixel accessor via javax.imageio: whole-raster getRGB
    * (sRGB-normalized 0xAARRGGBB — palette PNGs resolve through their
    * color table for free here). Corrupt/unrecognized payloads → None.
    */
  private def imageIoLumaAccessor(b: Array[Byte]): Option[(Int, Int, (Int, Int) => Long)] = {
    if (!hasSig(b, pngSig) && !hasSig(b, jpegSig)) return None
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val lum = (x: Int, y: Int) => {
        val rgb = px(y * w + x)
        luma1000((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      }
      Some((w, h, lum))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 64-bit perceptual difference hash (dHash — Krawetz's public
    * algorithm, the standard cheap image near-dup signature): decode
    * real pixels (BMP hand-parse or PNG/JPEG via javax.imageio) →
    * fixed-point luma → exact integer box-pool to a `gridCols`×`gridRows`
    * grid → one bit per horizontally adjacent cell pair. Defaults
    * (9, 8) give the canonical 64-bit hash. Non-image and
    * smaller-than-grid payloads are SKIPPED (no row), mirroring
    * [[decodeMedia]]'s degrade-don't-fail discipline.
    *
    * Near-identical images (resizes, small edits, recompression) land
    * within a few bits; feed the output to
    * [[Dedup.hammingNearDupPairs]] — the same pigeonhole-band + exact
    * hamming-verify machinery text SimHash uses, so image near-dup is
    * banded equi-joins at 100 TB, never all-pairs. Map-only here: one
    * (id, 8-byte hash) row per image leaves the executor.
    */
  def imageDHash(ds: Dataset[MediaRow], gridCols: Int = 9,
      gridRows: Int = 8): Dataset[ImageHash] = {
    require(gridCols >= 2 && gridRows >= 1, "grid must be at least 2x1")
    // hash bits are gridRows x (gridCols-1) packed into one Long; a
    // larger grid would wrap `1L << k` (mod-64 shift) and silently OR
    // distinct cells into the same bit
    require(gridRows * (gridCols - 1) <= 64,
      s"gridRows*(gridCols-1) = ${gridRows * (gridCols - 1)} exceeds the 64-bit hash")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        bmpLumaAccessor(r.payload).orElse(imageIoLumaAccessor(r.payload))
          .flatMap { case (w, h, lum) =>
            dhashFromLuma(w, h, gridCols, gridRows, lum)
          }.map(ImageHash(r.doc_id, _))
      }
    }
  }

  /** Deterministic 24-bpp grayscale BMP fixture from text bytes: pixel
    * (row r, col c) = byte of `textCol` at index (r·width + c) mod
    * length. A REAL file through the REAL decoder — yet pixel arithmetic
    * any engine can replay, which is what makes q_image_dhash /
    * q_image_neardup oracle-checkable (the DuckDB side recomputes the
    * same bytes from the text, no BMP parser needed). Empty texts are
    * dropped. Rows: (doc_id, payload, media_type, width, n_frames) —
    * the [[MediaRow]] shape.
    */
  def asBmpMedia(df: DataFrame, idCol: String, textCol: String,
      width: Int = 9, height: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .filter(length(col(textCol)) > 0)
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val tb = text.getBytes("UTF-8")
          val bmp = buildGrayBmp(width, height,
            (r, c) => tb((r * width + c) % tb.length) & 0xff)
          (id, bmp, "image/bmp", width, 1)
        }
      }
      .toDF("doc_id", "payload", "media_type", "width", "n_frames")
  }

  /** Assemble a real bottom-up 24-bpp BITMAPINFOHEADER BMP; `v(r, c)` is
    * the gray value with r counted from the TOP row (the builder handles
    * the bottom-up storage flip).
    */
  def buildGrayBmp(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"BMP dims must be positive: ${w}x$h")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def put16(o: Int, x: Int): Unit = {
      b(o) = (x & 0xff).toByte; b(o + 1) = ((x >> 8) & 0xff).toByte
    }
    def put32(o: Int, x: Int): Unit = {
      b(o) = (x & 0xff).toByte; b(o + 1) = ((x >> 8) & 0xff).toByte
      b(o + 2) = ((x >> 16) & 0xff).toByte; b(o + 3) = ((x >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    put32(2, size); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h) // positive height = bottom-up storage
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, rowBytes * h)
    var r = 0
    while (r < h) {
      val base = 54 + (h - 1 - r) * rowBytes
      var c = 0
      while (c < w) {
        val g = (v(r, c) & 0xff).toByte
        val o = base + c * 3
        b(o) = g; b(o + 1) = g; b(o + 2) = g
        c += 1
      }
      r += 1
    }
    b
  }
}
