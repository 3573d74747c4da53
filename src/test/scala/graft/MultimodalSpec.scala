package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal binary-column plumbing: schema, encoder boundary,
  * partition-batch decode + fingerprint paths, and the HLL error bound.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("asMedia produces binary payload + typed metadata") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.asMedia(df, "doc_id", "text")
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("media_type") == "string" && schema("width") == "int")
    val r = m.head()
    assert(r.getAs[Array[Byte]]("payload").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(r.getAs[Int]("width") == 11)
  }

  test("byteFingerprint computes deterministic byte statistics") {
    val payload = "abcdef".getBytes("UTF-8")
    val ds = Seq(MediaRow(7L, payload, "text/plain", 6, 1)).toDS()
    val f = Multimodal.byteFingerprint(ds, frameStride = 2).collect().head
    assert(f.n_bytes == 6)
    assert(f.byte_sum == "abcdef".map(_.toLong).sum)
    assert(f.head_hex == payload.map("%02x".format(_)).mkString)
    assert(f.frame_sum == 'a'.toLong + 'c'.toLong + 'e'.toLong) // stride 2: positions 0,2,4
    assert(f.n_sampled == 3)
  }

  test("byteFingerprint survives empty and binary-unsafe payloads") {
    val ds = Seq(
      MediaRow(1L, Array.emptyByteArray, "text/plain", 0, 1),
      MediaRow(2L, Array[Byte](-1, 0, 127, -128), "application/octet-stream", 4, 1)).toDS()
    val out = Multimodal.byteFingerprint(ds, 16).collect().sortBy(_.doc_id)
    assert(out(0).n_bytes == 0 && out(0).byte_sum == 0 && out(0).n_sampled == 0)
    assert(out(1).byte_sum == 255 + 0 + 127 + 128) // unsigned fold
  }

  test("byteFingerprint runs partition-parallel with stable results") {
    val rows = (1L to 500L).map(i => MediaRow(i, s"payload-$i".getBytes, "t", 1, 1))
    val a = Multimodal.byteFingerprint(rows.toDS().repartition(8)).collect().sortBy(_.doc_id)
    val b = Multimodal.byteFingerprint(rows.toDS().repartition(3)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  /** Hand-assemble a 24-bpp BITMAPINFOHEADER BMP: 2×2 pixels with known
    * channel bytes, rows padded to 4 bytes (2 px × 3 B = 6 B → pad 2).
    */
  private def tinyBmp(pixels: Seq[Int]): Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val rowBytes = 8 // 2 px * 3 B, padded to 4-byte boundary
    val dataLen = rowBytes * 2
    val header =
      "BM".getBytes ++ le32(54 + dataLen) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++     // DIB: 2x2, 24bpp
      le32(0) ++ le32(dataLen) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val px = pixels.map(_.toByte).toArray
    // two rows of 6 pixel bytes + 2 pad bytes each
    header ++ px.slice(0, 6) ++ Array[Byte](0, 0) ++ px.slice(6, 12) ++ Array[Byte](0, 0)
  }

  /** Hand-assemble a 16-bit mono PCM WAV with the given samples. */
  private def tinyWav(samples: Seq[Int], rate: Int = 8000): Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val data = samples.flatMap(s => le16(s & 0xffff)).toArray
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++
      le32(rate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  test("decodeMedia parses a real BMP: dimensions + exact pixel mean/rms") {
    // channel bytes 10,20,30 / 40,50,60 / 70,80,90 / 100,110,120
    val pixels = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val ds = Seq(Multimodal.MediaRow(1L, tinyBmp(pixels), "image/bmp", 2, 1)).toDS()
    val d = Multimodal.decodeMedia(ds).collect().head
    assert(d.format == "bmp")
    assert(d.width == 2 && d.height == 2 && d.channels == 3 && d.n_samples == 4)
    val mean = pixels.sum.toDouble / 12
    val rms = math.sqrt(pixels.map(v => v.toDouble * v).sum / 12)
    assert(math.abs(d.mean_value - mean) < 1e-12, s"mean=${d.mean_value} want $mean")
    assert(math.abs(d.rms - rms) < 1e-12)
    // padding bytes (nonzero would shift the stats) are excluded: a BMP
    // with garbage pad bytes must decode identically
    val padded = tinyBmp(pixels)
    padded(54 + 6) = 99.toByte // first row's pad byte
    val d2 = Multimodal.decodeMedia(
      Seq(Multimodal.MediaRow(2L, padded, "image/bmp", 2, 1)).toDS()).collect().head
    assert(math.abs(d2.mean_value - mean) < 1e-12)
  }

  /** Hand-assemble an 8-bit RGB PNG (2×2) from the spec primitives the
    * JDK exposes — Deflater for IDAT, CRC32 per chunk — so the test is
    * INDEPENDENT of the javax.imageio codec under test (an
    * ImageIO.write round-trip would verify the codec against itself).
    * Scanlines use filter type 0 (None).
    */
  private def tinyPng(pixels: Seq[Int]): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val body = tag.getBytes("US-ASCII") ++ data
      crc.update(body)
      be32(data.length) ++ body ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0) // 2x2, 8-bit, RGB
    val raw = (Array[Byte](0) ++ pixels.slice(0, 6).map(_.toByte)) ++
      (Array[Byte](0) ++ pixels.slice(6, 12).map(_.toByte)) // filter 0 per row
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val n = deflater.deflate(buf)
    deflater.end()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("decodeMedia parses a hand-assembled PNG: dimensions + exact pixel mean/rms") {
    val pixels = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val ds = Seq(Multimodal.MediaRow(9L, tinyPng(pixels), "image/png", 2, 1)).toDS()
    val d = Multimodal.decodeMedia(ds).collect().head
    assert(d.format == "png")
    assert(d.width == 2 && d.height == 2 && d.channels == 3 && d.n_samples == 4)
    val mean = pixels.sum.toDouble / 12
    val rms = math.sqrt(pixels.map(v => v.toDouble * v).sum / 12)
    assert(math.abs(d.mean_value - mean) < 1e-12, s"mean=${d.mean_value} want $mean")
    assert(math.abs(d.rms - rms) < 1e-12)
  }

  /** Hand-assemble an indexed-color (palette, color type 3) PNG: 2×2,
    * 8-bit indices into a 2-entry PLTE. Indices are NOT pixel values —
    * the decoder must resolve through the palette.
    */
  private def tinyPalettePng(palette: Seq[(Int, Int, Int)], indices: Seq[Int]): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val body = tag.getBytes("US-ASCII") ++ data
      crc.update(body)
      be32(data.length) ++ body ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 3, 0, 0, 0) // 2x2, 8-bit, palette
    val plte = palette.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val raw = (Array[Byte](0) ++ indices.slice(0, 2).map(_.toByte)) ++
      (Array[Byte](0) ++ indices.slice(2, 4).map(_.toByte))
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val n = deflater.deflate(buf)
    deflater.end()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("PLTE", plte) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  test("palette PNG resolves through the color table — stats over RGB, not indices") {
    // all-white image stored as palette index 1 (entry 0 is black):
    // index stats would read mean 1.0; RGB stats must read 255.0
    val png = tinyPalettePng(Seq((0, 0, 0), (255, 255, 255)), Seq(1, 1, 1, 1))
    val ds = Seq(Multimodal.MediaRow(11L, png, "image/png", 2, 1)).toDS()
    val d = Multimodal.decodeMedia(ds).collect().head
    assert(d.format == "png" && d.width == 2 && d.height == 2)
    assert(d.channels == 3)
    assert(math.abs(d.mean_value - 255.0) < 1e-12, s"mean=${d.mean_value}")
    assert(math.abs(d.rms - 255.0) < 1e-12)
  }

  test("corrupt PNG (signature + IHDR only, no image data) degrades to opaque, never crashes") {
    // Mid-IDAT truncation is NOT a reliable corrupt case — the JDK's
    // PNG reader tolerates it when every scanline already decoded. A
    // file with no IDAT at all cannot yield pixels from any reader.
    val whole = tinyPng(Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
    val truncated = whole.take(8 + 12 + 13) // signature + IHDR chunk only
    val ds = Seq(Multimodal.MediaRow(10L, truncated, "image/png", 2, 1)).toDS()
    val d = Multimodal.decodeMedia(ds).collect().head
    assert(d.format == "opaque") // signature matched, decode failed, fell back
    assert(d.n_bytes == truncated.length)
  }

  test("decodeMedia parses a JPEG: dimensions/channels + near-exact solid-color stats") {
    // JPEG is lossy, so the fixture is a SOLID color: a constant block
    // encodes as DC-only and survives quantization (near-)exactly. The
    // encoder is javax.imageio's JPEG WRITER — a different codec path
    // from the reader under test, and the assertion is against the
    // known color, not a reader round-trip.
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(128, 128, 128))
    g.fillRect(0, 0, 4, 3); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val bytes = bos.toByteArray
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) // is a JPEG
    val d = Multimodal.decodeMedia(
      Seq(Multimodal.MediaRow(12L, bytes, "image/jpeg", 4, 1)).toDS()).collect().head
    assert(d.format == "jpeg")
    assert(d.width == 4 && d.height == 3 && d.channels == 3 && d.n_samples == 12)
    assert(math.abs(d.mean_value - 128.0) <= 2.0, s"mean=${d.mean_value}")
    assert(math.abs(d.rms - 128.0) <= 2.0)
  }

  test("corrupt JPEG (signature + garbage) degrades to opaque, never crashes") {
    val evil = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.fill[Byte](64)(0x55)
    val d = Multimodal.decodeMedia(
      Seq(Multimodal.MediaRow(13L, evil, "image/jpeg", 0, 1)).toDS()).collect().head
    assert(d.format == "opaque" && d.n_bytes == evil.length)
  }

  test("decodeMedia parses a real WAV: rate/channels + exact PCM stats") {
    val samples = Seq(0, 1000, -1000, 500, -250, 32767, -32768, 0)
    val ds = Seq(Multimodal.MediaRow(3L, tinyWav(samples), "audio/wav", 0, 1)).toDS()
    val d = Multimodal.decodeMedia(ds).collect().head
    assert(d.format == "wav")
    assert(d.channels == 1 && d.sample_rate == 8000 && d.n_samples == samples.size)
    val meanAbs = samples.map(s => math.abs(s.toDouble)).sum / samples.size
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / samples.size)
    assert(math.abs(d.mean_value - meanAbs) < 1e-9, s"mean=${d.mean_value} want $meanAbs")
    assert(math.abs(d.rms - rms) < 1e-9)
  }

  test("decodeMedia falls back to byte-fold for unknown payloads") {
    val b = "not an image".getBytes("UTF-8")
    val truncatedBmp = "BM".getBytes ++ Array.fill[Byte](10)(0) // too short to parse
    val ds = Seq(
      Multimodal.MediaRow(1L, b, "text/plain", 0, 1),
      Multimodal.MediaRow(2L, truncatedBmp, "image/bmp", 0, 1)).toDS()
    val out = Multimodal.decodeMedia(ds).collect().sortBy(_.doc_id)
    assert(out.forall(_.format == "opaque"))
    assert(out(0).n_bytes == b.length)
    val mean = b.map(x => (x & 0xff).toDouble).sum / b.length
    assert(math.abs(out(0).mean_value - mean) < 1e-12)
  }

  test("corrupt headers with near-2^31 size fields degrade to opaque, never crash") {
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // WAV whose first chunk claims len 0x7FFFFFF0: off+8+len wraps in Int
    val evilWav = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(0x7FFFFFF0) ++ Array.fill[Byte](40)(1)
    // BMP whose width*3 ≈ 2^31: rowBytes wraps negative in Int math
    val evilBmp = new Array[Byte](128)
    evilBmp(0) = 'B'; evilBmp(1) = 'M'
    System.arraycopy(le32(54), 0, evilBmp, 10, 4)          // dataOff
    System.arraycopy(le32(715827882), 0, evilBmp, 18, 4)   // width
    System.arraycopy(le32(1), 0, evilBmp, 22, 4)           // height
    evilBmp(28) = 24                                       // bpp
    val ds = Seq(
      Multimodal.MediaRow(1L, evilWav, "audio/wav", 0, 1),
      Multimodal.MediaRow(2L, evilBmp, "image/bmp", 0, 1)).toDS()
    val out = Multimodal.decodeMedia(ds).collect().sortBy(_.doc_id)
    assert(out.length == 2 && out.forall(_.format == "opaque"))
  }

  test("BMP whose rowBytes×height product overflows Long degrades to opaque") {
    def le32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // width=2^30 at 32 bpp → rowBytes = 2^32; height=Int.MinValue →
    // |height| = 2^31; the product is exactly 2^63, which wraps negative
    // in Long and would pass a product-form bounds check — the division
    // guard must reject it (and the row loop must not spin on a wrapped
    // Int counter)
    val evil = new Array[Byte](256)
    evil(0) = 'B'; evil(1) = 'M'
    System.arraycopy(le32(54), 0, evil, 10, 4)            // dataOff
    System.arraycopy(le32(1 << 30), 0, evil, 18, 4)       // width = 2^30
    System.arraycopy(le32(Int.MinValue), 0, evil, 22, 4)  // height = -2^31
    evil(28) = 32                                         // bpp
    val out = Multimodal.decodeMedia(
      Seq(Multimodal.MediaRow(1L, evil, "image/bmp", 0, 1)).toDS()).collect()
    assert(out.length == 1 && out.head.format == "opaque")
  }

  test("approx_count_distinct stays within the configured error of exact") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val both = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"exact=$exact approx=$approx")
  }

  // ===================================================================
  // Image perceptual near-dup (dHash) — VERDICT r16 #5
  // ===================================================================

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.map { case (id, b) => MediaRow(id, b, "image/bmp", 0, 1) }.toDS()
  }

  private def dhashOf(b: Array[Byte]): Long = {
    import spark.implicits._
    Multimodal.imageDHash(mediaDf(Seq((0L, b)))).collect().head.dhash
  }

  test("imageDHash: near-identical images land within hamming 3; distinct far apart") {
    import spark.implicits._
    // a 36x32 smooth gradient; a copy with a small local edit; a
    // structurally different image (inverted gradient)
    val base = Multimodal.buildGrayBmp(36, 32, (r, c) => (r * 4 + c * 3) % 256)
    val edited = Multimodal.buildGrayBmp(36, 32, (r, c) =>
      if (r < 2 && c < 2) 255 else (r * 4 + c * 3) % 256)
    val inverted = Multimodal.buildGrayBmp(36, 32, (r, c) => 255 - ((r * 4 + c * 3) % 256))
    val sigs = Multimodal.imageDHash(mediaDf(Seq(
        (1L, base), (2L, edited), (3L, inverted), (4L, base))))
      .collect().map(s => s.doc_id -> s.dhash).toMap
    assert(sigs.size == 4)
    assert(sigs(1L) == sigs(4L), "identical bytes must hash identically")
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 3,
      s"small edit must stay within hamming 3, got ${java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))}")
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 20,
      "inverted gradient must be far in hamming space")
    // recall through the banded pair machinery: the near pair IS found
    val pairs = graft.operators.Dedup.hammingNearDupPairs(
        Multimodal.imageDHash(mediaDf(Seq(
          (1L, base), (2L, edited), (3L, inverted), (4L, base)))).toDF(),
        "doc_id", "dhash", bits = 64, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) &&
      pairs.contains((2L, 4L)), s"near pairs expected, got $pairs")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      s"distant image must not pair: $pairs")
  }

  test("imageDHash: nearest-neighbor upscale is hash-invariant (box pooling)") {
    // each 9x8 pixel becomes a constant 4x4 block: every grid cell mean
    // equals the original pixel, so the dHash must be IDENTICAL
    val small = Multimodal.buildGrayBmp(9, 8, (r, c) => (r * 31 + c * 17) % 256)
    val big = Multimodal.buildGrayBmp(36, 32, (r, c) => ((r / 4) * 31 + (c / 4) * 17) % 256)
    assert(dhashOf(small) == dhashOf(big))
  }

  test("imageDHash: PNG path agrees with BMP path on identical RGB pixels") {
    // COLOR image (not gray): catches BGR-vs-RGB channel-order bugs —
    // luma weights 299/587/114 differ per channel
    def rgb(r: Int, c: Int): Int = ((r * 7) % 256 << 16) | ((c * 11) % 256 << 8) | ((r + c) % 256)
    val w = 18; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(y, x))
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // BMP with the same pixels: buildGrayBmp is gray-only, so assemble
    // the color BMP inline (BGR byte order, bottom-up)
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val bmp = new Array[Byte](54 + rowBytes * h)
    val gray = Multimodal.buildGrayBmp(w, h, (_, _) => 0) // header template
    System.arraycopy(gray, 0, bmp, 0, 54)
    for (y <- 0 until h; x <- 0 until w) {
      val v = rgb(y, x)
      val o = 54 + (h - 1 - y) * rowBytes + x * 3
      bmp(o) = (v & 0xff).toByte            // B
      bmp(o + 1) = ((v >> 8) & 0xff).toByte // G
      bmp(o + 2) = ((v >> 16) & 0xff).toByte // R
    }
    assert(dhashOf(png) == dhashOf(bmp),
      "PNG and BMP decode paths must produce the same dHash for the same pixels")
  }

  test("imageDHash: non-image and smaller-than-grid payloads are skipped") {
    import spark.implicits._
    val tiny = Multimodal.buildGrayBmp(4, 4, (r, c) => r + c) // < 9x8 grid
    val out = Multimodal.imageDHash(mediaDf(Seq(
        (1L, "not an image".getBytes("UTF-8")),
        (2L, tiny),
        (3L, Multimodal.buildGrayBmp(9, 8, (r, c) => r * 9 + c)))))
      .collect()
    assert(out.map(_.doc_id).toSeq == Seq(3L))
  }
}
