package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal
import graft.functions.Multimodal._

/** The multimodal pipeline's Spark plumbing: typed schema, partition-
  * local decode, flatMap frame expansion, deterministic stub values.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extractFeatures: schema, determinism, null-free output") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, "image", "hello world".getBytes),
      MediaBlob(2L, "audio", Array[Byte]()),
      MediaBlob(3L, "video", (0 until 1000).map(_.toByte).toArray)).toDS()
    val feats = Multimodal.extractFeatures(blobs).collect().sortBy(_.docId)
    assert(feats.map(_.docId).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).nBytes == 11)
    // stub decode is deterministic: same bytes → same dims
    val again = Multimodal.extractFeatures(blobs).collect().sortBy(_.docId)
    assert(feats.map(f => (f.width, f.height, f.meanLuma)).toSeq ==
      again.map(f => (f.width, f.height, f.meanLuma)).toSeq)
    // empty blob handled
    assert(feats(1).nBytes == 0 && feats(1).byteEntropy == 0.0)
    // 1000 distinct bytes → high entropy
    assert(feats(2).byteEntropy > 7.5)
  }

  test("sampleFrames: exact expansion factor and stable hashes") {
    import spark.implicits._
    val blobs = Seq(MediaBlob(7L, "video", (0 until 100).map(_.toByte).toArray)).toDS()
    val frames = Multimodal.sampleFrames(blobs, 4).collect().sortBy(_.frameIdx)
    assert(frames.length == 4)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 1, 2, 3))
    assert(frames.map(_.frameHash).distinct.length == 4)
  }

  test("resize keeps length, tags header deterministically") {
    import spark.implicits._
    val blobs = Seq(MediaBlob(1L, "image", "abcdef".getBytes)).toDS()
    val out = Multimodal.resize(blobs, 128, 96).collect()(0)
    assert(out.bytes.length == 6)
    assert(out.bytes(0) == (128 % 251).toByte && out.bytes(1) == (96 % 251).toByte)
  }

  test("pipeline over documents table end-to-end") {
    val profile = SparkEntry.queries("mm_feature_profile")(
      spark, "/root/testdata/sf0.001")
    val rows = profile.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum == 500)
  }

  /** Hand-build an uncompressed 24bpp BMP (BITMAPINFOHEADER). */
  private def bmp24(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
      .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // rows bottom-up, BGR, 4-byte padded
    for (y <- height - 1 to 0 by -1) {
      var written = 0
      for (x <- 0 until width) {
        val (r, g, b) = px(x, y)
        bb.put(b.toByte).put(g.toByte).put(r.toByte)
        written += 3
      }
      while (written < rowBytes) { bb.put(0.toByte); written += 1 }
    }
    bb.array()
  }

  test("BMP decodes for real: true dimensions and luma, stub untouched") {
    import graft.functions.Multimodal.MediaCodec
    // 3x2 all-white: luma exactly 1.0
    val white = bmp24(3, 2, (_, _) => (255, 255, 255))
    assert(MediaCodec.decodeBmp(white).contains((3, 2, 1.0)))
    // pure red: luma = 0.299 exactly (Rec.601 weights over 255)
    val red = bmp24(5, 4, (_, _) => (255, 0, 0))
    val (w, h, luma) = MediaCodec.decode(red)
    assert(w == 5 && h == 4 && math.abs(luma - 0.299) < 1e-9)
    // odd width exercises row padding; decode must skip pad bytes
    val (w2, h2, luma2) = MediaCodec.decode(bmp24(3, 1, (_, _) => (0, 255, 0)))
    assert(w2 == 3 && h2 == 1 && math.abs(luma2 - 0.587) < 1e-9)
    // non-BMP bytes fall back to the stub, not an error
    val textBytes = "BMnot really a bitmap, just text".getBytes
    assert(MediaCodec.decodeBmp(textBytes).isEmpty)
    assert(MediaCodec.decode(textBytes) == MediaCodec.decodeStub(textBytes))
    // adversarial header: width chosen so width*3 overflows Int — must
    // reject (stub fallback), not index out of bounds
    val evil = bmp24(3, 1, (_, _) => (0, 0, 0))
    val ev = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ev.putInt(18, 0x2AAAAAAB) // width
    assert(MediaCodec.decodeBmp(evil).isEmpty)
    assert(MediaCodec.decode(evil) == MediaCodec.decodeStub(evil))
    // 8bpp is palette-indexed: a red palette entry must yield red luma,
    // not the raw index byte
    val pal8 = {
      val w = 2; val h = 1
      val rowBytes = (w + 3) & ~3
      val bb = java.nio.ByteBuffer.allocate(54 + 4 * 256 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(bb.capacity())
        .putInt(0).putInt(54 + 4 * 256)
        .putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(8).putInt(0).putInt(rowBytes * h)
        .putInt(2835).putInt(2835).putInt(256).putInt(0)
      // palette: entry 0 = pure red (BGRA), entry 1 = white, rest black
      bb.put(0.toByte).put(0.toByte).put(255.toByte).put(0.toByte)
      bb.put(255.toByte).put(255.toByte).put(255.toByte).put(0.toByte)
      (2 until 256).foreach(_ => bb.putInt(0))
      bb.put(0.toByte).put(1.toByte) // pixels: red, white
      while (bb.position() < bb.capacity()) bb.put(0.toByte)
      bb.array()
    }
    val Some((pw, ph, pluma)) = MediaCodec.decodeBmp(pal8): @unchecked
    assert(pw == 2 && ph == 1)
    assert(math.abs(pluma - (0.299 + 1.0) / 2) < 1e-9, s"got $pluma")
    // end-to-end: extractFeatures surfaces the real dimensions
    import graft.functions.Multimodal
    import graft.functions.Multimodal.MediaBlob
    import spark.implicits._
    val ds = Seq(MediaBlob(42L, "image", white)).toDS()
    val f = Multimodal.extractFeatures(ds).collect()(0)
    assert(f.width == 3 && f.height == 2 && math.abs(f.meanLuma - 1.0) < 1e-9)
  }

  /** Minimal PCM WAV: 44-byte canonical header + silence. */
  private def wav(sampleRate: Int, channels: Int, bits: Int,
      nSampleFrames: Int, extraChunkFirst: Boolean = false): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSampleFrames * blockAlign
    val extra = if (extraChunkFirst) 8 + 4 else 0 // a LIST chunk before fmt
    val bb = java.nio.ByteBuffer.allocate(44 + extra + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + extra + dataSize).put("WAVE".getBytes)
    if (extraChunkFirst) bb.put("LIST".getBytes).putInt(4).putInt(0)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes).putInt(dataSize)
    bb.array() // remaining bytes are zero = silence
  }

  test("WAV decodes for real: sample rate, channels, duration") {
    import graft.functions.Multimodal
    import graft.functions.Multimodal.{MediaBlob, MediaCodec, WavMeta}
    // 16 kHz mono 16-bit, 8000 frames = exactly 500 ms
    val a = wav(16000, 1, 16, 8000)
    assert(MediaCodec.decodeWav(a).contains(WavMeta(16000, 1, 16, 500L)))
    // 44.1 kHz stereo with a LIST chunk before fmt: chunk walk, 1s
    val b = wav(44100, 2, 16, 44100, extraChunkFirst = true)
    assert(MediaCodec.decodeWav(b).contains(WavMeta(44100, 2, 16, 1000L)))
    // truncated object: duration reflects the bytes present, not the
    // header's promise
    val t = java.util.Arrays.copyOf(a, 44 + 8000) // half the data
    assert(MediaCodec.decodeWav(t).contains(WavMeta(16000, 1, 16, 250L)))
    // non-PCM (format tag 3 = IEEE float) falls to the stub
    val f = wav(8000, 1, 32, 10)
    java.nio.ByteBuffer.wrap(f).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3.toShort)
    assert(MediaCodec.decodeWav(f).isEmpty)
    // plain text is not RIFF
    assert(MediaCodec.decodeWav("RIFFnot a wave".getBytes).isEmpty)
    // end-to-end: extractFeatures surfaces the audio family for WAV
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Seq(MediaBlob(7L, "audio", a)).toDS()).collect()(0)
    assert(feats.sampleRateHz == 16000 && feats.durationMs == 500L)
    assert(feats.width == 0 && feats.height == 0)
    // non-WAV audio rows keep the labeled stub behavior
    val stubFeats = Multimodal.extractFeatures(
      Seq(MediaBlob(8L, "audio", "just text".getBytes)).toDS()).collect()(0)
    assert(stubFeats.sampleRateHz == 0 && stubFeats.width >= 64)
  }
}
