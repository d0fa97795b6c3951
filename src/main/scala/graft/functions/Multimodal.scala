package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * operators over typed Datasets (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one JVM-side iterator per partition, batch
  * reuse, columnar in/out at the boundary).
  *
  * Decoding: uncompressed BMP ([[MediaCodec.decodeBmp]]) and PCM WAV
  * ([[MediaCodec.decodeWav]]) parse for REAL — both pure-JDK, public
  * specs; every other format falls back to the DETERMINISTIC STUB
  * [[MediaCodec.decodeStub]], since this container ships no image/audio
  * codecs. The Spark-side contract (schema, partitioning, operator
  * signature, batch shape, null handling) is real and tested; widening
  * the codec set further is confined to [[MediaCodec]].
  */
object Multimodal {

  /** One media object: id + declared type + raw bytes + source hint. */
  final case class MediaBlob(docId: Long, mediaType: String,
      bytes: Array[Byte])

  /** Extracted per-object features (fixed-width, columnar-friendly).
    * Image-shaped payloads fill width/height/meanLuma; audio-shaped
    * (WAV) fill sampleRateHz/durationMs — the unused family is zero. */
  final case class MediaFeatures(docId: Long, mediaType: String,
      nBytes: Long, width: Int, height: Int, meanLuma: Double,
      byteEntropy: Double, sampleRateHz: Int = 0, durationMs: Long = 0L)

  /** Parsed WAV header: the real audio metadata a pipeline filters on. */
  final case class WavMeta(sampleRateHz: Int, channels: Int,
      bitsPerSample: Int, durationMs: Long)

  /** One sampled frame of a "video" blob. */
  final case class MediaFrame(docId: Long, frameIdx: Int, nBytes: Long,
      frameHash: Long)

  object MediaCodec {

    /** REAL decode for one container format: uncompressed BMP
      * (BITMAPINFOHEADER, 8/24/32 bpp — public spec, pure JDK). Returns
      * (width, height, meanLuma) or None when the bytes are not a BMP
      * this parser accepts; callers fall back to [[decodeStub]] for
      * every other format (no codecs ship in this container).
      */
    def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataOffset = bb.getInt(10)
      val headerSize = bb.getInt(14)
      if (headerSize != 40) return None // BITMAPINFOHEADER only
      val width = bb.getInt(18)
      val height0 = bb.getInt(22) // negative = top-down; |h| rows either way
      val bpp = bb.getShort(28).toInt
      val compression = bb.getInt(30)
      val height = math.abs(height0.toLong)
      // dimension sanity bound ALSO prevents Int overflow in the row
      // arithmetic below — a corrupt header must fall to the stub, not
      // index out of bounds (the byte budget caps real files anyway:
      // bytes.length bounds width*height*bpp/8)
      if (width <= 0 || width > (1 << 24) || height == 0 ||
        height > (1 << 24) || compression != 0) return None
      if (bpp != 8 && bpp != 24 && bpp != 32) return None
      // 8bpp is palette-indexed: entries are BGRA quads between the
      // header and the pixel data; an index byte is NOT a gray value
      val palette: Array[Double] =
        if (bpp != 8) null
        else {
          val used = bb.getInt(46)
          val n = if (used > 0 && used <= 256) used else 256
          if (54 + 4L * n > bytes.length) return None
          Array.tabulate(n) { i =>
            val o = 54 + 4 * i
            val b = java.lang.Byte.toUnsignedInt(bytes(o))
            val g = java.lang.Byte.toUnsignedInt(bytes(o + 1))
            val r = java.lang.Byte.toUnsignedInt(bytes(o + 2))
            0.299 * r + 0.587 * g + 0.114 * b
          }
        }
      val rowBytes = (width.toLong * (bpp / 8) + 3) & ~3L // rows pad to 4
      val need = dataOffset.toLong + rowBytes * height
      if (dataOffset < 54 || need > bytes.length) return None
      var lumaSum = 0.0
      var y = 0L
      while (y < height) {
        val row = dataOffset + y * rowBytes
        var x = 0
        while (x < width) {
          val p = (row + x.toLong * (bpp / 8)).toInt
          val luma =
            if (bpp == 8) {
              val idx = java.lang.Byte.toUnsignedInt(bytes(p))
              if (idx >= palette.length) return None // index past palette
              palette(idx)
            } else { // little-endian BGR(A)
              val b = java.lang.Byte.toUnsignedInt(bytes(p))
              val g = java.lang.Byte.toUnsignedInt(bytes(p + 1))
              val r = java.lang.Byte.toUnsignedInt(bytes(p + 2))
              0.299 * r + 0.587 * g + 0.114 * b
            }
          lumaSum += luma
          x += 1
        }
        y += 1
      }
      Some((width, height.toInt, lumaSum / (width.toLong * height) / 255.0))
    }

    /** REAL decode for PCM WAV (RIFF — public spec, pure JDK like BMP):
      * walks the chunk list for `fmt ` + `data`, returns sample rate,
      * channel count, bit depth, and duration, or None when the bytes
      * are not a PCM WAV this parser accepts (callers fall back to the
      * stub). Duration comes from the data chunk size clamped to the
      * bytes actually present, so a truncated object reports the audio
      * it holds, not what its header promises.
      */
    def decodeWav(bytes: Array[Byte]): Option[WavMeta] = {
      if (bytes.length < 44) return None
      def tag(o: Int, s: String): Boolean =
        s.indices.forall(i => bytes(o + i) == s.charAt(i).toByte)
      if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // offset tracked as Long: a crafted 32-bit chunk size must not
      // wrap the Int arithmetic into a negative index (hostile headers
      // fall to the stub, they never throw)
      var off = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, byteRate, bits
      var dataBytes = -1L
      while (off + 8 <= bytes.length && (fmt.isEmpty || dataBytes < 0)) {
        val o = off.toInt
        val size = bb.getInt(o + 4).toLong & 0xFFFFFFFFL
        if (tag(o, "fmt ")) {
          if (off + 24 > bytes.length || size < 16) return None
          val audioFormat = bb.getShort(o + 8).toInt
          val channels = bb.getShort(o + 10).toInt
          val rate = bb.getInt(o + 12)
          val byteRate = bb.getInt(o + 16)
          val bits = bb.getShort(o + 22).toInt
          // PCM only; a hostile/corrupt header falls to the stub rather
          // than dividing by zero below
          if (audioFormat != 1 || channels <= 0 || rate <= 0 ||
            byteRate <= 0 || bits <= 0) return None
          fmt = Some((channels, rate, byteRate, bits))
        } else if (tag(o, "data")) {
          dataBytes = math.min(size, bytes.length - off - 8)
        }
        off += 8L + size + (size % 2) // chunks pad to even
      }
      fmt.collect { case (ch, rate, byteRate, bits) if dataBytes >= 0 =>
        WavMeta(rate, ch, bits, dataBytes * 1000L / byteRate)
      }
    }

    /** BMP parses for real; everything else falls to the stub. */
    def decode(bytes: Array[Byte]): (Int, Int, Double) =
      decodeBmp(bytes).getOrElse(decodeStub(bytes))

    /** STUB decode: a real implementation would parse the container
      * format (JPEG/PNG/WAV/...) here. The stub derives deterministic
      * pseudo-dimensions and luma from the byte stream so tests are
      * stable and the downstream pipeline shape is exercised honestly.
      */
    def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
      val n = bytes.length
      val w = 64 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(bytes(0)) % 192)
      val h = 64 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(bytes(1)) % 128)
      var sum = 0L
      var i = 0
      while (i < n) { sum += java.lang.Byte.toUnsignedInt(bytes(i)); i += 1 }
      val meanLuma = if (n == 0) 0.0 else sum.toDouble / n / 255.0
      (w, h, meanLuma)
    }

    /** Shannon entropy of the byte histogram — real, not stubbed. */
    def byteEntropy(bytes: Array[Byte]): Double = {
      if (bytes.isEmpty) return 0.0
      val hist = new Array[Long](256)
      bytes.foreach(b => hist(java.lang.Byte.toUnsignedInt(b)) += 1)
      val n = bytes.length.toDouble
      var e = 0.0
      var i = 0
      while (i < 256) {
        if (hist(i) > 0) { val p = hist(i) / n; e -= p * math.log(p) / math.log(2) }
        i += 1
      }
      e
    }
  }

  implicit val blobEnc: Encoder[MediaBlob] = Encoders.product[MediaBlob]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[MediaFrame] = Encoders.product[MediaFrame]

  /** Feature extraction: one pass per partition, no shuffle. At 100 TB
    * the blobs column is the dominant IO; this stage is map-only and
    * runs at scan parallelism.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] =
    blobs.mapPartitions { it =>
      it.map { b =>
        MediaCodec.decodeWav(b.bytes) match {
          case Some(a) => // real audio metadata; the image family is 0
            MediaFeatures(b.docId, b.mediaType, b.bytes.length.toLong,
              0, 0, 0.0, MediaCodec.byteEntropy(b.bytes),
              a.sampleRateHz, a.durationMs)
          case None =>
            val (w, h, luma) = MediaCodec.decode(b.bytes)
            MediaFeatures(b.docId, b.mediaType, b.bytes.length.toLong, w, h,
              luma, MediaCodec.byteEntropy(b.bytes))
        }
      }
    }

  /** Frame sampling: flatMap one blob → `framesPer` frame rows
    * (deterministic stride over the byte stream stands in for codec
    * frame extraction). Row-expansion operators must be flatMap-shaped
    * so Spark can pipeline them without materializing per-blob state.
    */
  def sampleFrames(blobs: Dataset[MediaBlob], framesPer: Int): Dataset[MediaFrame] =
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val n = b.bytes.length
        (0 until framesPer).iterator.map { f =>
          val start = if (framesPer == 0 || n == 0) 0 else (n.toLong * f / framesPer).toInt
          val end = if (n == 0) 0 else math.min(n, start + math.max(1, n / math.max(framesPer, 1)))
          // Frame content hash: first 60 bits of md5 — the SAME
          // HashKernels fold the dedup family's h60 uses (one
          // definition to keep bit-identical with the DuckDB oracle;
          // the previous inline form hex-formatted and re-parsed the
          // digest per frame).
          MediaFrame(b.docId, f, (end - start).toLong,
            HashKernels.md5Prefix60(b.bytes, start, end - start))
        }
      }
    }

  /** Resize stub: bytes→bytes, content-preserving marker semantics. */
  def resize(blobs: Dataset[MediaBlob], w: Int, h: Int): Dataset[MediaBlob] =
    blobs.mapPartitions { it =>
      it.map { b =>
        // STUB: a real codec would re-encode; we tag the header bytes so
        // the transform is observable and deterministic.
        val out = java.util.Arrays.copyOf(b.bytes, b.bytes.length)
        if (out.length >= 2) { out(0) = (w % 251).toByte; out(1) = (h % 251).toByte }
        b.copy(bytes = out)
      }
    }

  /** Build a MediaBlob dataset from the documents table (text bytes act
    * as the opaque payload in this container).
    */
  def blobsFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("mediaType"),
        col("text").cast("binary").as("bytes"))
      .as[MediaBlob]
  }
}
