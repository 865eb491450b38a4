package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * BINARY columns + typed metadata structs, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * Both the Spark-side design (schema, partition-friendly batch
  * processing via mapPartitions over a typed Dataset — the Scala analogue
  * of mapInPandas: one iterator per partition so codecs amortize
  * per-batch setup) AND the codecs are real: images decode through
  * pure-JDK `javax.imageio` (PNG/JPEG/GIF/BMP) to pixel rasters and
  * mean-pooled grid-luminance features, WAV audio decodes through a
  * hand-rolled RIFF/PCM walk (cross-checked against
  * `javax.sound.sampled`) to per-band energy features, and anything
  * undecodable falls back to a byte-value histogram — an honest
  * measurement of opaque bytes (video codecs are not in the JDK; swap
  * the dispatch in [[extractFeatures]] for javacv/ffmpeg at deploy time
  * and nothing else changes).
  */
object Multimodal {

  /** media table schema: one row per asset, content as opaque bytes. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))), nullable = true)))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
      duration_ms: Option[Long], codec: Option[String])
  final case class MediaRow(asset_id: Long, media_type: String,
      content: Array[Byte], meta: Option[MediaMeta])
  final case class MediaFeatures(asset_id: Long, media_type: String,
      n_bytes: Long, content_hash: Long, feature: Array[Float])

  /** Real operations on OPAQUE binary payloads — the honest path for
    * content no JDK codec decodes (video containers, unknown formats).
    * Nothing here pretends to decode: the histogram measures the actual
    * byte distribution, truncation caps the actual payload, block
    * sampling windows the actual bytes. */
  object OpaqueCodec {
    /** Deterministic FNV-ish rolling hash of the content bytes. */
    def contentHash(content: Array[Byte]): Long = {
      val bytes = Option(content).getOrElse(Array.emptyByteArray)
      var h = 1125899906842597L
      bytes.foreach(b => h = h * 31 + b)
      h
    }

    /** Byte-value histogram pooled into `dim` equal-width buckets,
      * normalized by length — a real distributional feature of the
      * bytes (compressed media ≈ uniform, text ≈ ASCII-banded). */
    def histogramFeatures(content: Array[Byte], dim: Int): Array[Float] = {
      val bytes = Option(content).getOrElse(Array.emptyByteArray)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) * dim / 256) += 1L
        i += 1
      }
      if (bytes.isEmpty) new Array[Float](dim)
      else counts.map(c => (c.toDouble / bytes.length).toFloat)
    }

    /** Payload cap: the byte prefix (real truncation, for opaque
      * content; decodable images rescale via
      * [[ImageIoCodec.resizeImage]] instead). */
    def truncate(content: Array[Byte], maxBytes: Int): Array[Byte] =
      Option(content).getOrElse(Array.emptyByteArray).take(maxBytes)

    /** Block sampling: every k-th 16-byte block as a "frame" — the
      * fixed-stride window sampler for OPAQUE streams. The decodable
      * analogue is [[ImageIoCodec.sampleFrameLums]]: real every-k-th
      * frame decode over a multi-frame container (gate m10). */
    def sampleBlocks(content: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
      val bytes = Option(content).getOrElse(Array.emptyByteArray)
      bytes.grouped(16).zipWithIndex
        .collect { case (blk, i) if i % everyK == 0 => blk }.toSeq
    }
  }

  /** REAL image codec path — pure-JDK `javax.imageio` (PNG/JPEG/GIF/BMP
    * ship with every JVM, no container dependency): `probeMeta` reads
    * width/height/format from the ACTUAL bytes via the header reader
    * (no full pixel decode — O(header) per asset, the right cost shape
    * for a 100 TB metadata sweep), `featurize` fully decodes the pixel
    * raster and mean-pools integer luminance over a grid (the classic
    * cheap visual embedding), `resizeImage` rescales through
    * Graphics2D, and `encodePng`/`encodeJpeg` produce real bytes for
    * the end-to-end gates. */
  object ImageIoCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Deterministic real PNG: `width`×`height` RGB pixels from an LCG
      * seeded by `seed`. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var s = seed
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          s = s * 6364136223846793005L + 1442695040888963407L
          img.setRGB(x, y, ((s >>> 40) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic real baseline JPEG (the JDK writer emits SOF0),
      * same LCG pixel fill as [[encodePng]]. */
    def encodeJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var s = seed
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          s = s * 6364136223846793005L + 1442695040888963407L
          img.setRGB(x, y, ((s >>> 40) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Deterministic real ANIMATED GIF: one uniform-gray frame per
      * entry of `lums`, written through the JDK's GIF sequence writer
      * over an EXPLICIT 256-gray IndexColorModel (the writer preserves
      * a supplied palette verbatim, so frame k decodes back to exactly
      * gray `lums(k)` — no quantization anywhere). The multi-frame
      * container stands in for video: the frame-sampling pipeline
      * (decode every k-th frame, featurize) is what a real codec
      * swap-in would feed. */
    def encodeGifFrames(lums: Seq[Int], width: Int, height: Int)
        : Array[Byte] = {
      val ramp = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        lums.foreach { g =>
          val img = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
          val raster = img.getRaster
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) { raster.setSample(x, y, 0, g & 0xff); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null),
            writer.getDefaultWriteParam)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      bos.toByteArray
    }

    /** Decode every `everyK`-th frame of a multi-frame container (GIF)
      * to its mean luminance (the 299/587/114 integer formula shared
      * with [[featurize]]): returns (total frame count, per-sampled-
      * frame (index, mean lum)). None when the bytes don't decode —
      * the honest null, never a throw, a corrupt asset must not kill a
      * 100 TB sweep. */
    def sampleFrameLums(bytes: Array[Byte], everyK: Int)
        : Option[(Int, Seq[(Int, Int)])] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(in)
          if (!readers.hasNext) return None
          val r = readers.next()
          try {
            r.setInput(in)
            val n = r.getNumImages(true)
            if (n < 1) return None
            val samples = (0 until n by everyK).map { i =>
              val img = r.read(i)
              var sum = 0L
              var cnt = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += (299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                  cnt += 1L
                  x += 1
                }
                y += 1
              }
              (i, if (cnt == 0) 0 else (sum / cnt).toInt)
            }
            Some((n, samples))
          } finally r.dispose()
        } finally if (in != null) in.close()
      } catch {
        case _: java.io.IOException => None
        case _: RuntimeException => None
      }
    }

    /** JPEG (width, height) straight from the SOF marker segment — a
      * second, fully hand-rolled decode path with no imageio reader in
      * the loop (the gate cross-checks the two against each other and
      * against the oracle's closed-form dimensions). Walks the marker
      * stream: SOI, then length-prefixed segments until a start-of-frame
      * marker (0xC0–0xCF excluding DHT 0xC4 / JPG 0xC8 / DAC 0xCC),
      * whose payload is [precision u8][height u16][width u16]. None for
      * anything malformed — never throws on arbitrary bytes. */
    def jpegSofDimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
      def u8(i: Int): Int = bytes(i) & 0xff
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      if (bytes == null || bytes.length < 4 ||
        u8(0) != 0xff || u8(1) != 0xd8) return None
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xff) return None // lost marker sync
        var j = i + 1
        while (j < bytes.length && u8(j) == 0xff) j += 1 // fill bytes
        if (j >= bytes.length) return None
        val marker = u8(j)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (j + 7 >= bytes.length) return None
          return Some((u16(j + 6), u16(j + 4)))
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // EOI / entropy-coded data begins: no SOF seen
        } else if ((marker >= 0xd0 && marker <= 0xd8) || marker == 0x01) {
          i = j + 1 // standalone marker, no length word
        } else {
          if (j + 2 >= bytes.length) return None
          i = j + 1 + u16(j + 1) // skip the length-prefixed segment
        }
      }
      None
    }

    /** Width/height/format from the image HEADER of the actual bytes;
      * all-None for empty/undecodable content (the honest null, not a
      * crash — a corrupt asset must not kill a 100 TB sweep). */
    def probeMeta(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.isEmpty) MediaMeta(None, None, None, None)
      else {
        try {
          val in = ImageIO.createImageInputStream(
            new ByteArrayInputStream(bytes))
          try {
            val readers = ImageIO.getImageReaders(in)
            if (!readers.hasNext) MediaMeta(None, None, None, None)
            else {
              val r = readers.next()
              try {
                r.setInput(in)
                MediaMeta(Some(r.getWidth(0)), Some(r.getHeight(0)), None,
                  Some(r.getFormatName.toLowerCase))
              } finally r.dispose()
            }
          } finally in.close()
        } catch {
          case _: java.io.IOException => MediaMeta(None, None, None, None)
        }
      }
    }

    /** Grid shape for a `dim`-cell mean-pool: gh = the largest divisor
      * of dim with gh² ≤ dim, gw = dim/gh (16 → 4×4, 8 → 2×4, primes →
      * 1×dim). Deterministic pure arithmetic — the m08 oracle restates
      * it. */
    def gridDims(dim: Int): (Int, Int) = {
      require(dim >= 1)
      var gh = math.sqrt(dim.toDouble).toInt
      while (gh > 1 && dim % gh != 0) gh -= 1
      (dim / gh, gh) // (gw, gh)
    }

    /** REAL feature extraction: decode the full pixel raster and
      * mean-pool integer luminance (lum = (299·R + 587·G + 114·B)/1000,
      * exact for gray pixels) over a gw×gh grid — one Float in [0,1]
      * per cell, row-major. Pixel (x,y) lands in cell
      * (y·gh/h, x·gw/w); sums accumulate as exact Longs and divide once
      * per cell, so a uniformly-colored cell yields exactly lum/255.
      * None when the bytes don't decode as an image — the dispatch
      * falls through to the next codec, never throws. */
    def featurize(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
      if (bytes == null || bytes.isEmpty) return None
      val img =
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null
                case _: RuntimeException => null }
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val (gw, gh) = gridDims(dim)
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](dim)
        val cnts = new Array[Long](dim)
        var y = 0
        while (y < h) {
          val cy = math.min(y.toLong * gh / h, gh - 1L).toInt
          var x = 0
          while (x < w) {
            val cx = math.min(x.toLong * gw / w, gw - 1L).toInt
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) +
              587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
            val c = cy * gw + cx
            sums(c) += lum
            cnts(c) += 1L
            x += 1
          }
          y += 1
        }
        Some(Array.tabulate(dim)(c =>
          if (cnts(c) == 0) 0f
          else (sums(c).toDouble / cnts(c) / 255.0).toFloat))
      }
    }

    /** REAL image rescale: decode, Graphics2D-draw into a `tw`×`th`
      * RGB raster (bilinear), re-encode as PNG. None when the bytes
      * don't decode — opaque payloads cap via
      * [[OpaqueCodec.truncate]] instead. */
    def resizeImage(bytes: Array[Byte], tw: Int, th: Int)
        : Option[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) return None
      val img =
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null
                case _: RuntimeException => null }
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, tw, th, null)
        } finally g2.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    }
  }

  /** WAV (RIFF / 16-bit PCM) codec — the audio sibling of
    * [[ImageIoCodec]]: deterministic synthesis plus TWO independent
    * pure-JDK header readers (javax.sound.sampled and a hand-rolled
    * RIFF chunk walk), so the m07 gate pins that both readers of the
    * actual bytes agree with each other and with the oracle's
    * closed-form metadata. */
  object WavCodec {
    /** Deterministic 16-bit PCM RIFF/WAVE bytes: canonical 44-byte
      * header + an LCG sample fill from the seed. */
    def encodeWav(sampleRate: Int, channels: Int, nSamples: Int,
        seed: Long): Array[Byte] = {
      val blockAlign = 2 * channels
      val dataLen = nSamples * blockAlign
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                    // PCM
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * blockAlign) // byte rate
        .putShort(blockAlign.toShort)
        .putShort(16)                    // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var s = seed
      var i = 0
      while (i < nSamples * channels) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bb.putShort((s >>> 48).toShort)
        i += 1
      }
      bb.array()
    }

    /** Shared safe RIFF chunk walk: PCM fmt fields plus the data
      * chunk's (offset, declared length, in-file length). The chunk
      * length is an UNSIGNED 32-bit field read from untrusted bytes —
      * the advance is computed in Long and a step that would leave the
      * buffer ends the walk (a crafted 0xFFFFFFF8 length previously
      * overflowed `len.toInt`, looping forever or driving the index
      * negative into IndexOutOfBoundsException; "never throws on
      * arbitrary bytes" is part of this API's contract). */
    private def riffWalk(bytes: Array[Byte])
        : Option[((Int, Int, Int, Int), Int, Long, Int)] = {
      if (bytes == null || bytes.length < 44) return None
      def tag(i: Int): String =
        new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def u16(i: Int): Int =
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, bits, align
      var data: Option[(Int, Long, Int)] = None // off, declared, in-file
      var halted = false
      while (!halted && i + 8 <= bytes.length &&
        (fmt.isEmpty || data.isEmpty)) {
        val id = tag(i)
        val len = u32(i + 4) // unsigned: 0 ≤ len ≤ 0xFFFFFFFF
        if (id == "fmt " && len >= 16 && i + 8 + 16 <= bytes.length) {
          if (u16(i + 8) != 1) return None // not PCM
          fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22),
            u16(i + 20)))
        } else if (id == "data") {
          val avail = math.min(len, (bytes.length - i - 8).toLong).toInt
          data = Some((i + 8, len, avail))
        }
        // chunks pad to even; Long arithmetic so a hostile length can
        // neither wrap negative nor loop — past-the-end simply stops
        val next = i.toLong + 8L + len + (len & 1L)
        if (next > bytes.length.toLong) halted = true
        else i = next.toInt
      }
      for {
        f <- fmt
        d <- data
      } yield (f, d._1, d._2, d._3)
    }

    /** (channels, sampleRate, bitsPerSample, nFrames) from the
      * hand-rolled RIFF chunk walk — no sound API in the loop. None on
      * anything malformed; never throws on arbitrary bytes. */
    def riffMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
      riffWalk(bytes).collect {
        case ((ch, rate, bits, align), _, declared, _) if align > 0 =>
          (ch, rate, bits, declared / align)
      }

    /** REAL audio feature extraction: decode the 16-bit PCM samples of
      * the data chunk (little-endian, via the safe RIFF walk) and pool
      * mean |amplitude|/32768 over `bands` equal contiguous segments —
      * one Float in [0,1] per band. Sample i lands in band
      * i·bands/nSamples; sums accumulate as exact Longs and divide once
      * per band, so a constant-amplitude band yields exactly v/32768
      * (2¹⁵ — no rounding anywhere). None when the bytes are not
      * PCM-16 WAV; never throws on arbitrary bytes. */
    def pcmBandEnergies(bytes: Array[Byte], bands: Int)
        : Option[Array[Float]] = {
      riffWalk(bytes) match {
        case Some(((_, _, bits, align), off, _, avail))
            if bits == 16 && align > 0 && avail >= 2 =>
          val n = avail / 2 // 16-bit samples actually present
          val sums = new Array[Long](bands)
          val cnts = new Array[Long](bands)
          var i = 0
          while (i < n) {
            val lo = bytes(off + 2 * i) & 0xff
            val hi = bytes(off + 2 * i + 1).toInt // sign-extends
            val s = (hi << 8) | lo
            val b = math.min(i.toLong * bands / n, bands - 1L).toInt
            sums(b) += math.abs(s.toLong)
            cnts(b) += 1L
            i += 1
          }
          Some(Array.tabulate(bands)(b =>
            if (cnts(b) == 0) 0f
            else (sums(b).toDouble / cnts(b) / 32768.0).toFloat))
        case _ => None
      }
    }

    /** Deterministic PCM WAV whose sample amplitudes are CONSTANT
      * within each of `values.length` equal bands (band k holds
      * `perBand` frames of amplitude `values(k)`) — the closed-form
      * synthesis for the m09 feature gate: a correct
      * [[pcmBandEnergies]] must recover exactly values(k)/32768. */
    def encodeWavBands(sampleRate: Int, channels: Int, perBand: Int,
        values: Array[Short]): Array[Byte] = {
      val blockAlign = 2 * channels
      val nSamples = perBand * values.length // frames
      val dataLen = nSamples * blockAlign
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)
        .putShort(channels.toShort)
        .putInt(sampleRate)
        .putInt(sampleRate * blockAlign)
        .putShort(blockAlign.toShort)
        .putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var k = 0
      while (k < values.length) {
        var i = 0
        while (i < perBand * channels) {
          bb.putShort(values(k))
          i += 1
        }
        k += 1
      }
      bb.array()
    }

    /** The same metadata via `javax.sound.sampled` — the independent
      * JDK reader path. */
    def javaxMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = aff.getFormat
        Some((f.getChannels, f.getSampleRate.toInt,
          f.getSampleSizeInBits, aff.getFrameLength.toLong))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Seed ids for the EXPENSIVE synthetic-media generators (PNG/JPEG/
    * GIF — javax.imageio encodes), spread across the session's
    * parallelism BEFORE the encode (r13, guide §8: payloads are
    * created after placement, so the exchange moves 8-byte seed rows,
    * never media bytes — the documents table is a single-row-group
    * parquet whose scan is one task, which serialized every encode on
    * one core; m05 1.23 → 0.90 s, m10 1.70 → 0.95 s). The WAV
    * generators deliberately do NOT use this: their PCM encodes are a
    * few hundred bytes of array fill, and the measured exchange+task
    * overhead exceeded the win (m07 0.40 → 0.79 s before the revert —
    * BENCH_FULL_r13c vs r13d). */
  private def seedIds(documents: DataFrame)
      (implicit spark: SparkSession)
      : org.apache.spark.sql.Dataset[Long] = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** Media table whose audio rows carry REAL RIFF/PCM WAV bytes
    * (sample rate / channels / frame count closed functions of the id
    * — the audio sibling of [[syntheticImages]]). */
  def syntheticWavs(documents: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val rate = (8000 + (id % 4) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val n = (100 + id % 50).toInt
        MediaRow(id, "audio", WavCodec.encodeWav(rate, ch, n, id), None)
      }
    }.toDF()
  }

  final case class WavProbe(asset_id: Long, channels: Int,
      sample_rate: Int, bits: Int, n_frames: Long, duration_ms: Long,
      readers_agree: Long)

  /** WAV meta via BOTH decode paths — javax.sound.sampled and the
    * hand-rolled RIFF walk — with an in-row agreement bit, mirroring
    * [[probeJpegMeta]]'s dual-reader discipline. Values come from the
    * RIFF walk; `readers_agree` certifies the JDK reader saw the same
    * (channels, rate, bits, frames). */
  def probeWavMeta(media: DataFrame)
      (implicit spark: SparkSession): Dataset[WavProbe] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val riff = WavCodec.riffMeta(r.content)
        val jdk = WavCodec.javaxMeta(r.content)
        val (ch, rate, bits, n) = riff.getOrElse((-1, -1, -1, -1L))
        WavProbe(r.asset_id, ch, rate, bits, n,
          if (rate > 0) n * 1000L / rate else -1L,
          if (riff.isDefined && riff == jdk) 1L else 0L)
      }
    }
  }

  /** Media table whose image rows carry REAL PNG bytes (dimensions a
    * closed function of the id, so an oracle can predict what decode
    * must find). */
  def syntheticImages(documents: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    seedIds(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        MediaRow(id, "image", ImageIoCodec.encodePng(w, h, id), None)
      }
    }.toDF()
  }

  /** Media table whose rows carry REAL baseline-JPEG bytes (dimensions
    * a closed function of the id — the JPEG sibling of
    * [[syntheticImages]]). */
  def syntheticJpegs(documents: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    seedIds(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        MediaRow(id, "image", ImageIoCodec.encodeJpeg(w, h, id), None)
      }
    }.toDF()
  }

  /** Media table of REAL two-tone PNGs: left half gray `10 + id % 200`,
    * right half gray `30 + id % 220`, dimensions multiples of 4 — so a
    * correct pixel decode + 4×4 mean-pool must recover exactly those
    * two gray levels (the m08 oracle states them in closed form; a fake
    * featurizer, a broken decode, or a misaligned grid all
    * hash-mismatch). */
  def syntheticTwoTonePngs(documents: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    seedIds(documents).mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + (id % 4) * 4).toInt // 8..20, all divisible by 4
        val h = (8 + (id % 2) * 4).toInt // 8 or 12, divisible by 4
        val a = (10 + id % 200).toInt
        val b = (30 + id % 220).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = if (x < w / 2) a else b
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image", bos.toByteArray, None)
      }
    }.toDF()
  }

  /** Media table of REAL PCM WAVs whose amplitude is constant within
    * each of 4 equal bands — band k holds 50 frames of amplitude
    * `100 + (id·7 + k·31) % 3000` — so a correct PCM decode + band
    * energy pool must recover exactly those integers (values/32768 is
    * an exact binary fraction: zero float rounding anywhere). */
  def syntheticBandWavs(documents: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val values = Array.tabulate(4)(k =>
          (100L + (id * 7 + k * 31) % 3000L).toShort)
        MediaRow(id, "audio",
          WavCodec.encodeWavBands(16000, 1, 50, values), None)
      }
    }.toDF()
  }

  /** Media table of REAL multi-frame animated GIFs: doc `id` carries
    * 3 + id % 5 frames, frame k uniformly gray 10 + (id·3 + k·17) % 236
    * — closed-form content a frame-sampling gate can pin exactly (the
    * 299/587/114 luminance of gray g is g: the weights sum to 1000). */
  def syntheticGifs(documents: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    seedIds(documents).mapPartitions { ids =>
      ids.map { id =>
        val n = (3 + id % 5).toInt
        val lums = Seq.tabulate(n)(k => (10 + (id * 3 + k * 17) % 236).toInt)
        MediaRow(id, "video", ImageIoCodec.encodeGifFrames(lums, 8, 8), None)
      }
    }.toDF()
  }

  final case class FrameSample(asset_id: Long, frame_idx: Int, lum: Int,
      n_frames: Int)

  /** Frame sampling over a REAL multi-frame container: decode every
    * `everyK`-th frame, mean-pool luminance per frame. One decoder per
    * partition iterator (mapPartitions), rows independent — the same
    * shape a video-codec swap-in would keep. Undecodable assets yield
    * no rows (honest skip, not a crash). */
  def sampleGifFrames(media: DataFrame, everyK: Int)
      (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        ImageIoCodec.sampleFrameLums(r.content, everyK) match {
          case Some((n, samples)) =>
            samples.map { case (i, lum) => FrameSample(r.asset_id, i, lum, n) }
          case None => Nil
        }
      }
    }
  }

  final case class JpegProbe(asset_id: Long, width: Int, height: Int,
      codec: String, sof_agrees: Long)

  /** JPEG meta via BOTH decode paths — the imageio header reader and
    * the hand-rolled SOF marker parse — with an in-row agreement bit
    * (`sof_agrees`), so the gate pins that two independent readers of
    * the actual bytes see the same dimensions. */
  def probeJpegMeta(media: DataFrame)
      (implicit spark: SparkSession): Dataset[JpegProbe] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val m = ImageIoCodec.probeMeta(r.content)
        val sof = ImageIoCodec.jpegSofDimensions(r.content)
        JpegProbe(r.asset_id, m.width.getOrElse(-1), m.height.getOrElse(-1),
          m.codec.getOrElse("?"),
          if (sof.exists(d => m.width.contains(d._1) &&
            m.height.contains(d._2))) 1L else 0L)
      }
    }
  }

  /** Meta-extraction stage: decode each asset's header and fill `meta`
    * from the actual bytes (mapPartitions — reader instances amortize
    * per partition). */
  def probeImageMeta(media: DataFrame)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => r.copy(meta = Some(ImageIoCodec.probeMeta(r.content))))
    }.toDF()
  }

  /** REAL decode + feature extraction per asset, dispatched by what the
    * bytes actually ARE (content sniffing, not the declared
    * media_type): decodable images → mean-pooled grid luminance over
    * the pixel raster ([[ImageIoCodec.featurize]]); PCM-16 WAV →
    * per-band energies over the decoded samples
    * ([[WavCodec.pcmBandEnergies]]); anything else → the byte-value
    * histogram ([[OpaqueCodec.histogramFeatures]]). mapPartitions so
    * per-batch codec setup is amortized (the mapInPandas batch shape).
    * At 100 TB the input is partitioned parquet with `content` in its
    * own column — scans that don't need bytes never read them (parquet
    * column pruning). */
  def extractFeatures(media: DataFrame, dim: Int = 16)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.content).getOrElse(Array.emptyByteArray)
        val feature = ImageIoCodec.featurize(bytes, dim)
          .orElse(WavCodec.pcmBandEnergies(bytes, dim))
          .getOrElse(OpaqueCodec.histogramFeatures(bytes, dim))
        MediaFeatures(r.asset_id, r.media_type, bytes.length.toLong,
          OpaqueCodec.contentHash(bytes), feature)
      }
    }
  }

  /** Resize stage: binary-in/binary-out column transform — decodable
    * images REALLY rescale (Graphics2D bilinear into maxDim×maxDim,
    * re-encoded PNG); opaque payloads cap at maxBytes by truncation.
    * `maxBytes` is a HARD cap on both paths: a re-encoded PNG that
    * still exceeds it (tiny caps, busy pixels) re-rescales at halved
    * dimensions until it fits, and if even a 1×1 PNG (~70 B) cannot,
    * the cap wins over decodability via prefix truncation — an output
    * column contracted to fit fixed-size storage must actually fit. */
  def resizeContent(media: DataFrame, maxBytes: Int, maxDim: Int = 32)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        var dim = maxDim
        var out = ImageIoCodec.resizeImage(r.content, dim, dim)
        while (out.exists(_.length > maxBytes) && dim > 1) {
          dim = math.max(1, dim / 2)
          out = ImageIoCodec.resizeImage(r.content, dim, dim)
        }
        r.copy(content = out match {
          case Some(b) if b.length <= maxBytes => b
          case Some(b) => OpaqueCodec.truncate(b, maxBytes)
          case None => OpaqueCodec.truncate(r.content, maxBytes)
        })
      }
    }.toDF()
  }

  /** Frame sampling stage for video rows: one output row per sampled
    * frame (flatMap shape — the UDTF/explode analogue; fixed-stride
    * block windows for opaque streams, [[OpaqueCodec.sampleBlocks]]). */
  final case class Frame(asset_id: Long, frame_no: Int, frame: Array[Byte])
  def sampleFrames(media: DataFrame, everyK: Int = 2)
      (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      OpaqueCodec.sampleBlocks(r.content, everyK).zipWithIndex.map {
        case (f, i) => Frame(r.asset_id, i, f)
      }
    }
  }

  /** Build a synthetic media table from the documents table (bytes =
    * utf-8 text) — the deterministic test input for this module. */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(lit(64).as("width"), lit(64).as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
}
