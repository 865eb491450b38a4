package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media as opaque
  * BINARY columns + typed metadata structs, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side design is real and tested — schema, partition-friendly
  * batch processing via mapPartitions over a typed Dataset (the Scala
  * analogue of mapInPandas: one iterator per partition so codecs amortize
  * per-batch setup) — while the actual media codecs are STUBBED with a
  * deterministic fake (`StubCodec`): the image/audio libraries are not in
  * this container. Swap `StubCodec` for a real decoder (javacv/ffmpeg) at
  * deploy time; nothing else changes.
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

  /** Deterministic stand-in for the real decode/feature step. Decoding
    * libraries are unavailable here — this produces a stable
    * pseudo-feature from the bytes so the pipeline shape (schema, batch
    * iteration, partitioning) is fully exercised. */
  object StubCodec {
    def decodeAndFeaturize(row: MediaRow, dim: Int): MediaFeatures = {
      val bytes = Option(row.content).getOrElse(Array.emptyByteArray)
      var h = 1125899906842597L // deterministic FNV-ish rolling hash
      bytes.foreach(b => h = h * 31 + b)
      val feature = Array.tabulate(dim) { i =>
        val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
        ((x % 1000L).toFloat) / 1000.0f
      }
      MediaFeatures(row.asset_id, row.media_type, bytes.length.toLong, h,
        feature)
    }

    /** Stubbed resize: returns the byte prefix, standing in for a real
      * image rescale. Keeps output size deterministic for tests. */
    def resize(content: Array[Byte], maxBytes: Int): Array[Byte] =
      Option(content).getOrElse(Array.emptyByteArray).take(maxBytes)

    /** Stubbed frame sampling: every k-th 16-byte block as a "frame". */
    def sampleFrames(content: Array[Byte], everyK: Int): Seq[Array[Byte]] = {
      val bytes = Option(content).getOrElse(Array.emptyByteArray)
      bytes.grouped(16).zipWithIndex
        .collect { case (blk, i) if i % everyK == 0 => blk }.toSeq
    }
  }

  /** REAL image codec path — pure-JDK `javax.imageio` (PNG/JPEG/GIF/BMP
    * ship with every JVM, no container dependency): `probeMeta` reads
    * width/height/format from the ACTUAL bytes via the header reader
    * (no full pixel decode — O(header) per asset, the right cost shape
    * for a 100 TB metadata sweep), and `encodePng` produces real PNG
    * bytes for the end-to-end gate. Feature extraction stays on
    * [[StubCodec]] (no ML image libs here); swapping
    * `decodeAndFeaturize` remains the only deploy-time change. */
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

    /** (channels, sampleRate, bitsPerSample, nFrames) from a
      * hand-rolled RIFF chunk walk — no sound API in the loop. None on
      * anything malformed; never throws on arbitrary bytes. */
    def riffMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
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
      var dataLen: Option[Long] = None
      while (i + 8 <= bytes.length &&
        (fmt.isEmpty || dataLen.isEmpty)) {
        val id = tag(i)
        val len = u32(i + 4)
        if (id == "fmt " && len >= 16 && i + 8 + 16 <= bytes.length) {
          if (u16(i + 8) != 1) return None // not PCM
          fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22),
            u16(i + 20)))
        } else if (id == "data") dataLen = Some(len)
        i += 8 + len.toInt + (len.toInt & 1) // chunks pad to even
      }
      for {
        (ch, rate, bits, align) <- fmt
        d <- dataLen
        if align > 0
      } yield (ch, rate, bits, d / align)
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
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
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
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        MediaRow(id, "image", ImageIoCodec.encodeJpeg(w, h, id), None)
      }
    }.toDF()
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

  /** Batch feature extraction over media rows: mapPartitions so per-batch
    * codec setup is amortized (the mapInPandas batch shape). At 100 TB the
    * input is partitioned parquet with `content` in its own column — scans
    * that don't need bytes never read them (parquet column pruning). */
  def extractFeatures(media: DataFrame, dim: Int = 16)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real impl: initialize the codec ONCE here, per partition
      rows.map(r => StubCodec.decodeAndFeaturize(r, dim))
    }
  }

  /** Resize stage: binary-in/binary-out column transform. */
  def resizeContent(media: DataFrame, maxBytes: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => r.copy(content = StubCodec.resize(r.content, maxBytes)))
    }.toDF()
  }

  /** Frame sampling stage for video rows: one output row per sampled
    * frame (flatMap shape — the UDTF/explode analogue). */
  final case class Frame(asset_id: Long, frame_no: Int, frame: Array[Byte])
  def sampleFrames(media: DataFrame, everyK: Int = 2)
      (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      StubCodec.sampleFrames(r.content, everyK).zipWithIndex.map {
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
