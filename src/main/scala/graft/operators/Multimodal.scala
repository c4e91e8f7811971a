package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `BINARY` payloads wrapped in
  * a typed struct `{mime STRING, bytes BINARY, meta MAP<STRING,STRING>}` —
  * the standard lakehouse shape for image/audio/video at 100 TB (payload
  * stays columnar + splittable; metadata stays queryable without decoding).
  *
  * Decode / feature-extraction runs as batched partition-local functions
  * (the Scala analogue of `mapInPandas`): one iterator pass per partition,
  * vectorizable batch shape, no per-row JVM↔native churn. Two codec lanes:
  * [[MediaCodecImageIO]] is a REAL decoder (the JDK's ImageIO —
  * PNG/JPEG/BMP/GIF) behind [[decodeReal]]/[[resizeReal]];
  * [[MediaCodecStub]] keeps the deterministic hash-derived lane for opaque
  * payloads and for formats with no in-container codec (video/audio).
  */
object Multimodal {

  case class MediaCell(mime: String, bytes: Array[Byte], meta: Map[String, String])
  case class MediaRow(id: Long, media: MediaCell)
  case class MediaFeatures(
      id: Long, mime: String, byte_len: Int,
      width: Int, height: Int, feature: Array[Float])

  /** Wrap raw columns into the multimodal struct. */
  def wrap(df: DataFrame, idCol: String, bytesCol: String,
      mime: org.apache.spark.sql.Column,
      metaPairs: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val metaCol = map(metaPairs.flatMap { case (k, v) => Seq(lit(k), v) }: _*)
    df.select(col(idCol).as("id"),
      struct(mime.as("mime"), col(bytesCol).as("bytes"), metaCol.as("meta")).as("media"))
  }

  /** Metadata-only projection — never touches payload bytes, so Parquet
    * column pruning keeps the scan narrow. */
  def describe(df: DataFrame): DataFrame =
    df.select(col("id"), col("media.mime").as("mime"),
      length(col("media.bytes")).as("byte_len"),
      map_keys(col("media.meta")).as("meta_keys"))

  /** STUB media codec: deterministic fake decode. A real deployment swaps
    * this object for JNI/FFI codec calls; the Spark-side contract (batch
    * iterator in, fixed-schema iterator out) is unchanged. */
  object MediaCodecStub {
    /** Fake "decode": derives dimensions and a 8-dim feature vector from
      * the payload via FNV-1a — deterministic, schema-faithful. */
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val h = graft.functions.Fnv1a64.hash(r.media.bytes)
        val w = 16 + (math.abs(h % 1024)).toInt
        val ht = 16 + (math.abs((h >>> 10) % 1024)).toInt
        val feat = Array.tabulate(8) { i =>
          (((h >>> (i * 8)) & 0xff).toFloat / 255.0f) - 0.5f
        }
        MediaFeatures(r.id, r.media.mime, r.media.bytes.length, w, ht, feat)
      }
  }

  /** Batched decode/feature-extract over the multimodal struct —
    * partition-local, one batch iterator per partition (mapInPandas shape).
    * Repartition count should target ~128 MB of payload per task at scale. */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.as[MediaRow].mapPartitions(MediaCodecStub.decodeBatch _)
  }

  /** Byte-range chunk plan over multimodal payloads — the R4-style
    * offset-addressed read surface (reference walrus_read.rs:419-585 plans
    * block-aligned ranges the same way) applied to large media blobs:
    * fixed-size chunk manifest (id, chunk_idx, start, len) for staged
    * download / range-request pipelines. Metadata-only arithmetic on
    * `length(bytes)` — payloads are never materialized, so column pruning
    * keeps the scan narrow at 100 TB. */
  def chunkManifest(df: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    df.select(col("id"), col("media.mime").as("mime"),
        length(col("media.bytes")).cast("long").as("byte_len"))
      .where(col("byte_len") > 0)
      .withColumn("n_chunks",
        ((col("byte_len") + (chunkBytes - 1)) / chunkBytes).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("id"), col("mime"), col("n_chunks"), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).as("chunk_start"),
        least(lit(chunkBytes.toLong),
          col("byte_len") - col("chunk_idx") * chunkBytes).as("chunk_len"))
  }

  /** Sliding-window manifest over multimodal payloads — the audio/PCM
    * analogue of [[chunkManifest]]: fixed `windowBytes` windows advancing by
    * `hopBytes` (overlapping when hop < window, the STFT/feature-frame
    * shape). Only complete windows are emitted; payloads shorter than one
    * window produce no rows. Metadata-only arithmetic on `length(bytes)` —
    * payloads are never materialized. */
  def hopWindows(df: DataFrame, windowBytes: Int, hopBytes: Int): DataFrame = {
    require(windowBytes > 0 && hopBytes > 0, "window and hop must be positive")
    df.select(col("id"), col("media.mime").as("mime"),
        length(col("media.bytes")).cast("long").as("byte_len"))
      .where(col("byte_len") >= windowBytes)
      .withColumn("n_windows",
        (((col("byte_len") - windowBytes) / hopBytes).cast("long") + 1L))
      .withColumn("win_idx", explode(sequence(lit(0L), col("n_windows") - 1)))
      .select(col("id"), col("n_windows"), col("win_idx"),
        (col("win_idx") * hopBytes).as("win_start"),
        lit(windowBytes.toLong).as("win_len"))
  }

  /** Magic-byte container sniffing over multimodal payloads — the
    * trust-the-bytes-not-the-extension triage every crawl ingest runs
    * before routing media to a decoder: JPEG (FF D8 FF), PNG
    * (89 50 4E 47), RIFF/WAVE ('RIFF' + size + 'WAVE'), else opaque.
    * Pure byte-slice comparisons on the payload prefix — codegen'd
    * built-ins, no decode, no UDF — and the only payload bytes read are
    * the first 12 (Parquet still fetches the column, but nothing is
    * parsed), so the pass is scan-bound at 100 TB. */
  def formatSniff(df: DataFrame): DataFrame = {
    def magic(hexStr: String): org.apache.spark.sql.Column = unhex(lit(hexStr))
    val b = col("media.bytes")
    val detected = when(substring(b, 1, 3) === magic("FFD8FF"), "image/jpeg")
      .when(substring(b, 1, 4) === magic("89504E47"), "image/png")
      .when(substring(b, 1, 4) === magic("52494646") &&
        substring(b, 9, 4) === magic("57415645"), "audio/wav")
      .otherwise("application/octet-stream")
    val headerLen = when(detected === "image/jpeg", 3)
      .when(detected === "image/png", 4)
      .when(detected === "audio/wav", 12)
      .otherwise(0)
    df.select(col("id"),
      col("media.mime").as("declared_mime"),
      detected.as("detected_mime"),
      headerLen.cast("long").as("header_len"),
      length(b).cast("long").as("byte_len"))
  }

  /** Frame-sampling plumbing for video-like payloads: emits `n` byte-range
    * "frames" per payload (stub slices; real impl calls the demuxer), as
    * (id, frame_idx, frame_bytes). */
  def sampleFrames(spark: SparkSession, df: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    df.as[MediaRow].flatMap { r =>
      val len = r.media.bytes.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val from = (len.toLong * i / n).toInt
        val until = (len.toLong * (i + 1) / n).toInt
        (r.id, i, java.util.Arrays.copyOfRange(r.media.bytes, from, until))
      }
    }.toDF("id", "frame_idx", "frame_bytes")
  }

  // ------------------------------------------------------ real codec path

  /** Real-codec decode via the JDK's own ImageIO (PNG/JPEG/BMP/GIF —
    * public JDK, no external library): this is the documented swap point
    * behind [[MediaCodecStub]], wired for the formats the JDK ships
    * codecs for. Payloads ImageIO cannot parse fall back to the stub's
    * hash-derived decode, flagged `real_codec = false` — an ingest over
    * mixed media keeps flowing and the flag routes opaque payloads to
    * quarantine/re-sniff. */
  object MediaCodecImageIO {
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Deterministic tiny RGB PNG (a GENUINE PNG through the JDK encoder):
      * pixel (x, y) of seed s is r=(7x+13y+s)%256, g=(3x+5y+2s)%256,
      * b=(11x+2y+3s)%256 — a closed form an engine-independent oracle can
      * replay without any image library. Test/fixture helper. */
    def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = java.lang.Math.floorMod(7L * x + 13L * y + seed, 256L).toInt
          val g = java.lang.Math.floorMod(3L * x + 5L * y + 2L * seed, 256L).toInt
          val b = java.lang.Math.floorMod(11L * x + 2L * y + 3L * seed, 256L).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Real AUDIO codec via the JDK's own javax.sound.sampled (WAV/AIFF/AU
    * PCM — public JDK, no external library): the audio sibling of
    * [[MediaCodecImageIO]]. PCM is lossless, so decoded samples replay a
    * synthesis closed form exactly — the oracle needs no audio library. */
  object MediaCodecAudio {
    /** Deterministic 16-bit mono PCM WAV (a GENUINE RIFF/WAVE container
      * through the JDK encoder): frame i of seed s is
      * `((37·i + 101·s) mod 4001) − 2000`. Test/fixture helper. */
    def syntheticWav(seed: Long, nFrames: Int, sampleRate: Float): Array[Byte] = {
      val raw = new Array[Byte](nFrames * 2)
      var i = 0
      while (i < nFrames) {
        val v = (java.lang.Math.floorMod(37L * i + 101L * seed, 4001L) - 2000L).toShort
        raw(2 * i) = (v & 0xff).toByte
        raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a PCM container to its 16-bit samples (channel-interleaved,
      * little-endian), or None when the JDK has no reader for it. */
    def decodeSamples(bytes: Array[Byte]): Option[Array[Short]] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          require(ais.getFormat.getSampleSizeInBits == 16 &&
            !ais.getFormat.isBigEndian)
          val raw = ais.readAllBytes()
          val out = new Array[Short](raw.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
            i += 1
          }
          Some(out)
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Decode a PCM audio container: (sampleRateHz, channels, frames,
      * sum, min, max) over the 16-bit samples, or None when the JDK has
      * no reader for the payload. */
    def decodeStats(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long, Long)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
          val raw = ais.readAllBytes()
          var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
          var i = 0
          while (i + 1 < raw.length) {
            val v = ((raw(i) & 0xff) | (raw(i + 1) << 8)).toShort.toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 2
          }
          val frames = raw.length / 2 / fmt.getChannels
          Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong,
            frames.toLong, sum, mn, mx))
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  case class MediaDecoded(id: Long, mime: String, byte_len: Long,
      width: Long, height: Long, mean_r_milli: Long, mean_g_milli: Long,
      mean_b_milli: Long, real_codec: Boolean)

  /** Real decode + channel statistics: ImageIO-decodable payloads report
    * their TRUE dimensions and exact per-channel mean (integer milli-units,
    * `sum·1000 DIV (w·h)` — replayable bit-for-bit by an oracle that knows
    * the pixels); opaque payloads take the stub's hash-derived dimensions
    * with NULL-free sentinel means derived from the same hash, flagged
    * `real_codec = false`. Same batched partition-local plumbing as
    * [[extractFeatures]] — at 100 TB the decode is the embarrassingly
    * parallel inner loop of a payload-repartitioned scan. */
  def decodeReal(spark: SparkSession, df: DataFrame): Dataset[MediaDecoded] = {
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaCodecImageIO.decode(r.media.bytes) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            MediaDecoded(r.id, r.media.mime, r.media.bytes.length.toLong,
              w.toLong, h.toLong, sr * 1000 / n, sg * 1000 / n, sb * 1000 / n,
              real_codec = true)
          case None =>
            val h64 = graft.functions.Fnv1a64.hash(r.media.bytes)
            val w = 16 + math.abs(h64 % 1024)
            val ht = 16 + math.abs((h64 >>> 10) % 1024)
            MediaDecoded(r.id, r.media.mime, r.media.bytes.length.toLong,
              w, ht, ((h64 >>> 20) & 0xff) * 1000 / 255,
              ((h64 >>> 28) & 0xff) * 1000 / 255,
              ((h64 >>> 36) & 0xff) * 1000 / 255, real_codec = false)
        }
      }
    }
  }

  case class MediaResizedRealRow(id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, mid_r: Long, mid_g: Long, mid_b: Long,
      mean_luma_milli: Long)

  /** Real-codec resize: ImageIO decode, then an explicit nearest-neighbor
    * kernel over the TRUE pixels — `out(x,y) = src((x·w) DIV ow,
    * (y·h) DIV oh)` with the aspect-preserving box fit of [[resize]] —
    * reporting output dims, the output-midpoint RGB, and the resized
    * frame's mean integer luma (`(r+g+b) DIV 3`, milli-units). The kernel
    * is integer-exact (no AWT scaler rounding), so every output value is
    * oracle-replayable from the pixel formula; undecodable payloads are
    * dropped (this is the image-only lane; [[resize]] keeps the opaque
    * lane). */
  def resizeReal(spark: SparkSession, df: DataFrame, box: Int): DataFrame = {
    require(box >= 1)
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodecImageIO.decode(r.media.bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val m = math.max(w, h)
          val (ow, oh) =
            if (m <= box) (w, h)
            else (math.max(1, w * box / m), math.max(1, h * box / m))
          var sum = 0L
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              val p = img.getRGB(x * w / ow, y * h / oh)
              sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          val mid = img.getRGB((ow / 2) * w / ow, (oh / 2) * h / oh)
          MediaResizedRealRow(r.id, w.toLong, h.toLong, ow.toLong, oh.toLong,
            ((mid >> 16) & 0xff).toLong, ((mid >> 8) & 0xff).toLong,
            (mid & 0xff).toLong, sum * 1000 / (ow.toLong * oh))
        }
      }
    }.toDF()
  }

  case class MediaResized(id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, resized: Array[Byte], mid_byte: Int)

  /** Stub-backed deterministic resize: the stub decode yields (w, h); the
    * output box fit preserves aspect ratio in integer arithmetic
    * (`d·box DIV max(w,h)`, floor 1), and the "resized" payload is the
    * area-ratio stride resample of the source bytes (output byte j reads
    * source byte `j·len DIV out_len` — the nearest-neighbor downsample a
    * real codec kernel would do per pixel, applied to the opaque payload).
    * Same batched partition-local plumbing as [[extractFeatures]]; a real
    * deployment swaps only the decode/kernel inner calls. `mid_byte`
    * (the resampled midpoint, 0-255) rides along so downstream checks
    * need not re-materialize payloads. Empty payloads are dropped. */
  def resize(spark: SparkSession, df: DataFrame, box: Int): DataFrame = {
    require(box >= 1)
    import spark.implicits._
    df.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val len = r.media.bytes.length
        if (len == 0) None
        else {
          val h64 = graft.functions.Fnv1a64.hash(r.media.bytes)
          val w = 16 + math.abs(h64 % 1024).toInt
          val h = 16 + math.abs((h64 >>> 10) % 1024).toInt
          val m = math.max(w, h)
          val (ow, oh) =
            if (m <= box) (w, h)
            else (math.max(1, w * box / m), math.max(1, h * box / m))
          val outLen = math.max(1,
            (len.toLong * ow * oh / (w.toLong * h)).toInt)
          val out = Array.tabulate(outLen)(j =>
            r.media.bytes((j.toLong * len / outLen).toInt))
          Some(MediaResized(r.id, w, h, ow, oh, out,
            out(outLen / 2) & 0xff))
        }
      }
    }.toDF()
  }
}
