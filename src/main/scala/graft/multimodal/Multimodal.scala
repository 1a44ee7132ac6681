package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as partition-batched functions.
  *
  * The Spark-side architecture is real and tested — schema, partition-level
  * batch iteration (the Scala analogue of `mapInPandas` batch shape),
  * deterministic output. The codec itself is a STUB (`fakeDecode`): this
  * container has no image/audio libraries, so "decoding" derives metadata
  * (width/height/channels) deterministically from the payload bytes. Swapping
  * in a real codec changes only the function body, not the pipeline shape:
  * the decode stays per-partition, no shuffle, no driver involvement.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decode: deterministic pseudo-metadata from an FNV-1a of the bytes.
    * A real implementation would parse the container header here.
    */
  def fakeDecode(payload: Array[Byte]): (String, Int, Int, Int) = {
    val h = graft.functions.SimHash64.fnv1a(payload)
    val format = Seq("png", "jpeg", "webp")(((h % 3) + 3).toInt % 3)
    val width = 64 + (((h >>> 8) % 1216) + 1216).toInt % 1216
    val height = 64 + (((h >>> 24) % 960) + 960).toInt % 960
    (format, width, height, 3)
  }

  /** Fabricate a binary column from the documents table (stands in for real
    * image bytes; UTF-8 of the text). Keeps the harness tables canonical.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Partition-batched decode: one pass per partition, rows consumed and
    * produced as iterators (never materializing a partition in memory).
    */
  def decodeMeta(spark: SparkSession, withBinary: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(metaSchema)
    withBinary.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (format, w, h, c) = fakeDecode(payload)
        Row(id, payload.length.toLong, format, w, h, c)
      }
    }(enc)
  }

  /** End-to-end: documents → payload → partition-batched decode → rollup by
    * format (the aggregate a curation pipeline would gate on).
    */
  def formatStats(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeMeta(spark, withPayload(documents))
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("width").cast("long")) / count(lit(1))).as("avg_width"))
      .orderBy(col("format"))

  /** Thumbnail/resize plumbing: fit each decoded image into a bounding box
    * preserving aspect ratio (integer floor scaling, never upscaling) and
    * report the resized dims + raw RGB byte size. The geometry is the real
    * resize contract (what a `mapInPandas`+PIL stage computes before
    * touching pixels); the pixel transform itself stays inside the stub
    * codec boundary. Pure row-local arithmetic over the decode output —
    * fused into the same partition-batched pass, no extra shuffle.
    */
  def thumbnails(spark: SparkSession, documents: DataFrame,
      maxW: Int = 256, maxH: Int = 256): DataFrame =
    decodeMeta(spark, withPayload(documents))
      // fixed-point (x1e6) INTEGER-ONLY scaling: bit-identical in any
      // engine (no float division anywhere)
      .withColumn("scale_num", expr(
        s"least((${maxW.toLong} * 1000000) DIV width," +
          s" (${maxH.toLong} * 1000000) DIV height, 1000000)"))
      .select(
        col("doc_id"), col("format"), col("width"), col("height"),
        expr("greatest(1, (width * scale_num) DIV 1000000)").cast("int")
          .as("thumb_w"),
        expr("greatest(1, (height * scale_num) DIV 1000000)").cast("int")
          .as("thumb_h"))
      .withColumn("thumb_bytes",
        col("thumb_w").cast("long") * col("thumb_h") * lit(3L))
      .orderBy(col("doc_id"))

  val bmpSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false)))

  /** Deterministic grayscale value for pixel (x, y) of doc `docId` — the
    * shared contract between the encoder below and the SQL oracle (which
    * recomputes the same modular arithmetic over a generate-series grid).
    */
  def bmpPixel(docId: Long, x: Int, y: Int): Int =
    ((docId + 31L * x + 17L * y) % 256L).toInt

  /** Synthesize a real BMP image for a doc: dims derived from the id,
    * pixels from [[bmpPixel]], encoded by the JDK's actual BMP writer.
    */
  def encodeBmp(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 13).toInt
    val h = 8 + (docId % 11).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = bmpPixel(docId, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // memory-only streams on executors
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** REAL-codec slice beside the FNV stub: encode each doc to actual BMP
    * bytes, decode them back through `javax.imageio` (a genuine pure-JVM
    * container parse — header, row padding, bottom-up row order), and
    * report the decoded geometry plus a full-pixel checksum. Same
    * partition-batched, shuffle-free shape as [[decodeMeta]]; the oracle
    * reproduces width/height/pixel_sum arithmetically, so a codec that
    * mangled dims, channel order or padding would hash-mismatch.
    */
  def bmpRoundTrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(bmpSchema)
    documents.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = encodeBmp(id)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Row(id, img.getWidth, img.getHeight, sum)
      }
    }(enc).orderBy(col("doc_id"))
  }

  val wavSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_sum", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false)))

  /** Deterministic signed 16-bit PCM sample i of doc `docId` — the shared
    * contract between the WAV encoder below and the SQL oracle. Spans the
    * full int16 range so both byte order and sign extension are exercised.
    */
  def wavSample(docId: Long, i: Int): Int =
    (((docId * 7L + i.toLong * 193L) % 65536L) - 32768L).toInt

  def wavSampleCount(docId: Long): Int = 64 + (docId % 97L).toInt

  /** Synthesize a real RIFF/WAVE container for a doc (16-bit mono LE PCM
    * at 8 kHz) through the JDK's actual WAV writer.
    */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = wavSampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = wavSample(docId, i)
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /*signed*/ true, /*bigEndian*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio-codec slice beside the BMP one: encode each doc to an
    * actual WAV container, decode it back through `javax.sound.sampled`
    * (genuine RIFF chunk parse — header walk, fmt block, frame size,
    * little-endian int16 payload), and report format fields plus exact
    * integer signal statistics. Same partition-batched, shuffle-free
    * shape as [[bmpRoundTrip]]; the oracle reproduces every output
    * arithmetically, so a codec that mangled endianness, sign, channel
    * count or chunk offsets would hash-mismatch.
    */
  def wavRoundTrip(spark: SparkSession, documents: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(wavSchema)
    documents.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = encodeWav(id)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        val n = ais.getFrameLength
        val buf = ais.readAllBytes()
        var sum = 0L
        var peak = 0L
        var i = 0
        while (i < buf.length - 1) {
          // decoded stream is little-endian signed 16-bit mono
          val s = ((buf(i) & 0xff) | (buf(i + 1).toInt << 8)).toShort.toInt
          sum += s
          if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
          i += 2
        }
        Row(id, fmt.getSampleRate.toInt, n, sum, peak)
      }
    }(enc).orderBy(col("doc_id"))
  }

  val imageFpSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false),
    StructField("ahash", LongType, nullable = false)))

  /** Perceptual hashes over the REAL decoded pixels — the image analogue
    * of the text fingerprints that drive near-dup dedup:
    *
    *  - **dHash** (difference hash): sample the image on a 9×8 integer
    *    grid (`x_src = x_t·w DIV 9`, `y_src = y_t·h DIV 8` — a
    *    deterministic nearest-neighbor resize, no float interpolation,
    *    so any engine reproduces it bit-exactly), set bit `y·8+x` iff
    *    the right neighbor is strictly brighter. Robust to uniform
    *    brightness shifts.
    *  - **aHash** (average hash): 8×8 grid, set the bit iff the pixel
    *    beats the grid mean — compared exactly as `64·g > Σg`, no
    *    division.
    *
    * Pixels come from an actual `javax.imageio` BMP parse of real encoded
    * bytes ([[encodeBmp]]) on the executors — same genuine-codec slice as
    * [[bmpRoundTrip]] (the grayscale read takes the blue channel; the
    * synthetic pixels are gray, r=g=b, so channel choice is immaterial
    * and the oracle's single-value pixel formula stays exact). Same
    * partition-batched, shuffle-free shape as [[decodeMeta]]: at 100 TB
    * of images this stage is embarrassingly parallel, one pass, output
    * 36 bytes/doc.
    */
  def imageFingerprints(spark: SparkSession, documents: DataFrame): DataFrame =
    imageFingerprintsRaw(documents).orderBy(col("doc_id"))

  /** [[imageFingerprints]] without the presentation sort — the near-dup
    * banding consumes this (a sort feeding an equi-join is wasted work).
    */
  private def imageFingerprintsRaw(documents: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFpSchema)
    documents.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(encodeBmp(id)))
        val w = img.getWidth
        val h = img.getHeight
        // dHash: 9x8 grid, horizontal gradient sign
        var dhash = 0L
        var yt = 0
        while (yt < 8) {
          val ys = yt * h / 8
          var prev = img.getRGB(0, ys) & 0xff // x_t = 0 → x_src = 0
          var xt = 0
          while (xt < 8) {
            val next = img.getRGB((xt + 1) * w / 9, ys) & 0xff
            if (next > prev) dhash |= 1L << (yt * 8 + xt)
            prev = next
            xt += 1
          }
          yt += 1
        }
        // aHash: 8x8 grid vs exact integer mean
        val grid = new Array[Int](64)
        var sum = 0L
        var i = 0
        while (i < 64) {
          grid(i) = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8) & 0xff
          sum += grid(i)
          i += 1
        }
        var ahash = 0L
        i = 0
        while (i < 64) {
          if (64L * grid(i) > sum) ahash |= 1L << i
          i += 1
        }
        Row(id, w, h, dhash, ahash)
      }
    }(enc)
  }

  /** Image near-duplicate detection: dHash fingerprints through the same
    * Hamming-banded candidate join the SimHash text path uses
    * ([[graft.operators.Dedup.bandedHammingPairs]] — pigeonhole-lossless,
    * `maxHamming + 1` bands, NEVER an all-pairs scan). For a training-data
    * pipeline this is the image twin of text near-dup dedup: re-encoded /
    * brightness-shifted copies land within a few dHash bits of each other
    * and surface here as (doc_a, doc_b, hamming) edges ready for
    * [[graft.operators.Dedup.nearDupClusters]]. Scale = fingerprint pass
    * (map-only over the images) + a band equi-join on 5/6-byte keys.
    */
  def imageNearDups(
      spark: SparkSession, documents: DataFrame,
      maxHamming: Int = 2): DataFrame =
    graft.operators.Dedup.bandedHammingPairs(
      imageFingerprintsRaw(documents)
        .select(col("doc_id"), col("dhash").as("fp")),
      maxHamming)

  /** Frame-sampling plumbing for video-like payloads: treat the payload as
    * a sequence of fixed-size frames, keep every `stride`-th frame. Emits
    * per-doc frame counts — the bookkeeping a `mapInPandas` frame-sampler
    * runs before decoding the kept frames. Row-local arithmetic on
    * n_bytes; sampling ratio is exact integer math (ceil division).
    */
  def frameSample(spark: SparkSession, documents: DataFrame,
      frameBytes: Int = 32, stride: Int = 4): DataFrame =
    decodeMeta(spark, withPayload(documents))
      .select(
        col("doc_id"),
        expr(s"n_bytes DIV $frameBytes").as("total_frames"))
      .withColumn("sampled_frames",
        expr(s"(total_frames + ${stride - 1}) DIV $stride"))
      .orderBy(col("doc_id"))
}
