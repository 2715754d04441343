package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-parity extension, SURVEY.md §7):
  * image/audio/video payloads ride as opaque `BinaryType` columns with a
  * typed metadata struct; feature extraction runs batched per partition.
  *
  * The IMAGE codec path is REAL: [[decodeImage]] / [[resizeImageNN]] parse
  * and resample actual PNG/BMP/GIF/JPEG payloads via `javax.imageio` (pure
  * JDK — the readers ship with the JRE). The VIDEO path stays STUBBED with
  * a deterministic fake ([[frameSampleStub]], [[resizeStub]] — no demuxer
  * in the JDK); its schema, batch shape, partition sizing, and null
  * handling are real and tested, so a real demuxer drops in by replacing
  * the stub only.
  *
  * Scale notes: payloads never enter a shuffle here — decode is a narrow
  * mapPartitions; downstream aggregations see only the small feature
  * struct. For 100 TB of media: size input splits so one partition's
  * payloads fit comfortably in executor memory (`maxPartitionBytes`), and
  * repartition BEFORE decode if the source files are few-but-huge.
  */
object Multimodal {

  /** The metadata struct every payload carries. */
  val MetaSchema: StructType = StructType(
    Seq(
      StructField("modality", StringType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("byte_len", LongType, nullable = false)
    )
  )

  val FeatureSchema: StructType = StructType(
    Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("byte_entropy", DoubleType, nullable = false),
      StructField("head_hash", LongType, nullable = false),
      StructField("feature_vec", ArrayType(FloatType, containsNull = false), nullable = false)
    )
  )

  /** Wrap a string column as an opaque binary payload + metadata — the
    * ingest shape (a real pipeline reads bytes from object storage; the
    * testdata has no binary columns, so documents.text stands in).
    */
  def asPayload(df: DataFrame, textCol: String, modality: String, format: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn(
        "meta",
        struct(
          lit(modality).alias("modality"),
          lit(format).alias("format"),
          octet_length(col("payload")).cast("long").alias("byte_len")
        )
      )

  /** STUB decoder: a real implementation would decode the image/audio and
    * emit model features. This fake derives deterministic features from the
    * raw bytes (length, Shannon entropy of the byte histogram, a hash of the
    * first 16 bytes, and an 8-dim byte-bucket histogram as the "embedding").
    * Deliberately cheap, pure, and collision-checkable in tests.
    */
  def fakeDecode(bytes: Array[Byte]): (Long, Double, Long, Array[Float]) = {
    val hist = new Array[Long](256)
    bytes.foreach(b => hist(b & 0xff) += 1)
    val n = bytes.length.toDouble
    var ent = 0.0
    if (n > 0) {
      var i = 0
      while (i < 256) {
        if (hist(i) > 0) { val p = hist(i) / n; ent -= p * math.log(p) / math.log(2) }
        i += 1
      }
    }
    var headHash = 1125899906842597L
    bytes.take(16).foreach(b => headHash = headHash * 31 + b)
    val vec = new Array[Float](8)
    var i = 0
    while (i < 256) { vec(i / 32) += hist(i).toFloat; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { vec(j) = (vec(j) / n).toFloat; j += 1 } }
    (bytes.length.toLong, ent, headHash, vec)
  }

  // ---- REAL image codec (javax.imageio — pure JDK: PNG/BMP/GIF/JPEG
  // readers ship with the JRE; no container dependency) -------------------

  /** Deterministic grayscale test-pattern PNG: pixel(x, y) =
    * (seed*31 + x*7 + y*13) mod 256, encoded 8-bit gray. This is the data
    * SYNTHESIS side of the codec round trip — the formula is plain integer
    * arithmetic, so a SQL oracle can replay the expected pixel sums of
    * anything the decoder reports (PNG is lossless: encode→decode is
    * identity on the raster).
    */
  def synthGrayPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((seed * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL decode: parse the payload with ImageIO and report (width, height,
    * channels, pix_sum) where pix_sum is the exact integer sum of every
    * band sample — the decoded-content witness a SQL oracle can check.
    * Returns null (not a default) for undecodable bytes: a corrupt payload
    * must be visible, not smoothed over.
    */
  def decodeImageInfo(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val r = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
      var sum = 0L
      var b = 0
      while (b < bands) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += r.getSample(x, y, b); x += 1 }
          y += 1
        }
        b += 1
      }
      Some((w, h, bands, sum))
    }
  }

  /** Struct-returning decode UDF (width, height, channels, pix_sum; null
    * for undecodable payloads). A codec is a black-box native-style call —
    * the UDF boundary is the honest integration point (same reasoning as
    * [[extractFeaturesBatched]]); everything around it stays columnar.
    */
  def decodeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      decodeImageInfo(bytes).map { case (w, h, c, s) => (w, h, c, s) }.orNull
    }

  def synthGrayPngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (seed: Long, w: Int, h: Int) => synthGrayPng(seed, w, h) }

  /** REAL nearest-neighbor resize: decode (any ImageIO format), reduce to
    * 8-bit gray — band 0 for single-band images, integer luminance
    * (299 r + 587 g + 114 b) / 1000 for color — then resample with
    * dst(x, y) = src(floor(x*sw/dw), floor(y*sh/dh)) and re-encode PNG.
    * Every step is integer arithmetic, so the resized raster is exactly
    * replayable by the oracle. Null for undecodable input. Narrow op: no
    * shuffle, payload stays in its partition.
    */
  def resizeImageNN(dw: Int, dh: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      val img =
        if (bytes == null || bytes.isEmpty) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
      if (img == null) null
      else {
        val src = img.getRaster
        val (sw, sh) = (img.getWidth, img.getHeight)
        def gray(x: Int, y: Int): Int =
          if (src.getNumBands >= 3)
            (src.getSample(x, y, 0) * 299 + src.getSample(x, y, 1) * 587 +
              src.getSample(x, y, 2) * 114) / 1000
          else src.getSample(x, y, 0)
        val out = new java.awt.image.BufferedImage(dw, dh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val dst = out.getRaster
        var y = 0
        while (y < dh) {
          var x = 0
          while (x < dw) {
            dst.setSample(x, y, 0, gray(x * sw / dw, y * sh / dh))
            x += 1
          }
          y += 1
        }
        encodePng(out)
      }
    }

  // ---- REAL audio codec (javax.sound.sampled — pure JDK: WAV/AIFF/AU PCM
  // readers ship with the JRE) ---------------------------------------------

  /** Deterministic 16-bit PCM mono WAV test pattern: sample(i) =
    * ((seed*31 + i*7) mod 65536) - 32768 — the audio sibling of
    * [[synthGrayPng]]. PCM WAV is lossless, so a SQL oracle can replay the
    * decoder's exact sample sums.
    */
  def synthPcmWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((seed * 31 + i * 7) % 65536) - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode: parse the payload with AudioSystem and report
    * (n_samples, sample_rate, channels, sample_sum, abs_sum) — exact
    * integer sums over the decoded 16-bit samples, the decoded-content
    * witness a SQL oracle can check (abs_sum is the energy proxy a quality
    * filter would threshold on). None for undecodable bytes.
    */
  def decodeAudioInfo(bytes: Array[Byte]): Option[(Long, Int, Int, Long, Long)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16) return None
      val data = ais.readAllBytes()
      val le = !fmt.isBigEndian
      var sum = 0L
      var abs = 0L
      var i = 0
      while (i + 1 < data.length) {
        val lo = data(if (le) i else i + 1) & 0xff
        val hi = data(if (le) i + 1 else i)
        val s = (hi << 8) | lo
        sum += s
        abs += math.abs(s)
        i += 2
      }
      Some((data.length / 2L / fmt.getChannels, fmt.getSampleRate.toInt,
        fmt.getChannels, sum, abs))
    } catch { case _: Exception => None }
  }

  def decodeAudio: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      decodeAudioInfo(bytes).map { case (n, r, c, s, a) => (n, r, c, s, a) }.orNull
    }

  def synthPcmWavUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (seed: Long, n: Int) => synthPcmWav(seed, n) }

  /** STUB resize (VIDEO frames and other non-ImageIO payloads — for images
    * use [[resizeImageNN]], which is real): a real implementation decodes,
    * resamples to `w x h`, re-encodes. The fake derives the output
    * deterministically by striding the input bytes to exactly `w*h` bytes
    * (sampling with wrap), so output size, determinism, and null/empty
    * behavior — the properties the surrounding plan depends on — are real.
    * Narrow op: no shuffle, payload stays in its partition.
    */
  def resizeStub(w: Int, h: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val out = new Array[Byte](w * h)
        if (bytes.nonEmpty) {
          var i = 0
          while (i < out.length) { out(i) = bytes((i.toLong * bytes.length / out.length).toInt % bytes.length); i += 1 }
        }
        out
      }
    }

  /** STUB frame sampling (video): a real implementation demuxes and decodes
    * every Nth frame. The fake treats the payload as fixed-size `frameLen`
    * chunks and keeps every `everyN`-th — emitting `array<binary>` with the
    * same shape a real sampler produces (frame count = ceil(nChunks/everyN)).
    */
  def frameSampleStub(frameLen: Int, everyN: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val frames = bytes.grouped(frameLen).toArray
        frames.indices.collect { case i if i % everyN == 0 => frames(i) }.toArray
      }
    }

  /** Feature extraction as native Catalyst expressions
    * ([[graft.plans.BinaryExprs]]) — one narrow projection, no RDD hop:
    * column pruning reaches the scan, sibling columns survive, and the plan
    * stays inside Catalyst end to end. Semantics identical to
    * [[fakeDecode]] (spec-pinned).
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import graft.plans.BinaryExprs
    // null payload ≡ empty payload (the fakeDecode contract)
    val p = coalesce(col(payloadCol), lit(Array.emptyByteArray))
    df.select(
      col(idCol).cast("long").alias("id"),
      octet_length(p).cast("long").alias("byte_len"),
      BinaryExprs.byteEntropy(p).alias("byte_entropy"),
      BinaryExprs.headHash(p).alias("head_hash"),
      BinaryExprs.byteBucketHist(p, 8).alias("feature_vec")
    )
  }

  // NOT `private`: Scala `private` compiles to private bytecode, which the
  // generated encoder class (a separate janino class) cannot construct —
  // Spark then silently falls back to the interpreted encoder path.
  private[operators] case class Feat(
      id: Long, byte_len: Long, byte_entropy: Double, head_hash: Long, feature_vec: Array[Float])

  /** Batched per-partition decode — the integration point for a REAL codec
    * (an image/audio decoder is a black-box native call, not an expression).
    * Typed `Dataset.mapPartitions` with encoders, not `df.rdd`: the select
    * below prunes columns before the boundary, and output comes back as a
    * DataFrame without a `createDataFrame` round-trip. The iterator form
    * means one JVM-side pass per partition, payloads GC'd as it advances —
    * the Scala analogue of a pandas-UDF `mapInPandas` stage.
    *
    * The codec here is [[fakeDecode]]; swap its call site for a real decoder.
    */
  def extractFeaturesBatched(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val in = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (len, ent, hh, vec) = fakeDecode(if (bytes == null) Array.emptyByteArray else bytes)
        Feat(id, len, ent, hh, vec)
      }
    }(Encoders.product[Feat]).toDF()
  }
}
