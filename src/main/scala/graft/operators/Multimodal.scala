package graft.operators

import graft.{QueryDef, Tables}
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque media bytes + typed metadata. */
final case class MediaRow(
    doc_id: Long,
    media: Array[Byte],
    width: Int,
    height: Int,
    fmt: String)

/** Decoder output: container stats + per-channel pixel means. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    mean_r: Double,
    mean_g: Double,
    mean_b: Double)

/** Multimodal columns (SURVEY.md §2.B / builder prompt): image/audio/video
  * as opaque `binary` columns with typed metadata, decoded/feature-extracted
  * in batch-shaped per-partition passes.
  *
  * The decode is REAL: media is a genuine PNG/BMP byte stream (encoded with
  * `javax.imageio`, the only codec stack in this container) and
  * [[Multimodal.decode]] reads it back pixel-by-pixel. The synthesized
  * images are solid-color with channel values derived from `doc_id`, so the
  * decoded per-channel means are integer-exact and the whole
  * encode→binary-column→partitioned-decode pipeline is verified by a DuckDB
  * oracle computing the same values from metadata alone — a hash mismatch
  * anywhere in codec, schema, or plumbing fails the gate.
  *
  * Scale shape: encode and decode run in `mapPartitions` (one codec init
  * per partition — the Scala analog of `mapInPandas` batch processing);
  * media bytes never enter a shuffle key; decode parallelism tracks input
  * splits.
  */
object Multimodal {

  /** ImageIO defaults to disk-backed stream caching: every read/write spins
    * up a temp FILE, ~ms of filesystem work per image — at a few thousand
    * images per task that dominates decode itself. All images here pass
    * through in-memory byte arrays, so the cache buys nothing. One-time
    * JVM-wide switch, forced on first codec use in each executor. */
  private lazy val inMemoryStreams: Unit = ImageIO.setUseCache(false)

  /** Deterministic channel color for a doc: (r, g, b) from doc_id. */
  private def rgb(docId: Long): (Int, Int, Int) =
    ((docId % 256).toInt, (docId * 7 % 256).toInt, (docId * 13 % 256).toInt)

  /** Encode a solid-color image of the given size as PNG or BMP bytes. */
  def encodeImage(docId: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    inMemoryStreams
    val (r, g, b) = rgb(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(r, g, b))
    gfx.fillRect(0, 0, w, h)
    gfx.dispose()
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"no imageio writer for '$fmt'")
    out.toByteArray
  }

  /** Real image decode: parse the container, read every pixel, return
    * (width, height, bands, per-band means). Throws on undecodable bytes —
    * a corrupt media column should fail loudly, not yield fake features. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    inMemoryStreams
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable media (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val sums = new Array[Long](bands)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < bands) { sums(c) += raster.getSample(x, y, c); c += 1 }
        x += 1
      }
      y += 1
    }
    (w, h, bands, sums.map(_.toDouble / (w.toLong * h)))
  }

  /** Synthesize a media table from `documents`: a real encoded PNG (src0)
    * or BMP (others) per document; dimensions derive from n_chars. Encoding
    * runs per partition (one codec init per split). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // malformed media records (no id / no size metadata) are skipped at
      // the ingest seam — they cannot cross the non-nullable typed boundary
      .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        when(col("source") === "src0", "png").otherwise("bmp").as("fmt"))
      .as[(Long, Long, String)]
      // codec work scales with cores, not input splits: `documents` arrives
      // as one small parquet split, which would serialize every encode on a
      // single task. The exchange carries only (id, n_chars, fmt) — the
      // media bytes are generated after it.
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        // per-partition codec init would go here (pooled, like the
        // reference's per-sink HTTP client manager)
        rows.map { case (id, nChars, fmt) =>
          val w = (nChars % 64 + 1).toInt
          val h = (nChars % 48 + 1).toInt
          MediaRow(id, encodeImage(id, w, h, fmt), w, h, fmt)
        }
      }
  }

  /** Encode a 2-D gradient image: per-pixel channels are closed-form
    * functions of (doc_id, x, y) — r varies with x, g with y, b constant —
    * so any pixel-sampling operator downstream has a metadata-computable
    * oracle while still exercising a real codec round-trip. */
  def encodeGradient(docId: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    inMemoryStreams
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId + x) % 256).toInt)
        raster.setSample(x, y, 1, ((docId * 7 + 3 * y) % 256).toInt)
        raster.setSample(x, y, 2, (docId * 13 % 256).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"no imageio writer for '$fmt'")
    out.toByteArray
  }

  /** Gradient media table: same schema/partitioning as [[mediaTable]], but
    * pixels vary within each image (losslessly encoded: PNG/BMP only). */
  def gradientMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // malformed media records (no id / no size metadata) are skipped at
      // the ingest seam — they cannot cross the non-nullable typed boundary
      .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"),
        when(col("source") === "src0", "png").otherwise("bmp").as("fmt"))
      .as[(Long, Long, String)]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { case (id, nChars, fmt) =>
          val w = (nChars % 64 + 1).toInt
          val h = (nChars % 48 + 1).toInt
          MediaRow(id, encodeGradient(id, w, h, fmt), w, h, fmt)
        }
      }
  }

  /** Resize-sample + 64-bit average-hash: decode, nearest-neighbor sample
    * a `grid`×`grid` lattice (the resize step — top-left rule, x = i·w/grid,
    * integer floor, so it is exactly reproducible), integer luma per sample
    * (`(299r + 587g + 114b) / 1000`), threshold against the mean. This is
    * the standard aHash perceptual fingerprint: near-identical images land
    * within a few Hamming bits, so the [[graft.api.TextDedup.simhashPairs]]
    * banding machinery applies unchanged to image near-dup at 100 TB.
    * Lossy-codec robustness is pinned in OperatorSpec: a JPEG re-encode of
    * the same image (ImageIO default quality) hashes within 3 bits of the
    * lossless hash — inside the default maxHamming=8 search budget. */
  def averageHash(bytes: Array[Byte], grid: Int = 8): Long = {
    inMemoryStreams
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable media (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val lumas = new Array[Int](grid * grid)
    var i = 0
    while (i < grid) {
      val x = i * w / grid
      var j = 0
      while (j < grid) {
        val y = j * h / grid
        lumas(i * grid + j) =
          (raster.getSample(x, y, 0) * 299 + raster.getSample(x, y, 1) * 587 +
            raster.getSample(x, y, 2) * 114) / 1000
        j += 1
      }
      i += 1
    }
    val mean = lumas.sum.toDouble / (grid * grid)
    var hash = 0L
    var k = 0
    while (k < grid * grid) {
      if (lumas(k) > mean) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** WAV codec providers resolved ONCE per JVM: `AudioSystem.write`/
    * `getAudioInputStream` re-scan the service-provider registry on every
    * call (~1 ms each — at thousands of clips per task the scan dominates
    * the actual PCM work; profiled 6.2 s → ~1 s at sf0.1). Same pooled-
    * codec-init pattern as the reference's per-sink HTTP client manager. */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer provider"))
  }
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWavBytes(0L, 4)
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala
      .find { r =>
        try { r.getAudioInputStream(new ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      .getOrElse(throw new IllegalStateException("no WAVE reader provider"))
  }

  private def encodeWavBytes(docId: Long, nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var n = 0
    while (n < nSamples) {
      val s = (((docId * 31 + n.toLong * 17) % 65536) - 32768).toInt
      pcm(2 * n) = (s & 0xff).toByte          // little-endian int16
      pcm(2 * n + 1) = ((s >> 8) & 0xff).toByte
      n += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    wavWriter.write(stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Encode a mono 16-bit PCM WAV through the real `javax.sound` container
    * writer. Samples are a closed-form function of (doc_id, n) —
    * `((doc_id·31 + n·17) mod 65536) − 32768`, a deterministic sawtooth —
    * so waveform statistics computed after a real container decode have a
    * metadata-only oracle, the same pattern as the gradient images. */
  def encodeWav(docId: Long, nSamples: Int): Array[Byte] =
    encodeWavBytes(docId, nSamples)

  /** Real audio decode: parse the WAV container via `javax.sound`, read
    * every PCM frame, return (n_samples, sample_rate, channels, peak, rms).
    * Throws on an unparsable container — same loud-failure contract as
    * [[decode]]. */
  def decodeWav(bytes: Array[Byte]): (Long, Int, Int, Int, Double) = {
    val in = wavReader.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"expected 16-bit LE PCM, got $fmt")
    val raw = in.readAllBytes()
    val nSamples = raw.length / 2
    var peak = 0
    var sumSq = 0L
    var n = 0
    while (n < nSamples) {
      val s = ((raw(2 * n) & 0xff) | (raw(2 * n + 1) << 8)).toShort.toInt
      if (math.abs(s) > peak) peak = math.abs(s)
      sumSq += s.toLong * s
      n += 1
    }
    (nSamples.toLong, fmt.getSampleRate.toInt, fmt.getChannels, peak,
      math.sqrt(sumSq.toDouble / nSamples))
  }

  /** Frame sampling: n equal-sized byte slices (video frame-sample shape). */
  def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val step = math.max(bytes.length / math.max(n, 1), 1)
    (0 until n).map(i => bytes.slice(i * step, math.min(i * step + step, bytes.length)))
  }

  /** Batch feature extraction: one decoder per partition, iterator-shaped. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, bands, means) = decode(r.media)
        MediaFeatures(r.doc_id, r.media.length, w, h, bands,
          means(0), if (bands > 1) means(1) else means(0),
          if (bands > 2) means(2) else means(0))
      }
    }
  }

  /** Declared query: media → real decode → per-image stats, oracle-checked
    * against the metadata-derived closed form (solid-color images make the
    * channel means integer-exact). `n_bytes` is container-dependent and
    * deliberately excluded. */
  val qMultimodalFeatures: QueryDef = QueryDef.sql(
    "q_multimodal_features",
    """SELECT doc_id,
      |       CAST(n_chars % 64 + 1 AS INTEGER) AS width,
      |       CAST(n_chars % 48 + 1 AS INTEGER) AS height,
      |       3 AS channels,
      |       round(CAST(doc_id % 256 AS DOUBLE), 4) AS mean_r,
      |       round(CAST(doc_id * 7 % 256 AS DOUBLE), 4) AS mean_g,
      |       round(CAST(doc_id * 13 % 256 AS DOUBLE), 4) AS mean_b
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    extractFeatures(mediaTable(s, d)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("doc_id")
  }

  /** Declared query: gradient media → real decode → resize-sample →
    * average-hash, split into two 32-bit halves (a 64-bit hash can set bit
    * 63; BIGINT `1<<63` overflows in ANSI engines, and the halves keep
    * every value positive in both). The oracle recomputes the sampled
    * lumas from the gradient's closed form — a mismatch anywhere in the
    * codec round-trip, the sampling lattice, the luma arithmetic, or the
    * thresholding fails the gate. */
  val qImagePhash: QueryDef = QueryDef.sql(
    "q_image_phash",
    """WITH m AS (SELECT doc_id, n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents),
      |g AS (SELECT unnest(range(0, 8)) AS i),
      |px AS (
      |  SELECT doc_id,
      |         CAST(gi.i * 8 + gj.i AS INTEGER) AS idx,
      |         (((doc_id + (gi.i * w) // 8) % 256) * 299 +
      |          ((doc_id * 7 + 3 * ((gj.i * h) // 8)) % 256) * 587 +
      |          ((doc_id * 13) % 256) * 114) // 1000 AS luma
      |  FROM m, g gi, g gj
      |),
      |mu AS (SELECT doc_id, sum(luma) / 64.0 AS mu FROM px GROUP BY doc_id)
      |SELECT p.doc_id,
      |       bit_or(CASE WHEN p.luma > mu.mu AND p.idx >= 32
      |                   THEN CAST(1 AS BIGINT) << (p.idx - 32) ELSE CAST(0 AS BIGINT) END) AS phash_hi,
      |       bit_or(CASE WHEN p.luma > mu.mu AND p.idx < 32
      |                   THEN CAST(1 AS BIGINT) << p.idx ELSE CAST(0 AS BIGINT) END) AS phash_lo
      |FROM px p JOIN mu ON mu.doc_id = p.doc_id
      |GROUP BY p.doc_id
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    gradientMediaTable(s, d)
      .mapPartitions { rows =>
        rows.map { r =>
          val hash = averageHash(r.media)
          (r.doc_id, hash >>> 32, hash & 0xFFFFFFFFL)
        }
      }
      .toDF("doc_id", "phash_hi", "phash_lo")
      .orderBy("doc_id")
  }

  /** Declared query: per-document WAV (n_chars samples) → real container
    * decode → waveform stats. The oracle regenerates each sample from the
    * closed form and recomputes peak/rms — container header, PCM byte
    * order, and the frame loop are all inside the hash gate. */
  val qAudioFeatures: QueryDef = QueryDef.sql(
    "q_audio_features",
    """WITH k AS (
      |  SELECT doc_id, unnest(range(0, n_chars)) AS n FROM documents
      |),
      |s AS (
      |  SELECT doc_id, ((doc_id * 31 + n * 17) % 65536) - 32768 AS smp FROM k
      |)
      |SELECT doc_id,
      |       count(*) AS n_samples,
      |       8000 AS sample_rate,
      |       1 AS channels,
      |       CAST(max(abs(smp)) AS INTEGER) AS peak,
      |       round(sqrt(sum(smp * smp) / count(*)), 4) AS rms
      |FROM s
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val wav = encodeWav(id, nChars.toInt)
          val (n, rate, ch, peak, rms) = decodeWav(wav)
          (id, n, rate, ch, peak, rms)
        }
      }
      .toDF("doc_id", "n_samples", "sample_rate", "channels", "peak", "rms")
      .select(col("doc_id"), col("n_samples"), col("sample_rate"),
        col("channels"), col("peak"), round(col("rms"), 4).as("rms"))
      .orderBy("doc_id")
  }

  /** Declared query: per-document "video" — a container of 2–4 real PNG
    * frames (concatenated, with a typed frame-offset index, the
    * binary-plus-metadata shape the multimodal contract prescribes) —
    * frame-extracted by offset slice and REALLY decoded per frame. Frame f
    * is a solid color derived from (doc_id + 131·f), so per-frame means
    * have a closed-form oracle: container assembly, the offset index, the
    * slice extraction, and the per-frame codec are all hash-gated. */
  val qVideoFrames: QueryDef = QueryDef.sql(
    "q_video_frames",
    """WITH f AS (
      |  SELECT doc_id, n_chars, unnest(range(0, (n_chars % 3) + 2)) AS frame
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(frame AS INTEGER) AS frame,
      |       CAST(n_chars % 16 + 1 AS INTEGER) AS width,
      |       CAST(n_chars % 12 + 1 AS INTEGER) AS height,
      |       round(CAST((doc_id + 131 * frame) % 256 AS DOUBLE), 4) AS mean_r,
      |       round(CAST((doc_id + 131 * frame) * 7 % 256 AS DOUBLE), 4) AS mean_g,
      |       round(CAST((doc_id + 131 * frame) * 13 % 256 AS DOUBLE), 4) AS mean_b
      |FROM f
      |ORDER BY doc_id, frame""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .where(col("doc_id").isNotNull && col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .repartition(s.sparkContext.defaultParallelism)
      .flatMap { case (id, nChars) =>
        val nF = (nChars % 3 + 2).toInt
        val w = (nChars % 16 + 1).toInt
        val h = (nChars % 12 + 1).toInt
        // container assembly: concatenated real PNG frames + offset index
        val frames = (0 until nF).map(f => encodeImage(id + 131L * f, w, h, "png"))
        val offsets = frames.scanLeft(0)(_ + _.length)
        val media = Array.concat(frames: _*)
        // extraction under test: slice frame f out of the container by its
        // offsets and decode it with the real codec
        (0 until nF).map { f =>
          val bytes = java.util.Arrays.copyOfRange(media, offsets(f), offsets(f + 1))
          val (dw, dh, _, means) = decode(bytes)
          (id, f, dw, dh, means(0), means(1), means(2))
        }
      }
      .toDF("doc_id", "frame", "width", "height", "mean_r", "mean_g", "mean_b")
      .select(col("doc_id"), col("frame"), col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("doc_id", "frame")
  }

  /** Image near-duplicate detection: the text-dedup LSH machinery applied
    * to the perceptual hash — REAL codec decode → 64-bit average-hash →
    * four 16-bit bands → per-band equi-join (doc₁ < doc₂, degenerate
    * buckets > 64 dropped lazily, the `BucketCap` semantics mirrored in
    * the oracle) → exact Hamming verify ≤ 2 on the full hash. The
    * cross-modal composition a 100 TB crawl pipeline runs to collapse
    * re-encoded/resized copies of the same image: cost ∝ candidate pairs
    * within capped buckets, never all-pairs; only 16-byte (doc_id, band,
    * value) rows shuffle — pixels stay in the decode stage. Oracle
    * recomputes the hash from the gradient closed form (the
    * `q_image_phash` gate) and replays banding/cap/Hamming in SQL. */
  val qImageNeardup: QueryDef = QueryDef.sql(
    "q_image_neardup",
    """WITH m AS (SELECT doc_id, n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents),
      |g AS (SELECT unnest(range(0, 8)) AS i),
      |px AS (
      |  SELECT doc_id,
      |         CAST(gi.i * 8 + gj.i AS INTEGER) AS idx,
      |         (((doc_id + (gi.i * w) // 8) % 256) * 299 +
      |          ((doc_id * 7 + 3 * ((gj.i * h) // 8)) % 256) * 587 +
      |          ((doc_id * 13) % 256) * 114) // 1000 AS luma
      |  FROM m, g gi, g gj
      |),
      |mu AS (SELECT doc_id, sum(luma) / 64.0 AS mu FROM px GROUP BY doc_id),
      |fp AS (
      |  SELECT p.doc_id,
      |       bit_or(CASE WHEN p.luma > mu.mu AND p.idx >= 32
      |                   THEN CAST(1 AS BIGINT) << (p.idx - 32) ELSE CAST(0 AS BIGINT) END) AS hi,
      |       bit_or(CASE WHEN p.luma > mu.mu AND p.idx < 32
      |                   THEN CAST(1 AS BIGINT) << p.idx ELSE CAST(0 AS BIGINT) END) AS lo
      |  FROM px p JOIN mu ON mu.doc_id = p.doc_id
      |  GROUP BY p.doc_id
      |),
      |bands AS (
      |  SELECT doc_id, b AS band,
      |         CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
      |                WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bv
      |  FROM fp, (SELECT unnest(range(0, 4)) AS b) g
      |),
      |big AS (SELECT band, bv FROM bands GROUP BY band, bv HAVING count(*) > 64),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
      |  WHERE NOT EXISTS (SELECT 1 FROM big g WHERE g.band = x.band AND g.bv = x.bv)
      |)
      |SELECT c.a, c.b,
      |       CAST(bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo)) AS INTEGER) AS hamming
      |FROM cand c JOIN fp fa ON fa.doc_id = c.a JOIN fp fb ON fb.doc_id = c.b
      |WHERE bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo)) <= 2
      |ORDER BY c.a, c.b""".stripMargin) { (s, d) =>
    imagePairs(s, d).orderBy("a", "b")
  }

  /** The image near-dup pair pipeline (decode → phash → banded LSH →
    * Hamming ≤ 2 verify), shared by [[qImageNeardup]] and the cross-modal
    * composition [[qCrossmodalDedup]]. Returns (a, b, hamming). */
  private[operators] def imagePairs(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val fp = graft.Persisting.maybe(
      gradientMediaTable(s, d)
        .mapPartitions { rows =>
          rows.map { r =>
            val h = averageHash(r.media)
            (r.doc_id, h >>> 32, h & 0xFFFFFFFFL)
          }
        }
        .toDF("doc_id", "hi", "lo"))
    val bands = fp.select(col("doc_id"), posexplode(array(
        col("lo").bitwiseAND(65535),
        shiftright(col("lo"), 16).bitwiseAND(65535),
        col("hi").bitwiseAND(65535),
        shiftright(col("hi"), 16).bitwiseAND(65535))))
      .toDF("doc_id", "band", "bv")
    val big = bands.groupBy("band", "bv")
      .agg(count(lit(1)).as("n")).where(col("n") > 64).select("band", "bv")
    val ok = bands.join(big, Seq("band", "bv"), "left_anti")
    val cand = ok.select(col("band"), col("bv"), col("doc_id").as("a"))
      .join(ok.select(col("band"), col("bv"), col("doc_id").as("b")), Seq("band", "bv"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(fp.select(col("doc_id").as("a"), col("hi").as("ha"), col("lo").as("la")), "a")
      .join(fp.select(col("doc_id").as("b"), col("hi").as("hb"), col("lo").as("lb")), "b")
      .withColumn("hamming",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("int"))
      .where(col("hamming") <= 2)
      .select("a", "b", "hamming")
  }

  /** Cross-modal near-dup composition — the crawl-pipeline shape that
    * collapses a page when EITHER modality duplicates: text SimHash pairs
    * (`q_dedup_simhash` derivation) full-outer-joined with image phash
    * pairs ([[imagePairs]], the `q_image_neardup` derivation) on the
    * shared (a, b) doc pair, with per-modality flags and Hamming
    * distances (-1 = not detected by that modality). Scale shape: both
    * inputs are banding-capped candidate sets verified before this join,
    * so the composition joins two pair tables several orders of magnitude
    * smaller than the corpus — adding a modality costs one pair-keyed
    * shuffle, not another corpus pass. Oracle replays BOTH derivations
    * (image CTEs i-prefixed to avoid name capture). */
  /** Oracle CTE chain shared by the cross-modal queries: derives the text
    * SimHash pair set `tp` (the `q_dedup_simhash` derivation) and the
    * image phash pair set `ip` (the `q_image_neardup` derivation,
    * i-prefixed to avoid name capture). */
  private val crossmodalPairsCtes: String = {
    import graft.functions.CrossHash.md5LongSql
    s"""${Corpora.dedupCorpusCte},
         |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         |wc AS (
         |  SELECT doc_id, word, count(*) AS cnt
         |  FROM tok, unnest(w) AS u(word)
         |  GROUP BY doc_id, word
         |),
         |wh AS (SELECT doc_id, ${md5LongSql("word")} AS h, cnt FROM wc),
         |bs AS (
         |  SELECT doc_id,
         |         ${(0 until 48).map(i => s"sum(cnt * (2 * ((h >> $i) & 1) - 1)) AS s$i").mkString(",\n         ")}
         |  FROM wh GROUP BY doc_id
         |),
         |fp AS (
         |  SELECT doc_id,
         |         ${(0 until 48).map(i => s"(CASE WHEN s$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)").mkString(" + ")} AS f
         |  FROM bs
         |),
         |sbands AS (
         |  SELECT doc_id, b AS band, (f >> (12 * b)) & 4095 AS bv
         |  FROM fp, (SELECT unnest(range(0, 4)) AS b) g
         |),
         |sbig AS (
         |  SELECT band, bv FROM sbands GROUP BY band, bv HAVING count(*) > 10000
         |),
         |scand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM sbands x JOIN sbands y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sbig g WHERE g.band = x.band AND g.bv = x.bv)
         |),
         |tp AS (
         |  SELECT c.a, c.b, CAST(bit_count(xor(fa.f, fb.f)) AS INTEGER) AS th
         |  FROM scand c
         |  JOIN fp fa ON fa.doc_id = c.a
         |  JOIN fp fb ON fb.doc_id = c.b
         |  WHERE bit_count(xor(fa.f, fb.f)) <= 8
         |),
         |im AS (SELECT doc_id, n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents),
         |ig AS (SELECT unnest(range(0, 8)) AS i),
         |ipx AS (
         |  SELECT doc_id,
         |         CAST(gi.i * 8 + gj.i AS INTEGER) AS idx,
         |         (((doc_id + (gi.i * w) // 8) % 256) * 299 +
         |          ((doc_id * 7 + 3 * ((gj.i * h) // 8)) % 256) * 587 +
         |          ((doc_id * 13) % 256) * 114) // 1000 AS luma
         |  FROM im, ig gi, ig gj
         |),
         |imu AS (SELECT doc_id, sum(luma) / 64.0 AS mu FROM ipx GROUP BY doc_id),
         |ifp AS (
         |  SELECT p.doc_id,
         |       bit_or(CASE WHEN p.luma > imu.mu AND p.idx >= 32
         |                   THEN CAST(1 AS BIGINT) << (p.idx - 32) ELSE CAST(0 AS BIGINT) END) AS hi,
         |       bit_or(CASE WHEN p.luma > imu.mu AND p.idx < 32
         |                   THEN CAST(1 AS BIGINT) << p.idx ELSE CAST(0 AS BIGINT) END) AS lo
         |  FROM ipx p JOIN imu ON imu.doc_id = p.doc_id
         |  GROUP BY p.doc_id
         |),
         |ibands AS (
         |  SELECT doc_id, b AS band,
         |         CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
         |                WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS bv
         |  FROM ifp, (SELECT unnest(range(0, 4)) AS b) g
         |),
         |ibig AS (SELECT band, bv FROM ibands GROUP BY band, bv HAVING count(*) > 64),
         |icand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM ibands x JOIN ibands y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM ibig g WHERE g.band = x.band AND g.bv = x.bv)
         |),
         |ip AS (
         |  SELECT c.a, c.b,
         |         CAST(bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo)) AS INTEGER) AS ih
         |  FROM icand c
         |  JOIN ifp fa ON fa.doc_id = c.a
         |  JOIN ifp fb ON fb.doc_id = c.b
         |  WHERE bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo)) <= 2
         |)""".stripMargin
  }

  val qCrossmodalDedup: QueryDef = QueryDef.sql(
    "q_crossmodal_dedup",
    s"""WITH $crossmodalPairsCtes
       |SELECT coalesce(tp.a, ip.a) AS a, coalesce(tp.b, ip.b) AS b,
         |       CAST(tp.a IS NOT NULL AS INTEGER) AS dup_text,
         |       CAST(ip.a IS NOT NULL AS INTEGER) AS dup_image,
         |       CAST(coalesce(tp.th, -1) AS INTEGER) AS text_hamming,
         |       CAST(coalesce(ip.ih, -1) AS INTEGER) AS image_hamming
         |FROM tp FULL OUTER JOIN ip ON tp.a = ip.a AND tp.b = ip.b
         |ORDER BY a, b""".stripMargin) { (s, d) =>
    val tp = textPairs(s, d).select(col("a"), col("b"), col("hamming").as("th"))
    val ip = imagePairs(s, d).select(col("a"), col("b"), col("hamming").as("ih"))
    tp.join(ip, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        col("th").isNotNull.cast("int").as("dup_text"),
        col("ih").isNotNull.cast("int").as("dup_image"),
        coalesce(col("th"), lit(-1)).cast("int").as("text_hamming"),
        coalesce(col("ih"), lit(-1)).cast("int").as("image_hamming"))
      .orderBy("a", "b")
  }

  /** The text near-dup pair pipeline (the `q_dedup_simhash` derivation),
    * shared by the cross-modal queries. Returns (a, b, hamming). */
  private[operators] def textPairs(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val fp = graft.api.TextDedup
      .simhash(Corpora.dedupCorpus(s, d), col("doc_id"), col("text"), bits = 48)
      .transform(graft.Persisting.maybe)
    graft.api.TextDedup.simhashPairs(fp, bands = 4, bitsPerBand = 12, maxHamming = 8)
  }

  /** Cross-modal duplicate CLUSTERS: connected components over the UNION
    * of both modality pair sets — the step after [[qCrossmodalDedup]] in
    * the crawl pipeline: a page joins a cluster when a chain of text OR
    * image duplications links it, and the cluster's minimum doc_id is the
    * canonical keeper. Spark side is the same pointer-jumping min-label
    * propagation as `q_dedup_cluster` (O(log diameter) rounds, lineage
    * capped); the oracle replays both pair derivations and closes them
    * with one recursive transitive closure. */
  val qCrossmodalCluster: QueryDef = QueryDef.sql(
    "q_crossmodal_cluster",
    s"""WITH RECURSIVE $crossmodalPairsCtes,
       |allp AS (SELECT a, b FROM tp UNION SELECT a, b FROM ip),
       |e2 AS (SELECT a AS s, b AS t FROM allp UNION ALL SELECT b AS s, a AS t FROM allp),
       |reach AS (
       |  SELECT s AS src, t AS dst FROM e2
       |  UNION
       |  SELECT r.src, e.t FROM reach r JOIN e2 e ON e.s = r.dst
       |)
       |SELECT src AS id, least(src, min(dst)) AS component
       |FROM reach
       |GROUP BY src
       |ORDER BY id""".stripMargin) { (s, d) =>
    val pairs = textPairs(s, d).select("a", "b")
      .unionByName(imagePairs(s, d).select("a", "b"))
      .distinct()
    // driverCutoff: the gradient phash pairs chain consecutive ids into
    // ONE near-corpus-wide component, so the distributed loop is
    // round-count-bound (~8 rounds of fixed job overhead for a tiny edge
    // list). Below 2^20 pairs (16 MB) the driver union-find is strictly
    // cheaper than any number of rounds; past the cutoff the same call
    // runs the distributed pointer-jumping loop unchanged.
    graft.api.TextDedup.connectedComponents(pairs, driverCutoff = 1 << 20).orderBy("id")
  }

  val all: Seq[QueryDef] = Seq(
    qMultimodalFeatures, qImagePhash, qAudioFeatures, qVideoFrames, qImageNeardup,
    qCrossmodalDedup, qCrossmodalCluster)
}
