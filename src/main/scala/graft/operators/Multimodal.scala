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

  val all: Seq[QueryDef] = Seq(qMultimodalFeatures)
}
