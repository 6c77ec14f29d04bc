package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque media bytes + typed metadata. */
final case class MediaRow(
    doc_id: Long,
    media: Array[Byte],
    width: Int,
    height: Int,
    fmt: String)

/** Output of the (stubbed) decoder. */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    mean_byte: Float,
    feature: Array[Float])

/** Multimodal columns (SURVEY.md §2.B / builder prompt): image/audio/video
  * as opaque `binary` columns with typed metadata, decoded/feature-extracted
  * in batch-shaped per-partition passes.
  *
  * No media codecs ship in this container, so [[Multimodal.decodeStub]] is a
  * clearly-marked deterministic FAKE decoder (byte-moment features). The
  * Spark-side plumbing is real and tested: binary column + metadata schema,
  * typed `Dataset[MediaRow]`, per-partition iterator processing (one decoder
  * init per partition — the Scala analog of `mapInPandas` batch shape), and
  * partition-count control so decode parallelism tracks input splits.
  */
object Multimodal {

  /** Synthesize a media table from `documents`: text bytes stand in for an
    * encoded image; metadata derives deterministically from n_chars. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        when(col("source") === "src0", "png")
          .when(col("source") === "src1", "jpeg")
          .otherwise("webp").as("fmt"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (no codec libs in this container). Produces 4 byte-moment
    * "features"; a real implementation would replace ONLY this function,
    * the partitioned plumbing around it is production-shaped. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    var s0 = 0L; var s1 = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      s0 += b; s1 += b.toLong * b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    val n = math.max(bytes.length, 1)
    Array(s0.toFloat / n, s1.toFloat / n, mn.toFloat, mx.toFloat)
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
      // per-partition decoder init would go here (pooled, like the
      // reference's per-sink HTTP client manager)
      rows.map { r =>
        val f = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.media.length, f(0), f)
      }
    }
  }

  /** Rows-only declared query (decoder is a stub, so no SQL oracle): the
    * full pipeline media → decode → per-format feature aggregate. */
  val qMultimodalFeatures: QueryDef = QueryDef.rowsOnly("q_multimodal_features") { (s, d) =>
    import s.implicits._
    val feats = extractFeatures(mediaTable(s, d))
    feats.toDF()
      .select(col("doc_id"), col("n_bytes"), round(col("mean_byte").cast("double"), 4).as("mean_byte"))
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(qMultimodalFeatures)
}
