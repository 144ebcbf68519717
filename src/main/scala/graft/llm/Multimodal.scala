package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (north-star, SURVEY §7.5): media as opaque
  * `binary` columns + typed metadata, with decode/feature-extraction as
  * a batched per-partition pass.
  *
  * The actual codec libraries are not in this container, so
  * [[decodeStub]] is a clearly-marked deterministic fake — but the
  * Spark-side plumbing is real: binary column schema, case-class
  * encoder, `mapPartitions` batching (one "decoder init" per partition,
  * amortized across rows — the same batch shape a Pandas-UDF/Arrow pass
  * has in PySpark), and the downstream rollup runs on the extracted
  * metadata only, never re-touching the blobs.
  *
  * Scale: blobs never shuffle. The decode pass is narrow
  * (partition-local), metadata is columnar, and any aggregate shuffles
  * only the small typed fields.
  */
object Multimodal {

  /** Typed metadata extracted from a media blob. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       n_frames: Int, channel_mean: Double)

  /** STUB decode: a real implementation would hand `bytes` to an image/
    * audio codec here. This deterministic fake derives plausible fields
    * from the payload so the pipeline shape is testable end-to-end. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = (1 + n % 640).toInt,
      height = (1 + n % 480).toInt,
      n_frames = (1 + n / 1000).toInt,
      // unsigned byte mean — stands in for a channel statistic
      channel_mean =
        if (n == 0) 0.0
        else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n)
  }

  /** documents.text re-cast as a binary media column (the fixture has no
    * real blobs; `encode(text, 'UTF-8')` plays the payload). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
              struct(col("source").as("origin"), col("lang").as("tag")).as("meta"))

  /** Batched decode pass: one iterator per partition (decoder init would
    * live at the top of the lambda), typed Dataset out. */
  def decodeAll(spark: SparkSession, sfDir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real decoder would be constructed once here, per partition
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** STUB resize: a real implementation would hand the decoded frame to
    * an image library; the deterministic fake rescales the metadata.
    * The pipeline shape (typed Dataset in/out, pure per-row transform,
    * no shuffle) is the real part. */
  def resizeStub(m: MediaMeta, maxDim: Int): MediaMeta = {
    val scale = maxDim.toDouble / math.max(m.width, m.height).max(1)
    if (scale >= 1.0) m
    else m.copy(width = math.max(1, (m.width * scale).toInt),
                height = math.max(1, (m.height * scale).toInt))
  }

  /** STUB frame sampling: pick every k-th frame index — a real decoder
    * would seek those frames; the index arithmetic and the exploded
    * (doc_id, frame_idx) output shape are the real plumbing. */
  def sampleFrames(spark: SparkSession, sfDir: String, everyK: Int = 10): Dataset[(Long, Int)] = {
    import spark.implicits._
    decodeAll(spark, sfDir).flatMap { m =>
      (0 until m.n_frames by everyK).map(i => (m.doc_id, i))
    }
  }

  /** Resize pass over the whole corpus (decode → resize, one fused
    * partition-local stage). */
  def resizeAll(spark: SparkSession, sfDir: String, maxDim: Int = 256): Dataset[MediaMeta] = {
    import spark.implicits._
    decodeAll(spark, sfDir).mapPartitions(_.map(m => resizeStub(m, maxDim)))
  }

  /** Oracle-facing query: the decode-stub fields that are pure
    * arithmetic on byte length (width/height/frames), so DuckDB can
    * compute them from octet_length without the stub. channel_mean is
    * exercised in the ScalaTest spec instead (not SQL-expressible
    * without a blob fold). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    decodeAll(spark, sfDir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"), col("n_frames"))
      .orderBy("doc_id")
}
