package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY / LLM-pipeline mandate).
  *
  * Media payloads (image/audio/video) are carried as opaque `binary` columns
  * next to typed metadata — the exact layout a 100 TB training-data pipeline
  * uses for parquet-resident media. The Spark-side plumbing here (schema,
  * batch shape, partition-wise decode) is real; the DECODE ITSELF IS A STUB:
  * no media codecs ship in this container, so `decodeStub`/`decodeBatch`
  * derive deterministic fake dimensions from the payload bytes. Swapping in
  * a real decoder (JNI/ffmpeg/ImageIO) changes only the marked function.
  */
/** Typed metadata produced by the (stubbed) decoder. Top-level so Spark's
  * encoder codegen can construct it. */
final case class MediaMeta(
    doc_id: Long, n_bytes: Long, sha: String,
    width: Int, height: Int, frames: Int)

/** Raw media row: id + opaque payload bytes. */
final case class MediaPayload(doc_id: Long, payload: Array[Byte])

object Multimodal {

  /** Attach an opaque binary payload column (stand-in: UTF-8 text bytes —
    * a real pipeline reads these from parquet as-is). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Stub-decoder constants, shared by the columnar and partition-wise
    * paths (SketchSpec asserts the two paths agree — keep them agreeing by
    * construction, not by parallel edits). Also mirrored in the q53/q85
    * oracle SQL. */
  private[multimodal] val WidthBase = 64; private[multimodal] val WidthMod = 1856L
  private[multimodal] val HeightBase = 64; private[multimodal] val HeightMod = 1016L
  private[multimodal] val FrameBase = 1; private[multimodal] val FrameMod = 30L

  /** Columnar decode path: metadata derived entirely by codegen'd built-ins.
    * STUB — fake dimensions are a deterministic function of payload size. */
  def decodeStub(withPayloadDf: DataFrame): DataFrame =
    withPayloadDf
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("sha", sha2(col("payload"), 256))
      .withColumn("width", (lit(WidthBase) + col("n_bytes") % WidthMod).cast("int"))
      .withColumn("height", (lit(HeightBase) + (col("n_bytes") * 7) % HeightMod).cast("int"))
      .withColumn("frames", (lit(FrameBase) + col("n_bytes") % FrameMod).cast("int"))

  /** Deterministic evenly-spaced frame sampling: the k frame indices a
    * frame-sampler decodes from an n-frame video. floor-based (no .5-tie
    * rounding hazards), distinct (k > n collapses to every frame), sorted
    * ascending by construction. Pure codegen'd built-ins — usable inside any
    * query projection. A non-positive frame count (corrupt/empty asset)
    * yields an EMPTY index list, never an out-of-range seek; k must be
    * positive (k = 0 would make sequence(0, -1) DESCEND). */
  def sampleFrameIndices(frames: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    require(k > 0, s"sampleFrameIndices needs k > 0, got $k")
    when(frames <= 0, expr("CAST(array() AS ARRAY<INT>)"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), lit(k - 1)),
        i => floor(i.cast("double") * frames.cast("double") / lit(k)).cast("int"))))
  }

  /** Aspect-preserving resize plan: target (out_w, out_h) struct with the
    * longer side clamped to maxSide (integer math only; never upscales).
    * Zero/negative input dims plan (0, 0) — without the guard, 0/0 is a
    * NaN whose int cast THROWS under ANSI mode (Spark 4 default). */
  def resizePlan(width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column,
      maxSide: Int): org.apache.spark.sql.Column = {
    val degenerate = width <= 0 || height <= 0
    val longSide = greatest(width, height)
    val scaleNum = least(longSide, lit(maxSide)) // numerator of scale = min(long, max)
    val outW = (width * scaleNum) / longSide
    val outH = (height * scaleNum) / longSide
    struct(
      when(degenerate, lit(0)).otherwise(floor(outW).cast("int")).as("out_w"),
      when(degenerate, lit(0)).otherwise(floor(outH).cast("int")).as("out_h"))
  }

  /** Partition-wise decode path: the shape a heavyweight decoder needs — one
    * decoder instance per partition, rows streamed through it in batches.
    * Mirrors PySpark's mapInPandas contract in idiomatic Scala. */
  def decodeBatch(spark: SparkSession, withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id"), col("payload")).as[MediaPayload]
      .mapPartitions { rows =>
        // A real implementation initializes the codec ONCE here:
        //   val decoder = HeavyDecoder.open()   // <-- stubbed below
        rows.map { p =>
          val sha = java.security.MessageDigest.getInstance("SHA-256")
            .digest(p.payload).map("%02x".format(_)).mkString
          val n = p.payload.length.toLong
          // STUB decode from the SHARED constants — must equal decodeStub.
          MediaMeta(p.doc_id, n, sha,
            (WidthBase + n % WidthMod).toInt,
            (HeightBase + (n * 7) % HeightMod).toInt,
            (FrameBase + n % FrameMod).toInt)
        }
      }
  }
}
