package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) travels as an opaque `binary` column with typed
  * metadata; decode / feature-extract / resize / frame-sample run inside
  * `mapPartitions` with explicit micro-batching — the Scala analogue of a
  * Pandas-UDF `mapInPandas` stage (per-batch setup amortization, bounded
  * memory per batch). The DECODE step is a clearly-marked deterministic stub
  * (no image/audio codecs in this container); everything Spark-side — the
  * schema, the batch shape, the partition behavior, the feature math over
  * decoded bytes — is real and oracle/test-verified.
  *
  * Scale: all stages are narrow (no shuffle); media bytes never leave their
  * input partition until an explicit aggregation. At 100 TB the decode-stub
  * swap-in (a real codec) changes only `decodeStub`.
  */
object Multimodal {

  /** Rows processed per inner batch inside a partition — the `mapInPandas`
    * Arrow-batch analogue. Amortizes per-batch decoder setup and bounds
    * per-batch memory to batchSize x max media size. */
  val BatchSize = 64

  val featureDim = 16

  /** DECODE STUB: a real implementation would hand bytes to a codec
    * (JPEG/PNG/opus/...) and return pixel/sample buffers. Deterministic
    * identity stand-in so downstream feature math is testable. */
  private def decodeStub(media: Array[Byte]): Array[Byte] = media

  /** Feature extraction over decoded bytes: 16-bin byte histogram
    * (bin = byte >> 4 for 7-bit text bytes), L1-normalized. Deterministic,
    * so the DuckDB oracle can recompute chosen bins with regexp counts. */
  def extractFeatures(decoded: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](featureDim)
    var i = 0
    while (i < decoded.length) {
      val b = decoded(i) & 0xff
      hist((b >> 4) & (featureDim - 1)) += 1f
      i += 1
    }
    if (decoded.length > 0) {
      var j = 0
      while (j < featureDim) { hist(j) /= decoded.length; j += 1 }
    }
    hist
  }

  /** "Frame sample": every strideth byte, up to maxFrames — the shape of
    * sampling frames from a video container (stub semantics over bytes). */
  def frameSample(decoded: Array[Byte], stride: Int, maxFrames: Int): Array[Byte] =
    decoded.indices.by(stride).take(maxFrames).map(decoded(_)).toArray

  /** "Resize" to a fixed target length: nearest-neighbor downsample over the
    * byte buffer (the 1-D analogue of nearest-neighbor image resize; a real
    * implementation would interpolate pixels after decode). Output length is
    * exactly `target` for any non-empty input — the fixed-shape contract a
    * training pipeline needs before batching tensors. */
  def resize(decoded: Array[Byte], target: Int): Array[Byte] = {
    if (decoded.isEmpty || target <= 0) Array.emptyByteArray
    else {
      val out = new Array[Byte](target)
      var i = 0
      while (i < target) {
        out(i) = decoded(((i.toLong * decoded.length) / target).toInt)
        i += 1
      }
      out
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("frame_fingerprint", LongType, nullable = false)))

  /** media (binary) -> typed metadata + features + frame fingerprint, in
    * explicit batches inside each partition. Input df must have columns
    * (doc_id: long, media: binary, mime_type: string). */
  def processMedia(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select("doc_id", "media", "mime_type").rdd.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // per-batch setup would live here (decoder init) — amortized like
        // a pandas UDF's per-Arrow-batch setup
        batch.iterator.map { r =>
          val docId = r.getLong(0)
          val media = r.getAs[Array[Byte]](1)
          val mime = r.getString(2)
          val decoded = decodeStub(media)
          val features = extractFeatures(decoded)
          val frames = frameSample(decoded, stride = 7, maxFrames = 32)
          // order-sensitive rolling hash of sampled "frames"
          val fp = frames.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xff))
          Row(docId, mime, media.length.toLong, features.toSeq, fp)
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** The documents table dressed as a media table: utf-8 bytes as the opaque
    * payload (the container has no codecs — see decodeStub). */
  def documentsAsMedia(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("media"),
        lit("text/plain;fake=1").as("mime_type"))
}
