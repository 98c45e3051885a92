package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, plus the feature-extraction plumbing a training-data
  * pipeline needs (beyond-reference surface; BASELINE.md north star).
  *
  * The Spark side — schema, partition-preserving `mapPartitions`,
  * batch shape, deterministic output — is real and tested. The actual
  * codec is STUBBED: this container has no image/audio libraries, so
  * [[decodeMedia]] throws, and [[extractFeatures]] takes a pluggable
  * decoder defaulting to a deterministic byte-level fake
  * ([[byteHistogram]]). Swapping in a real decoder changes no
  * plumbing: same signature, same schema, same partitioning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** REAL DECODER GOES HERE — requires an imaging/av library absent
    * from this container (prompt-sanctioned stub). */
  def decodeMedia(bytes: Array[Byte], mediaType: String): Nothing =
    throw new NotImplementedError(
      s"no $mediaType codec in this environment - plug a decoder into extractFeatures")

  /** Deterministic stand-in featurizer: 64-bin byte histogram,
    * L1-normalized. Same shape a CNN embedding would have. */
  def byteHistogram(bytes: Array[Byte], dim: Int = 64): Array[Float] = {
    val hist = new Array[Float](dim)
    bytes.foreach(b => hist((b & 0xff) % dim) += 1f)
    val total = math.max(1f, bytes.length.toFloat)
    hist.map(_ / total)
  }

  /** Feature extraction over the binary column: partition-preserving
    * `mapPartitions` (one featurizer instance per partition — the
    * model-loading amortization point for a real decoder), emitting
    * `(media_id, feature: array<float>)`. */
  def extractFeatures(media: DataFrame, dim: Int = 64,
                      featurizer: (Array[Byte], Int) => Array[Float] = byteHistogram)
  : DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val rows = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      // per-partition setup would load the real model here, once
      it.map { r =>
        Row(r.getLong(0), featurizer(r.getAs[Array[Byte]]("bytes"), dim).toSeq)
      }
    }
    spark.createDataFrame(rows, out)
  }

  /** Resize plumbing: emit each media row with payload transformed by
    * a pluggable kernel and the typed metadata updated to the target
    * dimensions — the real implementation decodes, resamples, and
    * re-encodes; the deterministic stand-in strides over the payload so
    * output size tracks the target area the way a resized image would.
    * Partition-preserving, one kernel instance per partition (the
    * model/codec amortization point), same `mediaSchema` out. */
  def resize(media: DataFrame, width: Int, height: Int,
             kernel: (Array[Byte], Int, Int) => Array[Byte] = strideResample)
  : DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "media_type", "bytes", "meta")
      .rdd.mapPartitions { it =>
        // per-partition setup would initialize the real codec here, once
        it.map { r =>
          val meta = r.getStruct(3)
          val dur = if (meta == null || meta.isNullAt(2)) null
                    else java.lang.Long.valueOf(meta.getLong(2))
          Row(r.getLong(0), r.getString(1),
            kernel(r.getAs[Array[Byte]]("bytes"), width, height),
            Row(width, height, dur))
        }
      }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Deterministic resample stand-in: stride-sample the payload down
    * (or repeat it up) to `w*h` bytes. */
  def strideResample(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val area = w.toLong * h.toLong
    require(area <= Int.MaxValue, s"resize target $w x $h overflows Int")
    val target = math.max(1L, area).toInt
    if (bytes.isEmpty) new Array[Byte](target)
    else Array.tabulate(target)(i =>
      bytes(((i.toLong * bytes.length) / target).toInt))
  }

  /** Deterministic frame sampling: split the payload into `nFrames`
    * equal byte ranges (a real implementation decodes and samples
    * video frames — same output schema `(media_id, frame_idx,
    * frame_bytes)`). */
  def frameSample(media: DataFrame, nFrames: Int = 4): DataFrame = {
    // pure Catalyst (no UDF): n equal `step`-byte slices via
    // transform(sequence)+substr, which codegen evaluates in-place on
    // the binary payload — with n = min(nFrames, len) frames of
    // step = len div n bytes each (trailing len mod n bytes dropped,
    // matching a stride-sampled decoder's whole-frame contract)
    val len = length(col("bytes"))
    val n = greatest(lit(1), least(lit(nFrames), len))
    val step = greatest(lit(1), floor(len / n)).cast("int")
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), n - lit(1)),
        i => col("bytes").substr(i * step + lit(1), step)))
        .as(Seq("frame_idx", "frame_bytes")))
  }
}
