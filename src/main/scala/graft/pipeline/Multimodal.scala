package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped decode/feature-extract
  * plumbing.
  *
  * The Spark-side design is real and tested: schema, partition-size
  * control, and per-partition batch processing (one decoder init per
  * partition, not per row — the same shape a Pandas-UDF/`mapInPandas`
  * pipeline has in PySpark). The actual byte→pixels/samples decode is a
  * deterministic STUB (`fakeDecode`) because no media codec libraries ship
  * in this environment; swap `fakeDecode` for a real codec call and
  * nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("feature", ArrayType(DoubleType), nullable = true)))

  /** STUB decoder — deterministic fake standing in for a codec call.
    * Returns an 8-bucket byte histogram as the "feature". Real
    * implementation would be `??? /* jpeg/opus/h264 decode */`; the fake
    * keeps the pipeline testable end-to-end.
    */
  private[pipeline] def fakeDecode(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >> 5) += 1d
      i += 1
    }
    if (bytes.length > 0) { var j = 0; while (j < 8) { hist(j) /= bytes.length; j += 1 } }
    hist
  }

  /** Batch decode: one "decoder" per partition, rows processed in a tight
    * loop — the mapInPandas batch shape. Null media → null feature,
    * row preserved (pipelines must not drop rows on decode failure).
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    media.select("media_id", "media", "meta").mapPartitions { it =>
      // decoder init would happen HERE, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val fmt = if (r.isNullAt(2)) null else r.getStruct(2).getString(0)
        if (bytes == null) Row(id, 0L, fmt, null)
        else Row(id, bytes.length.toLong, fmt, fakeDecode(bytes).toSeq)
      }
    }(Encoders.row(decodedSchema))
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true)))

  /** Resize stub — uniform index subsampling of the payload to `outLen`
    * bytes (`out[i] = in[(i·n) div outLen]`, integer arithmetic), the
    * nearest-neighbor downscale a real image resize performs per axis.
    * Same batch shape as [[decodeFeatures]] (one "scaler" init per
    * partition); null media keeps its row with null output, empty media
    * stays empty — the row-preservation invariant. Swap the sampling loop
    * for a codec-backed scaler and nothing else changes.
    */
  def resize(media: DataFrame, outLen: Int): DataFrame = {
    require(outLen > 0, "outLen must be positive")
    media.select("media_id", "media").mapPartitions { it =>
      // scaler init would happen HERE, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        if (bytes == null) Row(id, null)
        else if (bytes.isEmpty) Row(id, Array.empty[Byte])
        else {
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            out(i) = bytes((i.toLong * bytes.length / outLen).toInt)
            i += 1
          }
          Row(id, out)
        }
      }
    }(Encoders.row(resizedSchema))
  }

  /** Frame sampling for video-shaped payloads: every `stride`-th chunk of
    * `chunkBytes` becomes a "frame" row. Pure plumbing (posexplode over a
    * computed chunk index) — the chunk boundaries are where a real
    * demuxer's keyframe offsets would go.
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    require(stride > 0, "stride must be positive")
    media
      .withColumn("n_chunks",
        expr(s"CAST((octet_length(media) + $chunkBytes - 1) DIV $chunkBytes AS INT)"))
      // explode_outer: NULL and EMPTY media both keep their row with a
      // NULL frame_idx/frame (the row-preservation invariant of
      // decodeFeatures — a pipeline must not drop rows); emptiness vs
      // nullness stays distinguishable via the media column itself
      .withColumn("frame_idx",
        explode_outer(when(col("n_chunks") > 0,
          sequence(lit(0), col("n_chunks") - 1, lit(stride)))))
      .select(col("media_id"), col("frame_idx"),
        when(col("frame_idx").isNotNull,
          col("media").substr(col("frame_idx") * chunkBytes + 1, lit(chunkBytes)))
          .as("frame"))
  }
}
