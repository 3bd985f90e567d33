package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed per-partition in batches.
  *
  * The actual codec is STUBBED (this environment has no image/audio
  * libraries): [[FakeCodec.decode]] derives deterministic "pixels" from
  * the bytes. Everything around it is the real 100 TB-shape plumbing:
  *
  *  - payloads stay in `BinaryType` columns (columnar parquet, never
  *    stringified);
  *  - decode runs via `mapPartitions` over row batches — the Scala
  *    analog of `mapInPandas`: one codec init per partition, streaming
  *    iterator (no materialized partition), output schema declared
  *    up-front;
  *  - partition sizing is the caller's lever: repartition by byte budget
  *    before decoding so a partition's batch fits executor memory.
  */
object Multimodal {

  /** Stand-in codec. Swap `decode` for a real JNI/lib call; the Spark
    * plumbing does not change.
    */
  object FakeCodec {
    /** Fake-dimension formula constants — shared with the Column/SQL
      * reimplementations in [[MultimodalQueries]] so the three copies
      * can't drift.
      */
    val DimMod = 64
    val DimBase = 16
    val HeightMul = 7

    /** Deterministic fake "image decode": dims + a checksum-ish pixel
      * stat derived only from the payload bytes.
      */
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      val w = (payload.length % DimMod) + DimBase
      val h = ((payload.length * HeightMul) % DimMod) + DimBase
      var acc = 0L
      var i = 0
      while (i < payload.length) { acc = acc * 31 + (payload(i) & 0xff); i += 1 }
      (w, h, acc)
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_acc", LongType)))

  /** Batched decode over (doc_id: long, payload: binary) rows. */
  def decodeImages(withPayload: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // one codec "handle" per partition, rows streamed through it
        rows.map { r =>
          val (w, h, acc) = FakeCodec.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), w, h, acc)
        }
      }(enc)
  }

  /** Aspect-preserving resize planning: given decoded (width, height)
    * and a bounding box, compute output dims + scale — the pure-metadata
    * half of a resize (the pixel resample itself belongs in the codec
    * stub). Set-based arithmetic, stays in codegen.
    */
  def resizePlan(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(1.0),
      least(lit(maxW) / col("width").cast(DoubleType),
        lit(maxH) / col("height").cast(DoubleType)))
    decoded
      .withColumn("scale", scale)
      .withColumn("out_width", floor(col("width") * col("scale")).cast(IntegerType))
      .withColumn("out_height", floor(col("height") * col("scale")).cast(IntegerType))
  }

  /** "Video" frame sampling: split the payload into fixed-size frames
    * and keep every `stride`-th — posexplode keeps it set-based.
    */
  def sampleFrames(withPayload: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast(DoubleType) / frameBytes).cast(IntegerType)
    withPayload
      .select(col("doc_id"), col("payload"),
        // empty payload → empty array → explode drops the row (no
        // spurious zero-byte frame 0)
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx"),
        call_function("substring", col("payload"),
          col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame_bytes"))
  }
}
