package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed per-partition in batches.
  *
  * The decode step is a pluggable [[Codec]] seam: [[FakeCodec]] (the
  * default — deterministic "pixels" from the bytes, for fixture data
  * that isn't real media) and [[ImageIoCodec]] (a REAL image decoder on
  * `javax.imageio`, which ships with the JDK — no native libraries
  * needed). Everything around the seam is the real 100 TB-shape
  * plumbing, identical for both:
  *
  *  - payloads stay in `BinaryType` columns (columnar parquet, never
  *    stringified);
  *  - decode runs via `mapPartitions` over row batches — the Scala
  *    analog of `mapInPandas`: one codec instance per partition,
  *    streaming iterator (no materialized partition), output schema
  *    declared up-front;
  *  - partition sizing is the caller's lever: repartition by byte budget
  *    before decoding so a partition's batch fits executor memory.
  */
object Multimodal {

  /** The per-payload decode the partition kernel calls. Implementations
    * ship to executors — keep them serializable and stateless (or
    * lazily initialized per task).
    */
  trait Codec extends Serializable {
    /** (width, height, pixel checksum); (-1, -1, 0) marks an
      * undecodable payload — at corpus scale corrupt media is DATA to
      * filter downstream, not an exception to kill the task.
      */
    def decode(payload: Array[Byte]): (Int, Int, Long)
  }

  /** Stand-in codec for non-media fixture payloads: derives
    * deterministic dims + checksum from the bytes alone. Never fails.
    */
  object FakeCodec extends Codec {
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

  /** Real image decode on the JDK's own `javax.imageio` readers
    * (PNG/JPEG/GIF/BMP) — no external dependencies. The checksum folds
    * every ARGB pixel row-major with the same ×31 recurrence as
    * [[FakeCodec]], so downstream contracts (determinism, grouping,
    * schema) are identical whichever codec is plugged in. Undecodable
    * bytes yield the (-1, -1, 0) sentinel per the [[Codec]] contract.
    * (Per-pixel `getRGB` keeps this dependency-free and obviously
    * correct; a throughput deployment would grab the raster buffer —
    * same seam, same schema.)
    */
  /** Row-major ×31 fold over the ARGB values — the one pixel-checksum
    * recurrence every real codec here shares (single- and multi-frame),
    * so their outputs group/join interchangeably.
    */
  private def pixelFold(img: java.awt.image.BufferedImage): Long = {
    var acc = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        acc = acc * 31 + (img.getRGB(x, y) & 0xffffffffL); x += 1
      }
      y += 1
    }
    acc
  }

  object ImageIoCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Long) =
      // NonFatal, not just IOException: plugin readers throw unchecked
      // exceptions on crafted/truncated headers (IllegalArgumentException,
      // index/array errors), and the sentinel contract is that corrupt
      // media is DATA, never a task failure.
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) (-1, -1, 0L)
        else (img.getWidth, img.getHeight, pixelFold(img))
      } catch { case scala.util.control.NonFatal(_) => (-1, -1, 0L) }
  }

  /** Audio decode seam — the third modality's twin of [[Codec]]: one
    * payload yields (sample_rate, n_channels, n_samples, sample_acc).
    * Same contract: corrupt audio is DATA — the (-1, -1, -1, 0)
    * sentinel, never a task failure — and implementations ship to
    * executors.
    */
  trait AudioCodec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Long, Long)
  }

  /** Stand-in audio codec for non-media fixture payloads: rate /
    * channels / sample count / checksum derived deterministically from
    * the bytes alone. Unlike the image fakes, the checksum here is the
    * MOD-fold (×31 mod 2^31−1, the q43 rolling-hash recurrence), so an
    * SQL oracle can reproduce it without bigint overflow — the fake's
    * whole OUTPUT is gate-checkable, checksum included.
    */
  object FakeAudioCodec extends AudioCodec {
    val RateBase = 8000
    val RateMod = 8
    val RateStep = 1000
    val AccMod = 2147483647L
    def decode(payload: Array[Byte]): (Int, Int, Long, Long) = {
      requireAscii(payload, "FakeAudioCodec") // oracle fold is char-indexed (q134)
      val rate = RateBase + (payload.length % RateMod) * RateStep
      val channels = 1 + (payload.length % 2)
      val nSamples = payload.length / 2L // fake 16-bit framing
      var acc = 0L
      var i = 0
      while (i < payload.length) {
        acc = (acc * 31 + (payload(i) & 0xff)) % AccMod; i += 1
      }
      (rate, channels, nSamples, acc)
    }
  }

  /** Real audio decode on the JDK's own `javax.sound.sampled` readers
    * (WAV/AU/AIFF containers ship in every JDK — no native libraries).
    * 8/16-bit PCM only; anything else (compressed encodings the bare
    * JDK can't deliver as PCM) is the sentinel, same as corrupt bytes.
    * Samples fold container-order with the SAME mod recurrence as
    * [[FakeAudioCodec]] (16-bit values folded as their unsigned low 16
    * bits), so outputs group/join interchangeably whichever codec is
    * plugged in; n_samples counts FRAMES (all channels of one instant
    * = one frame), the number duration math wants.
    */
  object JavaSoundCodec extends AudioCodec {
    import javax.sound.sampled.AudioFormat.Encoding
    private val Undecodable = (-1, -1, -1L, 0L)
    def decode(payload: Array[Byte]): (Int, Int, Long, Long) =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val pcm = fmt.getEncoding == Encoding.PCM_SIGNED ||
            fmt.getEncoding == Encoding.PCM_UNSIGNED
          if (!pcm || (bits != 8 && bits != 16)) Undecodable
          else {
            val bytes = in.readAllBytes()
            val step = bits / 8
            var acc = 0L
            var i = 0
            while (i + step <= bytes.length) {
              val v =
                if (bits == 8) bytes(i) & 0xff
                else if (fmt.isBigEndian)
                  ((bytes(i) << 8) | (bytes(i + 1) & 0xff)) & 0xffff
                else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)) & 0xffff
              acc = (acc * 31 + v) % FakeAudioCodec.AccMod
              i += step
            }
            (fmt.getSampleRate.toInt, fmt.getChannels,
              bytes.length / fmt.getFrameSize, acc)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => Undecodable }
  }

  /** Per-window audio features — what an audio curation pass actually
    * gates on, where [[AudioCodec]] stops at container metadata. One
    * payload yields one row per fixed-size window of `frameSamples`
    * interleaved samples: (frame_idx, n_samples, sum_sq, peak), with
    * sum_sq = Σ amp² (exact integer — RMS is sqrt(sum_sq/n) downstream,
    * kept relational so thresholds are PLAN predicates, not codec
    * parameters) and peak = max |amp|. Empty seq for undecodable or
    * too-short payloads — corrupt audio is data, never a task failure.
    */
  trait AudioFrameCodec extends Serializable {
    def frames(payload: Array[Byte], frameSamples: Int): Seq[(Int, Int, Long, Int)]
  }

  /** Fake-twin window features: "samples" derived deterministically
    * from byte pairs — amp_i = (b₂ᵢ·256 + b₂ᵢ₊₁) mod [[AmpMod]] −
    * [[AmpOff]], centred in [−2000, 2000] so silence/clip thresholds
    * have realistic headroom. Integer-exact end to end, so a SQL
    * oracle reproduces the ENTIRE output (q159).
    */
  object FakeAudioFrameCodec extends AudioFrameCodec {
    val AmpMod = 4001
    val AmpOff = 2000
    def frames(payload: Array[Byte], frameSamples: Int): Seq[(Int, Int, Long, Int)] = {
      requireAscii(payload, "FakeAudioFrameCodec") // oracle twin is char-indexed
      val n = payload.length / 2
      val out = Seq.newBuilder[(Int, Int, Long, Int)]
      var idx = 0
      while (idx.toLong * frameSamples < n) {
        val start = idx * frameSamples
        val end = math.min(start + frameSamples, n)
        var sq = 0L; var peak = 0; var i = start
        while (i < end) {
          val amp = ((payload(2 * i) & 0xff) * 256 +
            (payload(2 * i + 1) & 0xff)) % AmpMod - AmpOff
          sq += amp.toLong * amp
          val a = math.abs(amp); if (a > peak) peak = a
          i += 1
        }
        out += ((idx, end - start, sq, peak))
        idx += 1
      }
      out.result()
    }
  }

  /** Real window features through the same JDK decode path as
    * [[JavaSoundCodec]]: signed amplitudes at native bit depth (8-bit
    * unsigned re-centred, 16-bit endianness-honoured), windows over the
    * interleaved sample stream. Clipping shows up as peak at full scale
    * (2^(bits−1)−1 and beyond) — the caller's threshold, like silence,
    * is a plan predicate on the output relation.
    */
  object JavaSoundFrameCodec extends AudioFrameCodec {
    import javax.sound.sampled.AudioFormat.Encoding
    def frames(payload: Array[Byte], frameSamples: Int): Seq[(Int, Int, Long, Int)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val signed = fmt.getEncoding == Encoding.PCM_SIGNED
          val pcm = signed || fmt.getEncoding == Encoding.PCM_UNSIGNED
          if (!pcm || (bits != 8 && bits != 16)) Seq.empty
          else {
            val bytes = in.readAllBytes()
            val step = bits / 8
            val n = bytes.length / step
            def amp(i: Int): Int =
              if (bits == 8) {
                val v = bytes(i) & 0xff
                if (signed) bytes(i).toInt else v - 128
              } else {
                val raw =
                  if (fmt.isBigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
                  else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
                if (signed) raw.toShort.toInt else (raw & 0xffff) - 32768
              }
            val out = Seq.newBuilder[(Int, Int, Long, Int)]
            var idx = 0
            while (idx.toLong * frameSamples < n) {
              val start = idx * frameSamples
              val end = math.min(start + frameSamples, n)
              var sq = 0L; var peak = 0; var i = start
              while (i < end) {
                val a = amp(i)
                sq += a.toLong * a
                val m = math.abs(a); if (m > peak) peak = m
                i += 1
              }
              out += ((idx, end - start, sq, peak))
              idx += 1
            }
            out.result()
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  val audioFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("sum_sq", LongType),
    StructField("peak", IntegerType)))

  /** Batched per-window feature extraction over (doc_id: long,
    * payload: binary) rows — same partition-kernel shape as
    * [[decodeAudio]], one frame row per window. RMS energy, silence
    * ratio and clip counts compose set-based on the result (see q159).
    */
  def decodeAudioFrames(withPayload: DataFrame, frameSamples: Int,
                        codec: AudioFrameCodec = FakeAudioFrameCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFrameSchema)
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          codec.frames(r.getAs[Array[Byte]]("payload"), frameSamples).iterator
            .map { case (i, n, sq, pk) => Row(id, i, n, sq, pk) }
        }
      }(enc)
  }

  /** Luma-grid seam for perceptual hashing: one payload yields a
    * fixed-size grayscale grid (row-major, `cells` ints in [0, 255]).
    * The grid — not the hash — is the codec's output so the hash
    * derivation stays a relational expression shared by every codec
    * (and by the SQL oracle through the fake twin).
    */
  trait GridCodec extends Serializable {
    /** Row-major rows×cols luma grid, values in [0, 255]. */
    def grid(payload: Array[Byte], rows: Int, cols: Int): Array[Int]
  }

  /** Fake twin: luma_i = byte[(7·i + 3) mod n] — deterministic byte
    * sampling a SQL oracle reproduces with `ord(substr(...))` (q185).
    * Empty payloads yield an all-zero grid (hash 0), never a failure.
    *
    * GUARDED ASCII-ONLY: the oracle twin indexes CHARACTERS and code
    * points while this codec indexes UTF-8 BYTES — they agree iff the
    * payload is pure ASCII (one byte per char, ord = byte value). A
    * multi-byte character anywhere shifts every later index, so the
    * codec refuses non-ASCII loudly ([[requireAscii]]) instead of
    * letting a fixture silently diverge from its oracle. Real bytes
    * belong to the real codec ([[ImageIoGridCodec]]), which has no
    * such constraint.
    */
  object FakeGridCodec extends GridCodec {
    def grid(payload: Array[Byte], rows: Int, cols: Int): Array[Int] = {
      requireAscii(payload, "FakeGridCodec")
      val out = new Array[Int](rows * cols)
      if (payload.length > 0) {
        var i = 0
        while (i < out.length) {
          out(i) = payload((7 * i + 3) % payload.length) & 0xff; i += 1
        }
      }
      out
    }
  }

  /** The oracle-parity precondition of the fake codecs: every byte
    * < 0x80 (pure ASCII), checked per payload at decode time — O(n)
    * next to the O(n) the decode already pays.
    */
  private[operators] def requireAscii(payload: Array[Byte], codec: String): Unit = {
    var i = 0
    while (i < payload.length) {
      require((payload(i) & 0x80) == 0,
        s"$codec is the SQL-oracle twin and indexes characters on the " +
          s"oracle side: payload byte $i is non-ASCII (0x${(payload(i) & 0xff).toHexString}), " +
          "which would silently diverge the engines. Use the real codec " +
          "for non-ASCII/binary payloads.")
      i += 1
    }
  }

  /** Real grid through `javax.imageio`: sample the decoded image at
    * evenly spaced pixel centres (nearest-neighbor — the standard
    * dHash prepass) and fold to integer rec-601 luma. Undecodable
    * bytes yield the all-zero grid, matching the corrupt-media-is-data
    * contract of the other codecs.
    */
  object ImageIoGridCodec extends GridCodec {
    def grid(payload: Array[Byte], rows: Int, cols: Int): Array[Int] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) new Array[Int](rows * cols)
        else {
          val out = new Array[Int](rows * cols)
          var r = 0
          while (r < rows) {
            var c = 0
            while (c < cols) {
              val x = ((2 * c + 1).toLong * img.getWidth / (2 * cols)).toInt
              val y = ((2 * r + 1).toLong * img.getHeight / (2 * rows)).toInt
              val rgb = img.getRGB(x, y)
              val rr = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              out(r * cols + c) = (rr * 299 + g * 587 + b * 114) / 1000
              c += 1
            }
            r += 1
          }
          out
        }
      } catch { case scala.util.control.NonFatal(_) => new Array[Int](rows * cols) }
  }

  val gridSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("luma", ArrayType(IntegerType, containsNull = false))))

  /** Batched luma-grid decode over (doc_id, payload) — same partition-
    * kernel shape as [[decodeImages]].
    */
  def decodeImageGrid(withPayload: DataFrame, rows: Int, cols: Int,
                      codec: GridCodec = FakeGridCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(gridSchema)
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.map(r => Row(r.getLong(0),
          codec.grid(r.getAs[Array[Byte]]("payload"), rows, cols)))
      }(enc)
  }

  /** Difference-hash fingerprint over a luma grid: bit (r·(cols−1)+c)
    * set iff cell (r, c+1) is brighter than cell (r, c) — the gradient
    * structure survives resizing/re-encoding, which is exactly what a
    * perceptual near-dup pass needs. rows·(cols−1) must stay ≤ 60 so
    * the fingerprint joins the 60-bit SimHash machinery
    * ([[Dedup.simhashPairs]] pigeonhole blocks) unchanged.
    */
  def dHash(luma: org.apache.spark.sql.Column, rows: Int, cols: Int): org.apache.spark.sql.Column = {
    require(rows * (cols - 1) <= 60,
      s"dHash width ${rows * (cols - 1)} exceeds the 60-bit fingerprint " +
        "budget (arithmetic shiftright corrupts pigeonhole blocks past bit 62)")
    (0 until rows).flatMap { r =>
      (0 until cols - 1).map { c =>
        val j = r * (cols - 1) + c
        when(element_at(luma, r * cols + c + 2) > element_at(luma, r * cols + c + 1),
          lit(1L << j)).otherwise(lit(0L))
      }
    }.reduce(_ + _).cast(LongType)
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sample_acc", LongType)))

  /** Batched audio decode over (doc_id: long, payload: binary) rows —
    * the same partition-kernel shape as [[decodeImages]].
    */
  def decodeAudio(withPayload: DataFrame,
                  codec: AudioCodec = FakeAudioCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(audioSchema)
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, ch, n, acc) = codec.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), rate, ch, n, acc)
        }
      }(enc)
  }

  /** Multi-frame decode seam — the "video" twin of [[Codec]]: one
    * payload yields an ordered frame sequence. Same contract: corrupt
    * media is DATA — a single (-1, -1, -1, 0) row, never a task
    * failure — and implementations ship to executors.
    */
  trait FrameCodec extends Serializable {
    /** (frame_idx, width, height, pixel checksum) per container frame,
      * frame_idx 0-based in container order; Seq((-1, -1, -1, 0))
      * marks an undecodable payload.
      */
    def frames(payload: Array[Byte]): Seq[(Int, Int, Int, Long)]
  }

  /** Real multi-frame decode on the JDK's `javax.imageio` sequence
    * readers (animated GIF ships in every JDK — no native libraries):
    * one reader per payload, frames read in container order, each
    * folded with the same ×31 recurrence as [[ImageIoCodec]] — so a
    * frame's (width, height, pixel_acc) is identical whether it arrives
    * through this seam or as a standalone image. This is the real-media
    * counterpart of the byte-slicing [[sampleFrames]]: that one fakes
    * frames from offsets; this one asks the container.
    */
  object ImageIoFrameCodec extends FrameCodec {
    private val Undecodable = Seq((-1, -1, -1, 0L))
    def frames(payload: Array[Byte]): Seq[(Int, Int, Int, Long)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Undecodable
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              // allowSearch: GIF doesn't index its frames, the reader
              // must walk the stream — fine, the payload is in memory
              val n = reader.getNumImages(true)
              (0 until n).map { i =>
                val img = reader.read(i)
                (i, img.getWidth, img.getHeight, pixelFold(img))
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => Undecodable }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_acc", LongType)))

  /** Batched decode over (doc_id: long, payload: binary) rows. */
  def decodeImages(withPayload: DataFrame, codec: Codec = FakeCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // one codec "handle" per partition, rows streamed through it
        rows.map { r =>
          val (w, h, acc) = codec.decode(r.getAs[Array[Byte]]("payload"))
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

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_acc", LongType)))

  /** Batched multi-frame decode over (doc_id: long, payload: binary)
    * rows: one frame row per container frame, same partition-kernel
    * shape as [[decodeImages]] (streaming iterator, schema up-front,
    * one codec per partition). Frame sampling composes set-based on the
    * result — `.filter(col("frame_idx") % stride === 0)` — so the
    * stride is a plan predicate, not a codec parameter.
    */
  def decodeFrames(withPayload: DataFrame,
                   codec: FrameCodec = ImageIoFrameCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    withPayload.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          codec.frames(r.getAs[Array[Byte]]("payload")).iterator
            .map { case (i, w, h, acc) => Row(id, i, w, h, acc) }
        }
      }(enc)
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
