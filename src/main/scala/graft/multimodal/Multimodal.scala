package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media carried as opaque `binary` payloads
  * with a typed metadata struct, processed per-partition in bounded
  * batches.
  *
  * Decode: `image/`-prefixed payloads are REALLY decoded via the JDK's
  * `javax.imageio` ([[ImageCodec]] — PNG/JPEG/GIF/BMP readers ship with
  * every JDK, zero external deps): width/height/channels/mean-intensity
  * come from the actual pixel raster. Non-image mimes (audio/video —
  * no codec libs in this container) and undecodable image payloads
  * fall back to [[FakeCodec]], which derives deterministic
  * pseudo-features from the payload bytes. Everything around the codec
  * boundary — schema, partitioning, the iterator-based per-partition
  * batch shape, and the typed boundary — is the real 100 TB design:
  *
  *  - payloads stay off the driver (mapPartitions, never collect);
  *  - the decode boundary is `Iterator[MediaRecord] → Iterator[MediaFeatures]`,
  *    the same shape a vectorized (Arrow/pandas-UDF-style) decoder uses,
  *    so swapping in a real codec changes one function;
  *  - feature extraction emits fixed-width columns → columnar parquet;
  *  - repartition count controls decode parallelism independently of
  *    upstream file splits (decode is CPU-bound, not IO-bound).
  */
object Multimodal {

  final case class MediaMeta(mime: String, n_bytes: Long, source: String)
  final case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, mean_intensity: Double)

  /** Real image decode on the JDK's built-in `javax.imageio` readers
    * (PNG, JPEG, GIF, BMP, WBMP — present in every JDK, no external
    * codec needed). Runs inside executor tasks ([[extractFeatures]]'s
    * mapPartitions); the in-memory cache setting avoids per-task temp
    * files on executor disks. */
  object ImageCodec {
    // ImageIO defaults to a disk-backed stream cache; executors decode
    // from in-memory byte arrays, so temp files are pure overhead.
    // Static toggle, safe to set from concurrent tasks (idempotent).
    javax.imageio.ImageIO.setUseCache(false)

    /** Decompression-bomb ceiling: a hostile payload can be tiny on
      * disk yet DECLARE an enormous raster (a 10⁵×10⁵ PNG header is a
      * few hundred bytes; the decoded raster would be tens of GB),
      * and the resulting OutOfMemoryError is an Error — it sails past
      * any exception handler and kills the executor, violating the
      * "corrupt frame degrades, never kills the job" posture. So the
      * guard must run BEFORE allocation: dimensions are read from the
      * image HEADER (ImageReader.getWidth/getHeight decode no pixels)
      * and oversize frames fall back to the stub. 2^26 px ≈ 67 MP —
      * generous for real corpus frames (a 8K video still is 33 MP),
      * ~256 MB of ARGB raster worst-case, bounded per decode slot. */
    val DefaultMaxPixels: Long = 1L << 26

    /** Decode image bytes → (width, height, channels, mean_intensity),
      * where channels is the raster band count (gray=1, RGB=3, RGBA=4)
      * and mean_intensity averages every sample of every band on the
      * decoded raster (0–255 scale for 8-bit images). None when no
      * registered reader accepts the payload OR the header declares
      * more than `maxPixels` pixels (caller falls back to the
      * deterministic stub — the payload is untrusted, and the full
      * raster is never allocated for an over-cap frame). */
    def decode(payload: Array[Byte],
        maxPixels: Long = DefaultMaxPixels): Option[(Int, Int, Int, Double)] = {
      val img =
        try {
          val in = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(in)
            if (!readers.hasNext) null
            else {
              val reader = readers.next()
              try {
                reader.setInput(in, true, true)
                // header-only dimension read — no pixel allocation yet
                val (hw, hh) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
                if (hw <= 0 || hh <= 0 || hw * hh > maxPixels) null
                else reader.read(0)
              } finally reader.dispose()
            }
          } finally in.close()
        } catch { case _: java.io.IOException | _: RuntimeException => null }
      Option(img).map { im =>
        val raster = im.getRaster
        val (w, h, bands) = (im.getWidth, im.getHeight, raster.getNumBands)
        // row-banded sample read: bounds the decode-side allocation to
        // one row regardless of image size (a 100 TB corpus has big
        // frames; never materialize w*h doubles per image)
        var sum = 0.0
        val row = new Array[Double](w)
        var b = 0
        while (b < bands) {
          var y = 0
          while (y < h) {
            raster.getSamples(0, y, w, 1, b, row)
            var x = 0
            while (x < w) { sum += row(x); x += 1 }
            y += 1
          }
          b += 1
        }
        (w, h, bands, sum / (w.toLong * h * bands))
      }
    }
  }

  /** Deterministic fake decoder: features derived from payload bytes.
    * Stands in for the codecs this container does NOT ship (audio,
    * video) and for undecodable payloads; `image/`-prefixed mimes take
    * the real [[ImageCodec]] path. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.abs(h % 1024)
      val height = 64 + math.abs((h >> 10) % 1024)
      val channels = 1 + math.abs(h % 3)
      val mean = if (payload.isEmpty) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / payload.length
      (width, height, channels, mean)
    }
  }

  /** Wrap a text table as a media table: payload = utf-8 bytes, typed
    * metadata struct. Real deployments read payloads from binary-file
    * or parquet-binary sources with the same schema. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** Real binary ingestion: read raw media files via Spark's
    * `binaryFile` source into the engine's media-table schema. This is
    * the production entry point for image/audio/video payloads — the
    * scan is distributed (one file per task, driver never sees bytes),
    * `pathGlobFilter` selects by extension, and the resulting frame
    * feeds [[extractFeatures]] unchanged. media_id is the xxhash64 of
    * the file path: deterministic across runs, unique per file. */
  def fromBinaryFiles(spark: SparkSession, path: String,
      mime: String = "application/octet-stream", glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        struct(
          lit(mime).as("mime"),
          col("length").cast("long").as("n_bytes"),
          col("path").as("source")).as("meta"))

  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Resize: per-record payload transform with updated metadata. The
    * byte transform is a STUB (deterministic resample of the payload to
    * `targetBytes` — no image codec in this container); the plumbing is
    * the real shape: mapPartitions over (payload, meta) pairs, output
    * schema identical to the input media table so resize stages
    * compose/chain. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val out = Array.tabulate(targetBytes) { i =>
          if (rec.payload.isEmpty) 0.toByte
          // nearest-neighbor resample over the byte axis — the stub's
          // analogue of spatial resampling
          else rec.payload((i.toLong * rec.payload.length / targetBytes).toInt)
        }
        MediaRecord(rec.media_id, out, rec.meta.copy(n_bytes = targetBytes.toLong))
      }
    }.toDF()
  }

  /** Frame sampling: split each payload into fixed-size `frameBytes`
    * chunks and keep every `stride`-th — the iterator shape of a real
    * video frame sampler (one input record fans out to many frames,
    * lazily, without materializing all frames per record in memory).
    * Frames are real byte slices; only their interpretation as
    * image frames is stubbed. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { rec =>
        val nFrames = rec.payload.length / frameBytes
        Iterator.range(0, nFrames, stride).map { f =>
          MediaFrame(rec.media_id, f,
            java.util.Arrays.copyOfRange(rec.payload, f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }
  }

  /** Per-partition batched decode. `image/`-prefixed payloads decode for real
    * ([[ImageCodec]], JDK imageio); other mimes — and image payloads
    * no reader accepts — take the deterministic [[FakeCodec]] stub, so
    * the operator is total (a corrupt frame degrades, never kills the
    * job — the decode-side posture a 100 TB media sweep needs). */
  def extractFeatures(media: DataFrame, decodeParallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sized = if (decodeParallelism > 0) media.repartition(decodeParallelism) else media
    sized.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val decoded =
          if (rec.meta.mime.startsWith("image/")) ImageCodec.decode(rec.payload) else None
        val (w, h, c, m) = decoded.getOrElse(FakeCodec.decode(rec.payload))
        MediaFeatures(rec.media_id, rec.meta.mime, rec.meta.n_bytes, w, h, c, m)
      }
    }
  }
}
