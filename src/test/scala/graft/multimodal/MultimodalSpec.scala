package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.toMediaTable(Tables.documents(spark, sf001))
    val r = m.head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") > 0)
  }

  test("feature extraction runs distributed per-partition and is deterministic") {
    val m = Multimodal.toMediaTable(Tables.documents(spark, sf001))
    val f1 = Multimodal.extractFeatures(m, decodeParallelism = 4).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(m, decodeParallelism = 2).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.channels >= 1))
    assert(f1.forall(f => f.mean_intensity > 0))
  }

  test("binaryFile source ingests real files into the media schema and decodes them") {
    val dir = java.nio.file.Files.createTempDirectory("media_bin")
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, 4, 5),
      "b.img" -> Array.tabulate(256)(i => i.toByte),
      "c.img" -> Array[Byte](42))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    val media = Multimodal.fromBinaryFiles(spark, dir.toString, mime = "image/test", glob = "*.img")
    val rows = media.collect()
    assert(rows.length == 3)
    // n_bytes metadata must equal the actual payload length, per file
    rows.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      val name = meta.getAs[String]("source").split('/').last
      assert(r.getAs[Array[Byte]]("payload").toSeq == payloads(name).toSeq)
      assert(meta.getAs[Long]("n_bytes") == payloads(name).length.toLong)
      assert(meta.getAs[String]("mime") == "image/test")
    }
    // distinct deterministic ids, and the decode stage runs over the scan
    assert(media.select("media_id").distinct().count() == 3)
    val feats = Multimodal.extractFeatures(media, decodeParallelism = 2).collect()
    assert(feats.length == 3)
    assert(feats.forall(f => f.n_bytes > 0 && f.width >= 64))
  }

  test("ImageCodec really decodes generated PNGs: exact geometry, channels, mean") {
    // 7x5 RGB, constant color (10, 20, 30): mean over all bands = 20.0 exactly
    val rgb = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 7; y <- 0 until 5) rgb.setRGB(x, y, (10 << 16) | (20 << 8) | 30)
    val rgbBytes = pngBytes(rgb)
    assert(Multimodal.ImageCodec.decode(rgbBytes).contains((7, 5, 3, 20.0)))

    // 4x6 grayscale gradient: sample(x,y) = (y*4+x)*10 → mean = 115.0 exactly
    val gray = new java.awt.image.BufferedImage(4, 6, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until 4; y <- 0 until 6) gray.getRaster.setSample(x, y, 0, (y * 4 + x) * 10)
    assert(Multimodal.ImageCodec.decode(pngBytes(gray)).contains((4, 6, 1, 115.0)))

    // JPEG (lossy): geometry and band count are exact; constant-color mean
    // survives DCT to within a hair
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", jb)
    val Some((jw, jh, jc, jm)) = Multimodal.ImageCodec.decode(jb.toByteArray)
    assert((jw, jh, jc) == (7, 5, 3))
    assert(math.abs(jm - 20.0) < 3.0, s"jpeg mean drifted: $jm")

    // junk bytes: no reader → None (extractFeatures falls back to the stub)
    assert(Multimodal.ImageCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("binaryFile PNG scan → real decode → parquet, end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("media_png")
    // distinct constant-color images with distinct geometry, keyed by file
    val fixtures = Map(
      "p1.png" -> (3, 4, 40),  // (w, h, gray level) → mean = level exactly
      "p2.png" -> (5, 2, 200),
      "p3.png" -> (8, 8, 0))
    fixtures.foreach { case (name, (w, h, level)) =>
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (x <- 0 until w; y <- 0 until h) im.getRaster.setSample(x, y, 0, level)
      java.nio.file.Files.write(dir.resolve(name), pngBytes(im))
    }
    val media = Multimodal.fromBinaryFiles(spark, dir.toString, mime = "image/png", glob = "*.png")
    val feats = Multimodal.extractFeatures(media, decodeParallelism = 2)
    val out = java.nio.file.Files.createTempDirectory("media_feat").resolve("feats").toString
    feats.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    // join decoded features back to their source file via media_id
    val byId = media.select(col("media_id"), col("meta.source").as("source"))
      .join(back, "media_id").collect()
    assert(byId.length == 3)
    byId.foreach { r =>
      val (w, h, level) = fixtures(r.getAs[String]("source").split('/').last)
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Double]("mean_intensity") == level.toDouble)
    }
  }

  test("undecodable image payloads degrade to the deterministic stub, not a crash") {
    import spark.implicits._
    val junk = Array.tabulate(64)(i => (i * 37).toByte)
    val m = Seq((9L, junk, Multimodal.MediaMeta("image/png", 64L, "fixture")))
      .toDF("media_id", "payload", "meta")
    val f = Multimodal.extractFeatures(m).collect().head
    val (w, h, c, mean) = Multimodal.FakeCodec.decode(junk)
    assert((f.width, f.height, f.channels, f.mean_intensity) == (w, h, c, mean))
  }

  private def pngBytes(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("decompression bomb: a tiny payload declaring a huge raster falls back, never allocates") {
    // Hand-built PNG: valid signature + IHDR declaring 100000x100000
    // (10^10 pixels ≈ 40 GB of ARGB raster) in a few hundred bytes —
    // the classic decompression bomb. The header read must reject it
    // BEFORE any raster allocation; the OutOfMemoryError a full
    // ImageIO.read would throw is an Error no handler catches.
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
        ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      be(data.length) ++ tag.getBytes("US-ASCII") ++ data ++ be(crc.getValue.toInt)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    // IHDR: w, h, bit depth 8, color type 2 (RGB), compression/filter/interlace 0
    val ihdr = chunk("IHDR", be(100000) ++ be(100000) ++ Array[Byte](8, 2, 0, 0, 0))
    val bomb = sig ++ ihdr ++ chunk("IDAT", Array[Byte](0)) ++ chunk("IEND", Array.empty)
    // the PNG reader parses the header (dimensions are really read)...
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bomb))
    val readers = javax.imageio.ImageIO.getImageReaders(in)
    assert(readers.hasNext, "fixture must look like a real PNG to the reader")
    val rdr = readers.next(); rdr.setInput(in, true, true)
    assert(rdr.getWidth(0) == 100000 && rdr.getHeight(0) == 100000)
    rdr.dispose(); in.close()
    // ...and decode refuses it at the header, before allocation
    assert(Multimodal.ImageCodec.decode(bomb).isEmpty,
      "over-cap frame must fall back to the stub")
    // a raised cap is honored for legitimately large-but-bounded frames
    val small = new java.awt.image.BufferedImage(40, 30, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until 40; y <- 0 until 30) small.getRaster.setSample(x, y, 0, 7)
    assert(Multimodal.ImageCodec.decode(pngBytes(small), maxPixels = 100L).isEmpty,
      "a tightened cap rejects frames over it")
    assert(Multimodal.ImageCodec.decode(pngBytes(small)).contains((40, 30, 1, 7.0)))
    // end-to-end: the bomb flows through extractFeatures as a stub row
    import spark.implicits._
    val m = Seq((66L, bomb, Multimodal.MediaMeta("image/png", bomb.length.toLong, "bomb")))
      .toDF("media_id", "payload", "meta")
    val f = Multimodal.extractFeatures(m).collect().head
    val (w, h, c, mean) = Multimodal.FakeCodec.decode(bomb)
    assert((f.width, f.height, f.channels, f.mean_intensity) == (w, h, c, mean))
  }

  test("resize emits the target byte count, composes, and is deterministic") {
    val m = Multimodal.toMediaTable(Tables.documents(spark, sf001)).limit(50)
    val r = Multimodal.resize(m, 128)
    val rows = r.collect()
    assert(rows.length == 50)
    rows.foreach { row =>
      assert(row.getAs[Array[Byte]]("payload").length == 128)
      assert(row.getStruct(row.fieldIndex("meta")).getAs[Long]("n_bytes") == 128L)
    }
    // resize stages chain (output schema == input schema)
    val twice = Multimodal.resize(Multimodal.resize(m, 128), 32).collect()
    assert(twice.forall(_.getAs[Array[Byte]]("payload").length == 32))
    // deterministic across partitioning
    val a = Multimodal.resize(m.repartition(4), 64).collect()
      .map(r2 => (r2.getLong(0), r2.getAs[Array[Byte]]("payload").toSeq)).toMap
    val b = Multimodal.resize(m.repartition(2), 64).collect()
      .map(r2 => (r2.getLong(0), r2.getAs[Array[Byte]]("payload").toSeq)).toMap
    assert(a == b)
  }

  test("frame sampling fans each payload into strided fixed-size frames") {
    import spark.implicits._
    val payload = Array.tabulate(100)(_.toByte)
    val m = Seq((1L, payload, Multimodal.MediaMeta("video/test", 100L, "fixture")))
      .toDF("media_id", "payload", "meta")
    val frames = Multimodal.sampleFrames(m, frameBytes = 10, stride = 3).collect()
    // 10 full frames, keep 0,3,6,9
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6, 9))
    frames.foreach { f =>
      assert(f.frame.length == 10)
      assert(f.frame(0) == (f.frame_idx * 10).toByte) // correct slice offsets
    }
    // empty payload → no frames, no crash
    val empty = Seq((2L, Array.empty[Byte], Multimodal.MediaMeta("video/test", 0L, "fixture")))
      .toDF("media_id", "payload", "meta")
    assert(Multimodal.sampleFrames(empty, 10, 3).count() == 0)
  }

  test("payload bytes round-trip: n_bytes metadata equals payload length") {
    val m = Multimodal.toMediaTable(Tables.documents(spark, sf001))
    val bad = m.filter(length(col("payload")).cast("long") =!= col("meta.n_bytes")).count()
    assert(bad == 0)
  }
}
