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

  test("payload bytes round-trip: n_bytes metadata equals payload length") {
    val m = Multimodal.toMediaTable(Tables.documents(spark, sf001))
    val bad = m.filter(length(col("payload")).cast("long") =!= col("meta.n_bytes")).count()
    assert(bad == 0)
  }
}
