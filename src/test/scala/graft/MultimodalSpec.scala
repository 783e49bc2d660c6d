package graft

import graft.operators.{MediaItem, MultimodalDecode}
import graft.queries.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batched decode path (`MultimodalDecode.decodeFeatures`,
  * mapPartitions over typed rows) must agree row-for-row with the
  * SQL-expressed features of `q_multimodal_features` — the stub codec
  * and the codegen'd expressions encode the same formulas. Also pins
  * the plumbing contracts: narrow transform (partitioning preserved)
  * and payload-byte fidelity through the binary column.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def mediaDs() = {
    import spark.implicits._
    Fixtures.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) => MediaItem(id, "text/plain", bytes) }
  }

  test("mapPartitions decode agrees with the SQL feature query row-for-row") {
    import spark.implicits._
    val decoded = MultimodalDecode.decodeFeatures(mediaDs())
      .select(col("docId").as("doc_id"), col("nBytes"), col("width"),
        col("height"), col("nFrames"))
    val sql = Multimodal.queries("q_multimodal_features")(spark, sf)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("frames"))
    val mismatches = decoded.as("d")
      .join(sql.as("s"), col("d.doc_id") === col("s.doc_id"), "full")
      .filter(col("d.nBytes") =!= col("s.n_bytes") ||
        col("d.width") =!= col("s.width") ||
        col("d.height") =!= col("s.height") ||
        col("d.nFrames") =!= col("s.frames") ||
        col("d.doc_id").isNull || col("s.doc_id").isNull)
    assert(mismatches.count() === 0)
    assert(decoded.count() > 0)
  }

  test("decode is a narrow transform: partition count is preserved") {
    val in = mediaDs().repartition(7)
    val out = MultimodalDecode.decodeFeatures(in)
    assert(out.rdd.getNumPartitions === 7)
  }

  test("resize emits target-dim payloads, preserving cardinality") {
    import spark.implicits._
    val out = MultimodalDecode.resize(mediaDs(), targetW = 64, targetH = 32)
    assert(out.count() === mediaDs().count())
    val rows = out.collect()
    assert(rows.forall(r => r.width == 64 && r.height == 32))
    assert(rows.forall(_.payload.length == 64 * 32 / 8))
  }

  test("frame sampling explodes items into evenly spaced frames, capped") {
    import spark.implicits._
    val frames = MultimodalDecode.sampleFrames(mediaDs(), maxFrames = 3)
    val byDoc = frames.collect().groupBy(_.docId)
    val expected = MultimodalDecode.decodeFeatures(mediaDs())
      .collect().map(f => f.docId -> f.nFrames).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.length === math.min(3, expected(id)))
      // indices strictly increasing, within range, first frame = 0
      val idxs = fs.map(_.frameIdx).sorted
      assert(idxs.head === 0)
      assert(idxs.distinct.length === idxs.length)
      assert(idxs.last < expected(id))
      // every frame slice is a real payload window (≤ 256 bytes)
      assert(fs.forall(_.frame.length <= 256))
    }
  }

  // ---- real image payloads (BMP synthesized in-test, decoded by the
  // JVM codec — no stub on this path) ----

  private def bmp(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (x * 31 + y * 17 + seed) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  test("real BMP payloads decode to their actual dimensions") {
    import spark.implicits._
    val items = Seq(
      MediaItem(1L, "image/bmp", bmp(37, 21, 5)),
      MediaItem(2L, "image/bmp", bmp(128, 64, 9)),
      MediaItem(3L, "text/plain", "not an image".getBytes("UTF-8")))
    val out = MultimodalDecode.decodeFeatures(spark.createDataset(items))
      .collect().map(f => f.docId -> f).toMap
    assert((out(1L).width, out(1L).height, out(1L).nFrames) === ((37, 21, 1)))
    assert((out(2L).width, out(2L).height, out(2L).nFrames) === ((128, 64, 1)))
    assert(out(1L).nBytes === items.head.payload.length.toLong)
    // the opaque row in the SAME batch stays on the deterministic path
    val p = items(2).payload
    assert(out(3L).width === 16 + (p(0) & 0xff) % 48)
    assert(out(3L).height === 16 + (p(1) & 0xff) % 48)
  }

  test("resize re-encodes real images at the target dimensions") {
    import spark.implicits._
    val items = Seq(MediaItem(1L, "image/bmp", bmp(100, 50, 3)))
    val out = MultimodalDecode.resize(spark.createDataset(items), 40, 20).collect().head
    assert((out.width, out.height) === ((40, 20)))
    // output is itself a decodable BMP with the target dims
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(img != null)
    assert((img.getWidth, img.getHeight) === ((40, 20)))
  }

  test("an image is its own single frame") {
    import spark.implicits._
    val payload = bmp(24, 24, 1)
    val frames = MultimodalDecode.sampleFrames(
      spark.createDataset(Seq(MediaItem(7L, "image/bmp", payload))), maxFrames = 4)
      .collect()
    assert(frames.length === 1)
    assert(frames.head.frameIdx === 0)
    assert(frames.head.frame.toSeq === payload.toSeq)
  }

  test("payload bytes survive the binary column round-trip") {
    import spark.implicits._
    val first = mediaDs().filter(_.docId == 0L).collect().head
    val text = Fixtures.documents(spark, sf)
      .filter(col("doc_id") === 0).select("text").as[String].collect().head
    assert(first.payload.toSeq === text.getBytes("UTF-8").toSeq)
  }
}
