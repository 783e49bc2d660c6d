package graft.operators

import org.apache.spark.sql.Dataset

/** One media row: opaque payload bytes + typed metadata, the schema a
  * multimodal corpus uses in parquet (payload column stays unparsed
  * until an explicit decode stage).
  */
case class MediaItem(docId: Long, mediaType: String, payload: Array[Byte])

/** Decoded per-item features. */
case class MediaFeatures(docId: Long, mediaType: String, nBytes: Long,
                         width: Int, height: Int, nFrames: Int)

/** One resized media row: payload re-encoded to target dimensions. */
case class ResizedMedia(docId: Long, width: Int, height: Int, payload: Array[Byte])

/** One sampled frame: (item, frame index, frame payload slice). */
case class MediaFrame(docId: Long, frameIdx: Int, frame: Array[Byte])

/** Per-task media codec. REAL image decode for image payloads —
  * BMP/PNG/GIF/JPEG through `javax.imageio`, pure JVM, headless-safe,
  * no native libraries — and a deterministic byte-derived stand-in for
  * opaque payloads (video/audio containers have no JVM-builtin codec;
  * a deployment drops its own decoder into [[decodeImage]]'s slot).
  * Constructed ONCE per task inside `mapPartitions`, so reader setup
  * amortizes over the partition's rows — the contract a native codec
  * needs, exercised by a real one.
  */
final class MediaCodec {
  import java.awt.image.BufferedImage

  // In-memory decode only: ImageIO's default disk cache would turn
  // every executor decode into temp-file I/O.
  javax.imageio.ImageIO.setUseCache(false)

  /** Full image decode, or None for non-image/corrupt payloads (the
    * magic-byte sniff keeps opaque payloads off the ImageIO parse
    * path entirely — cheap rejection at 100 TB matters as much as
    * decode speed).
    */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (!MultimodalDecode.looksLikeImage(payload)) None
    else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))

  /** (width, height, frameCount). Images: actual decoded dimensions,
    * one frame. Opaque payloads: dimensions derived from the leading
    * payload bytes (mirrors the SQL-expressible formula in
    * `queries.Multimodal` so the oracle can reproduce them) and one
    * frame per 256-byte window.
    */
  def dims(payload: Array[Byte]): (Int, Int, Int) =
    decodeImage(payload) match {
      case Some(img) => (img.getWidth, img.getHeight, 1)
      case None =>
        val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
        val b1 = if (payload.length > 1) payload(1) & 0xff else 0
        (16 + b0 % 48, 16 + b1 % 48, payload.length / 256 + 1)
    }

  /** Real resize for images: decode → Graphics2D scale →
    * BMP re-encode (BMP: JVM-builtin, compression-free, so output
    * size is a pure function of the target dims). Opaque payloads:
    * truncated/padded to targetW×targetH/8 — size-faithful (a resized
    * payload's size depends on the TARGET dims), which is what
    * downstream partition-sizing cares about.
    */
  def resize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    decodeImage(payload) match {
      case Some(img) =>
        val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        try g.drawImage(img, 0, 0, targetW, targetH, null)
        finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "bmp", baos)
        baos.toByteArray
      case None =>
        java.util.Arrays.copyOf(payload, math.max(1, targetW * targetH / 8))
    }

  /** Frame `idx` of the payload: an image IS its only frame; opaque
    * payloads expose 256-byte windows (the stand-in for container
    * frame extraction).
    */
  def frame(payload: Array[Byte], idx: Int): Array[Byte] =
    if (MultimodalDecode.looksLikeImage(payload)) payload // sniff only: no second decode
    else {
      val from = idx * 256
      val until = math.min(payload.length, from + 256)
      if (from >= payload.length) Array.empty[Byte]
      else java.util.Arrays.copyOfRange(payload, from, until)
    }
}

/** Batched media decode — the Spark side of an image/audio
  * feature-extraction stage.
  *
  * Shape notes (this is the part that matters at 100 TB):
  *  - `mapPartitions`, not `map`: the [[MediaCodec]] initializes once
  *    per task and amortizes over the partition's rows — the same
  *    batching contract `mapInPandas` gives Python codecs.
  *  - The transform is narrow (no shuffle); partitioning and ordering
  *    of the input pass through untouched, so an upstream
  *    `repartition(N)` fully controls decode parallelism and batch
  *    size stays bounded by `maxPartitionBytes`.
  *  - Typed Datasets on both sides: Encoders do the row codec work;
  *    payload bytes are never copied through an interpreted UDF boxing
  *    layer.
  */
object MultimodalDecode {

  /** Magic-byte sniff for the JVM-decodable image formats; anything
    * else is treated as an opaque payload.
    */
  private[graft] def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) ||          // BMP
      (p.length >= 4 && (p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte) ||                        // PNG
      (p.length >= 3 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte) ||                                              // GIF
      (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)     // JPEG

  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { batch =>
      val codec = new MediaCodec // per-task init, amortized over the batch
      batch.map { m =>
        val (w, h, frames) = codec.dims(m.payload)
        MediaFeatures(m.docId, m.mediaType, m.payload.length.toLong, w, h, frames)
      }
    }
  }

  /** Resize stage: decode → scale to (targetW, targetH) → re-encode.
    * Same batching contract as [[decodeFeatures]] (narrow, codec
    * amortized per task).
    */
  def resize(items: Dataset[MediaItem], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    items.mapPartitions { batch =>
      val codec = new MediaCodec
      batch.map { m =>
        ResizedMedia(m.docId, targetW, targetH, codec.resize(m.payload, targetW, targetH))
      }
    }
  }

  /** Frame sampling: explode each item into ≤ `maxFrames` evenly
    * spaced frames — the one multimodal stage that CHANGES cardinality
    * (flatMap shape, 1→N). Still narrow; downstream repartition
    * controls fan-out placement.
    */
  def sampleFrames(items: Dataset[MediaItem], maxFrames: Int): Dataset[MediaFrame] = {
    import items.sparkSession.implicits._
    items.mapPartitions { batch =>
      val codec = new MediaCodec
      batch.flatMap { m =>
        val (_, _, nFrames) = codec.dims(m.payload)
        val take = math.min(maxFrames, nFrames)
        // evenly spaced indices over the available frames, first-aligned
        (0 until take).map { i =>
          val frameIdx = if (take == 1) 0 else i * (nFrames - 1) / (take - 1)
          MediaFrame(m.docId, frameIdx, codec.frame(m.payload, frameIdx))
        }
      }
    }
  }
}
