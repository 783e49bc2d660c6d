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

/** Batched media decode — the Spark-side plumbing for an image/audio
  * feature-extraction stage.
  *
  * Shape notes (this is the part that matters at 100 TB):
  *  - `mapPartitions`, not `map`: a real codec initializes native
  *    state once per task and amortizes it over the partition's rows —
  *    the same batching contract `mapInPandas` gives Python codecs.
  *  - The transform is narrow (no shuffle); partitioning and ordering
  *    of the input pass through untouched, so an upstream
  *    `repartition(N)` fully controls decode parallelism and batch
  *    size stays bounded by `maxPartitionBytes`.
  *  - Typed Datasets on both sides: Encoders do the row codec work;
  *    payload bytes are never copied through an interpreted UDF boxing
  *    layer.
  *
  * STUB: the codec call itself is faked deterministically (no media
  * libraries in this environment) — `decodeDims` derives dimensions
  * from the leading payload bytes. A real deployment replaces ONLY
  * `decodeDims`; every contract above stays as-is.
  */
object MultimodalDecode {

  /** Deterministic stand-in for the native decode call. Mirrors the
    * SQL-expressible formula in `queries.Multimodal` so the spec can
    * cross-check the two paths row-for-row.
    */
  private def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    (16 + b0 % 48, 16 + b1 % 48, payload.length / 256 + 1)
  }

  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { batch =>
      // real impl: acquire the codec/native context once, here
      batch.map { m =>
        val (w, h, frames) = decodeDims(m.payload)
        MediaFeatures(m.docId, m.mediaType, m.payload.length.toLong, w, h, frames)
      }
      // and release it on batch exhaustion
    }
  }

  /** Resize stage: decode → scale to (targetW, targetH) → re-encode.
    * Same batching contract as [[decodeFeatures]] (narrow, codec
    * amortized per task). STUB scaler: output payload = input bytes
    * truncated/padded to targetW×targetH/8 — deterministic and
    * size-faithful (a resized payload's size depends on the TARGET
    * dims, not the source), which is what downstream partition-sizing
    * cares about.
    */
  def resize(items: Dataset[MediaItem], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    val outBytes = math.max(1, targetW * targetH / 8)
    items.mapPartitions { batch =>
      batch.map { m =>
        val out = java.util.Arrays.copyOf(m.payload, outBytes)
        ResizedMedia(m.docId, targetW, targetH, out)
      }
    }
  }

  /** Frame sampling: explode each item into ≤ `maxFrames` evenly
    * spaced frames — the one multimodal stage that CHANGES cardinality
    * (flatMap shape, 1→N). Still narrow; downstream repartition
    * controls fan-out placement. STUB extractor: frame i = the i-th
    * 256-byte payload window, matching `decodeDims`'s frame count.
    */
  def sampleFrames(items: Dataset[MediaItem], maxFrames: Int): Dataset[MediaFrame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      val (_, _, nFrames) = decodeDims(m.payload)
      val take = math.min(maxFrames, nFrames)
      // evenly spaced indices over the available frames, first-aligned
      (0 until take).map { i =>
        val frameIdx = if (take == 1) 0 else i * (nFrames - 1) / (take - 1)
        val from = frameIdx * 256
        val until = math.min(m.payload.length, from + 256)
        val frame =
          if (from >= m.payload.length) Array.empty[Byte]
          else java.util.Arrays.copyOfRange(m.payload, from, until)
        MediaFrame(m.docId, frameIdx, frame)
      }
    }
  }
}
