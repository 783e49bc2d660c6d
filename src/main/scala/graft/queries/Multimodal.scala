package graft.queries

import graft.Fixtures
import org.apache.spark.sql.functions._

/** Multimodal-column handling (SURVEY.md §2B B-9): media payloads are
  * opaque `binary` columns + typed metadata, exactly how a 100 TB
  * image/audio corpus rides in parquet. Here the payload is derived
  * from `text` (UTF-8 bytes) so the DuckDB oracle can reproduce every
  * byte; the feature extraction itself — sizes, digests, dimension
  * metadata — is real binary-column work and stays codegen'd.
  *
  * The batched DECODE path lives in `graft.operators.MultimodalDecode`:
  * typed Dataset in, `mapPartitions` batches out — the Scala analogue
  * of `mapInPandas`. Image payloads (BMP/PNG/GIF/JPEG) decode for REAL
  * through `javax.imageio`; opaque payloads (this fixture's text
  * bytes — video/audio have no JVM-builtin codec) take the
  * deterministic byte-derived path below, which is what keeps the
  * DuckDB oracle able to reproduce every value. MultimodalSpec asserts
  * the two agree row-for-row on opaque payloads and decodes real BMPs
  * synthesized in-test.
  */
object Multimodal {

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"), col("text"),
          col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          expr("octet_length(payload)").as("n_bytes"),
          substring(sha2(col("payload"), 256), 1, 16).as("digest16"),
          // stand-in "decoded" dimensions from the leading bytes (the
          // fixture payload is ASCII, so byte k = codepoint of char k)
          (lit(16) + ascii(substring(col("text"), 1, 1)) % 48).as("width"),
          (lit(16) + ascii(substring(col("text"), 2, 1)) % 48).as("height"),
          expr("octet_length(payload) div 256 + 1").as("frames"))
        .withColumn("aspect", round(col("width") / col("height"), 4))
        .orderBy("doc_id")),

    // Frame sampling: 4 evenly spaced frame indices per media row
    // (slot j → floor(j·(frames−1)/3), pure integer math) — the
    // planning half of video frame extraction: each sampled (row,
    // frame_idx) pair is one decode-work unit downstream, and the
    // explode is a map-side Generate with no shuffle.
    "q_multimodal_frames" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"),
          (expr("octet_length(cast(text AS binary)) div 256") + 1).as("frames"))
        .selectExpr("doc_id", "CAST(frames AS BIGINT) AS frames",
          "posexplode(transform(sequence(0, 3), j -> (j * (frames - 1)) div 3)) AS (slot, frame_idx)")
        .selectExpr("doc_id", "frames", "CAST(slot AS BIGINT) AS slot",
          "CAST(frame_idx AS BIGINT) AS frame_idx")
        .orderBy("doc_id", "slot")))

  val oracle: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH f AS (SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  substring(sha256(text), 1, 16) AS digest16,
        |  16 + ord(substring(text, 1, 1)) % 48 AS width,
        |  16 + ord(substring(text, 2, 1)) % 48 AS height,
        |  octet_length(encode(text)) // 256 + 1 AS frames
        |FROM documents)
        |SELECT doc_id, n_bytes, digest16, width, height, frames,
        |       round(width / height, 4) AS aspect
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """WITH f AS (SELECT doc_id,
        |                  octet_length(encode(text)) // 256 + 1 AS frames
        |           FROM documents)
        |SELECT doc_id, CAST(frames AS BIGINT) AS frames,
        |       CAST(j AS BIGINT) AS slot,
        |       CAST(j * (frames - 1) // 3 AS BIGINT) AS frame_idx
        |FROM f, (SELECT unnest(range(0, 4)) AS j)
        |ORDER BY doc_id, slot""".stripMargin)
}
