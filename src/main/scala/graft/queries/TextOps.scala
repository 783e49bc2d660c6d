package graft.queries

import graft.Fixtures
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators, P1 slice (SURVEY.md §2B B-9):
  * exact dedup, corpus stats, multimodal join, event dedup.
  *
  * Scale notes: dedup-by-content at 100 TB must never compare full
  * text across the cluster more than once — `q_dedup_exact` groups on
  * the text value itself (one shuffle keyed by the dedup key; the
  * hash-keyed variant `q_dedup_fingerprint` below cuts shuffle width
  * by keying on xxhash64(text) instead). Window `rn = 1` (not
  * `dropDuplicates`) pins WHICH duplicate survives, a determinism
  * requirement the arbitrary-row semantics of dropDuplicates can't
  * give (SURVEY.md known-hard #7).
  */
object TextOps {

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> ((s, dir) => {
      val w = Window.partitionBy("text").orderBy("doc_id")
      Fixtures.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    "q_text_stats" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             round(avg("n_chars"), 2).as("avg_chars"),
             countDistinct("source").as("n_sources"))
        .orderBy("lang")),

    "q_multimodal_join" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir)
      val e = Fixtures.embeddings(s, dir)
      d.join(e, d("doc_id") === e("vec_id"), "inner")
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("cnt"),
             round(avg("n_chars"), 2).as("avg_chars"))
        .orderBy("lang", "label")
    }),

    "q_dedup_events" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      Fixtures.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    }))

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       round(avg(n_chars), 2) AS avg_chars,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_multimodal_join" ->
      """SELECT lang, label, count(*) AS cnt,
        |       round(avg(n_chars), 2) AS avg_chars
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang, label ORDER BY lang, label""".stripMargin,
    "q_dedup_events" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)
}
