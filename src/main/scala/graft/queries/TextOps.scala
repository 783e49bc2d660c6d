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
  * hash-keyed variant `q_dedup_fingerprint` in Dedup.scala cuts
  * shuffle width by keying on sha2(text) instead). Window `rn = 1` (not
  * `dropDuplicates`) pins WHICH duplicate survives, a determinism
  * requirement the arbitrary-row semantics of dropDuplicates can't
  * give (SURVEY.md known-hard #7).
  */
object TextOps {

  import org.apache.spark.sql.DataFrame

  /** Distinct (doc_id, tok) pairs of a `doc_id, text` frame. */
  private[queries] def tokenize(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** Document-frequency-capped near-dup pipeline: candidate pairs are
    * generated ONLY from tokens whose df ≤ `dfCap` (tokens above the
    * cap are stopword-shaped: a bucket self-join on one of them is
    * quadratic in its document frequency — the one scale-killer shape
    * in token-bucketed dedup), then every candidate pair is verified
    * with an EXACT Jaccard over the FULL token sets — the LSH
    * candidate+verify split, with df-capping as the (deterministic)
    * candidate generator. The hot-token list is tiny by construction
    * (few tokens exceed a high cap), so it broadcasts and the corpus
    * never reshuffles to drop them. A pair sharing ONLY above-cap
    * tokens is not considered (that is the point: stopword-only
    * overlap is not similarity).
    */
  private[graft] def nearDupCapped(d: DataFrame, dfCap: Long): DataFrame = {
    // Annotated token table materialized ONCE (round 19): the token
    // frame feeds FIVE subplans (the hot-token df aggregate, both
    // self-join sides of the candidate generator, and both verify
    // sides) and as a plain view the executed plan ran the
    // scan + split + explode pipeline five times with almost no
    // exchange sharing (the subtrees differ, so ReuseExchange can't
    // unify them — 5 parquet scans, 5 Generates in the before-plan).
    // The per-doc set size `n` is annotated BEFORE the checkpoint so
    // its window also runs once instead of once per verify side. Same
    // device as q_text_despan's tokenized checkpoint; per-execution,
    // inside the timed region.
    val tok = tokenize(d)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .localCheckpoint(true)
    // ONE definition of the candidate generator, shared with the spec
    // hook below — a cap-rule tweak applied to only one copy would let
    // DedupSkewSpec keep passing against a stale pipeline.
    val cand = cappedCandidatesFrom(tok.select("doc_id", "tok"), dfCap)
    // set size rides WITH the token rows (round 18, the verifyJaccard
    // device) — one window count instead of a sizes aggregate + two
    // pair-scale join-backs; identical integer (shared, n1, n2) triples
    val shared = cand
      .join(tok.as("ta"), col("id1") === col("ta.doc_id"))
      .join(tok.as("tb"),
        col("id2") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("shared"),
        min(col("ta.n")).as("n1"), min(col("tb.n")).as("n2"))
    shared
      .filter(col("shared") * 10 >= (col("n1") + col("n2") - col("shared")) * 6)
      .select(col("id1"), col("id2"),
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 4)
          .as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** Candidate pairs only (pre-verify) — exposed so DedupSkewSpec can
    * assert the cap keeps candidate counts linear on a hot-token corpus.
    */
  private[graft] def cappedCandidates(d: DataFrame, dfCap: Long): DataFrame =
    cappedCandidatesFrom(tokenize(d), dfCap)

  /** [[cappedCandidates]] over an already-built (doc_id, tok) frame —
    * the main path hands in its materialized token table so the
    * generator and the spec hook stay ONE definition.
    */
  private def cappedCandidatesFrom(tok: DataFrame, dfCap: Long): DataFrame = {
    val hot = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("tok")
    val rare = tok.join(broadcast(hot), Seq("tok"), "left_anti")
    rare.as("a")
      .join(rare.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

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

    // Near-dup detection by token-set Jaccard >= 0.6 over the first 300
    // docs. The pair generation is token-bucketed — docs only meet in
    // the join if they SHARE a token — so the shuffle is keyed by token,
    // never all-pairs. At 100 TB the same plan holds: explode to
    // (token, doc) pairs, self-join per token bucket, aggregate shared
    // counts; hot tokens (stopwords) are the skew risk — the scale
    // form is `q_dedup_near_capped` below, which drops them from
    // candidate generation (df cap) and exact-verifies the survivors
    // over full token sets. The threshold filter is
    // exact integer math (shared*10 >= 6*(n1+n2-shared)) so both
    // engines agree on pair membership regardless of float rounding.
    "q_dedup_near" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir).filter(col("doc_id") < 300)
      // set size rides WITH the token rows (round 18, the verifyJaccard
      // device): a window count over doc_id replaces the separate sizes
      // aggregate + two pair-scale join-backs; min(n) per pair side IS
      // the size (constant per doc) — identical integer triples
      val tok = d.select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      val shared = tok.as("a")
        .join(tok.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("shared"),
          min(col("a.n")).as("n1"), min(col("b.n")).as("n2"))
      shared
        .filter(col("shared") * 10 >= (col("n1") + col("n2") - col("shared")) * 6)
        .select(col("id1"), col("id2"),
          round(col("shared") / (col("n1") + col("n2") - col("shared")), 4)
            .as("jaccard"))
        .orderBy("id1", "id2")
    }),

    // Near-dup by character-3-gram Jaccard >= 0.5 (docs < 120): the
    // shingle analogue of q_dedup_near — order-sensitive where token
    // sets are not ("badly formatted" vs "formatted badly" share all
    // tokens but few trigram positions... shared trigrams still bucket
    // the join). Same scale shape: explode distinct shingles, meet
    // only inside a shingle bucket, exact integer threshold. Texts
    // shorter than one shingle are excluded on BOTH sides (Spark's
    // sequence(1, 0) runs descending; DuckDB's generate_series is
    // empty — don't let engines disagree on degenerate inputs).
    "q_dedup_ngram" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir)
        .filter(col("doc_id") < 120 && length(col("text")) >= 3)
      // same size-rides-with-shingles device as q_dedup_near (round 18)
      val gr = d.select(col("doc_id"),
          explode(array_distinct(expr(
            "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")))
            .as("g"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      val shared = gr.as("a")
        .join(gr.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("shared"),
          min(col("a.n")).as("n1"), min(col("b.n")).as("n2"))
      shared
        .filter(col("shared") * 2 >= col("n1") + col("n2") - col("shared"))
        .select(col("id1"), col("id2"),
          round(col("shared") / (col("n1") + col("n2") - col("shared")), 4)
            .as("jaccard"))
        .orderBy("id1", "id2")
    }),

    // The scale form of q_dedup_near: candidates only from tokens with
    // df <= 150 (half the 300-doc scope), exact full-set Jaccard on the
    // survivors — see [[nearDupCapped]]. Same integer threshold math.
    "q_dedup_near_capped" -> ((s, dir) =>
      nearDupCapped(Fixtures.documents(s, dir).filter(col("doc_id") < 300), 150L)),

    // tf-idf over the corpus: tf from one grouped count, df from a
    // distinct+count, corpus size joined in as a 1-row broadcast. All
    // three shuffles are keyed by (doc, token) / token — partial
    // aggregation applies, and nothing is driver-side (`n_docs` is a
    // cross-joined 1-row DataFrame, not a collect()).
    "q_text_tfidf" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // document frequency as a GROUPED aggregate + BROADCAST join-back
      // (round 19; guide §2.3 aggregate-before-shuffle + §3.1): tf's
      // rows ARE the distinct (doc, token) pairs, so count-per-token
      // over them equals df. The r18 window form shuffled EVERY tf row
      // through one hash(token) exchange and buffered each token's
      // whole group in a single window frame — a stopword's group at
      // corpus scale funnels through one task's window buffer (skew,
      // guide §2.5). The grouped form does map-side partial counts, so
      // the hash(token) exchange carries vocabulary-sized partials,
      // and the vocabulary-sized df table broadcasts back onto tf —
      // tf itself never re-shuffles (its subtree is shared with the
      // df build through ReuseExchange). Same df per row, same scores.
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(broadcast(dfreq), "token")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n_docs") / col("df")), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"), col("token"))
        .limit(20)
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
    "q_dedup_near" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |tok AS (SELECT DISTINCT doc_id, tok FROM
        |        (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d)),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |sh AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
        |       FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(shared AS DOUBLE) / (s1.n + s2.n - shared), 4) AS jaccard
        |FROM sh JOIN sz s1 ON sh.id1 = s1.doc_id JOIN sz s2 ON sh.id2 = s2.doc_id
        |WHERE shared * 10 >= (s1.n + s2.n - shared) * 6
        |ORDER BY id1, id2""".stripMargin,
    "q_dedup_ngram" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id < 120 AND length(text) >= 3),
        |gr AS (SELECT DISTINCT doc_id, g FROM
        |       (SELECT doc_id,
        |               unnest(list_transform(generate_series(1, length(text) - 2),
        |                                     i -> substring(text, i, 3))) AS g
        |        FROM d)),
        |sz AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY 1),
        |sh AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
        |       FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(shared AS DOUBLE) / (s1.n + s2.n - shared), 4) AS jaccard
        |FROM sh JOIN sz s1 ON sh.id1 = s1.doc_id JOIN sz s2 ON sh.id2 = s2.doc_id
        |WHERE shared * 2 >= s1.n + s2.n - shared
        |ORDER BY id1, id2""".stripMargin,
    "q_dedup_near_capped" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |tok AS (SELECT DISTINCT doc_id, tok FROM
        |        (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM d)),
        |dfreq AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
        |rare AS (SELECT t.doc_id, t.tok FROM tok t JOIN dfreq f USING (tok)
        |         WHERE f.df <= 150),
        |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |         FROM rare a JOIN rare b ON a.tok = b.tok AND a.doc_id < b.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |sh AS (SELECT c.id1, c.id2, count(*) AS shared
        |       FROM cand c
        |       JOIN tok ta ON ta.doc_id = c.id1
        |       JOIN tok tb ON tb.doc_id = c.id2 AND tb.tok = ta.tok
        |       GROUP BY 1, 2)
        |SELECT id1, id2,
        |       round(CAST(shared AS DOUBLE) / (s1.n + s2.n - shared), 4) AS jaccard
        |FROM sh JOIN sz s1 ON sh.id1 = s1.doc_id JOIN sz s2 ON sh.id2 = s2.doc_id
        |WHERE shared * 10 >= (s1.n + s2.n - shared) * 6
        |ORDER BY id1, id2""".stripMargin,
    "q_text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.token, round(tf * ln(n_docs / df), 4) AS score
        |FROM tf JOIN df USING (token), n
        |ORDER BY score DESC, doc_id, token LIMIT 20""".stripMargin,
    "q_dedup_events" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)
}
