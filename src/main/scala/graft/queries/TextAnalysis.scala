package graft.queries

import graft.Fixtures
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators a training-data pipeline runs over every
  * document: language ID, quality scoring, token counting, content
  * fingerprinting (SURVEY.md §2B B-9).
  *
  * All four are per-document map-side work (plus one bounded
  * profile/vocabulary broadcast for language ID) — the shapes scale
  * linearly: no all-pairs, no unbounded state, no driver collection.
  * Everything is built-in Catalyst expressions (higher-order
  * functions, not UDFs) so the whole stage stays codegen'd.
  */
object TextAnalysis {

  val queries: Map[String, Q] = Map(
    // Language ID by token-profile overlap: the per-language profile =
    // its top-5 most frequent tokens over the corpus (an n-gram
    // profile degenerates to token profiles on this whitespace
    // corpus); a document's predicted language maximizes profile
    // overlap (ties → alphabetical). The profile is tiny (langs × 5)
    // and broadcast; the document side is one explode + one grouped
    // count — linear in corpus size.
    "q_text_langid" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val tokAll = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      val prof = tokAll.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))))
        .filter(col("rk") <= 5)
        .select(col("lang").as("plang"), col("tok"))
      val dtok = docs.filter(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      dtok.join(broadcast(prof), "tok")
        .groupBy("doc_id", "plang").agg(count(lit(1)).as("score"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("plang"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("plang").as("pred_lang"), col("score"))
        .orderBy("doc_id")
    }),

    // Quality score from cheap surface statistics: type-token ratio,
    // stopword ratio, average token length. Ratios are emitted as
    // floor(x*1e4 + 0.5) BIGINTs: the same IEEE op order on both
    // engines gives bit-identical doubles, and floor can't disagree —
    // unlike round(x, 4), where Spark (BigDecimal half-up on the
    // shortest decimal repr) and DuckDB (C math on the raw double)
    // split when x lands on a .xxxx5 boundary (seen at sf0.001).
    "q_text_quality" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok"),
          size(array_distinct(split(col("text"), " "))).as("n_uniq"),
          size(filter(split(col("text"), " "),
            t => t === "the" || t === "a")).as("n_stop"),
          length(regexp_replace(col("text"), " ", "")).as("n_nospace"))
        .select(col("doc_id"), col("n_tok"),
          floor(col("n_uniq") / col("n_tok") * 10000 + 0.5).as("ttr_x1e4"),
          floor(col("n_stop") / col("n_tok") * 10000 + 0.5).as("stop_x1e4"),
          floor(((col("n_uniq") / col("n_tok")) * 0.5
            + (lit(1.0) - col("n_stop") / col("n_tok")) * 0.3
            + least((col("n_nospace") / col("n_tok")) / 8.0, lit(1.0)) * 0.2)
            * 10000 + 0.5).as("score_x1e4"))
        .orderBy("doc_id")),

    // Vocabulary coverage — what a tokenizer-training run consumes:
    // corpus token frequencies, ranked, with the cumulative fraction
    // of all token OCCURRENCES the top-k vocabulary covers (the
    // "coverage at vocab size" curve; rank ties broken by token asc).
    // The corpus-sized work (token counting) is a distributed
    // explode+agg; the head selection is `orderBy().limit(50)` which
    // lowers to TakeOrderedAndProject — bounded per-partition heaps,
    // never a full sort or a single-partition window, so the shape
    // holds even when the vocabulary itself is billions of rows.
    // rank + cumulative coverage over the 50-row head come from a
    // broadcast triangular self-join (k² = 2 500 pairs), not a
    // global-order window: no WindowExec with an empty partition spec
    // exists anywhere in this plan (PlanSpec pins that).
    "q_tok_vocab" -> ((s, dir) => {
      val freq = Fixtures.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      val top = freq.orderBy(col("freq").desc, col("tok").asc).limit(50)
      // b "sorts before or at" a under (freq desc, tok asc); the order
      // is total (tok is unique), so count = row_number, sum = cumsum.
      val b = top.select(col("tok").as("b_tok"), col("freq").as("b_freq"))
      top.join(broadcast(b),
          col("b_freq") > col("freq") ||
            (col("b_freq") === col("freq") && col("b_tok") <= col("tok")))
        .groupBy(col("tok"), col("freq"))
        .agg(count(lit(1)).as("rank"), sum("b_freq").as("cum"))
        .crossJoin(broadcast(freq.agg(sum("freq").as("tot"))))
        .select(col("rank").cast("long").as("rank"), col("tok"), col("freq"),
          floor(col("cum") / col("tot") * 10000 + 0.5).as("cov_x1e4"))
        .orderBy("rank")
    }),

    // Curriculum quality binning: per-document TTR score → ABSOLUTE
    // score bands (score/1000, capped at bin 9), with per-bin document
    // and token budgets — what a data-mixing config consumes. Banding
    // by fixed thresholds (not rank deciles) keeps the whole query
    // map-side + one 10-group aggregate: no global sort, no window,
    // nothing that needs a total order over 100 TB of documents.
    "q_quality_bins" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"),
          floor(size(array_distinct(split(col("text"), " ")))
            / size(split(col("text"), " ")) * 10000 + 0.5).as("score"))
        .groupBy(least(floor(col("score") / 1000), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min("score").as("min_score"), max("score").as("max_score"))
        .orderBy("bin")),

    // Token counting two ways: whitespace split vs a BPE-ish regex
    // (letter/digit runs + single punctuation) — the pre-tokenizer
    // shape BPE vocabularies use. Pure per-row expressions.
    "q_text_tokens" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          expr("size(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0))")
            .as("re_tokens"),
          length(col("text")).as("n_chars_txt"))
        .withColumn("chars_per_tok",
          round(col("n_chars_txt") / col("ws_tokens"), 4))
        .orderBy("doc_id")),

    // The flagship curation pipeline — the C4-style shape every
    // training-data corpus goes through, composed end-to-end from the
    // engine's own operators: language filter → surface-quality gates
    // (length, stopword ratio) → exact dedup by content digest (keep
    // min doc_id) → deterministic hash sample. Two linear passes over
    // the corpus (per-doc stats map-side; one narrow digest shuffle)
    // + a keyed semi-join — no stage is super-linear, so the plan is
    // the one you'd run at 100 TB.
    // The FULL pretraining-corpus pipeline as one oracle-checked
    // composition — the engine's north star end to end: exact dedup
    // (sha-256, keep min doc_id) → language + quality gates →
    // benchmark DECONTAMINATION (drop anything sharing a 4-token
    // shingle with the held-out set) → deterministic train/val/test
    // split → per-split token budgets. Every stage is the scale shape
    // its standalone key pins: one digest shuffle, map-side gates, a
    // broadcast shingle probe, a map-side CASE, and a 3-row rollup.
    "q_pipeline_pretrain" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val toks = split(col("text"), " ")
      val keep = docs.groupBy(sha2(col("text"), 256))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val gated = docs.join(keep, "doc_id")
        .withColumn("n_tok", size(toks))
        .withColumn("n_stop", size(filter(toks, t => t === "the" || t === "a")))
        .filter(col("lang") === "en" && col("n_tok") >= 20 &&
                col("n_stop") * lit(1.0) / col("n_tok") < 0.4)
      // token array projected once per row — same O(tokens²) fix as
      // q_text_contaminate's grams (the lambda otherwise re-splits the
      // text per element)
      def grams(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"), split(col("text"), " ").as("ga"))
        .filter(size(col("ga")) >= 4)
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(1), size(col("ga")) - lit(3)),
          i => array_join(slice(col("ga"), i, lit(4)), " ")))).as("gram"))
      val bench = grams(docs.filter(col("doc_id") < 20)).select("gram").distinct()
      val contaminated = grams(gated.filter(col("doc_id") >= 20))
        .join(bench, "gram").select("doc_id").distinct()
      val clean = gated.filter(col("doc_id") >= 20)
        .join(contaminated, Seq("doc_id"), "left_anti")
      val b = substring(md5(col("doc_id").cast("string")), 1, 2)
      clean.withColumn("split",
          when(b <= "ef", "train").when(b <= "f7", "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
        .orderBy("split")
    }),

    "q_pipeline_curate" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val toks = split(col("text"), " ")
      val q = docs.select(col("doc_id"), col("lang"),
        size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_uniq"),
        size(filter(toks, t => t === "the" || t === "a")).as("n_stop"))
      val keep = docs.groupBy(sha2(col("text"), 256))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      q.join(keep, "doc_id")
        .filter(col("lang") === "en" && col("n_tok") >= 20 &&
                col("n_stop") * lit(1.0) / col("n_tok") < 0.4)
        .select(col("doc_id"), col("lang"), col("n_tok"),
          floor(col("n_uniq") * lit(1.0) / col("n_tok") * 10000 + 0.5)
            .as("ttr_x1e4"))
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <= "7")
        .orderBy("doc_id")
    }),

    // Deterministic hash sampling — the production way to sample a
    // 100 TB corpus: md5(key) prefix <= threshold admits a fixed,
    // reproducible ~10% (0x00–0x19 = 26/256) slice with NO coordination
    // — every executor decides per row, re-runs pick the identical
    // rows (unlike rand()-based .sample), and the slice is stable
    // under repartitioning. Pure map-side: predicate evaluates inside
    // the scan, no shuffle at all.
    "q_sample_hash" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <= "19")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    // Stratified hash sampling — different admission rates per
    // language (downsample the dominant language, keep more of the
    // low-resource ones: the standard corpus-balancing move). Still a
    // pure map-side predicate: rate choice is a CASE on lang, the
    // admission test the same md5 prefix, so the stratified sample is
    // as coordination-free and reproducible as the flat one.
    "q_sample_stratified" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <=
          when(col("lang") === "en", "0c").otherwise("33"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Weighted priority sampling (length-weighted, without
    // replacement): each document gets the deterministic priority
    // hash(doc_id)/weight — a larger weight (n_chars) shrinks the
    // priority, so longer documents are admitted more often — and the
    // sample is the global bottom-100 by priority. Both operands are
    // integers exact in a double and IEEE division is exactly
    // specified, so the priority is bit-identical on any engine; the
    // plan is a TakeOrderedAndProject (per-partition bounded heaps +
    // driver merge), never a full sort — the coordination-free
    // weighted corpus-mixing draw at any scale.
    "q_sample_weighted" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .withColumn("pri",
          conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("double") / col("n_chars"))
        .orderBy(col("pri"), col("doc_id"))
        .limit(100)
        .select("doc_id", "lang", "n_chars", "pri")),

    // Importance (Bernoulli-by-weight) sampling: each document keeps
    // with probability proportional to its importance score (here:
    // length, the DSIR-style stand-in for a quality ratio), decided by
    // a deterministic per-doc md5 uniform — so the sample is exactly
    // reproducible, distributed map-side with zero coordination, and
    // E[kept docs] follows the weight mass. Distinct from
    // q_sample_weighted (priority top-k): this is the streaming-
    // friendly independent test, no global sort or k.
    "q_sample_importance" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .withColumn("w", least(lit(1.0), col("n_chars") / lit(600.0)))
        .withColumn("u",
          conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("double") / lit(16777216.0))
        .filter(col("u") < col("w"))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // Bigram conditional-probability table (the count-based LM
    // estimation step behind n-gram quality scoring and contamination
    // heuristics): P(w2|w1) = count(w1 w2) / count(w1 ·). Bigrams are
    // built MAP-SIDE from each document's token array (an index
    // transform — no per-document window, no per-token shuffle), so
    // the only shuffles are the vocabulary²-bounded grouped count and
    // a broadcast join against the per-w1 totals (vocabulary-sized at
    // any corpus scale).
    "q_tok_bigram_lm" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => length(x) > lit(0)).as("a"))
        .filter(size(col("a")) >= 2)
      val bi = d.select(explode(expr(
          "transform(sequence(1, size(a)-1), i -> struct(a[i-1] AS w1, a[i] AS w2))"))
        .as("b")).select(col("b.w1"), col("b.w2"))
      val cnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy("w1").agg(sum("cnt").as("tot"))
      cnt.join(broadcast(tot), "w1")
        .withColumn("p", round(col("cnt") / col("tot"), 5))
        .select("w1", "w2", "cnt", "p")
        .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(30)
    }),

    // Fractional-epoch source mixing (the pretraining-mix move:
    // upsample curated sources by non-integer epoch counts — 2.5
    // epochs = every doc twice, half the docs a third time). The
    // fractional copy is decided by a deterministic per-doc md5
    // uniform, so the materialized mix is exactly reproducible and
    // entirely map-side: copies come from exploding a per-row
    // sequence, no join, no shuffle, no driver state — at 100 TB the
    // mix is a single linear pass whose output volume is the epoch-
    // weighted corpus size.
    "q_mix_epochs" -> ((s, dir) => {
      val ep = Fixtures.documents(s, dir)
        .withColumn("epochs",
          when(col("source").isin("src0", "src1", "src2", "src3"), lit(2.5))
            .when(col("source").isin("src4", "src5", "src6", "src7"), lit(1.5))
            .otherwise(lit(1.0)))
        .withColumn("u",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 6), 16, 10)
            .cast("double") / lit(16777216.0))
        .withColumn("n_copies",
          (floor(col("epochs")) +
            when(col("u") < col("epochs") - floor(col("epochs")), 1).otherwise(0))
            .cast("long"))
      ep.select(col("doc_id"), col("source"),
          explode(sequence(lit(1L), col("n_copies"))).as("copy"))
        .orderBy("doc_id", "copy")
    }),

    // Corpus-duplicated-span fraction (the line-dedup signal at
    // shingle granularity, CCNet/Gopher-style): per document, the
    // fraction of its distinct 5-gram spans that appear in ≥ 2
    // documents corpus-wide. Spans are built map-side from the token
    // array (index transform, per-doc distinct INSIDE the row), so
    // the plan is one span-keyed grouped count (constant-width keys)
    // plus one span-keyed join back — the same linear candidate shape
    // as the decontamination queries, never an all-pairs stage. At a
    // 100× corpus the span vocabulary grows sub-linearly and hot
    // spans would be df-capped like q_dedup_near's token buckets.
    "q_text_dupspan" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => length(x) > lit(0)).as("a"))
        .filter(size(col("a")) >= 5)
      // spans dictionary-encoded to 64-bit xxhash64 keys inside the
      // row (round 19) — the span string never reaches the exchange;
      // see q_text_despan for the full rationale (guide §2.3). Counts
      // per doc and per span are hash-invariant, so the output is
      // unchanged (oracle-pinned at every SF).
      val spans = d.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(a)-4), i -> xxhash64(concat_ws(' ', a[i-1], a[i], a[i+1], a[i+2], a[i+3])))")))
          .as("span"))
      // A span with df = 1 belongs to exactly ONE document, so
      //   n_dup(doc) = n_spans(doc) − #spans unique to doc.
      // That identity replaces the span-keyed join-back (which would
      // shuffle every span string a second and third time) with one
      // span-keyed aggregate + two doc-keyed metadata-sized ones —
      // at 100 TB the span strings cross the wire exactly once.
      val nSpans = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      val uniq = spans.groupBy("span")
        .agg(count(lit(1)).as("df"), min("doc_id").as("only_doc"))
        .filter(col("df") === 1)
        .groupBy(col("only_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_uniq"))
      nSpans.join(uniq, Seq("doc_id"), "left")
        .withColumn("n_dup", col("n_spans") - coalesce(col("n_uniq"), lit(0L)))
        .withColumn("dup_frac", round(col("n_dup") / col("n_spans"), 5))
        .select("doc_id", "n_spans", "n_dup", "dup_frac")
        .orderBy("doc_id")
    }),

    // Span REMOVAL (CCNet-style line dedup, token-granular): delete
    // every token covered by a corpus-duplicated 5-gram (a span
    // appearing in >= 2 docs) and emit the cleaned text + removal
    // stats — the actual cleaning step a pretraining pipeline runs
    // after q_text_dupspan measures the damage. Shape stays span-keyed
    // linear: one span-keyed df aggregate, one span-keyed join-back to
    // recover WHICH positions are covered (removal genuinely needs
    // them — the df-identity shortcut only yields counts), then one
    // doc-keyed fold; the per-doc HOF pass (`filter` with index +
    // `exists` over the start list) is map-side. No window, no
    // cartesian — span strings cross the wire twice, bounded.
    "q_text_despan" -> ((s, dir) => {
      // Tokenized frame materialized ONCE for its three consumers
      // (round 19): position-spans, the dup-span df aggregate, and the
      // final reconstruction join each re-scanned the parquet and
      // re-split every document as plain views — three full tokenize
      // passes per run. One per-execution checkpoint runs the split
      // once (same device as q_dedup_winnow's fps checkpoint);
      // measured 2.1 → 1.7 s same-box at sf0.1 and 47 → 33 s at sf3
      // (8 GB heap — the token arrays spill-safely at 30×).
      val d = Fixtures.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => length(x) > lit(0)).as("a"))
        .localCheckpoint(true)
      // Spans are DICTIONARY-ENCODED to 64-bit xxhash64 keys the
      // moment they leave the row (round 19, guide §2.3 "narrower
      // types"/"shuffle keys instead of payloads"): the span STRING
      // (five tokens, ~30–40 bytes) never reaches an exchange, a hash
      // table, or a broadcast — only its 8-byte hash does, on both the
      // df-aggregate side and the position side, shrinking the one
      // span-keyed exchange and the dup-set broadcast ~5×. The span
      // text itself is never output, so the result is unchanged (the
      // oracle pins that at every SF); a 64-bit collision over the
      // span dictionary is ~|spans|²/2⁶⁵ — negligible, and the
      // deterministic fixtures make the green oracle runs binding.
      val posSpans = d.filter(size(col("a")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(a)-4), i -> struct(i AS start, " +
            "xxhash64(concat_ws(' ', a[i-1], a[i], a[i+1], a[i+2], a[i+3])) AS span))"))
          .as("ps"))
        .select(col("doc_id"), col("ps.start").as("start"), col("ps.span").as("span"))
      // df = number of DOCS containing the span (per-doc-distinct),
      // matching q_text_dupspan's definition of "duplicated". The
      // per-doc distinct happens INSIDE the row (array_distinct over
      // the hashed-span array, round 18) so the df count needs ONE
      // span-keyed exchange — the old distinct().groupBy() shape
      // shuffled the span strings twice (once hash(doc_id, span), once
      // hash(span)).
      val dup = d.filter(size(col("a")) >= 5)
        .select(explode(array_distinct(expr(
          "transform(sequence(1, size(a)-4), " +
            "i -> xxhash64(concat_ws(' ', a[i-1], a[i], a[i+1], a[i+2], a[i+3])))")))
          .as("span"))
        .groupBy("span").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select("span")
      val dupStarts = posSpans.join(dup, "span")
        .groupBy("doc_id").agg(collect_set(col("start")).as("starts"))
      d.join(dupStarts, Seq("doc_id"), "left")
        .withColumn("starts",
          coalesce(col("starts"), expr("CAST(array() AS array<int>)")))
        // 1-based token position p is removed iff some dup-span start
        // s covers it (s <= p <= s+4)
        .withColumn("kept", expr(
          "filter(a, (x, i) -> NOT exists(starts, s -> s <= i + 1 AND i + 1 <= s + 4))"))
        .select(col("doc_id"),
          array_join(col("kept"), " ").as("clean_text"),
          size(col("a")).cast("long").as("n_tokens"),
          (size(col("a")) - size(col("kept"))).cast("long").as("n_removed"),
          when(size(col("a")) === 0, lit(0.0))
            .otherwise(round((size(col("a")) - size(col("kept"))).cast("double")
              / size(col("a")), 5)).as("removed_frac"))
        .orderBy("doc_id")
    }),

    // k-anonymity suppression over quasi-identifiers (the privacy
    // gate a training-data release runs before shipping metadata):
    // documents whose (lang, source) group holds fewer than k=20
    // members get both identifiers suppressed to '*'. One grouped
    // count (quasi-identifier-vocabulary-sized) broadcast back over
    // the corpus — a linear pass with a metadata-sized build side at
    // any scale.
    "q_text_kanon" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val groups = docs.groupBy("lang", "source").agg(count(lit(1)).as("grp_n"))
      docs.join(broadcast(groups), Seq("lang", "source"))
        .select(col("doc_id"),
          when(col("grp_n") >= 20, col("lang")).otherwise("*").as("lang_out"),
          when(col("grp_n") >= 20, col("source")).otherwise("*").as("source_out"),
          col("n_chars"))
        .orderBy("doc_id")
    }),

    // Zipf-law fit over the corpus token distribution: least-squares
    // slope of ln(frequency) against ln(rank) — the one-number corpus
    // health check (natural text sits near −1; templated/synthetic
    // corpora drift). Corpus-sized work is the distributed token
    // count. Every token needs its ln(rank), so the rank itself is
    // computed DISTRIBUTED: range-sort the vocabulary by (cnt desc,
    // tok) into globally-ordered partition runs, then zipWithIndex
    // (one count-per-partition pass + one offset-adding map pass) —
    // the canonical two-pass distributed rank. No single-partition
    // window anywhere (PlanSpec pins that): a billion-token
    // vocabulary never funnels to one task. Tie order within a cnt
    // group cannot change the answer — the multiset of (rank, cnt)
    // is invariant under permuting equal-cnt rows.
    "q_tok_zipf" -> ((s, dir) => {
      import s.implicits._
      val tf = Fixtures.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val sorted = tf
        .repartitionByRange(32, col("cnt").desc, col("tok").asc)
        .sortWithinPartitions(col("cnt").desc, col("tok").asc)
        .select(col("cnt")).as[Long]
      val ranked = sorted.rdd.zipWithIndex()
        .map { case (cnt, i) => (i + 1L, cnt) }
        .toDF("rk", "cnt")
        .select(log(col("rk")).as("x"), log(col("cnt")).as("y"))
      ranked.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"),
          col("n").as("vocab_size"))
    }),

    // Distributed BPE pair statistics (the induction step of byte-pair
    // / wordpiece training): count every ADJACENT token pair across
    // the corpus and rank the merge candidates. One map-side transform
    // (sequence + transform HOFs — no UDF, stays codegen'd) expands
    // each document to its n−1 bigrams, then a single grouped count;
    // at 100 TB the shuffle carries (pair, partial count), bounded by
    // vocabulary², with map-side combine doing the heavy fold.
    "q_tok_bpe_pairs" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(split(col("text"), " ").as("w"))
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(40)),

    // Per-source document caps (domain caps): keep at most 10 docs per
    // source, preferring longer ones — the RefinedWeb/C4 guard against
    // one domain flooding the corpus. One shuffle keyed by source;
    // rank <= k lowers to WindowGroupLimit (partial top-k map-side
    // before the shuffle), so the exchange carries at most k rows per
    // (source, partition), not the domain's whole flood.
    "q_cap_source" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("rk") <= 10)
        .select(col("doc_id"), col("source"), col("n_chars"), col("rk").cast("long").as("rk"))
        .orderBy("source", "rk")),

    // Benchmark-contamination screen (decontamination): flag training
    // docs sharing any 4-token shingle with the benchmark set (docs
    // 0-19 stand in for an eval benchmark). The benchmark's shingle
    // set is tiny next to the corpus → Spark auto-broadcasts it, so
    // each train doc's shingles probe a hash table map-side and only
    // matches shuffle (keyed by doc for the count) — linear in the
    // corpus, no all-pairs. Per-doc shingle dedup happens INSIDE the
    // row (array_distinct before the explode): a corpus-wide
    // `.distinct()` here would shuffle every shingle of every
    // document — the one stage that would dominate at 100 TB.
    "q_text_contaminate" -> ((s, dir) => {
      // token array PROJECTED once per row before the gram transform
      // (round 18): with `split(text)` inlined inside the transform
      // lambda, the lambda body re-split the whole text PER ELEMENT —
      // O(tokens²) per document, the exact trap the winnowFps comment
      // documents. Same grams, one split per row.
      def grams(d: org.apache.spark.sql.DataFrame) = d
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .filter(size(col("a")) >= 4)
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(1), size(col("a")) - lit(3)),
          i => array_join(slice(col("a"), i, lit(4)), " ")))).as("gram"))
      val all = Fixtures.documents(s, dir)
      val bench = grams(all.filter(col("doc_id") < 20)).select("gram").distinct()
      grams(all.filter(col("doc_id") >= 20))
        .join(bench, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id")
    }),

    // Deterministic train/val/test split — the standard leakage-proof
    // corpus partition: membership is a pure function of doc_id's md5
    // prefix (~94/3/3), so re-runs, late-arriving shards, and other
    // engines agree on every document's split with NO coordination.
    // Map-side CASE + one tiny aggregate; at 100 TB the split column
    // is free and the only shuffle carries 3 rows per partition.
    "q_split_hash" -> ((s, dir) => {
      val b = substring(md5(col("doc_id").cast("string")), 1, 2)
      Fixtures.documents(s, dir)
        .withColumn("split",
          when(b <= "ef", "train").when(b <= "f7", "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
        .orderBy("split")
    }),

    // PII-style regex scrubbing: redact a term set, report per-doc hit
    // counts and the post-redaction length. Pure per-row codegen'd
    // expressions (regexp_extract_all + regexp_replace) — linear,
    // no shuffle; the filter keeps the audit output to touched docs.
    "q_text_redact" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"),
          expr("size(regexp_extract_all(text, '\\\\b(customer|order|value)\\\\b', 0))")
            .as("n_hits"),
          length(regexp_replace(col("text"), "\\b(customer|order|value)\\b", "[X]"))
            .as("redacted_len"),
          length(col("text")).as("orig_len"))
        .filter(col("n_hits") > 0)
        .orderBy("doc_id")),

    // Token-count histogram (sequence-length planning for packing /
    // truncation budgets): bucket by 25-token bins. Map-side bucket
    // expression + one aggregate over ~#buckets rows.
    "q_tok_histogram" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select((floor(size(split(col("text"), " ")) / 25) * 25)
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket")),

    // Deterministic corpus shuffle — the training-order shuffle done
    // reproducibly: global sort by md5(doc_id) (unique key ⇒ total
    // order), so every run and every engine emits the identical
    // sequence. Spark's orderBy range-partitions (sampled bounds),
    // so at 100 TB this is the standard distributed sort, not a
    // single-reducer funnel; the limit keeps the demo output bounded.
    "q_shuffle_det" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"),
          md5(col("doc_id").cast("string")).as("shuffle_key"), col("source"))
        .orderBy("shuffle_key")
        .limit(200)),

    // Repetition ratio — the C4/Gopher-style quality signal: fraction
    // of duplicate word bigrams per document. Bigrams come from
    // zipping the token array with its own tail (all inside codegen);
    // ratio emitted as floor(x*1e4+0.5) for cross-engine determinism.
    "q_text_repetition" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val bg = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))
      Fixtures.documents(s, dir)
        .filter(size(split(col("text"), " ")) >= 2)
        .select(col("doc_id"), bg.as("bg"))
        .select(col("doc_id"),
          size(col("bg")).cast("long").as("n_bigrams"),
          floor((lit(1.0) - size(array_distinct(col("bg"))) * lit(1.0) / size(col("bg")))
            * 10000 + 0.5).as("rep_x1e4"))
        .orderBy("doc_id")
    }),

    // Token-distribution Shannon entropy per document — low entropy =
    // repetitive/templated text, a standard quality gate next to the
    // repetition ratio. One keyed shuffle for tf, re-aggregated per
    // doc; the -Σ p·ln p sum is over identical (tf, n) integer pairs
    // on both engines, so the floor-scaled result is stable (swept at
    // all three SFs).
    "q_text_entropy" -> ((s, dir) => {
      val tf = Fixtures.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val n = tf.groupBy("doc_id").agg(sum("tf").as("n"))
      val p = col("tf") * lit(1.0) / col("n")
      tf.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(floor(-sum(p * log(p)) * 10000 + 0.5).as("entropy_x1e4"))
        .orderBy("doc_id")
    }),

    // Unigram-LM cross-entropy scoring — the CCNet/Gopher-style
    // perplexity quality filter with a bounded vocabulary: train
    // p(tok) = cnt/total over the corpus, keep only the TOP-16 tokens
    // by count (tie → token asc; TakeOrderedAndProject, so the vocab
    // is a distributed top-K and stays broadcast-sized at ANY corpus
    // scale), and score each document in bits/token with an OOV floor
    // of 1/total. High bits = improbable text — the filter signal.
    // Sum terms are per-(doc, tok) groups like q_text_entropy, so both
    // engines fold identical (tf, cnt, total) tuples; floor-scaled.
    "q_text_lm_score" -> ((s, dir) => {
      val tf = Fixtures.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      // corpus counts from the tf aggregate (its rows ARE the distinct
      // (doc, tok) pairs) — ReuseExchange shares the scan+shuffle
      val counts = tf.groupBy("tok").agg(sum("tf").as("cnt"))
      val total = counts.agg(sum("cnt").as("total"))
      val vocab = counts.orderBy(col("cnt").desc, col("tok")).limit(16)
      val bits = -log(coalesce(col("cnt"), lit(1L)) * lit(1.0) / col("total")) /
        log(lit(2.0))
      tf.join(broadcast(vocab), Seq("tok"), "left")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(floor(sum(col("tf") * bits) / sum(col("tf")) * 10000 + 0.5)
          .as("bits_x1e4"))
        .orderBy("doc_id")
    }),

    // Bigram-LM perplexity per document (the KenLM-style quality
    // filter, self-trained on the corpus): average -log2 P(w2|w1)
    // over the document's bigrams, conditional probabilities from the
    // corpus bigram table. Bigrams expand map-side (index transform,
    // no per-doc window); the LM is vocab²-bounded so the per-doc
    // scoring join is a constant-width keyed shuffle — at 100 TB the
    // LM table shrinks relative to the corpus and AQE broadcasts it.
    // Integer-floored ×1e4 like q_text_lm_score (rule D2: the 1e-4
    // absolute rounding absorbs double-summation order).
    "q_text_bigram_ppl" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => length(x) > lit(0)).as("a"))
        .filter(size(col("a")) >= 2)
      val bi = d.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(a)-1), i -> struct(a[i-1] AS w1, a[i] AS w2))"))
        .as("b")).select(col("doc_id"), col("b.w1"), col("b.w2"))
      val cnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy("w1").agg(sum("cnt").as("tot"))
      val lm = cnt.join(tot, "w1")
        .select(col("w1"), col("w2"),
          (col("cnt") * lit(1.0) / col("tot")).as("p"))
      val bits = -log(col("p")) / log(lit(2.0))
      bi.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          floor(sum(bits) / count(lit(1)) * 10000 + 0.5).as("bits_x1e4"))
        .orderBy("doc_id")
    }),

    // Cross-document n-gram novelty — the decontamination primitive:
    // the fraction of a document's distinct token trigrams that appear
    // in NO other document. The same shape checks a training corpus
    // against a benchmark's n-grams (overlap = 1 - novelty); cost is
    // one explode + two keyed shuffles (gram df, then per-doc ratio) —
    // linear, the 100 TB decontamination-sweep plan.
    "q_text_novelty" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val grams = zip_with(
        zip_with(slice(toks, lit(1), size(toks) - 2),
                 slice(toks, lit(2), size(toks) - 2),
                 (a, b) => concat(a, lit(" "), b)),
        slice(toks, lit(3), size(toks) - 2),
        (ab, c) => concat(ab, lit(" "), c))
      val g = Fixtures.documents(s, dir)
        .filter(col("doc_id") < 300 && size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), explode(array_distinct(grams)).as("gram"))
      // gram df as a window over the gram partition (round 18): one
      // hash(gram) exchange instead of grouped-count + join-back — the
      // per-doc grams are already distinct, so the window count IS the
      // old ndocs
      g.withColumn("ndocs", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("gram")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          floor(sum(when(col("ndocs") === 1, 1.0).otherwise(0.0)) / count(lit(1))
            * 10000 + 0.5).as("novelty_x1e4"))
        .orderBy("doc_id")
    }),

    // Sequence-packing plan — the batch-construction step that turns a
    // curated corpus into fixed-token training chunks: docs are packed
    // greedily in deterministic (source, doc_id) order, and each doc's
    // chunk is the 256-token block its first token lands in
    // (floor(preceding-tokens / 256)). One window cumsum keyed by
    // source + one grouped agg — both shuffles narrow (source key),
    // linear at corpus scale; the decode/concat half is I/O the engine
    // schedules per (source, chunk) unit.
    "q_pack_chunks" -> ((s, dir) => {
      val cum = sum(col("n_tok")).over(
        Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      Fixtures.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("n_tok"))
        .withColumn("chunk_id",
          floor((cum - col("n_tok")) / 256).cast("long"))
        .groupBy("source", "chunk_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast("long").as("n_tokens"))
        .orderBy("source", "chunk_id")
    }),

    // Temperature-scaled mixture weights (T = 0.7) — the standard
    // corpus-mixing computation: upsample low-resource sources,
    // dampen the head (w_i ∝ c_i^T). The per-source token counts
    // reduce to #sources rows before any non-linear math, so the
    // whole computation after one grouped agg is driver-trivial; the
    // pow() output is floor-pinned to integers BEFORE summing so the
    // normalization is exact integer math on both engines. Caveat the
    // pin rests on: pow() is transcendental, and IEEE 754 does not
    // require correctly-rounded pow, so the JVM's and the oracle
    // libm's results may differ by an ulp — floor(x·1000 + 0.5)
    // absorbs that everywhere except a value landing within an ulp of
    // a .0005 boundary (none of the fixture values do; a paranoid
    // variant would compare at a coarser scale).
    "q_mix_temperature" -> ((s, dir) => {
      val c = Fixtures.documents(s, dir)
        .select(col("source"), size(split(col("text"), " ")).as("n_tok"))
        .groupBy("source").agg(sum("n_tok").as("toks"))
      val p = c.withColumn("p", floor(pow(col("toks"), 0.7) * 1000 + 0.5))
      val tot = p.agg(sum("p").as("tp"))
      p.crossJoin(broadcast(tot))
        .select(col("source"), col("toks"),
          floor(col("p") * 1000000.0 / col("tp") + 0.5).as("w_x1e6"))
        .orderBy("source")
    }),

    // BM25 retrieval scoring — the ranking primitive behind
    // retrieval-based curation (quality classifiers seeded from a
    // reference corpus, contamination sweeps, hard-negative mining).
    // Standard k1=1.2, b=0.75 with the +1 idf form; every input to the
    // per-(doc, term) formula is an exact integer (tf, df, dl, N) or a
    // ratio of integer aggregates (avgdl), and each term's
    // contribution is floor-pinned to an integer BEFORE the per-doc
    // sum — summation order across query terms can never move the
    // result. The ln() in idf is the one transcendental: IEEE 754
    // does not require it correctly rounded, so the two engines'
    // libms may differ by an ulp and the floor-pin absorbs that
    // unless a score sits within an ulp of an integer boundary
    // (none of the fixture scores do). Cost: one
    // tf shuffle keyed by (doc, token) + a 3-row broadcast of the
    // query terms — linear in corpus size.
    "q_bm25" -> ((s, dir) => {
      val qterms = Seq("data", "spark", "fast")
      val docs = Fixtures.documents(s, dir)
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").isin(qterms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum("dl") * lit(1.0) / count(lit(1))).as("avgdl"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
      val term = col("tf") * 2.2 /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      tf.join(broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          floor(idf * term * 1000000 + 0.5).cast("long").as("c_x1e6"))
        .groupBy("doc_id").agg(sum("c_x1e6").as("score_x1e6"))
        .orderBy(col("score_x1e6").desc, col("doc_id"))
        .limit(20)
    }),

    // Content fingerprint: polynomial rolling hash over the character
    // stream, h ← (31·h + codepoint) mod 1e9+7, as a sequential
    // `aggregate` fold — order-dependent by construction (that's what
    // distinguishes it from the bag-of-bytes sha256 in Dedup), and
    // deterministic on both engines.
    "q_text_fingerprint" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(col("doc_id"),
          // filter(''): Spark's split keeps a trailing empty element
          // (Java split limit -1); DuckDB's char split does not.
          aggregate(filter(split(col("text"), ""), c => c =!= ""), lit(0L),
            (h, c) => (h * 31L + ascii(c)) % 1000000007L).as("fp"))
        .orderBy("doc_id")),

    // WINNOWING fingerprints (the MOSS plagiarism-detection selection,
    // Schleimer/Wilkerson/Aiken 2003): hash every k=3-gram of tokens
    // (the md5-prefix 44-bit id convention — both engines compute the
    // identical value), then keep the MINIMUM hash of every w=4
    // window of consecutive grams, deduplicated. Guarantee: any two
    // documents sharing a run of ≥ w+k-1 tokens share a fingerprint —
    // the robust near-dup/overlap primitive between whole-doc hashing
    // (too brittle) and all-gram storage (too big: winnowing keeps
    // ~2/(w+1) of grams). ENTIRELY map-side — array HOFs inside
    // whole-stage codegen, zero joins, zero aggregation; the only
    // exchange is the output sort. The 100 TB shape: fingerprints
    // stream out at input-proportional cost.
    "q_text_winnow" -> ((s, dir) => winnowFps(s, dir).orderBy("doc_id", "fp")))

  /** Winnowing fingerprint rows (doc_id, fp), deduplicated, unordered
    * — shared by `q_text_winnow` (emits them) and `q_dedup_winnow`
    * (joins docs on shared fingerprints).
    */
  private[graft] def winnowFps(s: SparkSession, dir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      // Gram construction via zip_with over PRE-SHIFTED arrays: each
      // slice evaluates once per ROW and the lambdas touch only their
      // bound elements — linear. (The tempting index-lambda form
      // `transform(sequence(1, n-2), i => md5(slice(toks, i, 3)))`
      // re-instantiates the token-array EXPRESSION inside the lambda,
      // i.e. re-splits the whole text per element: O(n²) per document
      // — measured 100× slower at sf0.1.)
      val toksE = filter(split(col("text"), " "), c => c =!= "")
      val n = size(col("toks"))
      val t1 = slice(col("toks"), lit(2), greatest(n - 1, lit(0)))
      val t2 = slice(col("toks"), lit(3), greatest(n - 2, lit(0)))
      // zip_with pads the shorter side with nulls; concat_ws skips
      // nulls, so the 2-token tail pairs produce non-null strings but
      // their grams null out through t2 and are filtered.
      val pair = zip_with(col("toks"), t1, (a, b) => concat_ws(" ", a, b))
      val gramsAll = zip_with(pair, t2, (p, c) =>
        when(c.isNotNull,
          conv(substring(md5(concat_ws(" ", p, c)), 1, 11), 16, 10)
            .cast("long")))
      // posexplode_OUTER + a post-filter on the GENERATED column
      // (round 19): a plain posexplode makes the optimizer infer
      // `size(grams) > 0 AND isnotnull(grams)` and push it below the
      // projections, substituting the alias — the executed plan then
      // carried the ENTIRE gram pipeline (split × 6, both zip_withs,
      // the md5 per gram) a second time inside a per-row Filter ahead
      // of the projection that computes it for real. The outer form
      // infers no filter; empty-gram docs emit one (null, null) row
      // that the isNotNull on `g` — a generated column, not pushable
      // below the Generate — drops. Row set identical (the grams
      // array never holds nulls: they are filtered inside the row).
      val rows = Fixtures.documents(s, dir)
        .select(col("doc_id"), toksE.as("toks"))
        .select(col("doc_id"),
          filter(gramsAll, g => g.isNotNull).as("grams"))
        .select(col("doc_id"), posexplode_outer(col("grams")).as(Seq("gpos", "g")))
        .filter(col("g").isNotNull)
      // Window minima per document: ROWS frames over (doc_id, gpos) —
      // the shuffle is BY DOCUMENT (bounded partitions at any corpus
      // size), never global. Tail frames narrower than w=4 are not
      // winnowing windows (wcount filter); docs with fewer than 4
      // grams contribute their single overall minimum.
      val w4 = Window.partitionBy("doc_id").orderBy("gpos").rowsBetween(0, 3)
      val whole = Window.partitionBy("doc_id")
      val win = rows
        .withColumn("winmin", min("g").over(w4))
        .withColumn("wcount", count("g").over(w4))
        .withColumn("ng", count("g").over(whole))
      // Short docs (ng < 4) fold into the SAME pass (round 18): their
      // 0..3 frame at gpos = 0 spans every gram, so winmin there IS
      // the overall minimum the old union branch re-derived with a
      // second copy of the whole explode+window subtree plus a grouped
      // min — one disjunctive filter replaces union + groupBy and the
      // window pipeline executes once. Output set unchanged.
      win.filter((col("ng") >= 4 && col("wcount") === 4) ||
          (col("ng") < 4 && col("gpos") === 0))
        .select(col("doc_id"), col("winmin").as("fp"))
        .distinct()
  }

  val oracle: Map[String, String] = Map(
    "q_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
        |       WHERE tok IN ('data', 'spark', 'fast') GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |       FROM documents),
        |stats AS (SELECT count(*) AS n_docs,
        |                 sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |c AS (SELECT tf.doc_id,
        |             CAST(floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |               * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        |               * 1000000 + 0.5) AS BIGINT) AS c_x1e6
        |      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
        |      CROSS JOIN stats)
        |SELECT doc_id, CAST(sum(c_x1e6) AS BIGINT) AS score_x1e6
        |FROM c GROUP BY doc_id
        |ORDER BY score_x1e6 DESC, doc_id LIMIT 20""".stripMargin,
    "q_pack_chunks" ->
      """WITH t AS (SELECT doc_id, source,
        |                  len(string_split(text, ' ')) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |                              ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM t)
        |SELECT source, CAST(floor((cum - n_tok) / 256) AS BIGINT) AS chunk_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, chunk_id""".stripMargin,
    "q_mix_temperature" ->
      """WITH c AS (SELECT source, sum(len(string_split(text, ' '))) AS toks
        |           FROM documents GROUP BY 1),
        |p AS (SELECT source, toks,
        |             CAST(floor(pow(toks, 0.7) * 1000 + 0.5) AS BIGINT) AS p
        |      FROM c)
        |SELECT source, CAST(toks AS BIGINT) AS toks,
        |       CAST(floor(p * 1000000.0 / (SELECT sum(p) FROM p) + 0.5)
        |            AS BIGINT) AS w_x1e6
        |FROM p ORDER BY source""".stripMargin,
    "q_pipeline_pretrain" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |                  string_split(text, ' ') AS toks FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM documents
        |         GROUP BY sha256(text)),
        |gated AS (SELECT t.doc_id, len(toks) AS n_tok, toks
        |          FROM t JOIN keep USING (doc_id)
        |          WHERE lang = 'en' AND len(toks) >= 20
        |            AND len(list_filter(toks, x -> x IN ('the', 'a')))
        |                  * 1.0 / len(toks) < 0.4),
        |bgrams AS (SELECT DISTINCT
        |             unnest(list_transform(range(1, len(toks) - 2),
        |                    i -> array_to_string(list_slice(toks, i, i + 3), ' ')))
        |               AS gram
        |           FROM t WHERE doc_id < 20 AND len(toks) >= 4),
        |cgrams AS (SELECT DISTINCT doc_id,
        |             unnest(list_transform(range(1, len(toks) - 2),
        |                    i -> array_to_string(list_slice(toks, i, i + 3), ' ')))
        |               AS gram
        |           FROM gated WHERE doc_id >= 20 AND n_tok >= 4),
        |contaminated AS (SELECT DISTINCT doc_id
        |                 FROM cgrams JOIN bgrams USING (gram)),
        |clean AS (SELECT doc_id, n_tok FROM gated
        |          WHERE doc_id >= 20
        |            AND doc_id NOT IN (SELECT doc_id FROM contaminated))
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM (SELECT CASE
        |        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'ef'
        |          THEN 'train'
        |        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'f7'
        |          THEN 'val'
        |        ELSE 'test' END AS split, n_tok
        |      FROM clean)
        |GROUP BY split ORDER BY split""".stripMargin,
    "q_pipeline_curate" ->
      """WITH q AS (SELECT doc_id, text, lang,
        |         len(string_split(text, ' ')) AS n_tok,
        |         len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |         len(list_filter(string_split(text, ' '),
        |             t -> t IN ('the', 'a'))) AS n_stop
        |       FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM documents
        |         GROUP BY sha256(text))
        |SELECT doc_id, lang, n_tok,
        |       CAST(floor((n_uniq * 1.0 / n_tok) * 10000 + 0.5) AS BIGINT)
        |         AS ttr_x1e4
        |FROM q JOIN keep USING (doc_id)
        |WHERE lang = 'en' AND n_tok >= 20
        |  AND n_stop * 1.0 / n_tok < 0.4
        |  AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'
        |ORDER BY doc_id""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
        |ORDER BY doc_id""".stripMargin,
    "q_text_kanon" ->
      """WITH g AS (SELECT lang, source, count(*) AS grp_n
        |           FROM documents GROUP BY 1, 2)
        |SELECT doc_id,
        |       CASE WHEN grp_n >= 20 THEN lang ELSE '*' END AS lang_out,
        |       CASE WHEN grp_n >= 20 THEN source ELSE '*' END AS source_out,
        |       n_chars
        |FROM documents JOIN g USING (lang, source)
        |ORDER BY doc_id""".stripMargin,
    "q_text_bigram_ppl" ->
      """WITH d AS (SELECT doc_id,
        |                  list_filter(string_split(text, ' '), x -> len(x) > 0) AS a
        |           FROM documents),
        |b AS (SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS z
        |      FROM d WHERE len(a) >= 2),
        |t2 AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM b),
        |c AS (SELECT w1, w2, count(*) AS cnt FROM t2 GROUP BY 1, 2),
        |tt AS (SELECT w1, sum(cnt) AS tot FROM c GROUP BY 1),
        |lm AS (SELECT w1, w2, cnt * 1.0 / tot AS p FROM c JOIN tt USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(floor(sum(-ln(p) / ln(2)) / count(*) * 10000 + 0.5) AS BIGINT)
        |         AS bits_x1e4
        |FROM t2 JOIN lm USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_tok_bigram_lm" ->
      """WITH d AS (SELECT doc_id,
        |                  list_filter(string_split(text, ' '), x -> len(x) > 0) AS a
        |           FROM documents),
        |b AS (SELECT unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS z
        |      FROM d WHERE len(a) >= 2),
        |c AS (SELECT z[1] AS w1, z[2] AS w2, count(*) AS cnt FROM b GROUP BY 1, 2),
        |t AS (SELECT w1, sum(cnt) AS tot FROM c GROUP BY 1)
        |SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt, round(cnt / tot, 5) AS p
        |FROM c JOIN t USING (w1)
        |ORDER BY cnt DESC, w1, w2 LIMIT 30""".stripMargin,
    "q_mix_epochs" ->
      """WITH d AS (SELECT doc_id, source,
        |  CASE WHEN source IN ('src0','src1','src2','src3') THEN 2.5
        |       WHEN source IN ('src4','src5','src6','src7') THEN 1.5
        |       ELSE 1.0 END AS epochs,
        |  (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 6))::BIGINT)::DOUBLE
        |    / 16777216.0 AS u
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |             CAST(floor(epochs) +
        |                  CASE WHEN u < epochs - floor(epochs) THEN 1 ELSE 0 END
        |                  AS BIGINT) AS n_copies
        |      FROM d)
        |SELECT doc_id, source, CAST(copy AS BIGINT) AS copy
        |FROM n, LATERAL unnest(generate_series(1, n_copies)) AS t(copy)
        |ORDER BY doc_id, copy""".stripMargin,
    "q_text_dupspan" ->
      """WITH d AS (SELECT doc_id,
        |                  list_filter(string_split(text, ' '), x -> len(x) > 0) AS a
        |           FROM documents),
        |s AS (SELECT doc_id,
        |             unnest(list_distinct(list_transform(
        |               list_zip(a[1:len(a)-4], a[2:len(a)-3], a[3:len(a)-2],
        |                        a[4:len(a)-1], a[5:len(a)]),
        |               z -> z[1] || ' ' || z[2] || ' ' || z[3] || ' ' || z[4] || ' ' || z[5]))) AS span
        |      FROM d WHERE len(a) >= 5),
        |f AS (SELECT span, count(*) AS df FROM s GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / count(*), 5) AS dup_frac
        |FROM s JOIN f USING (span)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_despan" ->
      """WITH d AS (SELECT doc_id,
        |                  list_filter(string_split(text, ' '), x -> len(x) > 0) AS a
        |           FROM documents),
        |ps AS (SELECT doc_id, i,
        |              a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3] || ' ' || a[i+4] AS span
        |       FROM d, unnest(generate_series(1, len(a) - 4)) AS t(i)
        |       WHERE len(a) >= 5),
        |dup AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM ps)
        |        GROUP BY span HAVING count(*) >= 2),
        |st AS (SELECT ps.doc_id, list(ps.i) AS starts
        |       FROM ps JOIN dup USING (span) GROUP BY ps.doc_id),
        |k AS (SELECT d.doc_id, d.a,
        |             list_filter(d.a, (x, p) ->
        |               len(list_filter(coalesce(st.starts, []),
        |                               s -> s <= p AND p <= s + 4)) = 0) AS kept
        |      FROM d LEFT JOIN st USING (doc_id))
        |SELECT doc_id,
        |       coalesce(array_to_string(kept, ' '), '') AS clean_text,
        |       CAST(len(a) AS BIGINT) AS n_tokens,
        |       CAST(len(a) - len(kept) AS BIGINT) AS n_removed,
        |       CASE WHEN len(a) = 0 THEN 0.0
        |            ELSE round((len(a) - len(kept)) / len(a), 5) END AS removed_frac
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_sample_weighted" ->
      """SELECT doc_id, lang, n_chars,
        |       (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT)::DOUBLE
        |         / n_chars AS pri
        |FROM documents
        |ORDER BY pri, doc_id LIMIT 100""".stripMargin,
    "q_sample_importance" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT)::DOUBLE
        |        / 16777216.0
        |      < least(1.0, n_chars / 600.0)
        |ORDER BY doc_id""".stripMargin,
    "q_tok_zipf" ->
      """WITH tf AS (SELECT tok, count(*) AS cnt
        |            FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |                  FROM documents) GROUP BY tok),
        |r AS (SELECT ln(row_number() OVER (ORDER BY cnt DESC, tok)) AS x,
        |             ln(cnt) AS y
        |      FROM tf)
        |SELECT round((count(*) * sum(x * y) - sum(x) * sum(y)) /
        |             (count(*) * sum(x * x) - sum(x) * sum(x)), 4) AS zipf_slope,
        |       CAST(count(*) AS BIGINT) AS vocab_size
        |FROM r""".stripMargin,
    "q_tok_bpe_pairs" ->
      """WITH p AS (
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |                               i -> ws[i] || ' ' || ws[i + 1])) AS pair
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents))
        |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 40""".stripMargin,
    "q_text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |n AS (SELECT doc_id, sum(tf) AS n FROM tf GROUP BY 1)
        |SELECT tf.doc_id,
        |       CAST(floor(-sum((tf * 1.0 / n) * ln(tf * 1.0 / n))
        |            * 10000 + 0.5) AS BIGINT) AS entropy_x1e4
        |FROM tf JOIN n USING (doc_id)
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q_text_lm_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |counts AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt
        |           FROM tf GROUP BY 1),
        |total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
        |vocab AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok LIMIT 16)
        |SELECT doc_id,
        |       CAST(floor(sum(tf * -ln(CAST(coalesce(v.cnt, 1) AS DOUBLE)
        |                               / total.total) / ln(2.0))
        |            / sum(tf) * 10000 + 0.5) AS BIGINT) AS bits_x1e4
        |FROM tf LEFT JOIN vocab v USING (tok), total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 300),
        |g AS (SELECT DISTINCT doc_id,
        |             unnest(list_transform(range(1, len(toks) - 1),
        |                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |               AS gram
        |      FROM t WHERE len(toks) >= 3),
        |dfq AS (SELECT gram, count(*) AS ndocs FROM g GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(floor(sum(CASE WHEN ndocs = 1 THEN 1.0 ELSE 0.0 END)
        |            / count(*) * 10000 + 0.5) AS BIGINT) AS novelty_x1e4
        |FROM g JOIN dfq USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <=
        |      CASE WHEN lang = 'en' THEN '0c' ELSE '33' END
        |ORDER BY doc_id""".stripMargin,
    "q_cap_source" ->
      """SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    "q_text_contaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |             unnest(list_transform(range(1, len(toks) - 2),
        |                    i -> array_to_string(list_slice(toks, i, i + 3), ' ')))
        |               AS gram
        |      FROM t WHERE len(toks) >= 4),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM g JOIN b USING (gram)
        |WHERE doc_id >= 20
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_split_hash" ->
      """SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT CASE
        |        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'ef'
        |          THEN 'train'
        |        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'f7'
        |          THEN 'val'
        |        ELSE 'test' END AS split, n_chars
        |      FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin,
    "q_text_redact" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '\b(customer|order|value)\b')) AS n_hits,
        |  length(regexp_replace(text, '\b(customer|order|value)\b', '[X]', 'g'))
        |    AS redacted_len,
        |  length(text) AS orig_len
        |FROM documents
        |WHERE len(regexp_extract_all(text, '\b(customer|order|value)\b')) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_tok_histogram" ->
      """SELECT CAST(floor(len(string_split(text, ' ')) / 25) * 25 AS BIGINT)
        |         AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_shuffle_det" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key, source
        |FROM documents ORDER BY shuffle_key LIMIT 200""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |b AS (SELECT doc_id,
        |             list_transform(range(1, len(toks)),
        |                            i -> toks[i] || ' ' || toks[i+1]) AS bg
        |      FROM t WHERE len(toks) >= 2)
        |SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
        |       CAST(floor((1.0 - len(list_distinct(bg)) * 1.0 / len(bg))
        |            * 10000 + 0.5) AS BIGINT) AS rep_x1e4
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      """WITH tokall AS (SELECT doc_id, lang,
        |                       unnest(string_split(text, ' ')) AS tok
        |                FROM documents),
        |prof AS (SELECT lang AS plang, tok FROM (
        |  SELECT lang, tok,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY cnt DESC, tok) AS rk
        |  FROM (SELECT lang, tok, count(*) AS cnt FROM tokall GROUP BY 1, 2))
        |  WHERE rk <= 5),
        |dtok AS (SELECT DISTINCT doc_id, tok FROM tokall WHERE doc_id < 200),
        |sc AS (SELECT doc_id, plang, count(*) AS score
        |       FROM dtok JOIN prof USING (tok) GROUP BY 1, 2)
        |SELECT doc_id, plang AS pred_lang, score FROM (
        |  SELECT doc_id, plang, score,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, plang) AS rk
        |  FROM sc) WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "q_tok_vocab" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY tok),
        |r AS (SELECT tok, freq,
        |             CAST(row_number() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rank,
        |             sum(freq) OVER (ORDER BY freq DESC, tok
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM f),
        |t AS (SELECT sum(freq) AS tot FROM f)
        |SELECT rank, tok, freq,
        |       CAST(floor(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) * 10000 + 0.5)
        |            AS BIGINT) AS cov_x1e4
        |FROM r, t WHERE rank <= 50 ORDER BY rank""".stripMargin,

    "q_quality_bins" ->
      """WITH f AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |  CAST(floor(len(list_distinct(string_split(text, ' ')))
        |       / len(string_split(text, ' ')) * 10000 + 0.5) AS BIGINT) AS score
        |FROM documents)
        |SELECT least(CAST(floor(score / 1000) AS BIGINT), 9) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(score) AS min_score, max(score) AS max_score
        |FROM f GROUP BY bin ORDER BY bin""".stripMargin,

    "q_text_quality" ->
      """WITH f AS (SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tok,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a'))) AS n_stop,
        |  length(replace(text, ' ', '')) AS n_nospace
        |FROM documents)
        |SELECT doc_id, n_tok,
        |  CAST(floor(n_uniq / n_tok * 10000 + 0.5) AS BIGINT) AS ttr_x1e4,
        |  CAST(floor(n_stop / n_tok * 10000 + 0.5) AS BIGINT) AS stop_x1e4,
        |  CAST(floor(((n_uniq / n_tok) * 0.5 + (1.0 - n_stop / n_tok) * 0.3
        |        + least((n_nospace / n_tok) / 8.0, 1.0) * 0.2)
        |        * 10000 + 0.5) AS BIGINT) AS score_x1e4
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS re_tokens,
        |  length(text) AS n_chars_txt,
        |  round(length(text) / len(string_split(text, ' ')), 4) AS chars_per_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // winnowing: same md5-prefix gram ids, min per 4-window, distinct
    "q_text_winnow" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(generate_series(1, len(toks) - 2),
        |        i -> CAST(('0x' || substring(
        |               md5(array_to_string(toks[i:i+2], ' ')), 1, 11)) AS BIGINT))
        |    ELSE [] END AS grams
        |  FROM base),
        |w AS (
        |  SELECT doc_id,
        |    CASE WHEN len(grams) = 0 THEN []
        |         WHEN len(grams) >= 4 THEN
        |      list_distinct(list_transform(generate_series(1, len(grams) - 3),
        |        j -> list_min(grams[j:j+3])))
        |    ELSE [list_min(grams)] END AS fps
        |  FROM g)
        |SELECT doc_id, unnest(fps) AS fp FROM w
        |ORDER BY doc_id, fp""".stripMargin)
}
