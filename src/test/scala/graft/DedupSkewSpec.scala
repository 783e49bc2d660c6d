package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextOps

/** The df cap is the dedup family's skew guard: on a corpus where every
  * document shares a handful of stopword-shaped tokens, an uncapped
  * token-bucket self-join generates O(n²) candidate pairs from the hot
  * buckets alone — the one shape that would kill `q_dedup_near` on a
  * real 100 TB corpus. The cap must (a) collapse that quadratic
  * candidate set to the rare-token-driven linear one, and (b) still
  * find every pair that shares a rare token, with Jaccard verified
  * over FULL token sets so capping changes candidate generation, not
  * similarity values.
  */
class DedupSkewSpec extends AnyFunSuite {
  import TestSpark._

  // 200 docs, each = 3 shared hot tokens + one unique token; 5 planted
  // near-dup pairs additionally share a rare "pair token".
  private lazy val corpus = {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val pair = if (i < 10) s"pairtok${i / 2}" else s"solo$i"
      (i.toLong, s"the and of $pair uniq$i")
    }
    docs.toDF("doc_id", "text")
  }

  test("df cap collapses hot-token candidate blowup from quadratic to linear") {
    val uncapped = TextOps.cappedCandidates(corpus, dfCap = 1000L).count()
    val capped = TextOps.cappedCandidates(corpus, dfCap = 50L).count()
    // every doc pair shares "the and of": C(200,2) candidates uncapped
    assert(uncapped == 199L * 200L / 2)
    // capped: only the 5 planted pairs share a sub-cap token
    assert(capped == 5L)
  }

  test("capped near-dup still finds every rare-token pair, with full-set Jaccard") {
    val pairs = TextOps.nearDupCapped(corpus, dfCap = 50L).collect()
    // planted pairs: docs (0,1),(2,3),(4,5),(6,7),(8,9) share 4 of 5
    // tokens → jaccard 4/6 = 0.6667 ≥ 0.6
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L), (8L, 9L)))
    assert(pairs.forall(r => math.abs(r.getDouble(2) - 0.6667) < 1e-9))
  }

  test("bucket-star candidates stay linear on an identical-document bucket") {
    import graft.queries.Dedup
    import spark.implicits._
    // 120 IDENTICAL docs (one LSH bucket per band holds all of them)
    // plus 30 singletons: the clique would be C(120,2) = 7140 pairs;
    // the star must emit exactly 119 — one edge per non-min member,
    // the same pairs in every band so distinct collapses them.
    val docs = ((0 until 120).map(i => (i.toLong, "lorem ipsum dolor sit amet")) ++
      (200 until 230).map(i => (i.toLong, s"u${i}a v${i}b w${i}c x${i}d")))
      .toDF("doc_id", "text")
    val cand = Dedup.starCandidates(Dedup.tokIds(docs))
    val rows = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 119)
    assert(rows.forall(_._1 == 0L)) // every edge points at the bucket min
    assert(rows.map(_._2).sorted.toSeq === (1L until 120L))
  }

  test("fuzzy-match blocking: candidates stay linear on a same-letter vocabulary") {
    import graft.queries.Dedup
    import spark.implicits._
    // Hostile vocabulary: 300 names, ALL starting with 'a' — first-char
    // blocking alone would make one C(300,2) = 44 850-pair clique.
    // Lengths spread over 5..104 (3 names per length), so the length
    // band + |len diff| <= 3 predicate must cut candidates to exactly
    // the same-letter pairs within a ±3 length window.
    val names = (0 until 300).map { i =>
      val len = 5 + i % 100
      "a" * (len - 3) + f"$i%03d" // unique suffix, exact target length
    }.toDF("p_name")
    val cand = Dedup.fuzzyCandidates(names)
    val got = cand.count()
    // exact expectation, computed independently of the blocking scheme
    val lens = (0 until 300).map(i => 5 + i % 100)
    val expected = (for {
      i <- 0 until 300; j <- 0 until 300 if i != j
      if math.abs(lens(i) - lens(j)) <= 3
    } yield 1).size / 2
    assert(got === expected.toLong, "blocking emitted a wrong candidate set")
    assert(got < 44850 / 10, s"candidate count $got is not linear-ish in V")
    // exactly-once emission: the band-overlap probe must not duplicate
    assert(cand.distinct().count() === got)
  }

  test("fuzzy-match blocking loses no edit-distance-3 pair across a band boundary") {
    import graft.queries.Dedup
    import spark.implicits._
    // lengths 7 and 8 straddle the width-4 band boundary (7/4=1, 8/4=2);
    // also check the extreme |len diff| = 3 case (5 vs 8).
    val names = Seq("aaaaaaa", "aaaaaaaa", "aaaaa", "bbbbbbbb").toDF("p_name")
    val got = Dedup.fuzzyCandidates(names)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("aaaaa", "aaaaaaa"), ("aaaaa", "aaaaaaaa"),
      ("aaaaaaa", "aaaaaaaa")))
  }

  test("hot-token list is broadcast, not shuffled against the corpus") {
    val plan = TextOps.cappedCandidates(corpus, dfCap = 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"anti-join on the hot list should broadcast:\n$plan")
  }
}
