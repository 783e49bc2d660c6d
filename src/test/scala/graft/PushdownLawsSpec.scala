package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.dynamo.Implicits._

/** Pushdown ≡ post-filter equivalence on random predicates (SURVEY.md
  * §5.2 #3): for arbitrary filter trees — including `NOT` over nullable
  * attributes, where SQL three-valued logic and naive boolean
  * evaluation diverge — reading through the connector with
  * `filterPushdown=true` must return exactly the rows Spark computes
  * itself with `filterPushdown=false`. Spark does NOT re-evaluate
  * filters a source accepts, so any store-side semantic drift is a
  * silent wrong-answer bug, which is why this is property-tested
  * rather than spot-tested.
  */
class PushdownLawsSpec extends AnyFunSuite {
  import TestSpark._

  /** Deterministic sample sweep (same pattern as CodecLawsSpec). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap { i =>
      g.apply(Gen.Parameters.default.withSize(1 + i % 20), Seed(i.toLong))
    }

  // ---- one shared random-ish table with plenty of nulls ----

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-pushdown-laws").toString
    import spark.implicits._
    val strs = Seq("alpha", "beta", "gamma", "alphabet", "x")
    val rows = (0L until 120L).map { i =>
      (i,
       if (i % 7 == 3) null else strs((i % strs.size).toInt),
       if (i % 5 == 4) None else Some(i % 11),
       if (i % 6 == 5) None else Some(i.toDouble / 3.0),
       if (i % 4 == 2) None else Some(i % 3 == 0))
    }
    rows.toDF("id", "s", "n", "d", "flag")
      .write.dynamo(r, "laws", "id")
    r
  }

  private def read(pushdown: Boolean): DataFrame =
    spark.read.format("dynamo")
      .option("path", root).option("tableName", "laws")
      .option("filterPushdown", pushdown.toString)
      .load()

  // ---- random predicate trees over the table's columns ----

  private val genLeaf: Gen[Column] = Gen.oneOf(
    Gen.oneOf("alpha", "beta", "zeta").map(v => col("s") === v),
    Gen.oneOf("al", "be", "q").map(v => col("s").startsWith(v)),
    Gen.oneOf("pha", "et", "zz").map(v => col("s").contains(v)),
    Gen.oneOf("a", "t", "k").map(v => col("s").endsWith(v)),
    Gen.const(col("s").isNull),
    Gen.const(col("s").isNotNull),
    Gen.choose(0L, 11L).map(v => col("n") > v),
    Gen.choose(0L, 11L).map(v => col("n") <= v),
    Gen.choose(0L, 11L).map(v => col("n") === v),
    Gen.pick(3, 0L to 11L).map(vs => col("n").isin(vs.toSeq: _*)),
    Gen.choose(0.0, 40.0).map(v => col("d") >= v),
    Gen.choose(0.0, 40.0).map(v => col("d") < v),
    Gen.oneOf(true, false).map(v => col("flag") === v),
    Gen.const(col("flag").isNull),
    // v2-only shapes (SupportsPushDownV2Filters): column-vs-column and
    // arithmetic comparisons — the adv tier must obey the same
    // three-valued law as the v1 family
    Gen.const(col("n") > col("d")),
    Gen.const(col("n") <= col("d")),
    Gen.choose(0L, 22L).map(v => col("n") * 2 > v),
    Gen.choose(-5L, 15L).map(v => col("n") - 3 <= v),
    Gen.choose(0.0, 30.0).map(v => col("d") * 2.0 < v),
    Gen.const(-col("n") < col("d")))

  private def genPred(depth: Int): Gen[Column] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      2 -> Gen.zip(genPred(depth - 1), genPred(depth - 1)).map { case (a, b) => a && b },
      2 -> Gen.zip(genPred(depth - 1), genPred(depth - 1)).map { case (a, b) => a || b },
      2 -> genPred(depth - 1).map(c => !c))

  test("connector pushdown result equals pushdown-disabled result for random predicates") {
    val preds = samples(genPred(2), 40)
    assert(preds.size >= 30)
    val baseline = read(pushdown = false)
    val pushed = read(pushdown = true)
    preds.foreach { p =>
      val expect = baseline.filter(p).select("id").collect().map(_.getLong(0)).sorted.toSeq
      val got = pushed.filter(p).select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expect, s"predicate $p: pushdown=$got expected=$expect")
    }
  }

  test("point lookups prune shards without losing rows for hostile key values") {
    // Shard pruning recomputes the key hash from the FILTER literal; if
    // its canonicalization ever differs from the write path's (5.0 vs 5,
    // -0.0, repeating fractions), the lookup scans the wrong shard and
    // silently returns nothing — hence a sweep over hostile doubles.
    import spark.implicits._
    val r = Files.createTempDirectory("graft-keyprune-laws").toString
    val keys: Seq[Double] = (Seq(0.0, -0.0, 5.0, -5.0, 0.15, -123456.789,
      1e15, 1.0 / 3.0, 2.5e-7) ++ (1 to 40).map(_ * 1.25)).distinct
    keys.zipWithIndex.map { case (k, i) => (k, s"row$i") }
      .toDF("k", "v").write.dynamo(r, "pts", "k")
    val df = spark.read.format("dynamo")
      .option("path", r).option("tableName", "pts")
      .option("readPartitions", "16")
      .load()
    keys.foreach { k =>
      val hits = df.filter(col("k") === k).collect()
      assert(hits.length === 1, s"point lookup lost key $k")
    }
    // In() over a key subset also prunes and stays complete
    val some = keys.take(7)
    val got = df.filter(col("k").isin(some: _*)).collect()
    assert(got.length === some.length)
  }

  test("grouped pushdown equals driver-side aggregation for random filters and groupings") {
    // The grouped-aggregate pushdown (complete for hk — the partition
    // key — partial for the rest) must agree with a plain row read
    // aggregated on the driver, under arbitrary pushed/unpushed filter
    // trees and null-holding group keys. Spark trusts complete results
    // verbatim, so drift here is a silent wrong answer — property over
    // spot checks.
    import spark.implicits._
    val r = Files.createTempDirectory("graft-gagg-laws").toString
    val strs = Seq("alpha", "beta", "gamma", null, "x")
    (0L until 140L).map { i =>
      (i % 7, i,
       strs((i % strs.size).toInt),
       if (i % 5 == 4) None else Some(i % 11),
       if (i % 6 == 5) None else Some(i.toDouble / 3.0),
       if (i % 4 == 2) None else Some(i % 3 == 0))
    }.toDF("hk", "id", "s", "n", "d", "flag")
      .write.format("dynamo").option("path", r).option("tableName", "glaws")
      .option("hashKey", "hk").option("rangeKey", "id")
      .mode("append").save()
    val d = spark.read.format("dynamo")
      .option("path", r).option("tableName", "glaws").load()

    val preds = samples(genPred(1), 10)
    for (p <- preds; g <- Seq("hk", "s", "flag")) {
      val base = d.filter(p).select(col(g), col("n"), col("s")).collect()
      val expect = base.groupBy(row => row.get(0)).map { case (k, rs) =>
        val ns = rs.collect { case row if !row.isNullAt(1) => row.getLong(1) }
        val ss = rs.collect { case row if !row.isNullAt(2) => row.getString(2) }
        (k,
         rs.length.toLong,
         if (ns.isEmpty) null else ns.sum,
         if (ns.isEmpty) null else ns.min,
         if (ss.isEmpty) null else ss.max)
      }.toSet
      val got = d.filter(p).groupBy(col(g))
        .agg(count(lit(1)).as("c"), sum("n").as("sn"),
             min("n").as("mn"), max("s").as("mx"))
        .collect().map(row => (row.get(0), row.getLong(1),
          row.get(2), row.get(3), row.get(4))).toSet
      assert(got === expect, s"grouping $g under predicate $p")
    }
  }

  test("top-N pushdown equals Spark's own sort for random sort specs") {
    // The pushed per-segment heap uses its own comparator; this law
    // pins it to Spark's sort semantics (null placement, NaN, string
    // binary order) over random key lists and directions. `id` rides
    // as the final tiebreak so ties at the limit boundary are
    // deterministic on both sides.
    val genKey: Gen[Column] = for {
      name <- Gen.oneOf("s", "n", "d", "flag")
      dir <- Gen.oneOf(0, 1, 2, 3)
    } yield dir match {
      case 0 => col(name).asc_nulls_first
      case 1 => col(name).asc_nulls_last
      case 2 => col(name).desc_nulls_first
      case _ => col(name).desc_nulls_last
    }
    val genSpec: Gen[(List[Column], Int)] = for {
      ks <- Gen.listOfN(2, genKey)
      n <- Gen.choose(1, 30)
    } yield (ks, n)

    val full = read(pushdown = true)
    // ground truth: same rows via a connector-free DataFrame
    val local = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(full.collect(): _*)),
      full.schema)
    samples(genSpec, 25).foreach { case (ks, n) =>
      val order = ks :+ col("id").asc
      val got = full.orderBy(order: _*).limit(n)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got.length === math.min(n, 120),
        s"top-N returned ${got.length} rows for n=$n")
      val expect = local.orderBy(order: _*).limit(n)
        .select("id").collect().map(_.getLong(0)).toSeq
      assert(got === expect, s"sort ${order.mkString(", ")} limit $n")
    }
  }

  test("pushed join equals Spark's own join under random predicate trees") {
    import spark.implicits._
    val r = Files.createTempDirectory("graft-joinlaw").toString
    val strs = Seq("alpha", "beta", "gamma", "alphabet", "x")
    (0L until 80L).map { i =>
      (i, if (i % 7 == 3) null else strs((i % strs.size).toInt),
        if (i % 5 == 4) None else Some(i % 11),
        if (i % 6 == 5) None else Some(i.toDouble / 3.0),
        if (i % 4 == 2) None else Some(i % 3 == 0))
    }.toDF("id", "s", "n", "d", "flag").write.dynamo(r, "jlaw_l", "id")
    (0L until 30L).map(i => (i % 11, s"g${i % 4}", i))
      .toDF("n2", "grp", "rid").write.dynamo(r, "jlaw_r", "rid")

    def joined() = {
      val l = spark.read.dynamo(r, "jlaw_l")
      val rt = spark.read.dynamo(r, "jlaw_r")
      l.join(rt, l("n") === rt("n2"))
    }
    // predicates span both sides plus v2-only arithmetic shapes
    val preds = samples(genPred(1), 12) ++ Seq(
      col("grp") === "g1", col("rid") > col("n"), col("n2") * 2 <= col("n") + 10)
    val expect = preds.map(p => joined().filter(p)
      .select("id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq)
    // grouped aggregate OVER the pushed join, same predicate sweep:
    // per-task bounded partials + Spark's final aggregate must equal
    // Spark running the whole join+aggregate itself
    def aggOf(base: org.apache.spark.sql.DataFrame) = base
      .groupBy(col("grp")).agg(count(lit(1)).as("c"), sum(col("n")).as("sn"),
        min(col("d")).as("md"))
      .collect().map(x => (Option(x.getString(0)), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        if (x.isNullAt(3)) None else Some(x.getDouble(3)))).sortBy(_._1).toSeq
    val expectAgg = preds.map(p => aggOf(joined().filter(p)))
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    try {
      preds.zip(expect).foreach { case (p, exp) =>
        val df = joined().filter(p).select("id", "rid")
        assert(df.queryExecution.executedPlan.toString.contains("PushedJoin"),
          s"join not pushed under $p")
        val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        assert(got == exp, s"predicate $p over pushed join")
      }
      preds.zip(expectAgg).foreach { case (p, exp) =>
        assert(aggOf(joined().filter(p)) == exp,
          s"grouped aggregate over pushed join under $p")
      }
    } finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
  }

  test("zone-map mayMatch is an upper bound on FilterEval truth (soundness law)") {
    import org.apache.spark.sql.sources._
    import graft.sources.dynamo.{AttrVal, FilterEval, ShardStats, ZoneMap}
    // Items with mixed presence/types per attribute — exactly the
    // schemaless shapes a real shard holds. Strings include the
    // supplementary-plane orderings FilterEval compares in UTF8 order.
    val emoji = new String(Character.toChars(0x1F600))
    val genVal: Gen[Option[AttrVal]] = Gen.frequency(
      3 -> Gen.choose(-50L, 50L).map(v => Some(AttrVal.N(BigDecimal(v)): AttrVal)),
      2 -> Gen.oneOf("a", "alpha", "m0", "zz", "￾", emoji)
        .map(v => Some(AttrVal.S(v): AttrVal)),
      1 -> Gen.oneOf(true, false).map(v => Some(AttrVal.Bool(v): AttrVal)),
      1 -> Gen.const(Some(AttrVal.Null: AttrVal)),
      2 -> Gen.const(None: Option[AttrVal]))
    val genItem: Gen[Map[String, AttrVal]] =
      for { a <- genVal; b <- genVal; c <- genVal } yield
        Seq("a" -> a, "b" -> b, "c" -> c)
          .collect { case (k, Some(v)) => k -> v }.toMap
    val attrs = Gen.oneOf("a", "b", "c")
    val genLeafF: Gen[Filter] = Gen.oneOf(
      Gen.zip(attrs, Gen.choose(-60L, 60L)).map { case (a, v) => EqualTo(a, v) },
      Gen.zip(attrs, Gen.oneOf("a", "m0", "zz", "￾", emoji))
        .map { case (a, v) => EqualTo(a, v): Filter },
      Gen.zip(attrs, Gen.choose(-60L, 60L)).map { case (a, v) => GreaterThan(a, v) },
      Gen.zip(attrs, Gen.oneOf("a", "zz", emoji)).map { case (a, v) => LessThan(a, v): Filter },
      Gen.zip(attrs, Gen.choose(-60L, 60L)).map { case (a, v) => LessThanOrEqual(a, v) },
      Gen.zip(attrs, Gen.pick(2, -60L to 60L)).map { case (a, vs) =>
        In(a, vs.toArray.map(_.asInstanceOf[Any])) },
      Gen.zip(attrs, Gen.oneOf("a", "m", "z", "￾")).map { case (a, p) =>
        StringStartsWith(a, p): Filter },
      attrs.map(IsNull(_): Filter),
      attrs.map(IsNotNull(_): Filter),
      Gen.zip(attrs, Gen.oneOf(true, false)).map { case (a, v) => EqualTo(a, v): Filter })
    def genF(depth: Int): Gen[Filter] =
      if (depth <= 0) genLeafF
      else Gen.frequency(
        3 -> genLeafF,
        2 -> Gen.zip(genF(depth - 1), genF(depth - 1)).map { case (l, r) => And(l, r) },
        2 -> Gen.zip(genF(depth - 1), genF(depth - 1)).map { case (l, r) => Or(l, r) },
        1 -> genF(depth - 1).map(Not(_): Filter))

    val cases = samples(Gen.zip(Gen.listOfN(6, genItem), genF(2)), 400)
    var pruned = 0
    cases.foreach { case (items, f) =>
      val stats = items.foldLeft(ShardStats.empty)(_.widen(_))
      val anyTrue = items.exists(FilterEval.eval(f, _))
      val may = ZoneMap.mayMatch(f, stats)
      // SOUNDNESS: a shard holding a matching item is never prunable
      assert(!anyTrue || may,
        s"unsound prune: $f over $items (stats $stats)")
      if (!may) pruned += 1
    }
    // sanity: the law exercised real prunes, not vacuous truth
    assert(pruned > 20, s"only $pruned prunes across ${cases.size} cases")
  }

  test("outer pushed joins equal Spark's own under random predicate trees") {
    import spark.implicits._
    val r = Files.createTempDirectory("graft-joinlaw2").toString
    val strs = Seq("alpha", "beta", "gamma", "alphabet", "x")
    (0L until 80L).map { i =>
      (i, if (i % 7 == 3) null else strs((i % strs.size).toInt),
        if (i % 5 == 4) None else Some(i % 11),
        if (i % 6 == 5) None else Some(i.toDouble / 3.0),
        if (i % 4 == 2) None else Some(i % 3 == 0))
    }.toDF("id", "s", "n", "d", "flag").write.dynamo(r, "jlaw2_l", "id")
    (0L until 30L).map(i => (i % 11, s"g${i % 4}", i))
      .toDF("n2", "grp", "rid").write.dynamo(r, "jlaw2_r", "rid")

    def joined(t: String) = {
      val l = spark.read.dynamo(r, "jlaw2_l")
      val rt = spark.read.dynamo(r, "jlaw2_r")
      l.join(rt, l("n") === rt("n2"), t)
    }
    def snap(df: org.apache.spark.sql.DataFrame) = df.select("id", "rid")
      .collect().map(x =>
        (if (x.isNullAt(0)) None else Some(x.getLong(0)),
          if (x.isNullAt(1)) None else Some(x.getLong(1)))).sorted.toSeq
    // a filter ABOVE the outer join may let Catalyst collapse it to
    // inner (null-filtering predicate) — both runs see the same
    // rewrite, so the law still compares like with like
    val preds = samples(genPred(1), 8) ++ Seq(
      col("grp") === "g1", col("rid") > col("n"))
    for (t <- Seq("left", "right")) {
      val expPlain = snap(joined(t))
      val exps = preds.map(p => snap(joined(t).filter(p)))
      spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
      try {
        val plain = joined(t)
        assert(plain.queryExecution.executedPlan.toString.contains("PushedJoin"),
          s"$t outer join not pushed")
        assert(snap(plain) === expPlain, s"$t outer join, no predicate")
        preds.zip(exps).foreach { case (p, exp) =>
          assert(snap(joined(t).filter(p)) === exp, s"$t outer join under $p")
        }
      } finally spark.conf.unset("spark.sql.optimizer.datasourceV2JoinPushdown")
    }
  }

  test("pushed string ranges use code-point order on supplementary characters") {
    import spark.implicits._
    val r = Files.createTempDirectory("graft-surrogate").toString
    // U+FFFE sorts BELOW U+1F600 in code-point (UTF8String) order but
    // ABOVE it in java.lang.String UTF-16 code-unit order — the exact
    // divergence a store-side compareTo would smuggle into results.
    Seq((1L, "\uFFFE"), (2L, new String(Character.toChars(0x1F600))), (3L, "zed"))
      .toDF("id", "s").write.dynamo(r, "sup", "id")
    def ids(pushdown: Boolean) = spark.read.format("dynamo")
      .option("path", r).option("tableName", "sup")
      .option("filterPushdown", pushdown.toString).load()
      .filter(col("s") > "\uFFFD").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(pushdown = true) === ids(pushdown = false))
    assert(ids(pushdown = true) === Seq(1L, 2L)) // emoji > U+FFFD, "zed" is not
  }

  test("PushedSample laws: determinism, uniformity, range partition, seed independence") {
    import graft.sources.dynamo.PushedSample
    val keys = (0 until 20000).map(i => s"S|k$i") // canonical-key-ish strings

    // determinism: membership is a pure function of (key, seed, range)
    val s = PushedSample(0.0, 0.3, seed = 7L)
    assert(keys.map(s.keeps) === keys.map(s.keeps))

    // uniformity: each of ten equal ranges holds 10% ± 5σ of the keys
    // (σ = sqrt(n·p·(1-p)) ≈ 42 at n=20000, p=0.1)
    (0 until 10).foreach { b =>
      val r = PushedSample(b / 10.0, (b + 1) / 10.0, seed = 7L)
      val n = keys.count(r.keeps)
      assert(math.abs(n - 2000) < 210, s"bucket $b holds $n of 20000")
    }

    // range partition: [0,c) and [c,1) split the keys EXACTLY — the
    // deterministic train/test-split property (disjoint + exhaustive)
    val lo = PushedSample(0.0, 0.3, seed = 7L)
    val hi = PushedSample(0.3, 1.0, seed = 7L)
    keys.foreach(k => assert(lo.keeps(k) ^ hi.keeps(k), s"key $k not in exactly one split"))

    // different seeds decorrelate: overlap of two 30% samples is near
    // the independent 9% expectation, not near 30%
    val other = PushedSample(0.0, 0.3, seed = 8L)
    val both = keys.count(k => s.keeps(k) && other.keeps(k))
    assert(both > 1200 && both < 2500, s"seed overlap $both of 20000")

    // sequential keys (worst case for a weak hash) stay uniform: the
    // sampled fraction of a contiguous id block is still ~30%
    val block = (10000 until 12000).map(i => s"S|k$i")
    val inBlock = block.count(s.keeps)
    assert(inBlock > 480 && inBlock < 720, s"contiguous block sampled $inBlock of 2000")
  }

  test("zone-answered aggregates equal scanned aggregates on random tables") {
    // The answer path (metadata partition folded from exact sidecars,
    // zero items read) vs the same aggregation with zonePruning=false
    // (normal per-segment pushed-aggregate scan): results must be
    // IDENTICAL on arbitrary data with nulls and negatives, both on a
    // fully-compacted table (single answer partition) and with a
    // dirty journal (partial answer + hot-shard scans).
    import spark.implicits._
    val genRow: Gen[(Option[Long], Option[String], Option[Double])] = for {
      n <- Gen.option(Gen.choose(-1000L, 1000L))
      s <- Gen.option(Gen.oneOf("a", "bb", "ccc", "Zz", "alpha"))
      d <- Gen.option(Gen.choose(-50.0, 50.0))
    } yield (n, s, d)
    (0 until 12).foreach { it =>
      // anchor row with every attr present: schema inference samples
      // stored attrs, and a tiny all-null column would otherwise not
      // exist in the inferred schema at all
      val rows = (-1L, Option(0L), Option("anchor"), Option(0.0)) +:
        samples(genRow, 1 + it * 5).zipWithIndex
          .map { case ((n, s, d), i) => (i.toLong, n, s, d) }
      val root = Files.createTempDirectory("graft-zone-law").toString
      val store = new graft.sources.dynamo.LocalKVStore(root)
      rows.toDF("id", "n", "s", "d").write.dynamo(root, "t", "id")
      store.compact("t")
      def agg(zone: Boolean): Seq[Any] =
        spark.read.format("dynamo")
          .option("path", root).option("tableName", "t")
          .option("zonePruning", zone.toString).load()
          .agg(min("n"), max("n"), min("s"), max("s"), min("d"), max("d"),
               count(lit(1)), count(col("n")), count(col("s")), sum("n"),
               min("id"), max("id"), sum("id"))
          .collect()(0).toSeq
      assert(agg(zone = true) === agg(zone = false), s"iteration $it compacted")
      // dirty the journal: the partial answer must still agree
      Seq((100000L + it, Option(7L), Option("zz"), Option(1.5)))
        .toDF("id", "n", "s", "d").write.dynamo(root, "t", "id")
      assert(agg(zone = true) === agg(zone = false), s"iteration $it dirty")
    }
  }

  test("NOT over a nullable attribute is pushed and still matches SQL semantics") {
    // The canonical three-valued-logic trap: s IS NULL on some rows.
    val p = !(col("s") === "alpha")
    val expect = read(pushdown = false).filter(p).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = read(pushdown = true).filter(p).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect)
    // and the filter really is pushed (not silently rejected):
    val plan = read(pushdown = true).filter(p).queryExecution.executedPlan.toString
    assert(plan.contains("Not(EqualTo(s,alpha))"), plan)
  }
}
