package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Validation

/** Deequ-style validation suite: deterministic in-memory fixtures with
  * hand-computed report rows (q189 covers the same checks over the parquet
  * testdata against the DuckDB oracle).
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("checkRules: one scan, per-rule counts, NULL predicate = non-violation") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, -5L), (3L, null), (4L, 200L)).toDF("id", "v")
    val out = Validation.checkRules(df, Seq(
        "v_nonneg" -> ($"v" < 0L),      // row 2 -> 1 violation
        "v_cap_100" -> ($"v" > 100L),   // row 4; NULL row 3 is NOT a violation
        "v_complete" -> $"v".isNull))   // row 3
      .orderBy("rule").collect()
    assert(out.length == 3)
    assert(out(0) == Row("v_cap_100", 4L, 1L, 250000L, 0L))
    assert(out(1) == Row("v_complete", 4L, 1L, 250000L, 0L))
    assert(out(2) == Row("v_nonneg", 4L, 1L, 250000L, 0L))
  }

  test("checkRules: clean table passes with ppm 0") {
    val df = Seq((1L, 5L), (2L, 6L)).toDF("id", "v")
    val out = Validation.checkRules(df, Seq("v_pos" -> ($"v" <= 0L))).collect()
    assert(out.toSeq == Seq(Row("v_pos", 2L, 0L, 0L, 1L)))
  }

  test("checkUnique: surplus rows beyond first per key; composite keys") {
    // keys: (1,a) x3, (1,b) x1, (2,a) x1 -> 5 rows, 2 surplus
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("k1", "k2")
    val out = Validation.checkUnique(df, "pk", Seq($"k1", $"k2")).collect()
    assert(out.toSeq == Seq(Row("pk", 5L, 2L, 400000L, 0L)))
    val unique = Validation.checkUnique(df.distinct(), "pk", Seq($"k1", $"k2"))
      .collect()
    assert(unique.toSeq == Seq(Row("pk", 3L, 0L, 0L, 1L)))
  }

  test("checkForeignKey: NULL child keys skipped, orphans counted") {
    val child = Seq[(Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, 99L), (4L, null)).toDF("id", "fk")
    val parent = Seq((10L, "x"), (20L, "y"), (10L, "dup")).toDF("pk", "name")
    val out = Validation.checkForeignKey(
      child, "fk_ok", $"fk", parent, $"pk").collect()
    // 3 non-null child keys, 1 orphan (99); parent dup must not double-count
    assert(out.toSeq == Seq(Row("fk_ok", 3L, 1L, 333333L, 0L)))
  }

  test("categoricalDrift: hand-computed shares, one-sided categories, TVD") {
    // ref: a x3, b x1 (t=4); cur: a x1, c x1 (t=2)
    val ref = Seq("a", "a", "a", "b").toDF("cat")
    val cur = Seq("a", "c").toDF("cat")
    val out = Validation.categoricalDrift(ref, cur, $"cat")
      .orderBy("category").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // shares: a 750000 vs 500000 (diff 250000); b 250000 vs 0; c 0 vs 500000
    // tvd = (250000 + 250000 + 500000) / 2 = 500000
    assert(out.toSeq == Seq(
      ("a", 3L, 1L, 750000L, 500000L, 250000L, 500000L),
      ("b", 1L, 0L, 250000L, 0L, 250000L, 500000L),
      ("c", 0L, 1L, 0L, 500000L, 500000L, 500000L)))
    // identical distributions -> zero drift everywhere
    val same = Validation.categoricalDrift(ref, ref, $"cat").collect()
    assert(same.forall(r => r.getLong(5) == 0L && r.getLong(6) == 0L))
  }

  test("kAnonymity: class structure, risk share, NULL qids form a class") {
    // classes: (a,x) x3, (a,y) x2, (b,x) x1, (NULL,x) x2 -> 8 rows, 4 groups
    val df = Seq(
      Some("a") -> "x", Some("a") -> "x", Some("a") -> "x",
      Some("a") -> "y", Some("a") -> "y", Some("b") -> "x",
      None -> "x", None -> "x")
      .map { case (q1, q2) => (q1.orNull, q2) }.toDF("q1", "q2")
    val out = Validation.kAnonymity(df, "t", Seq($"q1", $"q2"), k = 2).collect()
    // below k=2: only (b,x) with 1 row -> risk 125000 ppm, not anonymous
    assert(out.toSeq == Seq(Row("t", 8L, 4L, 1L, 1L, 125000L, 0L)))
    // k=2 satisfied once the singleton is dropped
    val ok = Validation.kAnonymity(df.filter($"q1".isNull || $"q1" === "a"),
      "t", Seq($"q1", $"q2"), k = 2).collect()
    assert(ok.toSeq == Seq(Row("t", 7L, 3L, 2L, 0L, 0L, 1L)))
    // empty input: vacuously anonymous
    val empty = Validation.kAnonymity(df.filter($"q2" === "zzz"),
      "t", Seq($"q1", $"q2"), k = 2).collect()
    assert(empty.toSeq == Seq(Row("t", 0L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("report: unions parts; empty table yields ppm 0 and pass") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val rep = Validation.report(
      Validation.checkRules(empty, Seq("v_pos" -> ($"v" <= 0L))),
      Validation.checkUnique(empty, "pk", Seq($"id")))
      .orderBy("rule").collect()
    assert(rep.toSeq == Seq(
      Row("pk", 0L, 0L, 0L, 1L), Row("v_pos", 0L, 0L, 0L, 1L)))
  }

  test("lDiversity: homogeneous class fails, varied class passes, NULL sensitive is its own value") {
    // class A: 3 rows all label x -> 1 distinct (homogeneity);
    // class B: 3 rows labels x, y, null -> 3 distinct (null counts)
    val df = Seq[(String, String)](
      ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", null)).toDF("qid", "label")
    val out = Validation.lDiversity(df, "t", Seq($"qid"), $"label", l = 2).collect().head
    assert(out == Row("t", 6L, 2L, 1L, 3L, 500000L, 0L))
    // at l=2 only class A (3 rows, 1 distinct) is below; B has 3 distinct
    val ok = Validation.lDiversity(
      df.filter($"qid" === "B"), "t2", Seq($"qid"), $"label", l = 3).collect().head
    assert(ok == Row("t2", 3L, 1L, 3L, 0L, 0L, 1L))
  }

  test("tableFingerprint: order/partition-independent checksum, dup-sensitive, NULL distinct from empty") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "s")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Validation.tableFingerprint(d, "t", Seq("id", "s")).collect().head
    val a = fp(df)
    assert(a.getString(0) == "t" && a.getLong(1) == 3L)
    // expected: wrap-adding signed longs IS the mod-2^64 sum
    val expect = Seq("1x", "2y", "3z")
      .map(graft.plans.TextExprs.fnv1a64).sum
    assert(a.getLong(2) == expect)
    // row order and physical layout cannot move the checksum
    assert(fp(df.orderBy($"id".desc)).getLong(2) == expect)
    assert(fp(df.repartition(5)).getLong(2) == expect)
    // a duplicated row changes it (XOR would cancel the pair)
    assert(fp(df.union(Seq((1L, "x")).toDF("id", "s"))).getLong(2) != expect)
    // NULL and empty string render differently
    val withNull = Seq((1L, null: String)).toDF("id", "s")
    val withEmpty = Seq((1L, "")).toDF("id", "s")
    assert(fp(withNull).getLong(2) != fp(withEmpty).getLong(2))
  }

  test("tCloseness: hand-computed per-class TVD vs the global distribution, absent values charged") {
    // classes A(x,x,x,y), B(x,y,y,y), C(x,x) -> global x=6 y=4 over 10:
    // q_x=600000 q_y=400000, qtot=1e6
    // A: p=(750000,250000) -> tvd (|750-600|+|250-400|)/2 = 150000
    // B: p=(250000,750000) -> tvd 350000
    // C: p_x=1e6, y ABSENT -> tvd (400000+400000)/2 = 400000  (the absent
    //    value's full global mass is charged via the qtot constant)
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "x")).toDF("g", "s")
    val out = Validation.tCloseness(df, "t35", Seq($"g"), $"s", tPpm = 350000L)
      .collect().head
    assert(out == Row("t35", 10L, 3L, 400000L, 2L, 200000L, 0L))
    // loose threshold passes everything
    val ok = Validation.tCloseness(df, "t40", Seq($"g"), $"s", tPpm = 400000L)
      .collect().head
    assert(ok == Row("t40", 10L, 3L, 400000L, 0L, 0L, 1L))
    // one class == global distribution -> tvd 0, trivially close
    val same = Seq(("A", "x"), ("A", "y")).toDF("g", "s")
    assert(Validation.tCloseness(same, "t0", Seq($"g"), $"s", tPpm = 0L)
      .collect().head == Row("t0", 2L, 1L, 0L, 0L, 0L, 1L))
  }

  test("profileColumns: per-column rows from one pass — counts, nulls, distincts, string bounds") {
    val df = Seq[(java.lang.Long, String)](
      (3L, "b"), (1L, null), (2L, "a"), (3L, "c"), (null, "a"))
      .toDF("id", "s")
    val out = Validation.profileColumns(df, Seq("id", "s"))
      .orderBy("column").collect()
    assert(out.toSeq == Seq(
      Row("id", 5L, 1L, 3L, "1", "3"),
      Row("s", 5L, 1L, 3L, "a", "c")))
    // approx mode keeps the shape; HLL on a 3-distinct column is exact
    val approx = Validation.profileColumns(df, Seq("id"), exactDistinct = false)
      .collect()
    assert(approx.head == Row("id", 5L, 1L, 3L, "1", "3"))
  }

  test("rocAuc: hand rank-sum with ties, degenerate labels yield NULL, layout-independent") {
    // positives score {3, 5}, negatives {1, 3, 4}
    // u2 = (2*1 + 1) + (2*3 + 0) = 9; auc = 9 / (2*2*3) = 0.75
    val df = Seq((3L, true), (5L, true), (1L, false), (3L, false), (4L, false))
      .toDF("s", "lbl")
    def run(d: org.apache.spark.sql.DataFrame) =
      Validation.rocAuc(d, $"s", $"lbl", buckets = 2).collect().head
    assert(run(df) == Row(2L, 3L, 4L, 750000L))
    assert(run(df.repartition(3)) == Row(2L, 3L, 4L, 750000L))
    // perfect separation -> 1.0; inverted -> 0.0
    val perfect = Seq((10L, true), (9L, true), (1L, false)).toDF("s", "lbl")
    assert(run(perfect).getLong(3) == 1000000L)
    val inverted = Seq((1L, true), (9L, false)).toDF("s", "lbl")
    assert(run(inverted).getLong(3) == 0L)
    // no negatives: no ranking question
    val onlyPos = Seq((1L, true), (2L, true)).toDF("s", "lbl")
    assert(run(onlyPos).isNullAt(3))
  }

  test("chiSquareIndependence: hand 2x2 margins, expected and contribution ppm") {
    // X: U=10 V=20; Y: U=20 V=10 — every margin 30, N=60, E=15 per cell,
    // per-cell contrib = (O*N - 900)^2 * 1e6 / (60*900) = 300^2*1e6/54000
    val rows = Seq.fill(10)(("X", "U")) ++ Seq.fill(20)(("X", "V")) ++
      Seq.fill(20)(("Y", "U")) ++ Seq.fill(10)(("Y", "V"))
    val out = Validation.chiSquareIndependence(rows.toDF("a", "b"), $"a", $"b")
      .orderBy("a", "b").collect()
    assert(out.toSeq == Seq(
      Row("X", "U", 10L, 30L, 30L, 60L, 15000000L, 1666666L),
      Row("X", "V", 20L, 30L, 30L, 60L, 15000000L, 1666666L),
      Row("Y", "U", 20L, 30L, 30L, 60L, 15000000L, 1666666L),
      Row("Y", "V", 10L, 30L, 30L, 60L, 15000000L, 1666666L)))
    // statistic = sum of contributions ~ 4 * 5/3 = 6.67 (chi2 of this table)
    assert(out.map(_.getLong(7)).sum == 6666664L)
  }

  test("cohensKappa: hand 2x2 agreement, negative kappa sign-exact, constant raters NULL") {
    // 20 AA, 5 AB, 10 BA, 15 BB: po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)(("A", "A")) ++ Seq.fill(5)(("A", "B")) ++
      Seq.fill(10)(("B", "A")) ++ Seq.fill(15)(("B", "B"))
    val out = Validation.cohensKappa(rows.toDF("ra", "rb"), $"ra", $"rb")
      .collect().head
    assert(out == Row(50L, 35L, 700000L, 500000L, 400000L))
    // systematic disagreement: kappa = -1, truncation applied to |num|
    val neg = Validation.cohensKappa(
      Seq(("A", "B"), ("B", "A")).toDF("ra", "rb"), $"ra", $"rb").collect().head
    assert(neg.getLong(4) == -1000000L)
    // both raters constant: den = 0, kappa undefined
    val const = Validation.cohensKappa(
      Seq(("A", "A"), ("A", "A")).toDF("ra", "rb"), $"ra", $"rb").collect().head
    assert(const.isNullAt(4))
  }

  test("benfordAudit: leading-digit shares vs pinned constants, absent digits at 0, non-positive excluded") {
    val df = Seq(1L, 19L, 25L, 35L, 911L, 0L, -5L).toDF("v")
    val out = Validation.benfordAudit(df, $"v").orderBy("digit").collect()
    assert(out.length == 9)
    assert(out.head == Row(1L, 2L, 400000L, 301029L, 98971L, 352182L))
    assert(out(1) == Row(2L, 1L, 200000L, 176091L, 23909L, 352182L))
    // digits 4..8 absent -> n 0, diff = full expected mass
    assert(out(3) == Row(4L, 0L, 0L, 96910L, 96910L, 352182L))
    assert(out(8) == Row(9L, 1L, 200000L, 45757L, 154243L, 352182L))
  }

  test("calibrationReport: fixed bins with clamping, per-bin rate vs mean score, ECE") {
    val df = Seq((50000L, true), (50000L, false), (950000L, true),
      (1500000L, false)).toDF("s", "lbl")
    val out = Validation.calibrationReport(df, $"s", $"lbl", nBins = 10)
      .orderBy("bin").collect()
    // bin 0: rate 1/2, mean score 50000; bin 9 holds 950000 AND the
    // clamped 1500000: rate 1/2, mean 1225000
    assert(out.toSeq == Seq(
      Row(0L, 2L, 1L, 500000L, 50000L, 450000L, 587500L),
      Row(9L, 2L, 1L, 500000L, 1225000L, 725000L, 587500L)))
    // ECE = (2*450000 + 2*725000) / 4
    assert(out.head.getLong(6) == 587500L)
  }

  test("abTestProportions: z² at the significance boundary, degenerate NULLs") {
    // 5/10 vs 1/10: z² = 1600*20e6/8400 = 3809523 ppm — just UNDER 3.8415
    val close = (1 to 10).map(i => ("a", i <= 5)) ++ (1 to 10).map(i => ("b", i <= 1))
    val out = Validation.abTestProportions(close.toDF("g", "c"),
      $"g" === "a", $"c").collect().head
    assert(out == Row(10L, 10L, 5L, 1L, 500000L, 100000L, 3809523L, false))
    // 5/10 vs 0/10: z² = 2500*20e6/7500 = 6666666 ppm — significant
    val wide = (1 to 10).map(i => ("a", i <= 5)) ++ (1 to 10).map(_ => ("b", false))
    val sig = Validation.abTestProportions(wide.toDF("g", "c"),
      $"g" === "a", $"c").collect().head
    assert(sig.getLong(6) == 6666666L && sig.getBoolean(7))
    // everyone converted: no variance, NULL z², not significant
    val flat = Seq(("a", true), ("b", true)).toDF("g", "c")
    val f = Validation.abTestProportions(flat, $"g" === "a", $"c").collect().head
    assert(f.isNullAt(6) && !f.getBoolean(7))
  }

  test("giniFeatureImportance: perfect split zeroes impurity, useless feature zero reduction") {
    val df = Seq(("A", "x", "m"), ("A", "x", "n"), ("B", "z", "m"), ("B", "z", "n"))
      .toDF("y", "f", "g")
    val out = Validation.giniFeatureImportance(df, $"y",
        Seq("f" -> $"f", "g" -> $"g"))
      .orderBy("feature").collect()
    // base gini of 2/2 = 0.5; f separates perfectly, g not at all
    assert(out.toSeq == Seq(
      Row("f", 2L, 500000L, 0L, 500000L),
      Row("g", 2L, 500000L, 500000L, 0L)))
  }

  test("decisionStump: exact Gini-optimal threshold, pure split, full accuracy") {
    val df = (1L to 10L).map(v => (v, v <= 5L)).toDF("v", "lbl")
    val out = Validation.decisionStump(df, $"v", $"lbl").collect().head
    // threshold 5 splits 5 pos / 5 neg perfectly
    assert(out == Row(5L, 5L, 5L, 500000L, 0L, 500000L, 1000000L))
    // constant label: base gini 0, no split helps, accuracy still 1
    val const = (1L to 10L).map(v => (v, true)).toDF("v", "lbl")
    val c = Validation.decisionStump(const, $"v", $"lbl").collect().head
    assert(c.getLong(3) == 0L && c.getLong(5) == 0L && c.getLong(6) == 1000000L)
  }

  test("decisionTree2: XOR grid — root tie order, branches pick the complementary feature") {
    // 10x10 grid, label = (a<5) XOR (b<5): every single split leaves 50/50,
    // so ALL root candidates tie at wg=500000 and the (wg, feature,
    // threshold) order must pick ('a', 0); the left branch (a=0 only, 'a'
    // constant there) must then find 'b' <= 4 as a PERFECT split
    val df = (for (a <- 0 until 10; b <- 0 until 10)
      yield (a.toLong, b.toLong, (a < 5) != (b < 5))).toDF("a", "b", "lbl")
    val out = Validation.decisionTree2(df,
        Seq("a" -> $"a", "b" -> $"b"), $"lbl")
      .orderBy("node").collect()
    assert(out.length == 3)
    val byNode = out.map(r => r.getString(0) -> r).toMap
    val root = byNode("root")
    assert(root.getString(1) == "a" && root.getLong(2) == 0L,
      s"root tie order must pick (a, 0), got $root")
    assert(root.getLong(7) == 0L, "no single split reduces XOR impurity")
    val left = byNode("left")
    // left = the 10 rows with a=0: label = (b >= 5); b<=4 is pure
    assert(left.getString(1) == "b" && left.getLong(2) == 4L)
    assert(left.getLong(3) == 10L && left.getLong(4) == 5L)
    assert(left.getLong(5) == 500000L && left.getLong(6) == 0L)
    assert(left.getLong(8) == 1000000L)
    // side class counts (the applicable-model columns): left side of the
    // b<=4 split holds the 5 negatives (label = b>=5), so pos_left = 0
    assert(left.getLong(9) == 5L && left.getLong(10) == 0L)
    // right (a in 1..9): 'b' still carries more signal than 'a'
    assert(byNode("right").getString(1) == "b")
    assert(byNode("right").getLong(3) == 90L)
  }

  test("decisionTree2Eval: held-out confusion on a separable feature; constant-feature fallback") {
    // v = i % 100, label = v < 50; train on evens, score the odds. The
    // train deciles put a candidate at 48 (pure split), so the tree
    // separates perfectly except the two held-out v=49 rows (49 > 48
    // falls in the all-negative right branch)
    val df = (0L until 200L).map(i => (i, i % 100, (i % 100) < 50))
      .toDF("id", "v", "lbl")
    val out = Validation.decisionTree2Eval(df, Seq("v" -> $"v"), $"lbl",
      isTrain = $"id" % 2 === 0).collect().head
    assert(out.getLong(0) == 100L && out.getLong(1) == 100L, "train/val sizes")
    assert((out.getLong(2), out.getLong(3), out.getLong(4), out.getLong(5)) ==
      ((48L, 0L, 2L, 50L)), "confusion (tp, fp, fn, tn)")
    assert(out.getLong(6) == 980000L, "acc_ppm")
    // constant feature: a DEGENERATE zero-reduction root trains (one
    // edge at the constant, everything on the left) and both side
    // majorities are the train majority — predict negative (4 pos of 10)
    val const = (0L until 20L).map(i => (i, 7L, i < 8)).toDF("id", "v", "lbl")
    val c = Validation.decisionTree2Eval(const, Seq("v" -> $"v"), $"lbl",
      isTrain = $"id" % 2 === 0).collect().head
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3),
      c.getLong(4), c.getLong(5), c.getLong(6)) ==
      ((10L, 10L, 0L, 0L, 4L, 6L, 600000L)))
    // EMPTY train partition: the only path to the case-None fallback —
    // n_train = 0 and every val row gets the vacuous negative majority
    val e = Validation.decisionTree2Eval(const, Seq("v" -> $"v"), $"lbl",
      isTrain = lit(false)).collect().head
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3),
      e.getLong(4), e.getLong(5), e.getLong(6)) ==
      ((0L, 20L, 0L, 0L, 8L, 12L, 600000L)))
  }

  test("decisionTree2: branches smaller than nBins train without error") {
    // 13 rows, pure split at v=3: the 3-row left branch has fewer rows
    // than nBins=10, so its rank bins are sparse — regression test for
    // the null-initialized Array[Option] NPE in the edge derivation
    val df = (1L to 13L).map(v => (v, v <= 3L)).toDF("v", "lbl")
    val out = Validation.decisionTree2(df, Seq("v" -> $"v"), $"lbl").collect()
    val root = out.find(_.getString(0) == "root").get
    assert(root.getLong(2) == 3L, "pure split at v=3")
    assert(out.exists(_.getString(0) == "left"), "3-row branch must train")
    assert(out.exists(_.getString(0) == "right"), "10-row branch must train")
  }

  test("decisionTree2: single-feature root row agrees with decisionStump") {
    val df = (0L until 200L).map(i => ((i * 37) % 100, (i % 13) < 6))
      .toDF("v", "lbl")
    val stump = Validation.decisionStump(df, $"v", $"lbl").collect().head
    val root = Validation.decisionTree2(df, Seq("v" -> $"v"), $"lbl")
      .filter($"node" === "root").collect().head
    // (threshold, base gini, weighted gini, reduction, acc) must match
    assert(root.getLong(2) == stump.getLong(0), "threshold")
    assert(root.getLong(5) == stump.getLong(3), "base gini")
    assert(root.getLong(6) == stump.getLong(4), "weighted gini")
    assert(root.getLong(7) == stump.getLong(5), "reduction")
    assert(root.getLong(8) == stump.getLong(6), "accuracy")
  }

  test("numericDrift: exact decile edges from ref, strict-greater binning, TVD") {
    val ref = (1L to 10L).toDF("v")
    val cur = Seq(1L, 11L, 12L).toDF("v")
    val out = Validation.numericDrift(ref, cur, $"v", nBins = 10)
      .orderBy("bin").collect()
    // ref deciles: one value per bin, edges 1..9; cur: 1 -> bin 0 (no edge
    // strictly below), 11 and 12 -> bin 9
    assert(out.length == 10)
    assert(out.head == Row(0L, null, 1L, 1L, 100000L, 333333L, 233333L, 799999L))
    assert(out(1) == Row(1L, 1L, 1L, 0L, 100000L, 0L, 100000L, 799999L))
    assert(out(9) == Row(9L, 9L, 1L, 2L, 100000L, 666666L, 566666L, 799999L))
    // TVD = (233333 + 8*100000 + 566666) / 2
    assert(out.forall(_.getLong(7) == 799999L))
    // identical splits: zero drift
    val zero = Validation.numericDrift(ref, ref, $"v", nBins = 5).collect()
    assert(zero.forall(r => r.getLong(6) == 0L && r.getLong(7) == 0L))
  }

  test("functionalDependency: majority repair size, clean FD, empty input") {
    // groups: a -> {x:2, y:1} (3 rows, max 2), b -> {z:1}; repair = 1 row
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")).toDF("l", "r")
    val row = Validation.functionalDependency(df, "t", $"l", $"r").collect().head
    assert(row == Row("t", 2L, 1L, 4L, 1L, 250000L))
    // a real FD: zero violations, every group clean
    val clean = Seq(("a", "x"), ("a", "x"), ("b", "y")).toDF("l", "r")
    assert(Validation.functionalDependency(clean, "t", $"l", $"r")
      .collect().head == Row("t", 2L, 2L, 3L, 0L, 0L))
    // empty input: honest zeros, not a null row
    val empty = Seq.empty[(String, String)].toDF("l", "r")
    assert(Validation.functionalDependency(empty, "t", $"l", $"r")
      .collect().head == Row("t", 0L, 0L, 0L, 0L, 0L))
  }

  test("fairnessReport: hand contingency, gaps vs global, NULL TPR on label-free group") {
    // A: 4 rows, 3 selected, 2 labeled (both selected); B: 2 rows, none
    // selected, none labeled -> TPR undefined, never 0-faked
    val df = Seq(
      ("A", true, true), ("A", true, true), ("A", true, false), ("A", false, false),
      ("B", false, false), ("B", false, false)
    ).toDF("g", "pred", "lab")
    val out = Validation.fairnessReport(df, $"g", $"pred", $"lab")
      .orderBy($"grp").collect()
    // globals: sel 3/6 = 500000 ppm, TPR 2/2 = 1e6
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 4L)
    assert(a.getLong(5) == 750000L && a.getLong(6) == 500000L)
    assert(a.getLong(7) == 250000L)               // dp gap
    assert(a.getLong(8) == 1000000L && a.getLong(10) == 0L)  // TPR, eo gap
    val b = out(1)
    assert(b.getString(0) == "B" && b.getLong(5) == 0L)
    assert(b.getLong(7) == -500000L)
    assert(b.isNullAt(8) && b.isNullAt(10))
  }

  test("profileDrift: deltas and min/max movement flags per column") {
    val v1 = Seq((1L, Option("a")), (2L, Option("b")), (3L, None))
      .toDF("id", "s")
    // v2: one row fewer, nulls gone, a new max value
    val v2 = Seq((1L, Option("a")), (2L, Option("z"))).toDF("id", "s")
    val out = Validation.profileDrift(v1, v2, Seq("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7))).toMap
    // rows -1, nulls -1, distinct 0 (a,b -> a,z), min same 'a', max b -> z
    assert(out("s") == (-1L, -1L, 0L, false, true))
  }

  test("adjustedRandIndex: textbook pair counts and the fixed points") {
    // A = [1,1,1,2,2], B = [1,1,2,2,2]: contingency {(1,1):2,(1,2):1,
    // (2,2):2} -> S=2, A2=4, B2=4, N2=10 -> ARI = 2(20-16)/(80-32) = 1/6
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 2L), (2L, 2L)).toDF("a", "b")
    val r = Validation.adjustedRandIndex(df, $"a", $"b").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L && r.getLong(2) == 4L &&
      r.getLong(3) == 10L)
    assert(r.getLong(4) == 166666L) // floor(1e6/6)
    // identical labelings agree perfectly
    val same = Seq((1L, 1L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(Validation.adjustedRandIndex(same, $"a", $"b")
      .collect().head.getLong(4) == 1000000L)
    // degenerate single cluster on both sides: den2 = 0 -> 1e6 by convention
    val one = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    assert(Validation.adjustedRandIndex(one, $"a", $"b")
      .collect().head.getLong(4) == 1000000L)
    // independent labelings sit near zero (can be negative) — exercise the
    // sign-split branch: a 2x2 uniform table has ARI exactly 0... use a
    // worse-than-chance pairing instead: A=[1,2], B groups them together
    val anti = Seq((1L, 9L), (2L, 9L), (1L, 8L), (2L, 8L)).toDF("a", "b")
    val v = Validation.adjustedRandIndex(anti, $"a", $"b").collect().head
    // S=0+..: cells are 4 singles... each (a,b) distinct once -> S=0;
    // A2 = 2*C(2,2)... a-sums 2,2 -> A2=2; b-sums 2,2 -> B2=2; N2=6
    // num2 = 2(0-4) = -8; den2 = 4*6-8 = 16 -> ARI = -1/2
    assert(v.getLong(4) == -500000L)
  }
  test("cupedAdjustment: perfect covariate collapses the arm gap, constant-X NULL") {
    import spark.implicits._
    // y = 10x + 10 exactly: theta = 10, both adjusted means -> 25
    val df = Seq((0L, 0L, 10L), (0L, 2L, 30L), (1L, 1L, 20L), (1L, 3L, 40L))
      .toDF("arm", "x", "y")
    val got = Validation.cupedAdjustment(df, $"arm", $"x", $"y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(0L) == (20000000L, 25000000L, 10000000L))
    assert(got(1L) == (30000000L, 25000000L, 10000000L))
    val const = Seq((0L, 5L, 1L), (1L, 5L, 2L)).toDF("arm", "x", "y")
    val c = Validation.cupedAdjustment(const, $"arm", $"x", $"y").collect()
    assert(c.forall(r => r.isNullAt(5) && r.isNullAt(6)),
      "Var(X)=0 leaves CUPED undefined")
  }
  test("isotonicCalibration: PAVA pools violations, preserves monotone runs") {
    import spark.implicits._
    // group A bins: rates 1/2, 1/4, 3/4 -> first two pool to 2/6
    val rows =
      (0 until 2).map(i => (0L, i == 0)) ++ // b0: 1/2
        (0 until 4).map(i => (1L, i == 0)) ++ // b1: 1/4
        (0 until 4).map(i => (i < 3, 2L)).map(p => (p._2, p._1)) // b2: 3/4
    val got = Validation.isotonicCalibration(
        rows.toDF("b", "s"), $"b", $"s")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) == (500000L, 333333L))
    assert(got(1L) == (250000L, 333333L))
    assert(got(2L) == (750000L, 750000L))
    // strictly increasing input is a fixed point
    val inc = Seq((0L, false), (0L, false), (1L, true), (1L, false),
      (2L, true)).toDF("b", "s")
    val fx = Validation.isotonicCalibration(inc, $"b", $"s")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(fx == Map(0L -> 0L, 1L -> 500000L, 2L -> 1000000L))
  }
  test("kendallConcordance: hand counts, tie conventions, invariant, brute-force equality") {
    import spark.implicits._
    val df = Seq(
      ("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 15L), ("g", 3L, 15L),
      ("g", 2L, 20L),
      ("h", 1L, 30L), ("h", 2L, 20L), ("h", 3L, 10L),
      ("m", 1L, 7L), ("m", 2L, 7L),
      ("s", 5L, 5L)
    ).toDF("k", "x", "y")
    val got = Validation.kendallConcordance(df, $"k", $"x", $"y")
      .collect().map(r => r.getString(0) -> r).toMap
    // g hand-traced: C=4 D=4 tx=2 ty=2 txy=2 over 10 pairs -> tau 0
    val g = got("g")
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4),
      g.getLong(5), g.getLong(6), g.getLong(7)) == (5L, 10L, 4L, 4L, 2L, 2L, 2L))
    assert(g.getLong(8) == 0L)
    // invariant C + D + tx + ty - txy = n_pairs on every group
    got.values.filter(_.getLong(2) > 0).foreach { r =>
      assert(r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6) -
        r.getLong(7) == r.getLong(2))
    }
    assert(got("h").getLong(8) == -1000000L, "perfect inversion")
    val mRow = got("m") // y-tie across different x: ties_y only
    assert((mRow.getLong(5), mRow.getLong(6), mRow.getLong(7)) == (0L, 1L, 0L))
    assert(got("s").isNullAt(8) && got("s").getLong(2) == 0L, "singleton NULL tau")
    // brute-force pair-join equality on a pseudo-random group
    val rnd = (0 until 60).map(i =>
      ("r", (i * 37 % 11).toLong, (i * 53 % 7).toLong)).toDF("k", "x", "y")
    val fast = Validation.kendallConcordance(rnd, $"k", $"x", $"y").collect().head
    val rows = (0 until 60).map(i => ((i * 37 % 11).toLong, (i * 53 % 7).toLong))
    val pairs = for { i <- 0 until 60; j <- i + 1 until 60 } yield (rows(i), rows(j))
    def cnt(f: ((Long, Long), (Long, Long)) => Boolean) =
      pairs.count { case (p, q) => f(p, q) }.toLong
    assert(fast.getLong(3) == cnt((p, q) => (p._1 < q._1 && p._2 < q._2) ||
      (p._1 > q._1 && p._2 > q._2)))
    assert(fast.getLong(4) == cnt((p, q) => (p._1 < q._1 && p._2 > q._2) ||
      (p._1 > q._1 && p._2 < q._2)))
    assert(fast.getLong(5) == cnt((p, q) => p._1 == q._1))
    assert(fast.getLong(6) == cnt((p, q) => p._2 == q._2))
    assert(fast.getLong(7) == cnt((p, q) => p._1 == q._1 && p._2 == q._2))
  }

  test("kaplanMeier: hand curve, censor-only times shrink risk set silently") {
    val subj = Seq(
      (0L, 5L, 1L), (0L, 5L, 1L), (0L, 8L, 0L), (0L, 10L, 1L), (0L, 12L, 0L),
      (1L, 3L, 0L), (1L, 7L, 0L), // all censored: no curve rows
      (2L, 3L, 1L)                // single death: survival drops to 0
    ).toDF("g", "dur", "ev")
    val got = Validation.kaplanMeier(subj, $"g", $"dur", $"ev")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 3)
    assert(got((0L, 5L)) == (5L, 2L, 600000L), "2 of 5 die at t=5")
    assert(got((0L, 10L)) == (2L, 1L, 300000L),
      "t=8 censor row emits nothing but removes one at-risk subject")
    assert(got((2L, 3L)) == (1L, 1L, 0L))
  }

  test("logRank: O-E per event time, censoring shrinks risk sets") {
    val subj = Seq((1, 5L, 1L), (1, 10L, 0L), (0, 5L, 1L), (0, 7L, 1L))
      .toDF("g", "dur", "ev")
    val got = Validation.logRank(subj, $"g", $"dur", $"ev")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(5L) == (4L, 2L, 2L, 1L, 0L), "balanced deaths: O = E")
    assert(got(7L) == (2L, 1L, 1L, 0L, -500000L),
      "cohort-0 death while cohort 1 holds half the risk set")
    assert(!got.contains(10L), "censor-only time emits no row")
  }

  test("rfmScores: three independent quintiles, recency inverted, code composition") {
    val df = Seq((1L, 1L, 10L, 100L), (2L, 5L, 1L, 10L),
      (3L, 3L, 5L, 50L), (4L, 9L, 7L, 5L)).toDF("u", "rd", "fq", "mo")
    val got = Validation.rfmScores(df, $"u", $"rd", $"fq", $"mo", buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(7)).toMap
    assert(got == Map(1L -> 222L, 2L -> 111L, 3L -> 212L, 4L -> 121L),
      "freshest/most-frequent/highest-spend units land in the top bucket")
  }

  test("lorenzDeciles: cumulative share, zero total NULL") {
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("v", "tb")
    val got = Validation.lorenzDeciles(rows, $"v", $"tb", buckets = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (2L, 3L, 300000L), "bottom half holds 30%")
    assert(got(2L) == (2L, 7L, 1000000L))
    val zero = Seq((0L, 1L), (0L, 2L)).toDF("v", "tb")
    assert(Validation.lorenzDeciles(zero, $"v", $"tb", 2)
      .collect().forall(_.isNullAt(3)))
  }

  test("simpsonDiversity: hand match probability, singleton NULL") {
    val df = Seq(("g1", "A"), ("g1", "A"), ("g1", "B"), ("g2", "X"))
      .toDF("g", "c")
    val got = Validation.simpsonDiversity(df, $"g", $"c")
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4))
      == (3L, 2L, 333333L, 666667L))
    assert(got("g2").isNullAt(3), "one draw: undefined")
  }

  test("prCurveDeciles: hand threshold sweep, exact ppm") {
    val rows = Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 3L, 0L), (4L, 4L, 1L))
      .toDF("sc", "tb", "y")
    val got = Validation.prCurveDeciles(rows, $"sc", $"tb", $"y", buckets = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(got(1L) == (2L, 2L, 0L, 500000L, 1000000L, 666666L),
      "threshold at bucket 1 predicts everything positive")
    assert(got(2L) == (1L, 1L, 1L, 500000L, 500000L, 500000L))
  }

  test("cramerVonMises: hand interleaving, tie-order invariance") {
    val df = Seq(("k", 0, 1L), ("k", 0, 3L), ("k", 1, 2L), ("k", 1, 4L),
      ("t", 0, 1L), ("t", 0, 1L), ("t", 1, 1L), ("t", 1, 2L))
      .toDF("k", "s", "v")
    val got = Validation.cramerVonMises(df, $"k", $"s", $"v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("k") == (2L, 2L, 48L, 125000L), "U2 = 4U = 48, T = 24/192")
    assert(got("t")._3 == 48L, "triple tie at 1: doubled midranks stay integer")
  }

  test("mcnemarReadout: discordant cells drive the statistic") {
    val df = Seq(("g", 1, 1), ("g", 1, 0), ("g", 1, 0), ("g", 1, 0),
      ("g", 0, 1), ("g", 0, 0), ("h", 1, 1), ("h", 0, 0)).toDF("g", "p0", "p1")
    val got = Validation.mcnemarReadout(df, $"g", $"p0", $"p1")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4))
      == (1L, 3L, 1L, 1L))
    assert(g.getLong(5) == 1000000L, "(3-1)^2 / 4 = 1")
    assert(got("h").isNullAt(5), "no discordant pairs: undefined")
  }

  test("spearmanReport: monotone +-1, hand ties via doubled midranks") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 6L), ("b", 2L, 4L), ("b", 3L, 2L),
      ("c", 1L, 1L), ("c", 1L, 2L), ("c", 2L, 2L)).toDF("k", "x", "y")
    val got = Validation.spearmanReport(df, $"k", $"x", $"y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got("a") == Some(1000000L) && got("b") == Some(-1000000L))
    assert(got("c") == Some(250000L), "dx=(-1,-1,2), dy=(-2,1,1): 9/36")
  }

  test("upliftDeciles: hand two-bucket uplift and qini, tie-broken equal scores") {
    val rows = Seq(
      (1L, 1L, 1, 1L), (2L, 2L, 0, 0L), (3L, 3L, 1, 1L), (4L, 4L, 0, 0L),
      (5L, 5L, 1, 0L), (6L, 6L, 0, 1L), (7L, 7L, 1, 0L), (8L, 8L, 0, 1L)
    ).toDF("sc", "tb", "tr", "oc")
    val got = Validation.upliftDeciles(rows, $"sc", $"tb", $"tr", $"oc",
        buckets = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(5) == 1000000L && got(1L).getLong(6) == 2000000L)
    assert(got(2L).getLong(5) == -1000000L && got(2L).getLong(6) == 0L,
      "cumulative qini returns to zero when control catches up")
    // all-equal scores: the tie column alone orders the ranking
    val ties = Seq((7L, 1L, 1, 0L), (7L, 2L, 0, 0L), (7L, 3L, 1, 0L),
      (7L, 4L, 0, 0L)).toDF("sc", "tb", "tr", "oc")
    val tg = Validation.upliftDeciles(ties, $"sc", $"tb", $"tr", $"oc", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tg(1L) == (1L, 1L) && tg(2L) == (1L, 1L))
  }

  test("didReadout: hand parallel-trends delta, empty cell NULLs") {
    val rows = Seq(
      ("a", 1, 1, 10L), ("a", 1, 1, 20L), ("a", 1, 0, 5L),
      ("a", 0, 1, 4L), ("a", 0, 0, 2L),
      ("e", 1, 1, 9L), ("e", 0, 1, 3L), ("e", 0, 0, 1L) // no treat-pre cell
    ).toDF("g", "tr", "po", "v")
    val got = Validation.didReadout(rows, $"g", $"tr", $"po", $"v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(5) == 15000000L && a.getLong(6) == 5000000L)
    assert(a.getLong(9) == 8000000L, "(15-5)-(4-2) = 8")
    assert(got("e").isNullAt(9) && got("e").isNullAt(6), "empty cell => NULL")
  }

  test("datasetCard: one long-format frame with hand-checked profile, histogram, and top-term cells") {
    val df = Seq(
      (1L, "hello world", 11.0),
      (2L, "hello again", 11.0),
      (3L, null.asInstanceOf[String], 100.0)
    ).toDF("id", "txt", "len")
    val card = Validation.datasetCard(df, Seq("id", "txt"),
        histCol = $"len", histLo = 0.0, histHi = 100.0, histBuckets = 4,
        tokens = org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.coalesce($"txt",
            org.apache.spark.sql.functions.lit("")), " "),
        topK = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3))
      .toMap
    assert(card(("profile", "id", "n_rows")) == "3")
    assert(card(("profile", "txt", "n_nulls")) == "1")
    assert(card(("profile", "id", "n_distinct")) == "3")
    assert(card(("profile", "id", "min")) == "1" && card(("profile", "id", "max")) == "3")
    // len 11 -> bucket 0 (x2); len 100 clamps into the last bucket (3)
    assert(card(("histogram", "0", "count")) == "2")
    assert(card(("histogram", "3", "count")) == "1")
    // "hello" x2 beats everything; ties below it break lexicographically
    assert(card(("top_terms", "hello", "count")) == "2")
  }
}
