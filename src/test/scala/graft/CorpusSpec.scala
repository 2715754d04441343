package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Similarity}
import graft.operators.Relational.GraftOps
import graft.streaming.EventStreams

/** Round-3 corpus-preparation + time-series operators: deterministic
  * in-memory fixtures, exact expected answers (the driver's DuckDB oracles
  * cover the same ops over the parquet testdata).
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("tokenChunks: 25 tokens at chunk=10 -> 10/10/5; empty doc -> empty array") {
    val txt = (1 to 25).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, txt), (2L, ""), (3L, "   ")).toDF("id", "text")
      .select($"id", Corpus.tokenChunks($"text", 10).alias("chunks"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L).length == 3)
    assert(m(1L)(0) == (1 to 10).map(i => s"t$i").mkString(" "))
    assert(m(1L)(2) == (21 to 25).map(i => s"t$i").mkString(" "))
    assert(m(2L).isEmpty && m(3L).isEmpty)
  }

  test("segmentDedup: later duplicate segments drop, all-dup docs come back empty") {
    // doc 1: A B; doc 2: B C (B repeats -> dropped); doc 3: A B (both dup -> empty)
    val docs = Seq(
      (1L, Seq("alpha alpha", "beta beta")),
      (2L, Seq("beta beta", "gamma gamma")),
      (3L, Seq("alpha alpha", "beta beta"))
    ).toDF("id", "segs")
    val out = Corpus.segmentDedup(docs, $"id", $"segs")
      .orderBy("id").collect()
    assert(out(0) == Row(1L, "alpha alpha beta beta", 2L, 0L))
    assert(out(1) == Row(2L, "gamma gamma", 1L, 1L))
    assert(out(2) == Row(3L, "", 0L, 2L))
  }

  test("contamination: overlap ratio vs the benchmark shingle set is exact") {
    // 2-grams; bench doc "a b c" -> shingles {a b, b c}
    val docs = Seq(
      (1L, "a b c", true),     // benchmark
      (2L, "a b x y", false),  // shingles {a b, b x, x y} -> 1 hit of 3
      (3L, "p q r", false)     // no overlap
    ).toDF("id", "text", "isb")
    val out = Corpus.contamination(docs, $"id", $"text", $"isb", ngram = 2)
      .orderBy("id").collect()
    assert(out(0) == Row(2L, 3L, 1L, 1.0 / 3))
    assert(out(1) == Row(3L, 2L, 0L, 0.0))
  }

  test("contaminationBloom equals contamination, even at a high false-positive rate") {
    // fpp 0.5 forces bloom false positives through the prefilter — the
    // exact semi join must still remove every one of them
    val docs = Seq(
      (1L, "a b c d e", true),
      (2L, "a b c x y z w", false),
      (3L, "p q r s t u", false),
      (4L, "a b c d e f g", false)
    ).toDF("id", "text", "isb")
    val exact = Corpus.contamination(docs, $"id", $"text", $"isb", ngram = 2)
      .orderBy("id").collect().toSeq
    val bloom = Corpus.contaminationBloom(docs, $"id", $"text", $"isb",
        ngram = 2, fpp = 0.5)
      .orderBy("id").collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty && exact.head.getLong(2) > 0, "fixture must have real hits")
  }

  test("stripBoilerplate: shared lines drop everywhere, trim-keyed, blanks survive") {
    val docs = Seq(
      (1L, "alpha\n-- footer --"),
      (2L, "beta\n\n-- footer --"),
      (3L, "gamma"),
      (4L, "delta\n  -- footer --  ")   // padded variant: same trimmed key
    ).toDF("id", "text")
    val out = Corpus.stripBoilerplate(docs, $"id", $"text", minDocs = 2L)
      .orderBy("id").collect()
    // footer appears (trimmed) in docs 1,2,4 -> boilerplate; bodies unique;
    // doc 2's blank line is kept as-is (blanks are never boilerplate)
    assert(out(0) == Row(1L, "alpha", 1L, 1L))
    assert(out(1) == Row(2L, "beta\n", 2L, 1L))
    assert(out(2) == Row(3L, "gamma", 1L, 0L))
    assert(out(3) == Row(4L, "delta", 1L, 1L))
  }

  test("rarityScore: hand-computed scaled inverse probabilities") {
    // corpus: a a b | b c  ->  c(a)=2 c(b)=2 c(c)=1, N=5
    // rarity(a)=rarity(b)=2500000, rarity(c)=5000000
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val out = Corpus.rarityScore(docs, $"id", split($"text", " "))
      .orderBy("id").collect()
    assert(out(0) == Row(1L, 3L, 7500000L, 2500000.0))
    assert(out(1) == Row(2L, 2L, 7500000L, 3750000.0))
  }

  test("frequencySpectrum: frequency-of-frequencies on a tiny corpus") {
    // a:2 b:2 c:1 -> one term seen once, two terms seen twice
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val m = Corpus.frequencySpectrum(docs, split($"text", " "))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 2L))
  }

  test("truncateTokens: budget cut on the normalized stream; short docs untouched") {
    val docs = Seq((1L, "A  b C d"), (2L, "x y"), (3L, "")).toDF("id", "text")
    val out = Corpus.truncateTokens(docs, $"id", $"text", 2)
      .orderBy("id").collect()
    assert(out(0) == Row(1L, "a b", 4L, true))
    assert(out(1) == Row(2L, "x y", 2L, false))
    assert(out(2) == Row(3L, "", 0L, false))
  }

  test("deterministicShuffle: reproducible, complete, contiguous positions per shard") {
    val df = (0L until 100L).toDF("id")
    val a = Corpus.deterministicShuffle(df, $"id", 4)
      .select($"id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Corpus.deterministicShuffle(df, $"id", 4)
      .select($"id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "shuffle must be reproducible")
    assert(a.map(_._1).toSet == (0L until 100L).toSet)
    assert(a.forall(t => t._2 >= 0 && t._2 < 4))
    // positions are 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // salt changes the permutation
    val s = Corpus.deterministicShuffle(df, $"id", 4, salt = 7L)
      .select($"id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(s.toSeq != a.toSeq)
  }

  test("pagerankStep: hand-computed integer damped ranks over a 3-cycle-ish graph") {
    import graft.operators.Graph
    // edges 1->3, 2->3, 3->1; scale 100, d = 50/100; teleport = 50
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val r0 = Graph.uniformRanks(nodes, scale = 100L)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = Graph.pagerankStep(edges, r0, dNum = 50, scale = 100L)
    // contrib(3) = 100+100, contrib(1) = 100, node 2 dangles at teleport
    assert(m(r1) == Map(1L -> 100L, 2L -> 50L, 3L -> 150L))
    val r2 = Graph.pagerankStep(edges, r1, dNum = 50, scale = 100L)
    // contrib(3) = 100+50 -> 125; contrib(1) = 150 -> 125
    assert(m(r2) == Map(1L -> 125L, 2L -> 50L, 3L -> 125L))
    // fixed-round driver: pagerank(2 rounds) == stepping twice
    assert(m(Graph.pagerank(edges, rounds = 2, dNum = 50, scale = 100L, nodes = Some(nodes))) == m(r2))
  }

  test("kCorePeel: triangle survives k=2, chain cascades to empty, sub-k degrees honest") {
    import graft.operators.Graph
    // triangle {1,2,3} + tail 3-4
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 drops degree-1 node 4; round 2 changes nothing (converged)
    assert(m(Graph.kCorePeel(tri, k = 2, rounds = 2)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: only node 3 qualifies round 1 -> every edge loses an endpoint
    assert(Graph.kCorePeel(tri, k = 3, rounds = 1).count() == 0)
    // path 1-2-3-4-5, k=2: ends die each round -> empty by round 3;
    // one round leaves interior nodes with their honest sub-k degrees
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    assert(m(Graph.kCorePeel(path, k = 2, rounds = 1)) ==
      Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    assert(Graph.kCorePeel(path, k = 2, rounds = 3).count() == 0)
  }

  test("degreeStats: star graph histogram, shares, edge count from the degree sum") {
    import graft.operators.Graph
    // star: center 1 with leaves 2, 3, 4
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val rows = Graph.degreeStats(star).orderBy("degree").collect()
    assert(rows.length == 2)
    // degree 1: the 3 leaves (750000 ppm); degree 3: the center (250000 ppm)
    assert(rows(0) == Row(1L, 3L, 750000L, 4L, 3L, 3L))
    assert(rows(1) == Row(3L, 1L, 250000L, 4L, 3L, 3L))
  }

  test("degreeAssortativity: star exactly -1, mixed case -1/2, regular graph NULL") {
    import graft.operators.Graph
    def one(df: org.apache.spark.sql.DataFrame) = df.collect()(0)
    // star: hubs only ever touch leaves — perfectly disassortative
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val s = one(Graph.degreeAssortativity(star))
    // m=6, sx=12, sxy=18, sxx=30 -> num=-36, den=36 -> r = -1 exactly
    assert(s.getLong(0) == 6L && s.getLong(1) == 12L)
    assert(s.getLong(2) == 18L && s.getLong(3) == 30L)
    assert(s.getLong(6) == -1000000L)
    // (1,2),(3,4),(1,3): hand co-moments give r = -1/2 exactly
    val mixed = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    assert(one(Graph.degreeAssortativity(mixed)).getLong(6) == -500000L)
    // triangle: degree-regular, den = 0 -> undefined, NULL by contract
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(one(Graph.degreeAssortativity(tri)).isNullAt(6))
  }

  test("largestRemainderQuota: sums to the budget exactly, remainder ties to the smaller label") {
    val df = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("src", "n")
    def run(budget: Long) = Corpus.largestRemainderQuota(df, $"src", $"n", budget)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // budget 11: bases 3/3/4 leave 1 unit; c's remainder 4 wins it
    assert(run(11L) == Map("a" -> 3L, "b" -> 3L, "c" -> 5L))
    // budget 12: 2 units; c first, then the a/b remainder tie -> a
    assert(run(12L) == Map("a" -> 4L, "b" -> 3L, "c" -> 5L))
    // the whole point: quotas always sum to the budget
    Seq(1L, 7L, 10L, 99L).foreach { b => assert(run(b).values.sum == b) }
  }

  test("neighborAgg: hand aggregates, featureless neighbors invisible, sign-split mean") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L)).toDF("id_a", "id_b")
    // node 4 and 5 carry no feature: they aggregate but never contribute
    val feats = Seq((1L, 10L), (2L, -20L), (3L, 30L)).toDF("id", "f")
    val out = Graph.neighborAgg(edges, feats).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // 1 sees 2 (-20) and 3 (30); 4 is featureless -> n_nbrs = 2
    assert(out(1L) == (2L, 10L, -20L, 30L, 5000L))
    // 2 sees 1 (10) and featureless 5
    assert(out(2L) == (1L, 10L, 10L, 10L, 10000L))
    assert(out(4L) == (1L, 10L, 10L, 10L, 10000L))
    // 5 sees only 2 (-20): the sign-split floor branch
    assert(out(5L) == (1L, -20L, -20L, -20L, -20000L))
  }

  test("personalizedPagerank: teleport lands only on seeds, hand rounds, no-seed graph all zero") {
    import graft.operators.Graph
    // path 1 -> 2 -> 3, seed {1}, d = 50/100, scale 100
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r0: 100/0/0; r1: 1 -> 50 (teleport only), 2 -> 50*100/100 = 50, 3 -> 0
    val r1 = Graph.personalizedPagerank(edges, seeds, rounds = 1,
      dNum = 50, scale = 100L)
    assert(m(r1) == Map(1L -> 50L, 2L -> 50L, 3L -> 0L))
    // r2: 1 -> 50, 2 -> 50*50/100 = 25, 3 -> 25
    val r2 = Graph.personalizedPagerank(edges, seeds, rounds = 2,
      dNum = 50, scale = 100L)
    assert(m(r2) == Map(1L -> 50L, 2L -> 25L, 3L -> 25L))
    // empty seed set: no teleport source, every rank collapses to zero
    val none = Graph.personalizedPagerank(edges,
      Seq.empty[Long].toDF("id"), rounds = 1, dNum = 50, scale = 100L)
    assert(m(none) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("hits: max-normalized hand rounds, hub/auth roles separate") {
    import graft.operators.Graph
    // hubs {1, 2}, auths {10, 11}: 1->10, 2->10, 2->11
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    // round 1: a_raw 10 -> 2e6, 11 -> 1e6, max-normed (1e6, 5e5);
    // h_raw 1 -> 1e6, 2 -> 1.5e6 -> (666666, 1e6)
    val r1 = m(Graph.hits(edges, rounds = 1))
    assert(r1 == Map(("auth", 10L) -> 1000000L, ("auth", 11L) -> 500000L,
      ("hub", 1L) -> 666666L, ("hub", 2L) -> 1000000L))
    // round 2: a_raw 10 -> 1666666, 11 -> 1e6 -> (1e6, 600000);
    // h_raw 1 -> 1e6, 2 -> 1.6e6 -> (625000, 1e6)
    val r2 = m(Graph.hits(edges, rounds = 2))
    assert(r2 == Map(("auth", 10L) -> 1000000L, ("auth", 11L) -> 600000L,
      ("hub", 1L) -> 625000L, ("hub", 2L) -> 1000000L))
  }

  test("linkPrediction: wedge candidates only, known edges dropped, hub cap excludes through-nodes") {
    import graft.operators.Graph
    // 1-2, 1-3, 2-3, 3-4: the only non-edges sharing a neighbor are
    // (1,4) and (2,4), both through hub 3 (deg 3)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Graph.linkPrediction(edges).orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // jaccard = 1 / (deg_a + deg_b - 1)
    assert(out == Seq(
      (1L, 4L, 1L, 2L, 1L, 500000L),
      (2L, 4L, 1L, 2L, 1L, 500000L)))
    // capping the through-node degree at 2 removes every wedge through 3;
    // the remaining wedges (through 1 and 2) are all existing edges
    assert(Graph.linkPrediction(edges, maxWedgeDegree = 2).count() == 0)
  }

  test("labelPropagation: barbell graph splits into its two triangles; ties go to the smallest label") {
    import graft.operators.Graph
    // triangles {1,2,3} and {4,5,6} bridged by 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 from self-labels: every vote count is 1, so the argmax IS
    // the tie-break — node 1 sees {2,3} and must pick 2
    assert(m(Graph.labelPropagation(edges, rounds = 1)) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L))
    // round 3: converged to one label per triangle, bridge notwithstanding
    assert(m(Graph.labelPropagation(edges, rounds = 3)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("bfsDistances: multi-source hop distances, unreached nodes absent") {
    import graft.operators.Graph
    // path 1-2-3-4-5 and separate edge 6-7; sources {1, 6}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val src = Seq(1L, 6L).toDF("id")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.bfsDistances(edges, src, rounds = 2)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 0L, 7L -> 1L))
    // more rounds reach the tail; distances already found never grow
    assert(m(Graph.bfsDistances(edges, src, rounds = 4)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 0L, 7L -> 1L))
    // maxLocalEdges=0 forces the DISTRIBUTED frontier loop (the default
    // hybrid takes the driver path on a graph this small) — both paths
    // must produce the identical horizon-capped answer
    assert(m(Graph.bfsDistances(edges, src, rounds = 2, maxLocalEdges = 0L)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 6L -> 0L, 7L -> 1L))
    assert(m(Graph.bfsDistances(edges, src, rounds = 4, maxLocalEdges = 0L)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 0L, 7L -> 1L))
  }

  test("two-tier size pre-gate: corpus-scale scan leaves skip the driver tier with ZERO jobs; materialized/small frames pay the count") {
    import graft.operators.Graph
    // a 10B-row Range leaf reports ~80 GB of scan bytes — the gate must
    // say "not driver-sized" WITHOUT running any job (the whole point:
    // a 100 TB edge list must not pay a count to learn it's too big)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val huge = spark.range(10L * 1000 * 1000 * 1000)
        .select($"id".as("a"), ($"id" + 1L).as("b"))
      assert(!Graph.plausiblyDriverSized(huge, 4L << 20))
      // listener events are async: a job start would enqueue within the
      // submit call itself; give the bus a beat before asserting empty
      Thread.sleep(300)
      assert(jobs.get() == 0, "the pre-gate must be plan-analysis only")
    } finally spark.sparkContext.removeSparkListener(listener)
    // small scan-backed and already-materialized frames pass (and then
    // pay the one cheap count): a LocalRelation has no scan leaves at
    // all, and a checkpoint's LogicalRDD leaf is excluded because its
    // stats are the pre-checkpoint ROOT estimate (join-inflated), while
    // counting it never re-executes upstream lineage
    val small = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Graph.plausiblyDriverSized(small, 4L << 20))
    val ckpt = graft.operators.Iterative.truncate(
      small.join(small.toDF("b", "c"), "b"), None)
    assert(Graph.plausiblyDriverSized(ckpt, 4L << 20))
    // heap-aware budget: never above the configured bound, and positive
    val budget = Graph.driverRowBudget(4L << 20)
    assert(budget > 0 && budget <= (4L << 20))
  }

  test("driver-tier null parity: null ids/weights drop on BOTH tiers (equi-join semantics), never NPE") {
    import graft.operators.{Graph, Dedup}
    val edges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L))
    ).toDF("id_a", "id_b")
    val src = Seq(1L).toDF("id")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null-endpoint edges contribute nothing on either tier
    val expected = Map(1L -> 0L, 2L -> 1L)
    assert(m(Graph.bfsDistances(edges, src, rounds = 3)) == expected)
    assert(m(Graph.bfsDistances(edges, src, rounds = 3, maxLocalEdges = 0L)) == expected)
    // components: the 2-null and null-5 edges vanish; {1,2} remains
    val comp = Map(1L -> 1L, 2L -> 1L)
    assert(m(Dedup.nearDupComponents(edges)) == comp)
    assert(m(Dedup.nearDupComponents(edges, maxLocalEdges = 0L)) == comp)
    // weighted: a null weight drops the edge on both tiers
    val wedges = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L), java.lang.Long.valueOf(7L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long])
    ).toDF("src", "dst", "w")
    val sp = Map(1L -> 0L, 2L -> 7L)
    assert(m(Graph.shortestPaths(wedges, src, rounds = 3)) == sp)
    assert(m(Graph.shortestPaths(wedges, src, rounds = 3, maxLocalEdges = 0L)) == sp)
    val mst = Graph.boruvkaMst(wedges.toDF("a", "b", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mst == Set((1L, 2L, 7L)))
  }

  test("dagLongestPath: diamond takes the heavier arm, sources at 0, rounds truncate") {
    import graft.operators.Graph
    // diamond 1→2→4 (3+1) vs 1→3→4 (1+10), tail 4→5 (2); isolated edge 6→7
    val edges = Seq((1L, 2L, 3L), (2L, 4L, 1L), (1L, 3L, 1L), (3L, 4L, 10L),
      (4L, 5L, 2L), (6L, 7L, 5L)).toDF("src", "dst", "w")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.dagLongestPath(edges, rounds = 3)) ==
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 11L, 5L -> 13L, 6L -> 0L, 7L -> 5L))
    // under-convergence contract: rounds < depth sees only paths that
    // short; values are monotone in rounds, never wrong-side-high
    assert(m(Graph.dagLongestPath(edges, rounds = 1)) ==
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 10L, 5L -> 2L, 6L -> 0L, 7L -> 5L))
    // maxLocalEdges=0 forces the DISTRIBUTED relax loop (the default
    // hybrid runs this graph on the driver) — identical both rounds
    assert(m(Graph.dagLongestPath(edges, rounds = 3, maxLocalEdges = 0L)) ==
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 11L, 5L -> 13L, 6L -> 0L, 7L -> 5L))
    assert(m(Graph.dagLongestPath(edges, rounds = 1, maxLocalEdges = 0L)) ==
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 10L, 5L -> 2L, 6L -> 0L, 7L -> 5L))
  }

  test("shortestPaths: weighted multi-source min, hop bound bites, unreached absent") {
    import graft.operators.Graph
    // 1 -2-> 2 -2-> 3 -2-> 4; shortcut 1 -7-> 4 (more weight, fewer hops);
    // island 9 -1-> 10; sources {1, 9}
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 2L), (3L, 4L, 2L), (1L, 4L, 7L),
      (9L, 10L, 1L)).toDF("src", "dst", "w")
    val src = Seq(1L, 9L).toDF("id")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.shortestPaths(edges, src, rounds = 3)) ==
      Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 6L, 9L -> 0L, 10L -> 1L))
    // hop bound 1: only direct edges — the costly shortcut IS the answer
    assert(m(Graph.shortestPaths(edges, src, rounds = 1)) ==
      Map(1L -> 0L, 2L -> 2L, 4L -> 7L, 9L -> 0L, 10L -> 1L))
    // hop bound 2: 1-2-3 reached; 4 still best at 7 via the shortcut
    assert(m(Graph.shortestPaths(edges, src, rounds = 2)) ==
      Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 7L, 9L -> 0L, 10L -> 1L))
    // maxLocalEdges=0 forces the DISTRIBUTED loop — the horizon-sensitive
    // hop-1/hop-2 answers must match the driver hybrid exactly
    assert(m(Graph.shortestPaths(edges, src, rounds = 1, maxLocalEdges = 0L)) ==
      Map(1L -> 0L, 2L -> 2L, 4L -> 7L, 9L -> 0L, 10L -> 1L))
    assert(m(Graph.shortestPaths(edges, src, rounds = 2, maxLocalEdges = 0L)) ==
      Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 7L, 9L -> 0L, 10L -> 1L))
  }

  test("localMaxMatching: both-endpoints-agree rule, weight tie to (a,b), multi-round") {
    import graft.operators.Graph
    def run(es: Seq[(Long, Long, Long)], rounds: Int) =
      Graph.localMaxMatching(es.toDF("a", "b", "w"), rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // descending chain: e12 wins round 1, blocks e23; e34 only in round 2
    assert(run(Seq((1L, 2L, 9L), (2L, 3L, 8L), (3L, 4L, 7L)), 3) ==
      Set((1L, 2L, 1L), (3L, 4L, 2L)))
    // weight tie at node 3: (2,3) beats (3,4) by the (a,b) rule
    assert(run(Seq((1L, 2L, 5L), (2L, 3L, 9L), (3L, 4L, 9L)), 2) ==
      Set((2L, 3L, 1L)))
    // star: only the heaviest spoke survives, nothing left after
    assert(run(Seq((1L, 2L, 3L), (1L, 3L, 5L), (1L, 4L, 4L)), 2) ==
      Set((1L, 3L, 1L)))
  }

  test("bigramSurprise: hand-computed smoothed inverse transition probabilities") {
    // docs: [a b a], [b a], [x] -> uni a=3 b=2 x=1; bigrams (a,b)=1 (b,a)=2,
    // B=2; surprise(a,b) = (3+2)*1e6 DIV 2 = 2.5e6;
    // surprise(b,a) = (2+2)*1e6 DIV 3 = 1333333; single-token doc omitted
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "x")).toDF("id", "text")
    val out = Corpus.bigramSurprise(docs, $"id", split($"text", " "))
      .orderBy("id").collect()
    assert(out.length == 2)
    // mean is integer floor division (engine-portable decoration; the
    // exact value is the (surprise_sum, n_bigrams) pair)
    assert(out(0) == Row(1L, 2L, 3833333L, 1916666L))
    assert(out(1) == Row(2L, 1L, 1333333L, 1333333L))
  }

  test("stupidBackoffScore: every backoff level hand-computed on a held-out split") {
    // train: [a b c a b c], [b c d] -> N=9; uni a=2 b=3 c=3 d=1;
    // bi (a,b)=2 (b,c)=3 (c,a)=1 (c,d)=1;
    // tri (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (b,c,d)=1
    val train = Seq((0L, "a b c a b c"), (2L, "b c d")).toDF("id", "text")
    val score = Seq(
      (1L, "a b c"),   // tri hit: 2e6 DIV c(a,b)=2 -> 1000000
      (3L, "a b x"),   // x unseen everywhere -> OOV, 0
      (5L, "b c d d"), // (b,c,d): 1e6 DIV 3 = 333333; (c,d,d): uni d ->
                       // 4e6*1 DIV (25*9) = 17777
      (9L, "d b c"),   // (d,b,c) unseen, (b,c) seen: 2e6*3 DIV (5*3) = 400000
      (11L, "x y")     // < 3 tokens -> omitted
    ).toDF("id", "text")
    val out = Corpus.stupidBackoffScore(train, split($"text", " "),
        score, $"id", split($"text", " "))
      .orderBy("id").collect()
    assert(out.length == 4)
    assert(out(0) == Row(1L, 1L, 1L, 0L, 0L, 0L, 1000000L, 1000000L))
    assert(out(1) == Row(3L, 1L, 0L, 0L, 0L, 1L, 0L, 0L))
    assert(out(2) == Row(5L, 2L, 1L, 0L, 1L, 0L, 351110L, 175555L))
    assert(out(3) == Row(9L, 1L, 0L, 1L, 0L, 0L, 400000L, 400000L))
  }

  test("hllSketch: registers match a reference fold; dup-invariant; merge = max; estimate sane") {
    def refRegisters(vals: Seq[String]): Map[Long, Long] =
      vals.map { s =>
        val h = { // same portable FNV the expression uses
          var acc = -3750763034362895579L
          s.foreach(ch => acc = (acc ^ ch.toInt) * 1099511628211L)
          acc
        }
        val bucket = ((h % 64) + 64) % 64
        val w = h >>> 6
        val rho = if (w == 0L) 59L else java.lang.Long.numberOfTrailingZeros(w) + 1L
        bucket -> rho
      }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val vals = (1 to 300).map(i => s"v$i")
    val df = vals.toDF("s")
    val out = Corpus.hllSketch(df, $"s").orderBy("bucket").collect()
    assert(out.length == 64) // spine: every bucket present even if empty
    val expect = refRegisters(vals)
    out.foreach { r =>
      assert(r.getLong(1) == expect.getOrElse(r.getLong(0), 0L))
    }
    assert(out(0).getLong(3) == 300L) // n_exact
    val est = out(0).getDouble(4)
    // this fixed draw lands at 433.0 (+44%, ~3 sigma of the 1.04/sqrt(64)
    // bound — verified against an independent reference; larger n
    // concentrate: 5000 -> +5.9%); the band just guards magnitude
    assert(est > 300 * 0.5 && est < 300 * 1.5)
    // duplicates leave the sketch untouched
    val dup = Corpus.hllSketch(df.union(df).union(df), $"s")
      .orderBy("bucket").collect()
    assert(dup.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      out.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // mergeability: sketch(A ++ B) = elementwise max of the halves
    val (a, b) = vals.splitAt(150)
    val ra = Corpus.hllSketch(a.toDF("s"), $"s").orderBy("bucket")
      .collect().map(_.getLong(1))
    val rb = Corpus.hllSketch(b.toDF("s"), $"s").orderBy("bucket")
      .collect().map(_.getLong(1))
    val merged = ra.zip(rb).map { case (x, y) => math.max(x, y) }
    assert(merged.toSeq == out.map(_.getLong(1)).toSeq)
  }

  test("hllSketchGrouped + hllMerge: shard merge equals the global sketch") {
    val vals = (1 to 200).map(i => (s"g${i % 3}", s"v$i"))
    val df = vals.toDF("g", "s")
    val grouped = Corpus.hllSketchGrouped(df, $"g", $"s")
    // dense: every (group, bucket) cell present
    assert(grouped.count() == 3 * 64)
    val merged = Corpus.hllMerge(grouped,
        df.agg(countDistinct($"s").alias("n_exact")))
      .orderBy("bucket").collect()
    val global = Corpus.hllSketch(df, $"s").orderBy("bucket").collect()
    assert(merged.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      global.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(merged(0).getLong(2) == global(0).getLong(2)) // s_scaled
    assert(merged(0).getDouble(4) == global(0).getDouble(4)) // estimate bits
  }

  test("hllOverlap: identical sets collapse, exact instruments, union dominates") {
    val a = (1 to 200).map(i => s"w$i").toDF("v")
    val b = (101 to 300).map(i => s"w$i").toDF("v")
    val r = Corpus.hllOverlap(a, b, $"v").collect()(0)
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L && r.getLong(2) == 100L)
    val (estA, estB, estU, estI) =
      (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
    // inclusion-exclusion identity holds exactly on the rounded outputs'
    // unrounded parents; on rounded values it holds to rounding slack
    assert(math.abs((estA + estB - estU) - estI) < 1e-4)
    assert(estU >= estA && estU >= estB) // union registers dominate
    // identical inputs: union sketch == each side, intersection == est_a
    val same = Corpus.hllOverlap(a, a, $"v").collect()(0)
    assert(same.getDouble(3) == same.getDouble(5))
    assert(same.getDouble(3) == same.getDouble(6))
  }

  test("hashedTfIdf: hand-computed integer weights, fnv bucketing, exact collision sums") {
    // corpus: (1, "a b a"), (2, "b c") -> N=2; tf: (1,a)=2 (1,b)=1 (2,b)=1
    // (2,c)=1; df: a=1 b=2 c=1; w = (tf*(N+1)*1e6) DIV (df+1)
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("id", "text")
    val out = Corpus.hashedTfIdf(docs, $"id", split($"text", " "), dim = 64,
        portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    import graft.plans.TextExprs.fnv1a64
    def bucket(t: String) = java.lang.Math.floorMod(fnv1a64(t), 64L)
    val expected = Seq(
      (1L, "a", 2L, 1L), (1L, "b", 1L, 2L), (2L, "b", 1L, 2L), (2L, "c", 1L, 1L))
      .groupBy { case (id, t, _, _) => (id, bucket(t)) }
      .map { case (k, rows) =>
        k -> rows.map { case (_, _, tf, df) => tf * 3L * 1000000L / (df + 1L) }.sum }
    assert(out == expected)
  }

  test("prepareTrainingData: strip -> gate -> dedup -> truncate -> pack composes") {
    val body1 = "the quick brown fox jumps over the lazy dog again today"
    val body2 = "the small red cat sits near the warm fire stone tonight"
    val docs = Seq(
      (1L, body1 + "\n-- footer --"),
      (2L, body2 + "\n-- footer --"),
      (3L, body1 + "\n-- footer --"),   // exact dup of 1 after cleaning
      (4L, ";;;; !!!! @@@@\n-- footer --") // junk -> gated out
    ).toDF("id", "text")
    val out = graft.operators.Pipeline.prepareTrainingData(
        docs, $"id", $"text",
        minDocsBoiler = 3L, minQuality = 0.66, // footer df=4; dup body df=2 stays
        maxTokens = 8, ctxLen = 10L, bucketSize = 4L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      (1L, "en", 1.0, 11L, true, 8L, 0L, 0L),
      (2L, "en", 1.0, 11L, true, 8L, 0L, 8L)))
  }

  test("packSequences: bucketed prefix sum equals the naive running total") {
    val counts = Seq.tabulate(40)(i => (i.toLong, (i % 7 + 1) * 3L))
    val df = counts.toDF("id", "n")
    val out = Corpus.packSequences(df, $"id", $"n", ctxLen = 16, bucketSize = 8)
      .orderBy("id").collect()
    var cum = 0L
    counts.foreach { case (id, n) =>
      val r = out(id.toInt)
      assert(r.getLong(2) == cum / 16, s"seq_id at $id")
      assert(r.getLong(3) == cum % 16, s"seq_offset at $id")
      cum += n
    }
  }

  test("heavyHitters: (count desc, term asc) order makes the k-cut deterministic") {
    val df = Seq(Seq("b", "b", "a", "a", "c")).toDF("ts")
    val out = Corpus.heavyHitters(df, $"ts", 2).collect()
    assert(out.toSeq == Seq(Row("a", 2L), Row("b", 2L)))
  }

  test("gapFill + forwardFill: missing buckets appear, levels carry forward") {
    val step = 60L * 1000000
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), "up"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:03:10"), "down")
    ).toDF("user_id", "ts", "state")
    val filled = EventStreams.gapFill(ev, $"user_id", $"ts", step,
      Seq(count(lit(1)).as("n"), max($"state").as("st")))
    assert(filled.count() == 4) // buckets 0..3 of that minute grid
    val ff = EventStreams.forwardFill(filled, $"k", $"bucket", Seq("st"))
      .orderBy("bucket").collect()
    assert(ff.map(_.getAs[String]("st")).toSeq == Seq("up", "up", "up", "down"))
    assert(ff.map(r => Option(r.getAs[Any]("n")).map(_.toString.toLong).getOrElse(0L)).toSeq
      == Seq(1L, 0L, 0L, 1L))
  }

  test("rangeJoin: containment matches exactly once even when intervals span buckets") {
    val ev = Seq(
      (10L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00")),
      (11L, 1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00")) // outside
    ).toDF("event_id", "user_id", "ts")
    val iv = Seq(
      (1L, 100L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 02:00:00")) // spans many 30-min buckets
    ).toDF("user_id", "iv_id", "s", "e")
    val out = ev.rangeJoin(iv, Seq("user_id"), Seq("user_id"),
        "ts", "s", "e", bucketWidth = 30L * 60 * 1000000)
      .selectCols(Seq(col("l.event_id").as("event_id"), col("r.iv_id").as("iv_id")))
      .collect()
    assert(out.toSeq == Seq(Row(10L, 100L))) // exactly one match, no dup, no leak
  }

  test("tfIdfTopTerms: exact scores for a hand-computed fixture") {
    // 2 docs; term u only in doc 1 (tf 2), term v in both (tf 1 each)
    // linear idf: u -> (2+1)/(1+1) = 1.5; v -> (2+1)/(2+1) = 1.0
    val docs = Seq((1L, "u u v"), (2L, "v w")).toDF("id", "text")
    val out = Corpus.tfIdfTopTerms(docs, $"id", graft.functions.TextFns.tokens($"text"), k = 2)
      .orderBy("id", "rank").collect()
    assert(out(0) == Row(1L, "u", 2L, 1L, 3.0, 1L))  // 2 * 1.5
    assert(out(1) == Row(1L, "v", 1L, 2L, 1.0, 2L))
    assert(out(2).getString(1) == "w" && out(2).getDouble(4) == 1.5)
  }

  test("bigramLift: hand-computed lift on a tiny corpus; minCount prunes") {
    // "x y" occurs 2x and x,y occur ONLY together => maximal lift;
    // "a a" occurs 2x but a is everywhere => low lift
    val docs = Seq("x y a a x y", "a a b a").toDF("text")
    val out = Corpus.bigramLift(docs, graft.functions.TextFns.tokens($"text"),
        minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // unigrams: x=2 y=2 a=5 b=1, Nu=10; bigrams: "x y","y a","a a","a x","a a","a b","b a" => Nb=8
    // wait: doc1 bigrams: xy, ya, aa, ax, xy (5); doc2: aa, ab, ba (3); Nb=8
    // nab("x y")=2: lift = 2*10*10/(2*2*8) = 6.25
    // nab("a a")=2: lift = 2*10*10/(5*5*8) = 1.0
    val m = out.map(t => (t._1, t._2) -> t).toMap
    assert(m(("x", "y"))._4 == 6.25 && m(("x", "y"))._5 == 1L)
    assert(m(("a", "a"))._4 == 1.0)
    assert(out.length == 2) // every other bigram occurs once => pruned by minCount
  }

  test("quotaSample honors per-group quotas and the deterministic tie-break") {
    val docs = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 5.0),
      ("b", 4L, 9.0), ("b", 5L, 8.0)
    ).toDF("src", "id", "sc")
    val out = Corpus.quotaSample(docs, $"src", $"sc", $"id",
        Map("a" -> 2L), defaultQuota = 1L)
      .orderBy("id").collect()
    // a: ties at 10.0 -> ids 1,2 kept (id asc tie-break); b: only id 4
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))
  }

  test("topKPerGroupAgg equals the window formulation (heap = sort)") {
    val docs = Seq.tabulate(60)(i => (s"g${i % 3}", i.toLong, (i * 37 % 50).toDouble))
      .toDF("g", "id", "sc")
    val agg = Corpus.topKPerGroupAgg(docs, $"g", $"id", $"sc", k = 5)
      .orderBy("group", "rank").collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"sc".desc, $"id".asc)
    val win = docs.withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"g".as("group"), $"id", $"sc".as("score"), $"rank".cast("long"))
      .orderBy("group", "rank").collect()
    assert(agg.toSeq == win.toSeq)
  }

  test("intervalJoin: overlap pairs exactly once across bucket spans; disjoint drop") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val a = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 03:00:00")))
      .toDF("a_id", "s", "e")
    val b = Seq(
      (10L, ts("2024-01-01 02:00:00"), ts("2024-01-01 05:00:00")), // overlaps [2,3]
      (11L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")), // touches at 3 -> overlap
      (12L, ts("2024-01-01 04:00:00"), ts("2024-01-01 06:00:00"))  // disjoint
    ).toDF("b_id", "s", "e")
    val out = a.intervalJoin(b, Seq(), Seq(), "s", "e", "s", "e",
        bucketWidth = 30L * 60 * 1000000)
      .selectCols(Seq(col("l.a_id").as("a_id"), col("r.b_id").as("b_id")))
      .orderBy("b_id").collect()
    assert(out.toSeq == Seq(Row(1L, 10L), Row(1L, 11L)))
  }

  test("approx_percentile stays within sketch error of the exact percentile") {
    val vals = Seq.tabulate(5000)(i => (i % 7).toString -> (i % 997).toLong)
      .toDF("g", "v")
    val joined = vals.groupBy("g")
      .agg(expr("approx_percentile(v, 0.5, 10000)").as("pa"),
        expr("percentile(v, 0.5)").as("pe"))
      .collect()
    joined.foreach { r =>
      val pa = r.getLong(1).toDouble
      val pe = r.getDouble(2)
      assert(math.abs(pa - pe) <= 2.0, s"group ${r.getString(0)}: $pa vs $pe")
    }
  }

  test("mixtureResample exact mode: per-domain output counts hit w*N div 1000 exactly") {
    // 60 docs: 40 'a', 15 'b', 5 'c'; weights a=500 b=250 c=250
    val docs = ((1L to 40L).map(i => (i, "a")) ++ (41L to 55L).map(i => (i, "b")) ++
      (56L to 60L).map(i => (i, "c"))).toDF("id", "dom")
    val out = Corpus.mixtureResample(docs, $"id", $"dom",
      Map("a" -> 500, "b" -> 250, "c" -> 250), exact = true)
    val byDom = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // tgt: a = 500*60 div 1000 = 30 (downsample), b = 15 (exact 1x),
    //      c = 15 (3x upsample: every doc gets epochs 0..2)
    assert(byDom == Map("a" -> 30L, "b" -> 15L, "c" -> 15L))
    val cEpochs = out.filter($"domain" === "c").groupBy("id").count().collect()
    assert(cEpochs.forall(_.getLong(1) == 3L))
  }

  test("mixtureResample threshold mode: deterministic, near-target, unmapped domain dropped") {
    val docs = ((1L to 40L).map(i => (i, "a")) ++ (41L to 60L).map(i => (i, "x")))
      .toDF("id", "dom")
    val run = () => Corpus.mixtureResample(docs, $"id", $"dom", Map("a" -> 500))
      .orderBy("id", "epoch").collect().toSeq
    val out = run()
    assert(out == run()) // rerun-identical, unlike sample()
    assert(out.forall(_.getString(1) == "a")) // 'x' has no weight -> dropped
    // tgt = 500*60 div 1000 = 30 of 40 'a' docs; threshold acceptance is
    // binomial around rem=30 — bound loosely, determinism is the contract
    assert(out.size >= 20 && out.size <= 40)
  }

  test("noveltyCurve: first batch all-new, repeats don't count, units distinct per batch") {
    val docs = Seq(
      (0L, Seq("a", "b")), (1L, Seq("b", "c")),       // batch 0: units a,b,c — all new
      (10L, Seq("b", "c", "d")),                      // batch 1: b,c seen; d new
      (20L, Seq("a", "a", "e")), (21L, Seq("e"))      // batch 2: a seen; e new (distinct once)
    ).toDF("id", "units")
    val out = Corpus.noveltyCurve(docs, ($"id" / 10).cast("long"), $"units")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) == (3L, 3L, 1.0))
    assert(out(1L) == (3L, 1L, 1.0 / 3.0))
    assert(out(2L) == (2L, 1L, 0.5))
  }

  test("oovRate: vocab top-k by (count, term), multiplicity counted, vocab docs at 0") {
    val docs = Seq(
      (0L, Seq("a", "a", "a", "b", "b")),   // all in top-2 vocab
      (1L, Seq("a", "rare", "rare", "b")),  // 2 OOV hits of one term
      (2L, Seq("zz", "yy")),                // all OOV
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val out = Corpus.oovRate(docs, $"id", $"toks", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // counts: a=4, b=3, rare=2, zz=1, yy=1 => vocab {a, b}
    assert(out(0L) == (5L, 0L, 0.0))
    assert(out(1L) == (4L, 2L, 0.5))
    assert(out(2L) == (2L, 2L, 1.0))
    assert(out(3L) == (0L, 0L, 0.0))   // empty doc: rate 0, not NaN
  }

  test("slidingChunks: full coverage, fixed stride, last chunk ends at doc end") {
    val toks = (1 to 13).map(i => s"w$i")
    val docs = Seq((0L, toks), (1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("id", "toks")
    val out = Corpus.slidingChunks(docs, $"id", $"toks", chunkTokens = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // doc 0: n=13 => ceil(5/4)+1 = 3 starts (0, 4, 8)
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(c => (c._3, c._4)).toSeq == Seq((0L, 8L), (4L, 8L), (8L, 5L)))
    assert(d0(2)._5 == (9 to 13).map(i => s"w$i").mkString(" "))   // ends at doc end
    assert(d0(0)._5 == (1 to 8).map(i => s"w$i").mkString(" "))
    // short doc: one whole-doc chunk; empty doc: no chunks
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 2L, "a b")))
    assert(!out.exists(_._1 == 2L))
    // every token index covered by at least one chunk
    val covered = d0.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 13L).toSet)
  }

  test("gopherQualityFlags: each rule trips independently; pass is the conjunction") {
    val good = (Seq("the", "and", "of") ++ (1 to 30).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      (0L, good),                                   // all rules pass
      (1L, "the and " + (1 to 5).map(i => s"w$i").mkString(" ")),  // too short
      (2L, ("the and " + Seq.fill(31)("x").mkString(" "))),        // mwl < 4, top share high
      (3L, (Seq("the", "and") ++ (1 to 30).map(_ => "sameword")).mkString(" "))  // repetition
    ).toDF("doc_id", "text")
    val out = Corpus.gopherQualityFlags(docs, $"doc_id",
        graft.functions.TextFns.tokens($"text"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(out(0L) == (true, true, true, true, true))
    assert(out(1L)._1 == false && out(1L)._5 == false)          // wc trips
    assert(out(2L)._2 == false && out(2L)._5 == false)          // mwl trips
    assert(out(3L)._4 == false && out(3L)._5 == false)          // repetition trips
    assert(out(3L)._3 == true)                                  // stopwords still ok
  }

  test("difficultyBins: quartile bins, ties land low, bin counts balanced on distinct scores") {
    // scores 1..100 => thresholds 25.75 / 50.5 / 75.25, bins of 25/25/25/25
    val docs = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "score")
    val out = Corpus.difficultyBins(docs, $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.groupBy(_._3).view.mapValues(_.size).toMap ==
      Map(0L -> 25, 1L -> 25, 2L -> 25, 3L -> 25))
    // monotone: higher score never gets a lower bin
    val sorted = out.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    // a score exactly AT a threshold stays in the lower bin
    val cut = Corpus.difficultyBins(
      (1L to 4L).map(i => (i, i.toDouble)).toDF("id", "score"),
      $"id", $"score", probs = Seq(0.5))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // p50 of 1,2,3,4 = 2.5 => 1,2 -> bin 0; 3,4 -> bin 1
    assert(cut == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("repeatedSpans flags shared windows at the right offsets, skips short and unique docs") {
    val passage = "x" * 30 + "SHARED-LICENSE-TEXT " * 5  // > 64 chars of shared tail
    val docs = Seq(
      (0L, "unique prefix zero " * 4 + passage),
      (1L, "another lead-in one " * 4 + passage),
      (2L, "entirely different content with no repeats " * 4),
      (3L, "tiny")   // < winLen => no windows at all
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(docs, $"doc_id", $"text", winLen = 32, step = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(2L) && !byDoc.contains(3L))
    assert(byDoc.contains(0L) && byDoc.contains(1L))
    assert(out.forall(_._3 == 2L))
    // every flagged window's text really is shared: recompute in Scala
    val texts = Map(0L -> ("unique prefix zero " * 4 + passage),
      1L -> ("another lead-in one " * 4 + passage))
    val windows = texts.map { case (id, t) =>
      id -> (0 to (t.length - 32) / 8).map(k => t.substring(k * 8, k * 8 + 32)).toSet
    }
    out.foreach { case (id, pos, _) =>
      val w = texts(id).substring(pos.toInt, pos.toInt + 32)
      assert(windows.filter(_._1 != id).values.exists(_.contains(w)), s"($id,$pos)")
    }
    // strided positions only
    assert(out.forall(_._2 % 8 == 0))
  }

  test("repeatedSpans: same-doc repetition alone does not flag (minDocs is cross-doc)") {
    val docs = Seq(
      (0L, "repeat me twice ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 repeat me twice ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"),
      (1L, "no overlap with the other document at all, plain filler text here")
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(docs, $"doc_id", $"text", winLen = 32, step = 32)
    assert(out.count() == 0)
  }

  test("qualityEnsembleGate: reason bits name the failed rules; score clamps the DSIR term") {
    // doc 1: healthy English-ish (20+ words, stopwords, varied) on-target;
    // doc 2: word-count + stopword failures (reason bits 1|4 = 5);
    // doc 3: structurally fine but OFF-target vocabulary (clamped malus)
    val good = "the quick brown foxes jumped over the lazy dogs and then " +
      "walked that winding path of hills toward a quiet village in the valley"
    val off = "zzaaa zzbbb zzccc zzddd zzeee zzfff zzggg zzhhh zziii zzjjj " +
      "zzkkk zzlll zzmmm zznnn zzooo zzppp zzqqq zzrrr zzsss zzttt " +
      "the and of to a in is that"
    val docs = Seq(
      (1L, good, true), (2L, "tiny doc", true), (3L, off, false)
    ).toDF("doc_id", "text", "is_en")
    val out = graft.operators.Pipeline.qualityEnsembleGate(docs, $"doc_id",
        graft.functions.TextFns.tokens($"text"), $"is_en")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(5)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 0L && byId(1L)._4, "healthy on-target doc keeps")
    assert((byId(2L)._2 & 1L) == 1L && (byId(2L)._2 & 4L) == 4L && !byId(2L)._4,
      "short stopword-free doc fails wc and stopword bits")
    // doc 3 passes structure (mask 0) but its off-target malus — bounded
    // by the -250k clamp — drags the score under the keep threshold:
    // dropped for domain affinity alone, auditable as "no rule failed"
    assert(byId(3L)._2 == 0L && !byId(3L)._4)
    assert(byId(3L)._3 < 1000000L && byId(3L)._3 >= 750000L)
  }

  test("lengthBatching: similar lengths batch together, waste is the padding delta") {
    val docs = Seq((1L, 20L), (2L, 20L), (3L, 18L), (4L, 5L), (5L, 4L))
      .toDF("id", "n")
    val out = Corpus.lengthBatching(docs, $"id", $"n", batchSize = 2, bucketWidth = 16)
      .orderBy("bucket", "batch_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      // bucket 0: [5, 4] -> max 5, sum 9, waste 1, 100000 ppm
      (0L, 0L, 2L, 5L, 9L, 1L, 100000L),
      // bucket 1: [20, 20] zero waste; [18] alone zero waste
      (1L, 0L, 2L, 20L, 40L, 0L, 0L),
      (1L, 1L, 1L, 18L, 18L, 0L, 0L)))
  }

  test("cmsHeavyHitters: never undercounts; exact at collision-free width; bounded matrix") {
    val docs = Seq((1L, "a a a a b b b c c d")).toDF("doc_id", "text")
    // width 2, depth 1: every token collides into 2 cells — estimates must
    // still be >= exact for every token (CMS's one-sided guarantee)
    val tiny = Corpus.cmsHeavyHitters(docs, $"text", width = 2, depth = 1, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(tiny.length == 4)
    assert(tiny.forall { case (_, exact, cms, over) => cms >= exact && over == cms - exact })
    // wide sketch: 4 tokens in 65536 cells -> no collisions, cms == exact
    val wide = Corpus.cmsHeavyHitters(docs, $"text", width = 65536, depth = 4, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(wide.toSet == Set(("a", 4L, 0L), ("b", 3L, 0L), ("c", 2L, 0L), ("d", 1L, 0L)))
  }

  test("dsirWeights: disjoint-vocab target separates cleanly; shared tokens score parity-ish") {
    // target vocab {ta tb}, raw-only vocab {ra rb}, one mixed doc:
    // target docs select, raw-only docs don't, the mixed doc sits between
    val docs = Seq(
      (1L, "ta tb ta tb", true), (2L, "tb ta tb ta", true),
      (3L, "ra rb ra rb", false), (4L, "rb ra rb ra", false),
      (5L, "ta tb ra rb", false)
    ).toDF("doc_id", "text", "is_en")
    val out = Corpus.dsirWeights(docs, $"doc_id",
      graft.functions.TextFns.tokens($"text"), $"is_en")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._3 && byId(2L)._3, "pure-target docs must select")
    assert(!byId(3L)._3 && !byId(4L)._3, "raw-only docs must not select")
    // the mixed doc scores strictly between the two pure groups
    assert(byId(5L)._2 > byId(3L)._2 && byId(5L)._2 < byId(1L)._2)
    // target-only tokens carry a ratio >= parity even though target <= raw
    assert(byId(1L)._2 > 1000000L)
  }

  test("bpeMerges: frequency argmax, early stop when pairs run out") {
    // words: ab x2, ac x1 -> pair (a,b) count 2 beats (a,c) count 1;
    // after both merges every word is one symbol -> stops at 2 of 5 rounds
    val docs = Seq((1L, "ab ab ac")).toDF("doc_id", "text")
    val out = Corpus.bpeMerges(docs, graft.functions.TextFns.tokens($"text"), rounds = 5)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "b", 2L), (2L, "a", "c", 1L)))
  }

  test("bpeMerges: greedy non-overlapping chain — 'a a a a' merges to 'aa aa', not 'aa a a'") {
    // the l == r chain is the case a naive replace-all gets wrong (shared
    // delimiter): word aaaa x3 has 3 overlapping (a,a) pairs -> count 9;
    // greedy rewrite leaves [aa, aa], so round 2 must merge (aa, aa) — a
    // buggy rewrite leaving [aa, a, a] would pick (a, a) again by the
    // lexicographic tie-break
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val out = Corpus.bpeMerges(docs, graft.functions.TextFns.tokens($"text"), rounds = 3)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "a", 9L), (2L, "aa", "aa", 3L)))
  }

  test("bpeMerges: merged symbols compound across rounds (multi-char merge uses round-1 output)") {
    // 'er' dominates round 1; round 2's best pair is then (h, er) — the
    // merged symbol participating as a unit
    val docs = Seq((1L, "her her her per per xq")).toDF("doc_id", "text")
    val out = Corpus.bpeMerges(docs, graft.functions.TextFns.tokens($"text"), rounds = 2)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1L, "e", "r", 5L)))
    assert(out(1) == ((2L, "h", "er", 3L)))
  }

  test("bpeSegment: rank-ordered merges chain (aaaa -> aa aa -> aaaa); unknown words pass through") {
    val docs = Seq((1L, "aaaa aab zz")).toDF("doc_id", "text")
    val toks = graft.functions.TextFns.tokens($"text")
    val one = Corpus.bpeSegment(docs, toks, Seq(("a", "a")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(one("aaaa") == Seq("aa", "aa"))
    assert(one("aab") == Seq("aa", "b"))
    assert(one("zz") == Seq("z", "z")) // no merge for z: stays at chars
    val two = Corpus.bpeSegment(docs, toks, Seq(("a", "a"), ("aa", "aa")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(two("aaaa") == Seq("aaaa"))
  }

  test("bpeSegment with trained merges reproduces training's final symbol state") {
    val docs = Seq((1L, "her her her per per xq her per")).toDF("doc_id", "text")
    val toks = graft.functions.TextFns.tokens($"text")
    val merges = Corpus.bpeMerges(docs, toks, rounds = 3)
      .orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Corpus.bpeSegment(docs, toks, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    // 3 rounds on this vocab: er, her, per all become single symbols
    assert(seg("her").length == 1 && seg("per").length == 1)
    assert(seg("xq") == Seq("x", "q"))
  }

  test("assignToCentroids: nearest wins, distance ties break to the lower cid") {
    val corpus = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 0.0f)), (3L, Seq(5.0f, 0.0f)))
      .toDF("id", "v")
    val cents = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(10.0f, 0.0f))).toDF("cid", "cv")
    val out = Similarity.assignToCentroids(corpus, cents).orderBy("id").collect()
    assert(out(0) == Row(1L, 0L, 0.0))
    assert(out(1) == Row(2L, 1L, 0.0))
    assert(out(2) == Row(3L, 0L, 25.0)) // exact tie at 25.0 -> cid 0
  }

  test("temperatureWeights: sqrt-proportional shares, floor-exact for non-squares") {
    // counts 1, 4, 9 -> sqrt_milli 1000, 2000, 3000 -> shares 1/6, 2/6, 3/6
    val df = (Seq.fill(1)("a") ++ Seq.fill(4)("b") ++ Seq.fill(9)("c")).toDF("g")
    val out = Corpus.temperatureWeights(df, $"g").orderBy("group").collect()
    assert(out.toSeq == Seq(
      Row("a", 1L, 1000L, 166666L),
      Row("b", 4L, 2000L, 333333L),
      Row("c", 9L, 3000L, 500000L)))
    // non-square count: floor(1000 * sqrt(2)) = 1414, not rounded to 1415
    val two = Corpus.temperatureWeights(Seq("x", "x").toDF("g"), $"g").collect().head
    assert(two == Row("x", 2L, 1414L, 1000000L))
  }

  test("skipgramCounts: windowed pairs, canonical order, 1/d ppm weights, minCount prune") {
    val df = Seq((1L, Seq("a", "b", "a", "c"))).toDF("id", "tk")
    val all = Corpus.skipgramCounts(df, $"id", $"tk", window = 2)
      .orderBy("w_a", "w_b").collect()
    // pairs: (a,b)@1 twice, (a,a)@2, (b,c)@2, (a,c)@1
    assert(all.toSeq == Seq(
      Row("a", "a", 1L, 500000L),
      Row("a", "b", 2L, 2000000L),
      Row("a", "c", 1L, 1000000L),
      Row("b", "c", 1L, 500000L)))
    // minCount keeps only the repeated pair
    val pruned = Corpus.skipgramCounts(df, $"id", $"tk", window = 2, minCount = 2L)
      .collect()
    assert(pruned.toSeq == Seq(Row("a", "b", 2L, 2000000L)))
    // window 1 = adjacent only: no (a,a) or (b,c)
    val w1 = Corpus.skipgramCounts(df, $"id", $"tk", window = 1)
      .orderBy("w_a", "w_b").collect()
    assert(w1.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", "b", 2L), ("a", "c", 1L)))
  }

  test("crossSourceOverlap: shared distinct contents only, asymmetric ppm, dup rows collapse") {
    val df = Seq(("s1", "x"), ("s1", "y"), ("s2", "x"), ("s2", "x"), ("s3", "z"))
      .toDF("src", "t")
    val out = Corpus.crossSourceOverlap(df, $"src", $"t").collect()
    // only (s1, s2) share content; s2's duplicate "x" counts once
    assert(out.toSeq == Seq(Row("s1", "s2", 1L, 2L, 1L, 500000L, 1000000L)))
  }

  test("piiScan: per-pattern counts on raw text, sequential redaction, clean text untouched") {
    val df = Seq(
      (1L, "mail bob@x.com or 10.0.0.1 ref 123456789x"),
      (2L, "nothing to see"),
      // digits inside the email count for longnum on the RAW text, but the
      // email replacement wins the sequential redaction
      (3L, "9876543210@example.org")).toDF("id", "t")
    val out = Corpus.piiScan(df, $"id", $"t").orderBy("id").collect()
    assert(out(0) == Row(1L, 1L, 1L, 1L, "mail <EMAIL> or <IP> ref <NUM>x"))
    assert(out(1) == Row(2L, 0L, 0L, 0L, "nothing to see"))
    assert(out(2) == Row(3L, 1L, 0L, 1L, "<EMAIL>"))
  }
  test("groupHoldout: group-coherent, deterministic, FNV low-bit rule, boundary fractions") {
    // 50 rows in 10 groups of 5: every group's rows must share one split
    val df = spark.range(0, 50).select($"id", ($"id" % 10).as("grp"))
    val out = Corpus.groupHoldout(df, $"id", $"grp", 512)
    val perGroup = out.join(df, out("id") === df("id"))
      .groupBy($"grp").agg(countDistinct($"split").as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L), "a group straddled the split")
    // the rule is exactly fnv1a64(key-string) low 10 bits < threshold
    val got = out.orderBy("id").collect().map(_.getString(1))
    val want = (0 until 50).map { i =>
      val h = graft.plans.TextExprs.fnv1a64((i % 10).toString)
      val low = ((h % 1024) + 1024) % 1024
      if (low < 512) "val" else "train"
    }
    assert(got.toSeq == want, "split disagrees with the FNV low-bit rule")
    // both splits non-empty at 512/1024 on 10 groups (sanity, not chance:
    // deterministic hash, fixed keys)
    assert(got.distinct.sorted.toSeq == Seq("train", "val"))
    // boundary fractions: 0 => all train, 1024 => all val
    assert(Corpus.groupHoldout(df, $"id", $"grp", 0)
      .filter($"split" === "val").count() == 0L)
    assert(Corpus.groupHoldout(df, $"id", $"grp", 1024)
      .filter($"split" === "train").count() == 0L)
  }

  test("greedyMaxCoverage: greedy beats biggest-doc-first, ties to smaller id, zero-gain stop") {
    import graft.operators.Corpus
    // doc 1 has 4 shingles; docs 2+3 have 3 each but DISJOINT from each
    // other and from only part of doc 1: greedy picks 1 first, then the
    // doc with most uncovered. "a b c d e f" -> shingles {a b c, b c d,
    // c d e, d e f}
    val docs = Seq(
      (1L, "a b c d e f"),          // 4 shingles
      (2L, "a b c d"),              // {a b c, b c d} subset of doc 1 -> gain 0 later
      (3L, "x y z w"),              // {x y z, y z w} disjoint
      (4L, "p q r"),                // {p q r}
      (5L, "p q r")                 // duplicate of 4 -> tie, smaller id wins
    ).toDF("id", "txt")
    val got = Corpus.greedyMaxCoverage(docs, $"id", $"txt", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // rounds: 1 (gain 4), 3 (gain 2), 4 (gain 1, tie 4<5), then all gains 0 -> stop
    assert(got.toSeq == Seq((1L, 1L, 4L, 4L), (2L, 3L, 2L, 6L), (3L, 4L, 1L, 7L)))
  }
  test("huffmanBudget: hand merge trace equals code-length optimum, width ladder") {
    import spark.implicits._
    // counts d:4 c:2 a:1 b:1 -> merges 1+1=2, 2+2=4, 4+4=8: cost 14
    // = optimal code lengths (d:1, c:2, a:3, b:3) weighted: 4+4+3+3
    val docs = Seq((1L, "d d d d c c a b")).toDF("doc_id", "text")
    val r = graft.operators.Corpus.huffmanBudget(
      docs, graft.functions.TextFns.tokens(col("text")), k = 32).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 8L, 16L, 14L))
    // uniform weights hit the fixed-width bound exactly: 4 symbols x2 bits
    val uni = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val u = graft.operators.Corpus.huffmanBudget(
      uni, graft.functions.TextFns.tokens(col("text")), k = 4).collect().head
    assert((u.getLong(2), u.getLong(3)) == (8L, 8L), "uniform = no entropy savings")
  }
}
