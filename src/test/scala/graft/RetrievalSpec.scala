package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, Similarity}
import graft.functions.TextFns

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark spark spark runs fast"),
    (1L, "spark joins and windows"),
    (2L, "ducks swim in ponds"),
    (3L, "spark spark joins joins joins windows windows hash"),
    (4L, "the hash join shuffles rows"),
    (5L, "completely unrelated words here today")
  ).toDF("doc_id", "text")

  /** Plain-Scala BM25 with the same rational (ln-free) idf. */
  private def bm25Ref(query: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Double] = {
    val toks = Seq(
      0L -> Seq("spark", "spark", "spark", "runs", "fast"),
      1L -> Seq("spark", "joins", "and", "windows"),
      2L -> Seq("ducks", "swim", "in", "ponds"),
      3L -> Seq("spark", "spark", "joins", "joins", "joins", "windows", "windows", "hash"),
      4L -> Seq("the", "hash", "join", "shuffles", "rows"),
      5L -> Seq("completely", "unrelated", "words", "here", "today"))
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val df = query.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.map { case (id, ts) =>
      val score = query.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
        (idf * (tf * (k1 + 1.0))) /
          (tf + k1 * ((1.0 - b) + b * (ts.size.toDouble / avgdl)))
      }.sum
      id -> score
    }.toMap
  }

  test("bm25Score matches the plain-Scala reference on every scoring doc") {
    val query = Seq("spark", "hash")
    val got = Retrieval.bm25Score(docs, col("doc_id"), TextFns.tokens(col("text")), query)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = bm25Ref(query).filter(_._2 > 0)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) => assert(math.abs(s - want(id)) < 1e-12, s"doc $id") }
  }

  test("bm25TopK ranks by (score desc, id asc) and respects k") {
    val query = Seq("spark", "hash")
    val got = Retrieval.bm25TopK(docs, col("doc_id"), TextFns.tokens(col("text")), query, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = bm25Ref(query).filter(_._2 > 0).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(3)
      .zipWithIndex.map { case ((id, _), i) => ((i + 1).toLong, id) }
    assert(got.toSeq == want)
  }

  test("bm25: term frequency saturates (k1 bound) and length normalization demotes long docs") {
    val scores = bm25Ref(Seq("spark"))
    // doc 0 has tf=3 of 5 tokens; doc 3 has tf=2 of 8 tokens — higher
    // density wins even though idf is shared
    assert(scores(0L) > scores(3L))
    // saturation: tripling tf must not triple the score (k1=1.2 caps at
    // (k1+1)x the tf=1 contribution for same-length docs)
    val one = bm25Ref(Seq("joins"))(1L)   // tf=1, dl=4
    assert(scores(0L) < 3 * one * 10)     // loose structural bound, no NaN/blowup
    assert(scores.values.forall(s => !s.isNaN && s >= 0))
  }

  test("passageTopK: best chunk of the matching doc wins; id packing round-trips") {
    val needle = Seq.fill(6)("needle").mkString(" ")
    val docs2 = Seq(
      (7L, ("padding words here " * 10) + needle),   // match in a LATE chunk
      (8L, "nothing relevant in this one at all " * 5)
    ).toDF("doc_id", "text")
    val out = Retrieval.passageTopK(docs2, col("doc_id"),
        TextFns.tokens(col("text")), Seq("needle"), k = 3,
        chunkTokens = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.forall(_._2 == 7L))     // only doc 7 scores
    // the top passage is one actually containing the needle tokens
    val toks = ("padding words here " * 10 + needle).trim.split("\\s+")
    val (_, _, topChunk) = out.head
    val start = (topChunk * 4).toInt
    assert(toks.slice(start, start + 8).contains("needle"))
  }

  test("rrfFuse combines ranks, handles one-sided docs, orders by fused score") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((12L, 1L), (10L, 2L), (13L, 3L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(a, b, c = 60, k = 10).collect()
      .map(r => (r.getLong(1), r.getDouble(4))).toMap
    def c(r: Long) = 1.0 / (60.0 + r)
    assert(math.abs(got(10L) - (c(1) + c(2))) < 1e-15)
    assert(math.abs(got(12L) - (c(3) + c(1))) < 1e-15)
    assert(math.abs(got(11L) - c(2)) < 1e-15)   // absent from b => one term
    assert(math.abs(got(13L) - c(3)) < 1e-15)
    // fused order: 10 (1st+2nd) beats 12 (3rd+1st) beats 11/13
    val ranked = Retrieval.rrfFuse(a, b, c = 60, k = 10).collect().map(_.getLong(1)).toSeq
    assert(ranked.take(2) == Seq(10L, 12L))
  }

  test("rrf ties broken by id; k truncates") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (1L, 2L)).toDF("id", "rank")   // symmetric => tie
    val got = Retrieval.rrfFuse(a, b, k = 1).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L)
  }

  private def vec(seed: Int): Seq[Float] =
    Array.tabulate(8)(i => math.sin(seed * 31 + i).toFloat).toSeq

  test("semanticDedup drops within-cell near-dups, keeps cross-cell ones") {
    // 2 far-apart centroids; plant a near-identical pair in cell 0 and an
    // identical-direction pair split across cells (scaled copies assign to
    // the same cell by l2 only if close — build explicitly)
    val c0 = Seq.fill(8)(1.0f); val c1 = Seq.fill(8)(-1.0f)
    val mk = (base: Seq[Float], eps: Float) => base.map(x => x + eps)
    val corpus = Seq(
      (0L, mk(c0, 0.01f)), (1L, mk(c0, 0.02f)),   // same cell, cosine ~1 => 1 dropped
      (2L, mk(c1, 0.01f)), (3L, mk(c1, 0.02f)),   // same cell, cosine ~1 => 3 dropped
      (4L, Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f))  // alone near neither
    ).toDF("id", "v")
    val cents = Seq((0L, c0), (1L, c1)).toDF("cid", "cv")
    val got = Dedup.semanticDedup(corpus, col("id"), col("v"), cents, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(0L) == (0L, true))
    assert(got(1L)._2 == false)
    assert(got(2L) == (1L, true))
    assert(got(3L)._2 == false)
    assert(got(4L)._2 == true)
  }

  test("semanticDedup: dup_of is the smallest dominating id; maxCell guard fires") {
    val base = Seq.fill(8)(1.0f)
    val corpus = (0L until 6L).map(i => (i, base.map(x => x + i * 0.001f))).toDF("id", "v")
    val cents = Seq((0L, base)).toDF("cid", "cv")
    val got = Dedup.semanticDedup(corpus, col("id"), col("v"), cents, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.count(_._2) == 1)               // only id 0 survives
    assert(got.filter(!_._2).forall(_._3 == 0L))  // all dominated by 0
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(corpus, col("id"), col("v"), cents, threshold = 0.99,
        maxCell = 2L)
    }
    assert(e.getMessage.contains("maxCell"))
  }

  test("semanticDedup plan: assignment broadcasts centroids, no cartesian on the corpus") {
    val base = Seq.fill(8)(1.0f)
    val corpus = (0L until 6L).map(i => (i, base.map(x => x + i * 0.001f))).toDF("id", "v")
    val cents = Seq((0L, base), (1L, base.map(-_))).toDF("cid", "cv")
    val plan = Dedup.semanticDedup(corpus, col("id"), col("v"), cents, threshold = 0.99)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"))
    // the pairwise stage must be an equi-join on cid, not a nested loop
    // over the whole corpus
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
  }

  test("mmrSelect: greedy diversity — high-rel near-dup deferred behind a diverse lower-rel pick") {
    val cand = Seq(
      (1L, 10L, 900000L), // A: best rel
      (1L, 20L, 880000L), // B: near-dup of A (sim 900k)
      (1L, 30L, 870000L), // C: mildly similar to A (100k), near-dup of B
      (1L, 40L, 100000L), // D: unrelated
      (2L, 50L, 500000L)  // second query advances independently
    ).toDF("qid", "doc_id", "rel_ppm")
    val sims = Seq(
      (1L, 10L, 20L, 900000L),
      (1L, 10L, 30L, 100000L),
      (1L, 20L, 30L, 800000L),
      (1L, 10L, 40L, 0L)).toDF("qid", "id_a", "id_b", "sim_ppm")
    val out = Retrieval.mmrSelect(cand, sims, k = 4)
      .orderBy("qid", "round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // q1: A first; B (rel 880k) is blocked by its 900k barrier to A, so C
    // (rel 870k, barrier 100k) goes second; D (barrier 0) third; B last
    assert(out.toSeq == Seq(
      (1L, 1L, 10L, 0L), (1L, 2L, 30L, 100000L),
      (1L, 3L, 40L, 0L), (1L, 4L, 20L, 900000L),
      (2L, 1L, 50L, 0L)))
  }

  test("evalRetrieval: integer metrics — first rank, hits@k, precision/recall; judged-but-unretrieved query reports zeros") {
    val ranked = Seq(
      (1L, 100L, 1L), (1L, 101L, 2L), (1L, 102L, 3L), (1L, 103L, 4L)
    ).toDF("qid", "doc_id", "rank")
    val qrels = Seq(
      (1L, 101L), (1L, 103L), (1L, 999L), // 999 never retrieved
      (2L, 555L)                          // qid 2 has no results at all
    ).toDF("qid", "doc_id")
    val out = Retrieval.evalRetrieval(ranked, qrels, k = 3)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // q1: 3 judged, first hit rank 2, 1 hit in top-3, 2 total;
    // rr = 1e6/2, p@3 = 1/3, recall@3 = 1/3
    assert(out(0) == (1L, 3L, 2L, 1L, 2L, 500000L, 333333L, 333333L))
    // q2: judged but empty result list -> all zeros except n_rel
    assert(out(1) == (2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("phraseOccurrences: overlap, repeated-term phrase, normalization, absence") {
    val d = Seq(
      (1L, "a a a a end"),            // "a a" overlaps: starts 0,1,2
      (2L, "  A  a b  "),             // case+whitespace normalize: "a a" at 0
      (3L, "a b a b a"),              // "a b a" at 0 and 2 (shared middle)
      (4L, "nothing here")
    ).toDF("doc_id", "text")
    def occ(p: String) = Retrieval.phraseOccurrences(d, col("doc_id"), col("text"),
        p.split(" ").toSeq)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(occ("a a") == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    assert(occ("a b a") == Set((3L, 0L), (3L, 2L)))
    assert(occ("a a a a") == Set((1L, 0L)))
    assert(occ("missing phrase") == Set.empty)
    // single-term degenerates to the postings list itself
    assert(occ("b") == Set((2L, 2L), (3L, 1L), (3L, 3L)))
  }

  test("mmrSelect: score ties break by ascending doc_id") {
    val cand = Seq((1L, 7L, 500000L), (1L, 3L, 500000L)).toDF("qid", "doc_id", "rel_ppm")
    val sims = Seq.empty[(Long, Long, Long, Long)].toDF("qid", "id_a", "id_b", "sim_ppm")
    val out = Retrieval.mmrSelect(cand, sims, k = 2)
      .orderBy("round").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(3L, 7L))
  }
  test("trigramSubstringSearch: index candidates equal the full scan, near-miss pruned") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick quicker quickest"),
      (3L, "a qu ick decoy with all trigram letters scattered"),
      (4L, "brown foxes fan out")
    ).toDF("id", "txt")
    def run(ps: Seq[String]) =
      graft.operators.Retrieval.trigramSubstringSearch(docs, $"id", $"txt", ps)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // "quick" in 1 and 2; doc 3 has "qu " and "ick" but not the substring
    // -> must be pruned by either the trigram set or the verify
    assert(run(Seq("quick", "brown fox")) ==
      Set((1L, "quick"), (2L, "quick"), (1L, "brown fox"), (4L, "brown fox")))
    assert(run(Seq("zzz")).isEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.trigramSubstringSearch(docs, $"id", $"txt", Seq("ab")); ()
    }
  }
  test("rankBiasedOverlap10: identical=1e6 ppm, disjoint=0, depth-weighted partial overlap") {
    import spark.implicits._
    def ranking(qid: String, docs: Seq[Long]) =
      docs.zipWithIndex.map { case (d, i) => (qid, d, i + 1) }
    val idDocs = (1L to 10L).toSeq
    val a = (ranking("same", idDocs) ++ ranking("none", idDocs) ++
        ranking("head", idDocs)).toDF("qid", "doc_id", "rank")
    val b = (ranking("same", idDocs) ++ ranking("none", (101L to 110L).toSeq) ++
        // doc 1 moves to rank 3 in B; docs 2,3 shift up; tail disjoint
        ranking("head", Seq(2L, 3L, 1L) ++ (201L to 207L))).toDF("qid", "doc_id", "rank")
    val got = Retrieval.rankBiasedOverlap10(a, b)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("same") == (10L, 16413303309480L, 1000000L))
    assert(got("none") == (0L, 0L, 0L))
    // common docs 1@(1,3), 2@(2,1), 3@(3,2): weights W(3)+W(2)+W(3)
    val w3 = 2278493265528L; val w2 = 3412493265528L
    val exp = w3 + w2 + w3
    val expPpm = (BigInt(exp) * 1000000 / BigInt(16413303309480L)).toLong
    assert(got("head") == (3L, exp, expPpm))
  }
  test("ndcg10: ideal order = 1e6, swapped head pays the log discount, all-zero NULL") {
    import spark.implicits._
    val ranked = Seq(
      ("ideal", 1, 3L), ("ideal", 2, 2L), ("ideal", 3, 0L),
      ("rev", 1, 0L), ("rev", 2, 3L),
      ("zero", 1, 0L), ("zero", 2, 0L)
    ).toDF("qid", "rank", "grade")
    val got = Retrieval.ndcg10(ranked)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), Option(r.get(4)))).toMap
    // ideal: dcg = idcg = 3e9 + 2*630929753
    assert(got("ideal") == (4261859506L, 4261859506L, Some(1000000L)))
    // rev: dcg = 3*630929753, idcg = 3e9 -> floor ppm
    assert(got("rev") == (1892789259L, 3000000000L, Some(630929L)))
    assert(got("zero") == (0L, 0L, None), "all-zero grades leave NDCG undefined")
  }
}
