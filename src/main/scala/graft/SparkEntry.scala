package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{ColFns, TextFns, Udfs}
import graft.operators.{Corpus, Dedup, Multimodal, Retrieval, Similarity, Spatial, Validation}
import graft.operators.Relational
import graft.operators.Relational.GraftOps
import graft.streaming.EventStreams

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (parity surface) plus the beyond-parity training-data
  * operators (SURVEY.md §7), each with a DuckDB oracle where the semantics
  * are ANSI-SQL-expressible.
  *
  * Oracle-match discipline (the driver hash-compares values):
  *   - every floating aggregate is computed exactly: cast to DECIMAL before
  *     SUM (order-independent, exact in both engines), cast the exact result
  *     to DOUBLE at the end — identical bits on both sides;
  *   - per-row double arithmetic uses the same IEEE op sequence in both
  *     engines (left-assoc), so results are bit-identical;
  *   - ratio outputs (cosine) are rounded to 6 decimals on both sides;
  *   - every query has a total ORDER BY (unique tie-break columns);
  *   - integer widths are aligned (Spark rank/size cast to long = DuckDB
  *     BIGINT).
  */
object SparkEntry {

  /** Scratch root for queries whose CONTRACT includes a write (format
    * round-trips, streaming stores/checkpoints, compaction). Default: the
    * repo's target dir. Bench redirects it to tmpfs via the
    * `graft.scratch` system property (or SPARK_GRAFT_SCRATCH) so those
    * queries measure the operator, not the box's disk; Verify keeps the
    * disk default — correctness is location-independent.
    */
  def scratchRoot: String =
    sys.props.getOrElse("graft.scratch",
      sys.env.getOrElse("SPARK_GRAFT_SCRATCH", "/root/repo/target/graft-scratch"))

  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as TIMESTAMP(NANOS) (read as int64 under
    // spark.sql.legacy.parquet.nanosAsLong) and as tz-naive
    // TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under default NTZ
    // inference); normalize either encoding to TIMESTAMP_LTZ so watermarks
    // and unix_* functions work in any session (UTC sessions make the
    // NTZ→LTZ cast value-preserving).
    if (name == "events")
      graft.streaming.EventStreams.normalizeTs(df.schema, df)
    else df
  }

  /** q174/q406's shared IVFADC fixture quantizer over a (id, v) corpus:
    * coarse centroids = the first-8 vectors, residual PQ codebooks =
    * 8-dim sub-slices of the first-16 vectors' residuals — deterministic,
    * so DuckDB re-derives both. Factored so the persisted-index sibling
    * (q406) provably serves the SAME quantizer as the inline build
    * (q174) — the "hash-match q174's oracle verbatim" contract holds by
    * construction. Returns (centroids (cid, cv), codebooks (sub, cid, cv)).
    */
  private def pqFixture(corpus: DataFrame): (DataFrame, DataFrame) = {
    val cents = corpus.filterCol(col("id") < 8)
      .selectCols(Seq(col("id").as("cid"), col("v").as("cv")))
    val first16 = corpus.filterCol(col("id") < 16)
    val a16 = Similarity.assignToCentroids(first16, cents)
      .selectCols(Seq(col("id"), col("cid")))
    val res16 = first16.join(a16, "id")
      .join(broadcast(cents), "cid")
      .selectCols(Seq(col("id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv")))
    val cb = res16.selectCols(Seq(col("id").as("cbid"),
        explode(sequence(lit(0), lit(7))).as("sub"), col("rv")))
      .selectCols(Seq(col("sub"), col("cbid").as("cid"),
        slice(col("rv"), col("sub") * 8 + 1, lit(8)).as("cv")))
    (cents, cb)
  }

  /** Exact decimal sum surfaced as double — order-independent, so Spark's
    * partial-aggregate merge order vs DuckDB's scan order cannot diverge.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** q304's sparse-vector construction (bigram hashed-TF-IDF over every
    * 3rd doc), factored out so Bench's attribution counters measure
    * candidate volume on the EXACT frame the query joins.
    *
    * '_' joiner, not ' ': hashedTfIdf's portable hash is the rolling
    * token fingerprint, which would TOKENIZE a space-joined bigram and
    * fold two FNVs — the oracle hashes the joined string whole, and a
    * single-token input makes the two identical.
    * NOT materialized: sparseCosinePairs consumes the vector frame four
    * times (norms, bucket sizes, both join sides), but the subtrees end
    * in the same canonical aggregate, so exchange reuse computes the
    * tokenize→bigram→hash→agg pipeline once; an explicit truncate
    * A/B-measured equal-to-slower (the candidate join dominates).
    */
  def tfidfBigramVecs(s: SparkSession, dir: String): DataFrame = {
    val withBi = t(s, dir, "documents")
      .filterCol(pmod(col("doc_id"), lit(3L)) === 0L)
      .withColumn("__toks", TextFns.tokens(col("text")))
      .withColumn("__bi", expr(
        """IF(size(__toks) < 2, array(),
             transform(sequence(1, size(__toks) - 1),
               i -> concat(element_at(__toks, i), '_',
                 element_at(__toks, i + 1))))"""))
    Corpus.hashedTfIdf(withBi, col("doc_id"), col("__bi"),
        dim = 4096, scale = 1000L, portable = true)
      .selectCols(Seq(col("id"), col("bucket"), col("weight")))
  }

  /** Shared CTE chain for the BPE oracles: word-frequency state `s0`, then
    * per round (pair counts `pN` -> argmax `mN` -> greedy rewrite `sN`;
    * an empty argmax carries the symbol state through unchanged — the
    * early-stop case [[graft.operators.Corpus.bpeMerges]] handles).
    */
  /** Mechanically-unrolled Hilbert xy2d oracle (q216): one CTE per bit
    * level replaying the quadrant-digit + flip/swap recurrence in integer
    * SQL (&, xor, CASE) — each level reads the PREVIOUS level's (x, y, d),
    * so the unroll is exact.
    */
  private def hilbertOracle(bits: Int): String = {
    val n1 = (1L << bits) - 1
    val its = (1 to bits).map { k =>
      val s = 1L << (bits - k)
      s"""it$k AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CASE WHEN (y & $s) > 0 THEN x
                ELSE CASE WHEN (x & $s) > 0 THEN $n1 - y ELSE y END END AS x,
           CASE WHEN (y & $s) > 0 THEN y
                ELSE CASE WHEN (x & $s) > 0 THEN $n1 - x ELSE x END END AS y,
           d + ${s * s} * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
                              (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d
         FROM it${k - 1})"""
    }.mkString(",\n         ")
    s"""WITH it0 AS (
         SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           l_partkey & $n1 AS x, l_suppkey & $n1 AS y, CAST(0 AS BIGINT) AS d
         FROM lineitem),
       $its
       SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(d AS BIGINT) AS h
       FROM it$bits ORDER BY h, l_orderkey, l_linenumber"""
  }

  /** Mechanically-unrolled greedy k-center oracle (q230): seed = min id,
    * then per round the (min-dist DESC, id ASC) argmax over the running
    * least() of squared L2 distances — the identical left-assoc IEEE sums
    * as q79's list_sum, so every pick replays exactly.
    */
  private def kcenterOracle(k: Int): String = {
    def dist(vl: String, vr: String) =
      s"list_sum(list_transform(range(1, len($vl) + 1), i -> ($vl[i] - $vr[i]) * ($vl[i] - $vr[i])))"
    val rounds = (2 to k).map { r =>
      val prev = if (r == 2) "m1" else s"m${r - 1}"
      val pick = s"""p$r AS MATERIALIZED (SELECT id AS cid, md FROM $prev
           ORDER BY md DESC, id LIMIT 1)"""
      val next =
        if (r == k) pick
        else pick + s""",
         m$r AS MATERIALIZED (SELECT m.id, m.v,
             least(m.md, ${dist("m.v", "c.v")}) AS md
           FROM $prev m JOIN e c ON c.id = (SELECT cid FROM p$r))"""
      next
    }.mkString(",\n         ")
    val picks = (2 to k).map(r =>
      s"SELECT $r AS rank, cid AS id, round(md, 6) AS dist_sq FROM p$r")
      .mkString("\n         UNION ALL ")
    s"""WITH e AS MATERIALIZED (
         SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       s1 AS MATERIALIZED (SELECT min(id) AS cid FROM e),
       m1 AS MATERIALIZED (SELECT e.id, e.v, ${dist("e.v", "c.v")} AS md
         FROM e JOIN e c ON c.id = (SELECT cid FROM s1)),
       $rounds
       SELECT CAST(rank AS BIGINT) AS rank, id, dist_sq FROM (
         SELECT 1 AS rank, cid AS id, 0.0 AS dist_sq FROM s1
         UNION ALL $picks)
       ORDER BY rank"""
  }

  /** Mechanically-unrolled MMR oracle (q212): candidate pool + pairwise
    * token-set similarities, then `k` greedy selection rounds — each round
    * drops the selected set, computes every remaining candidate's
    * max-similarity barrier, and picks the (score DESC, doc_id ASC) argmax.
    * All-integer ppm arithmetic, so the replay is exact.
    */
  private def mmrOracle(k: Int): String = {
    val rounds = (2 to k).map { r =>
      val prev = r - 1
      s"""rem$r AS MATERIALIZED (SELECT * FROM cand
           WHERE doc_id NOT IN (SELECT doc_id FROM selall$prev)),
         bar$r AS MATERIALIZED (SELECT s_cand AS doc_id, MAX(sim_ppm) AS ms FROM sb
           WHERE s_sel IN (SELECT doc_id FROM selall$prev) GROUP BY 1),
         sel$r AS MATERIALIZED (SELECT $r AS round, c.doc_id, c.rel_ppm,
             COALESCE(b.ms, 0) AS max_sim_ppm,
             500000 * c.rel_ppm - 500000 * COALESCE(b.ms, 0) AS score
           FROM rem$r c LEFT JOIN bar$r b USING (doc_id)
           ORDER BY score DESC, c.doc_id LIMIT 1),
         selall$r AS MATERIALIZED (SELECT * FROM selall$prev UNION ALL SELECT * FROM sel$r)"""
    }.mkString(",\n         ")
    s"""WITH t AS MATERIALIZED (
         SELECT doc_id, list_distinct(list_filter(
           regexp_split_to_array(lower(trim(text)), '\\s+'),
           x -> len(x) > 0)) AS tk
         FROM documents),
       rel AS MATERIALIZED (
         SELECT doc_id,
           len(list_intersect(tk, ['spark', 'join', 'window'])) * 1000000 // 3 AS rel_ppm
         FROM t),
       cand AS MATERIALIZED (SELECT doc_id, CAST(rel_ppm AS BIGINT) AS rel_ppm FROM rel
         ORDER BY rel_ppm DESC, doc_id LIMIT 20),
       ct AS MATERIALIZED (SELECT c.doc_id, c.rel_ppm, t.tk FROM cand c JOIN t USING (doc_id)),
       sims AS MATERIALIZED (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.tk, b.tk)) * 1000000
             // (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) AS sim_ppm
         FROM ct a JOIN ct b ON a.doc_id < b.doc_id),
       sb AS MATERIALIZED (SELECT id_a AS s_sel, id_b AS s_cand, sim_ppm FROM sims
         UNION ALL SELECT id_b, id_a, sim_ppm FROM sims),
       sel1 AS MATERIALIZED (SELECT 1 AS round, doc_id, rel_ppm, CAST(0 AS BIGINT) AS max_sim_ppm,
           500000 * rel_ppm AS score
         FROM cand ORDER BY score DESC, doc_id LIMIT 1),
       selall1 AS MATERIALIZED (SELECT * FROM sel1),
       $rounds
       SELECT CAST(1 AS BIGINT) AS qid, CAST(round AS BIGINT) AS round, doc_id,
         CAST(rel_ppm AS BIGINT) AS rel_ppm, CAST(max_sim_ppm AS BIGINT) AS max_sim_ppm,
         CAST(score AS BIGINT) AS score
       FROM selall$k ORDER BY round"""
  }

  private def bpeCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS (SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(wc) AS BIGINT) AS cnt
         FROM (SELECT string_split(sym, ' ') AS toks, wc FROM $prev) t,
              LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
         GROUP BY 1, 2),
         m$r AS (SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1),
         s$r AS (SELECT CASE WHEN m$r.l IS NULL THEN sym
             ELSE trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',
               ' ' || m$r.l || '  ' || m$r.r || ' ', ' ' || m$r.l || m$r.r || ' '),
               '  ', ' ')) END AS sym, wc
          FROM $prev LEFT JOIN m$r ON TRUE)"""
    }.mkString(",\n         ")
    s"""WITH w0 AS (
         SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
           SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             x -> len(x) > 0)) AS w
           FROM documents) GROUP BY w),
       s0 AS (SELECT list_aggregate(string_split(w, ''), 'string_agg', ' ') AS sym, wc FROM w0),
       $roundCtes"""
  }

  /** q165's oracle, `rounds` BPE rounds unrolled: mechanically generated so
    * every round is literally the same SQL — the round count is the only
    * variable. Mirrors [[graft.operators.Corpus.bpeMerges]] exactly,
    * including the doubled-separator greedy merge application.
    */
  private def bpeOracle(rounds: Int): String = {
    val union = (1 to rounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS merge_round, l AS merge_left, r AS merge_right, cnt AS pair_count FROM m$r"
    }.mkString(" UNION ALL ")
    s"""${bpeCtes(rounds)}
       SELECT * FROM ($union) ORDER BY merge_round"""
  }

  /** q167's oracle: the corpus subword histogram after `rounds` merges —
    * training's final symbol state `sN` exploded and weighted by word
    * frequency, which is exactly what segmenting the corpus with its own
    * merge table produces ([[graft.operators.Corpus.bpeSegment]]).
    */
  private def bpeVocabOracle(rounds: Int, k: Int): String =
    s"""${bpeCtes(rounds)}
       SELECT sub AS subtoken, CAST(sum(wc) AS BIGINT) AS n_occurrences
       FROM (SELECT unnest(string_split(sym, ' ')) AS sub, wc FROM s$rounds)
       GROUP BY sub ORDER BY n_occurrences DESC, subtoken LIMIT $k"""

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): TPC-H Q1. */
  def entry(spark: SparkSession): DataFrame =
    q1Pricing(spark, "/root/testdata/sf0.001")

  /** TPC-H Q1 pricing summary — `df/aggregate` with full agg-builder set. */
  private def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filterCol(col("l_shipdate").cast("date") <= lit(java.sql.Date.valueOf("1998-09-02")))
    val disc  = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    l.aggregate(
      Seq(col("l_returnflag"), col("l_linestatus")),
      Seq(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc.cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
        sum(charge.cast(DecimalType(18, 6))).cast("double").as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount"), 6) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
    ).sortBy(Seq(col("l_returnflag"), col("l_linestatus")))
  }

  /** q150's join+agg body over the bucketed catalog tables, shared with
    * ExplainAuditSpec's zero-Exchange assertion (the spec builds it WITHOUT
    * the final sort, whose range exchange is inherent to a total order).
    * Both scans report HashPartitioning(key, 8) from the bucket layout, so
    * the merge join AND the groupBy (keys ⊇ bucket key) reuse it — no
    * exchange anywhere between scan and sort.
    */
  private[graft] def bucketedRevenue(s: SparkSession): DataFrame =
    s.table("graft_lineitem_b")
      .join(s.table("graft_orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .aggregate(Seq(col("o_orderkey"), col("o_orderpriority")), Seq(
        dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_lines")))

  /** q282's rebalanced frame, shared with ExplainAuditSpec's skewed-read
    * assertion: events with a planted hot key (2/3 of rows on k=0) under a
    * REBALANCE hint, in an isolated session whose advisory partition size
    * is scaled to sf-sized shuffles. The hint must stay TERMINAL (write
    * or collect it directly) — an aggregation on top lets Catalyst prune
    * the user shuffle as redundant, which is exactly the non-demo plan.
    */
  private[graft] def skewRebalanced(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
    s2.conf.set("spark.sql.adaptive.rebalancePartitionsSmallPartitionFactor", "0.2")
    Engine.readParquet(s2, s"$dir/events.parquet")
      // skew splits happen at MAP-OUTPUT granularity: a single-mapper
      // shuffle (one small input file) has nothing to split along, so
      // give the rebalance shuffle the multiple mappers any real corpus
      // has
      .repartition(8)
      .withColumn("k",
        when(pmod(col("event_id"), lit(3L)) =!= 0L, lit(0L))
          .otherwise(col("event_id")))
      .hint("rebalance", col("k"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 core relational surface -----------------------------------
    "q01_select" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .selectCols(Seq(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    "q02_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filterCol(ColFns.and(
          ColFns.lt(col("l_quantity"), lit(5)),
          ColFns.eq(col("l_returnflag"), lit("R"))))
        .selectCols(Seq(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate").cast("date").as("ship_date")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    "q03_with_column" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("price_ratio", col("o_totalprice") / lit(100000.0))
        .withColumnRenamed("o_orderkey", "order_id")
        .selectCols(Seq(col("order_id"), col("price_ratio")))
        .sortBy(Seq(col("order_id")))),

    "q04_agg" -> ((s, dir) => q1Pricing(s, dir)),

    "q05_agg_global" -> ((s, dir) =>
      t(s, dir, "lineitem").aggregate(Seq.empty, Seq(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        countDistinct(col("l_orderkey")).as("n_orders")))),

    "q06_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byPrice = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      val byPriceOnly = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc)
      val part = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity")))
        .windowCols(Seq(
          row_number().over(byPrice).cast("long"),
          rank().over(byPriceOnly).cast("long"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).over(part).cast("double")))
        .filterCol(col("w0") <= 2)
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("w0"), col("w1"), col("w2")))
        .sortBy(Seq(col("l_orderkey"), col("w0")))
    }),

    "q07_sort_nulls" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("v", when(col("value") < 1, lit(null)).otherwise(col("value")))
        .sortExprs(Seq(ColFns.sortExpr(col("v"), ascending = true, nullsFirst = false), col("event_id").asc))
        .limitOffset(0, Some(100))
        .selectCols(Seq(col("event_id"), col("v")))),

    "q08_limit_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .sortBy(Seq(col("o_orderkey")))
        .limitOffset(100, Some(10))
        .selectCols(Seq(col("o_orderkey"), col("o_totalprice")))),

    "q09_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .selectCols(Seq(col("l_returnflag"), col("l_linestatus")))
        .distinctAll
        .sortBy(Seq(col("l_returnflag"), col("l_linestatus")))),

    "q10_distinct_on" -> ((s, dir) =>
      t(s, dir, "orders")
        .distinctOn(
          on = Seq(col("o_custkey")),
          select = Seq(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
          sort = Seq(col("o_orderdate").desc, col("o_orderkey").asc))
        .sortBy(Seq(col("o_custkey")))),

    "q11_join_names" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .joinNames(t(s, dir, "part"), "inner", Seq("l_partkey"), Seq("p_partkey"),
          extra = Some(col("p_retailprice") > 990.0))
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("p_name"), col("p_retailprice")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    "q12_join_left" -> ((s, dir) =>
      t(s, dir, "customer")
        .joinNames(t(s, dir, "orders"), "left", Seq("c_custkey"), Seq("o_custkey"))
        .selectCols(Seq(col("c_custkey"), col("c_name"), col("o_orderkey")))
        .sortExprs(Seq(col("c_custkey").asc, col("o_orderkey").asc_nulls_last))),

    "q13_join_semi" -> ((s, dir) =>
      t(s, dir, "orders")
        .joinNames(t(s, dir, "lineitem"), "left_semi", Seq("o_orderkey"), Seq("l_orderkey"),
          extra = Some(col("l_quantity") >= 49))
        .selectCols(Seq(col("o_orderkey"), col("o_totalprice")))
        .sortBy(Seq(col("o_orderkey")))),

    "q14_join_anti" -> ((s, dir) =>
      t(s, dir, "orders")
        .joinNames(t(s, dir, "lineitem"), "left_anti", Seq("o_orderkey"), Seq("l_orderkey"))
        .selectCols(Seq(col("o_orderkey"), col("o_orderstatus")))
        .sortBy(Seq(col("o_orderkey")))),

    "q15_join_theta" -> ((s, dir) =>
      t(s, dir, "supplier")
        .joinOn(t(s, dir, "nation"), "inner", Seq(
          col("s_nationkey") === col("n_nationkey"),
          col("s_acctbal") > lit(2000.0)))
        .selectCols(Seq(col("s_suppkey"), col("s_name"), col("n_name")))
        .sortBy(Seq(col("s_suppkey")))),

    "q16_cross" -> ((s, dir) =>
      t(s, dir, "region")
        .joinOn(t(s, dir, "nation"), "inner", Seq.empty)
        .selectCols(Seq(col("r_name"), col("n_name")))
        .sortBy(Seq(col("r_name"), col("n_name")))),

    "q17_union_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.filterCol(col("o_totalprice") > 400000.0)
        .selectCols(Seq(col("o_orderkey"), col("o_totalprice")))
      val vhi = o.filterCol(col("o_totalprice") > 450000.0)
        .selectCols(Seq(col("o_orderkey"), col("o_totalprice")))
      hi.unionAll(vhi).sortBy(Seq(col("o_orderkey"), col("o_totalprice")))
    }),

    "q18_union_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hi = o.filterCol(col("o_totalprice") > 400000.0)
        .selectCols(Seq(col("o_orderkey"), col("o_totalprice")))
      val vhi = o.filterCol(col("o_totalprice") > 450000.0)
        .selectCols(Seq(col("o_orderkey"), col("o_totalprice")))
      hi.unionDistinct(vhi).sortBy(Seq(col("o_orderkey"), col("o_totalprice")))
    }),

    "q19_intersect" -> ((s, dir) =>
      t(s, dir, "customer").selectCols(Seq(col("c_nationkey").as("nk")))
        .intersectDistinct(t(s, dir, "supplier").selectCols(Seq(col("s_nationkey").as("nk"))))
        .sortBy(Seq(col("nk")))),

    "q20_except" -> ((s, dir) =>
      // right side restricted to RECENT orders so the result is non-empty
      // (every customer has SOME order in the synthetic data — the
      // unrestricted form was a vacuous 0-row check)
      t(s, dir, "customer").selectCols(Seq(col("c_custkey").as("ck")))
        .exceptDistinct(t(s, dir, "orders")
          .filterCol(col("o_orderdate").cast("date") >=
            lit(java.sql.Date.valueOf("2000-01-01")))
          .selectCols(Seq(col("o_custkey").as("ck"))))
        .sortBy(Seq(col("ck")))),

    "q47_salted_join" -> ((s, dir) =>
      // Skew-salted join, hash-matched against the plain-join oracle: the
      // left side is spread over 8 salt buckets keyed by the row identity,
      // the right side replicated per salt. Result must be IDENTICAL to the
      // unsalted join — salting changes the shuffle layout, never the answer.
      t(s, dir, "lineitem")
        .saltedJoin(t(s, dir, "orders"), Seq("l_orderkey"), Seq("o_orderkey"),
          saltFrom = struct(col("l_orderkey"), col("l_linenumber")), buckets = 8)
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("o_totalprice")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    "q56_asof_join" -> ((s, dir) => {
      // for each purchase, the most recent prior-or-equal click by the same
      // user — one shuffle (union + per-key window), not a range nested loop
      val e = t(s, dir, "events")
      val purchases = e.filterCol(col("event_type") === "purchase")
        .selectCols(Seq(col("event_id"), col("user_id"), col("ts")))
      val clicks = e.filterCol(col("event_type") === "click")
        .selectCols(Seq(col("event_id"), col("user_id"), col("ts")))
      purchases.asofJoin(clicks, Seq("user_id"), Seq("user_id"), "ts", "ts")
        .selectCols(Seq(
          col("l.event_id").as("purchase_id"),
          col("l.user_id").as("user_id"),
          col("r.event_id").as("click_id"),
          (unix_micros(col("l.ts")) - unix_micros(col("r.ts"))).as("gap_us")))
        .sortBy(Seq(col("purchase_id")))
    }),

    "q53_histogram" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .histogramOf(col("l_extendedprice"), lo = 900.0, hi = 105000.0, buckets = 20)
        .withColumn("bucket_lo", round(col("bucket_lo"), 6))
        .sortBy(Seq(col("bucket")))),

    "q54_stratified_sample" -> ((s, dir) =>
      // deterministic corpus mixing: 50% of en, 25% of de, 10% otherwise —
      // reproducible across runs/engines (multiplicative hash of doc_id),
      // which df.sample (partition-layout-dependent) cannot give
      t(s, dir, "documents")
        .stratifiedSample(col("doc_id"), col("lang"),
          rates = Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
        .selectCols(Seq(col("doc_id"), col("lang")))
        .sortBy(Seq(col("doc_id")))),

    // ---- §2.4 expression surface -----------------------------------------
    "q21_case" -> ((s, dir) => {
      val statusWord = ColFns.caseOf(col("o_orderstatus"))
        .when(lit("F"), lit("done"))
        .when(lit("O"), lit("open"))
        .end // no ELSE => NULL for 'P'
      val bucket = ColFns.caseWhen(col("o_totalprice") > 300000.0, lit("big"))
        .when(col("o_totalprice") > 100000.0, lit("mid"))
        .otherwise(lit("small"))
      t(s, dir, "orders")
        .selectCols(Seq(col("o_orderkey"), statusWord.as("status_word"), bucket.as("size_bucket")))
        .sortBy(Seq(col("o_orderkey")))
    }),

    "q22_like" -> ((s, dir) =>
      t(s, dir, "part")
        .filterCol(ColFns.and(
          ColFns.ilike(col("p_name"), lit("%RED%")),
          ColFns.notLike(col("p_name"), lit("%bolt%"))))
        .selectCols(Seq(col("p_partkey"), col("p_name")))
        .sortBy(Seq(col("p_partkey")))),

    "q23_arith" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .selectCols(Seq(
          col("l_orderkey"), col("l_linenumber"),
          ColFns.add(col("l_quantity"), col("l_tax"), col("l_discount")).as("s3"),
          ColFns.sub(col("l_extendedprice"), col("l_tax"), col("l_discount")).as("d3"),
          ColFns.mul(col("l_quantity"), col("l_extendedprice")).as("m2"),
          ColFns.div(col("l_extendedprice"), col("l_quantity"), lit(2.0)).as("v3")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    // ---- §2.5 UDF surface --------------------------------------------------
    "q24_udf" -> ((s, dir) => {
      // Typed handle: declared arg types are enforced (arity) and coerced
      // (cast) at every call — the reference's full define-udf signature.
      val u = Udfs.defineUdfTyped(s, "graft_charge",
        Seq(DoubleType, DoubleType, DoubleType), DoubleType,
        { case Seq(p: Double, t: Double, d: Double) => p * (1 + t) * (1 - d) })
      t(s, dir, "lineitem")
        .selectCols(Seq(
          col("l_orderkey"), col("l_linenumber"),
          Udfs.udfCall(u, Seq(col("l_extendedprice"), col("l_tax"), col("l_discount"))).as("charge")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))
    }),

    // ---- §2.3 actions with frame-shaped output ----------------------------
    "q25_describe" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .selectCols(Seq(col("l_quantity"), col("l_extendedprice"), col("l_returnflag")))
        .describeDf),

    "q26_explain" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .joinNames(t(s, dir, "orders"), "inner", Seq("l_orderkey"), Seq("o_orderkey"))
        .aggregate(Seq(col("o_orderstatus")), Seq(count(lit(1)).as("n")))
        .explainDf()),

    // ---- text analysis (SURVEY.md §7 training-data operators) -------------
    "q27_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(
          col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFns.meanTokenLen(col("text")).as("mean_tok_len"),
          length(col("text")).cast("long").as("n_chars_calc")))
        .sortBy(Seq(col("doc_id")))),

    "q28_lang_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(
          col("doc_id"), col("lang"),
          TextFns.langId(col("text")).as("lang_pred"),
          TextFns.qualityScore(col("text")).as("quality")))
        .sortBy(Seq(col("doc_id")))),

    "q44_stopword_ratio" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), col("lang"),
          TextFns.stopwordRatio(col("text")).as("sw_ratio")))
        .sortBy(Seq(col("doc_id")))),

    "q48_bpeish_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          TextFns.bpeishTokenCount(col("text")).cast("long").as("n_bpeish")))
        .sortBy(Seq(col("doc_id")))),

    "q55_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          TextFns.redactPii(col("text")).as("clean_text"),
          (length(col("text")) - length(TextFns.redactPii(col("text")))).cast("long").as("removed_chars")))
        .sortBy(Seq(col("doc_id")))),

    "q52_repetition" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          TextFns.dupLineRatio(col("text")).as("dup_line_ratio"),
          TextFns.ngramRepetitionRatio(col("text"), 5).as("rep_5gram_ratio")))
        .sortBy(Seq(col("doc_id")))),

    "q29_fingerprint" -> ((s, dir) =>
      // portable: FNV-1a token hashes instead of xxhash64, so the DuckDB
      // oracle can replay the exact fold (HUGEINT mod-2^64 arithmetic) and
      // the fingerprint is hash-compared, not rows-only
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), TextFns.fingerprint(col("text"), portable = true).as("fp")))
        .sortBy(Seq(col("doc_id")))),

    "q30_char_ngrams" -> ((s, dir) =>
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          TextFns.charNgramCount(col("text"), 5).cast("long").as("n_5grams")))
        .sortBy(Seq(col("doc_id")))),

    // ---- deduplication -----------------------------------------------------
    "q31_dedup_exact" -> ((s, dir) =>
      // exactDedupAgg: aggregated keep-first (partial map-side combine),
      // not the window+row_number formulation — the shuffle carries one row
      // per (source, lang) per partition instead of the whole table.
      Dedup.exactDedupAgg(t(s, dir, "documents"), Seq(col("source"), col("lang")), Seq(col("doc_id")))
        .selectCols(Seq(col("doc_id"), col("source"), col("lang")))
        .sortBy(Seq(col("doc_id")))),

    "q32_dup_map" -> ((s, dir) =>
      Dedup.exactDupMap(t(s, dir, "documents"),
        concat_ws("|", col("source"), col("lang")), col("doc_id"))
        .sortBy(Seq(col("survivor_id"), col("dup_id")))),

    "q33_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          ngram = 3, k = 128, bands = 32, threshold = 0.8, maxBucket = 1 << 20)
        .sortBy(Seq(col("id_a"), col("id_b")))),

    "q34_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          ngram = 3, threshold = 0.8)
        .sortBy(Seq(col("id_a"), col("id_b")))),

    "q35_simhash" -> ((s, dir) =>
      // portable FNV token hashes => the oracle recomputes every fingerprint
      // and brute-forces all hamming<=3 pairs; the 4x16-bit pigeonhole here
      // is exact for hamming<=3, so the two answer sets must be identical
      Dedup.simhashPairs(t(s, dir, "documents"), col("doc_id"), col("text"), maxHamming = 3,
          portable = true)
        .withColumn("hamming", col("hamming").cast("long"))
        .sortBy(Seq(col("id_a"), col("id_b")))),

    "q50_neardup_components" -> ((s, dir) =>
      // transitive closure over the exact near-dup pair graph: every doc in
      // a pair, labeled with its component's minimum doc id
      Dedup.nearDupComponents(
        Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"), col("text"), threshold = 0.8))
        .sortBy(Seq(col("id")))),

    "q51_clean_corpus" -> ((s, dir) =>
      // the composed training-corpus pipeline: quality/lang gate -> exact
      // dedup -> near-dup component collapse (exact pairs => DuckDB can
      // replay every stage; at scale swap pairFn for minhashLshPairs)
      graft.operators.Pipeline.cleanCorpus(t(s, dir, "documents"), col("doc_id"), col("text"))
        .sortBy(Seq(col("id")))),

    // ---- similarity search --------------------------------------------------
    "q36_ann_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val queries = corpus.filterCol(col("id") < 10)
      Similarity.bruteForceTopK(corpus, queries, k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q37_emb_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Dedup.embeddingCosinePairs(e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v"))),
          col("id"), col("v"), threshold = 0.4)
        .withColumn("cosine", round(col("cosine"), 6))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q38_ann_ivf" -> ((s, dir) => {
      // PRUNED IVF config (nprobe=4 of nlist=16) over a fixture coarse
      // quantizer — the first 16 corpus vectors as cells (the q174
      // deterministic-fixture trick, via ivfTopK's pre-trained-codebook
      // parameter). With re-derivable cells, the ENTIRE pruned path —
      // corpus cell assignment, query probe selection, probe join, exact
      // cosine, top-k — replays as plain SQL in DuckDB: a fully
      // independent oracle (r10; the r9 pin is gone). The k-means-seeded
      // production config stays oracle-covered by q45 (nprobe=nlist ==
      // brute force, exact hash vs q36's oracle).
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val queries = corpus.filterCol(col("id") < 10)
      val cents = corpus.filterCol(col("id") < 16)
        .selectCols(Seq(col("id").cast("int").as("cell"), col("v").as("cv")))
      Similarity.ivfTopK(corpus, queries, nlist = 16, nprobe = 4, k = 5,
          centroids = Some(cents))
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q45_ann_ivf_exact" -> ((s, dir) => {
      // nprobe = nlist probes every cell => IVF degenerates to exhaustive
      // search and must EXACTLY equal brute force — so q36's oracle applies
      // verbatim. This pins the whole IVF pipeline (k-means centroids, cell
      // assignment, probe join, top-k) against DuckDB, leaving only the
      // nprobe<nlist pruning uncovered (measured by q46 instead).
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val queries = corpus.filterCol(col("id") < 10)
      Similarity.ivfTopK(corpus, queries, nlist = 16, nprobe = 16, k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q46_ann_ivf_recall" -> ((s, dir) => {
      // Recall@5 of the pruned IVF config (nprobe=4 of nlist=16) vs exact
      // brute force, per query — the approximation measured, not asserted.
      // Same fixture quantizer as q38, so BOTH sides of the recall (the
      // pruned probe and the exact top-5) replay in DuckDB and the recall
      // itself is an independent oracle (r10; the r9 pin is gone).
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val queries = corpus.filterCol(col("id") < 10)
      val cents = corpus.filterCol(col("id") < 16)
        .selectCols(Seq(col("id").cast("int").as("cell"), col("v").as("cv")))
      val approx = Similarity.ivfTopK(corpus, queries, nlist = 16, nprobe = 4, k = 5,
        centroids = Some(cents))
      val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      Similarity.recallAtK(approx, exact)
        .withColumn("recall", round(col("recall"), 6))
        .sortBy(Seq(col("query_id")))
    }),

    // ---- multimodal plumbing ------------------------------------------------
    "q39_multimodal" -> ((s, dir) => {
      // Native-expression feature extraction (no RDD hop). The feature vector
      // is surfaced as 8 scalar columns: the driver comparator hashes scalar
      // cells; the array form is exercised by MultimodalSpec.
      val payload = Multimodal.asPayload(t(s, dir, "documents"), "text", "text", "utf8")
      val feats = Multimodal.extractFeatures(payload, "doc_id", "payload")
      feats
        .selectCols(Seq(
          col("id"), col("byte_len"),
          round(col("byte_entropy"), 6).as("byte_entropy"),
          col("head_hash")) ++
          (0 until 8).map(j =>
            round(element_at(col("feature_vec"), j + 1).cast("double"), 6).as(s"fv$j")))
        .sortBy(Seq(col("id")))
    }),

    // ---- events: windowed agg + sessionization ------------------------------
    "q40_events_window" -> ((s, dir) =>
      t(s, dir, "events")
        .aggregate(
          Seq(date_trunc("hour", col("ts")).cast("long").as("win_epoch"), col("event_type")),
          Seq(count(lit(1)).as("n"), dsum(col("value"), 6).as("total_value")))
        .sortBy(Seq(col("win_epoch"), col("event_type")))),

    "q41_sessionize" -> ((s, dir) =>
      EventStreams.sessionize(t(s, dir, "events"), gapMinutes = 30)
        .aggregate(Seq(col("user_id")), Seq(max(col("session_seq")).cast("long").as("n_sessions")))
        .sortBy(Seq(col("user_id")))),

    "q43_emb_lsh" -> ((s, dir) => {
      // Sign-LSH near-dup pairs (the linear-shuffle 100 TB path; q37 is the
      // quadratic exact baseline). Fully independently oracle-verified
      // (r10): DuckDB re-derives the splitmix64 hyperplanes in HUGEINT
      // mod-2^64 arithmetic and replays buckets, band join, and cosine
      // verify from the raw parquet; DedupSpec additionally pins that it
      // finds planted near-dups and never emits a false pair.
      val e = t(s, dir, "embeddings")
      Dedup.embeddingLshPairs(
          e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v"))),
          col("id"), col("v"), dims = 64, threshold = 0.35)
        .withColumn("cosine", round(col("cosine"), 6))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q49_dedup_stream" -> ((s, dir) => {
      // TRUE streaming ingestion dedup (dropDuplicatesWithinWatermark)
      // drained through a memory sink. The surviving ROW per key is
      // intra-batch-order-dependent, so the query projects the key columns
      // only — making the result exactly DISTINCT(user_id, event_type) and
      // hash-matchable.
      val staged = java.nio.file.Files.createTempDirectory("graft_q49")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q49_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runDedupSmoke(s, staged.toString, qn, Seq("user_id", "event_type"))
          .selectCols(Seq(col("user_id"), col("event_type")))
          .sortBy(Seq(col("user_id"), col("event_type")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q42_sessionize_stream" -> ((s, dir) => {
      // TRUE Structured Streaming run (flatMapGroupsWithState + event-time
      // timeout) drained through a memory sink. FileStreamSource needs a
      // directory, so the single-file table is staged into a temp dir; one
      // input file => one micro-batch => deterministic output: every session
      // except each user's last (still open at drain time).
      val staged = java.nio.file.Files.createTempDirectory("graft_q42")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q42_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runSessionizeSmoke(s, staged.toString, qn, gapMinutes = 30)
          .selectCols(Seq(col("user_id"), col("session_seq"), col("start_us"), col("end_us"), col("n_events")))
          .sortBy(Seq(col("user_id"), col("session_seq")))
      } finally {
        // the drain materialized its result, so the staged copy can go
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    // ---- corpus preparation (round 3) -----------------------------------
    "q57_segment_dedup" -> ((s, dir) =>
      // CCNet-style segment dedup; the synthetic corpus has no paragraph
      // breaks, so segments are 10-token chunks (127 of 2798 chunks repeat
      // across docs at sf0.01 — the op has real work to do)
      Corpus.segmentDedup(t(s, dir, "documents"), col("doc_id"),
          Corpus.tokenChunks(col("text"), 10))
        .sortBy(Seq(col("id")))),

    "q58_heavy_hitters" -> ((s, dir) =>
      Corpus.heavyHitters(t(s, dir, "documents"), TextFns.tokens(col("text")), 50)
        // deterministic total order: (count desc, term asc) in operator AND
        // final sort, so the rank-50 tie cut matches the oracle exactly
        .orderBy(col("n").desc, col("term"))),

    "q59_contamination" -> ((s, dir) =>
      // benchmark set = every 97th doc (deterministic ~1%), 8-gram overlap
      Corpus.contamination(t(s, dir, "documents"), col("doc_id"), col("text"),
          pmod(col("doc_id"), lit(97)) === 0, ngram = 8)
        .sortBy(Seq(col("id")))),

    "q60_pack_sequences" -> ((s, dir) =>
      // bucketSize 64 << doc count so the distributed prefix-sum actually
      // exercises the multi-bucket path at test scale
      Corpus.packSequences(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokenCount(col("text")), ctxLen = 512, bucketSize = 64)
        .sortBy(Seq(col("id")))),

    "q61_group_percentiles" -> ((s, dir) =>
      // exact R-7 percentiles (Spark `percentile` == DuckDB quantile_cont)
      t(s, dir, "documents")
        .selectCols(Seq(col("lang"), TextFns.tokenCount(col("text")).cast("long").as("n_tokens")))
        .aggregate(Seq(col("lang")), Seq(
          round(expr("percentile(n_tokens, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_tokens, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n")))
        .sortBy(Seq(col("lang")))),

    "q62_json_props" -> ((s, dir) =>
      // semi-structured extraction: events.props is a JSON object column
      t(s, dir, "events")
        .selectCols(Seq(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k")))
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k")))
        .sortBy(Seq(col("event_type")))),

    "q63_range_join" -> ((s, dir) => {
      // interval containment as a bucketed equi-join: each event joined to
      // the (30-min-gap) session interval that contains it
      val ev = t(s, dir, "events")
      val sessions = EventStreams.sessionize(ev, gapMinutes = 30)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      ev.rangeJoin(sessions, Seq("user_id"), Seq("user_id"),
          "ts", "s_start", "s_end", bucketWidth = 30L * 60 * 1000000)
        .selectCols(Seq(
          col("l.event_id").as("event_id"),
          col("r.user_id").as("user_id"),
          col("r.session_seq").cast("long").as("session_seq")))
        .sortBy(Seq(col("event_id")))
    }),

    "q64_gap_fill" -> ((s, dir) => {
      // hourly per-user series, zero-filled counts/sums over each user's
      // span, last event_type forward-filled across the gaps
      val filled = EventStreams.gapFill(t(s, dir, "events"),
        col("user_id"), col("ts"), stepMicros = 3600L * 1000000,
        aggs = Seq(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sv"),
          max(col("event_type")).as("et")))
      EventStreams.forwardFill(filled, col("k"), col("bucket"), Seq("et"))
        .selectCols(Seq(
          col("k").as("user_id"), col("bucket"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("sv"), lit(0.0)).as("sum_value"),
          col("et").as("last_type")))
        .sortBy(Seq(col("user_id"), col("bucket")))
    }),

    // ---- corpus composition + interval analytics (round 4) ---------------
    "q66_tfidf_top_terms" -> ((s, dir) =>
      // linear-idf config (exact cross-engine; logIdf=true is the
      // production flavor, see Corpus.tfIdfTopTerms)
      Corpus.tfIdfTopTerms(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), k = 5)
        .withColumn("score", round(col("score"), 6))
        .sortBy(Seq(col("id"), col("rank")))),

    "q67_quota_sample" -> ((s, dir) =>
      // data mixing: src0 capped at 10 docs, src1 at 5, everything else 3,
      // best-n_chars-first with doc_id tie-break
      Corpus.quotaSample(t(s, dir, "documents"), col("source"),
          col("n_chars").cast("double"), col("doc_id"),
          Map("src0" -> 10L, "src1" -> 5L), defaultQuota = 3L)
        .selectCols(Seq(col("doc_id"), col("source"), col("n_chars")))
        .sortBy(Seq(col("doc_id")))),

    "q68_interval_join" -> ((s, dir) => {
      // concurrent-session detection: which other users' sessions overlap
      // user 0's sessions in time (keyless bucketed interval join)
      val sessions = EventStreams.sessionize(t(s, dir, "events"), gapMinutes = 30)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val mine = sessions.filter(col("user_id") === 0)
      val theirs = sessions.filter(col("user_id") =!= 0)
      mine.intervalJoin(theirs, Seq(), Seq(),
          "s_start", "s_end", "s_start", "s_end", bucketWidth = 30L * 60 * 1000000)
        .selectCols(Seq(
          col("l.session_seq").cast("long").as("a_seq"),
          col("r.user_id").as("b_user"),
          col("r.session_seq").cast("long").as("b_seq")))
        .sortBy(Seq(col("a_seq"), col("b_user"), col("b_seq")))
    }),

    "q69_topk_per_group" -> ((s, dir) =>
      // bounded-heap top-k per group (the no-sort sibling of q67's window;
      // the SAME SQL-window oracle must hash-match)
      Corpus.topKPerGroupAgg(t(s, dir, "documents"), col("source"),
          col("doc_id"), col("n_chars"), k = 20)
        .sortBy(Seq(col("group"), col("rank")))),

    "q70_approx_percentiles" -> ((s, dir) =>
      // sketch-based percentiles: the 100 TB path next to q61's exact ones
      // (approx_percentile shuffles O(accuracy) summaries, never the
      // values). Approximate by construction => rows-only check; the
      // error-vs-exact bound is spec-pinned (CorpusSpec).
      t(s, dir, "documents")
        .selectCols(Seq(col("lang"), TextFns.tokenCount(col("text")).cast("long").as("n_tokens")))
        .aggregate(Seq(col("lang")), Seq(
          expr("approx_percentile(n_tokens, array(0.5, 0.9), 10000)").as("ps"),
          count(lit(1)).as("n")))
        .selectCols(Seq(col("lang"),
          element_at(col("ps"), 1).cast("double").as("p50a"),
          element_at(col("ps"), 2).cast("double").as("p90a"),
          col("n")))
        .sortBy(Seq(col("lang")))),

    "q71_stream_stream_join" -> ((s, dir) => {
      // TRUE watermarked stream-stream join (click -> purchase within 30
      // min, same user) drained through a memory sink. Inner-join output is
      // append-only and watermark-independent for a finite drain, so the
      // result equals the batch join — replayed verbatim by the oracle.
      val staged = java.nio.file.Files.createTempDirectory("graft_q71")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q71_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runStreamJoinSmoke(s, staged.toString, qn,
            Seq("user_id"), leftType = "click", rightType = "purchase",
            windowSeconds = 1800)
          .selectCols(Seq(
            col("l_user_id").as("user_id"),
            col("l_event_id").as("click_id"),
            col("r_event_id").as("purchase_id"),
            unix_micros(col("l_ts")).as("click_us"),
            unix_micros(col("r_ts")).as("purchase_us")))
          .sortBy(Seq(col("user_id"), col("click_id"), col("purchase_id")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q72_rollup" -> ((s, dir) =>
      // hierarchical subtotals in ONE aggregate pass (Expand, not n scans);
      // gid disambiguates subtotal levels from genuine NULL group values
      t(s, dir, "lineitem").rollupAgg(
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")))
        .sortBy(Seq(col("gid"), col("l_returnflag"), col("l_linestatus")))),

    "q73_pivot" -> ((s, dir) =>
      // long->wide reporting pivot with EXPLICIT pivot values (no extra
      // distinct-collect job); absent cells coalesced to 0 on both engines
      Relational.pivotCounts(t(s, dir, "documents"),
          Seq(col("source")), "lang", Seq("de", "en", "es", "fr", "zh"),
          col("n_chars"))
        .sortBy(Seq(col("source")))),

    "q74_unicode_nfc" -> ((s, dir) => {
      // NFC normalization; the corpus is ASCII-heavy, so a decomposed
      // "e"+combining-acute suffix is appended to give composition real
      // work — the full normalized string is hash-compared, and the
      // code-point count drops by exactly 1 per doc (the composed pair)
      val mixed = concat(col("text"), lit(" cafe\u0301"))
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          TextFns.normalizeUnicode(mixed).as("nfc_text"),
          length(mixed).cast("long").as("n_raw"),
          length(TextFns.normalizeUnicode(mixed)).cast("long").as("n_nfc")))
        .sortBy(Seq(col("doc_id")))
    }),

    "q75_url_domains" -> ((s, dir) => {
      // per-domain doc counts (the blocklist/quota profile). The corpus has
      // no URLs, so deterministic ones are built from real columns first —
      // the parse side (host + apex extraction) is what's under test
      val url = concat(lit("https://docs."), col("source"), lit(".Example.COM:8443/"),
        col("lang"), lit("/"), col("doc_id"), lit("?ref=x#top"))
      val host = TextFns.urlHost(url)
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), host.as("host"),
          TextFns.apexDomain(host).as("apex")))
        .aggregate(Seq(col("host"), col("apex")), Seq(count(lit(1)).as("n")))
        .sortBy(Seq(col("host")))
    }),

    "q76_quantize_embeddings" -> ((s, dir) =>
      // int8 storage quantization: per-vector [min,max] -> 256 levels. The
      // whole codec is replayed in SQL (mn/scale/codes/roundtrip error) —
      // floor(x+0.5) quantization is bit-identical cross-engine
      t(s, dir, "embeddings")
        .selectCols(Seq(col("vec_id"), col("embedding").as("v"),
          graft.plans.VectorExprs.quantizeInt8(col("embedding")).as("qz")))
        .withColumn("dq", graft.plans.VectorExprs.dequantizeInt8(col("qz")))
        .selectCols(Seq(
          col("vec_id"),
          col("qz.mn").as("mn"),
          col("qz.scale").as("scale"),
          aggregate(col("qz.q"), lit(0L), (acc, x) => acc + x).as("qsum"),
          element_at(col("qz.q"), 1).cast("long").as("q0"),
          element_at(col("qz.q"), 17).cast("long").as("q16"),
          round(aggregate(zip_with(col("v"), col("dq"), (a, b) => abs(a - b)),
            lit(0.0), (acc, x) => greatest(acc, x)), 6).as("max_err")))
        .sortBy(Seq(col("vec_id")))),

    "q77_approx_distinct" -> ((s, dir) =>
      // HLL++ distinct-token cardinality per lang: the sketch shuffles a
      // few KB per group instead of the token set (the 100 TB path next to
      // the exact countDistinct, which shuffles every distinct token).
      // Sketches differ across engines by construction => rows-only; the
      // <=5% relative-error bound vs exact is spec-pinned (CorpusSpec).
      t(s, dir, "documents")
        .selectCols(Seq(col("lang"), explode(TextFns.tokens(col("text"))).as("tok")))
        .aggregate(Seq(col("lang")), Seq(
          approx_count_distinct(col("tok"), rsd = 0.02).as("approx_toks"),
          countDistinct(col("tok")).as("exact_toks")))
        .sortBy(Seq(col("lang")))),

    "q78_corr_stats" -> ((s, dir) =>
      // Pearson corr / covariance from exact decimal co-moments — NOT the
      // streaming corr aggregate, whose float accumulation is
      // partitioning-dependent and never hash-matchable
      t(s, dir, "lineitem").corrStats(Seq(col("l_returnflag")),
          col("l_quantity"), col("l_extendedprice"))
        .selectCols(Seq(col("l_returnflag"), col("n"),
          round(col("corr"), 6).as("corr"),
          round(col("covar_samp"), 4).as("covar_samp"),
          round(col("std_x"), 6).as("std_x"),
          round(col("std_y"), 4).as("std_y")))
        .sortBy(Seq(col("l_returnflag")))),

    "q79_kmeans_lloyd" -> ((s, dir) => {
      // one exact distributed Lloyd iteration from the deterministic
      // first-8 init: nearest-centroid assignment + decimal per-dim means,
      // every number replayed in SQL (the hash-matchable sibling of the
      // sampled k-means seeding behind IVF)
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val init = e.filterCol(col("vec_id") < 8)
        .selectCols(Seq(col("vec_id").as("cid"), col("embedding").as("cv")))
      Similarity.kmeansLloydStep(corpus, init)
        .withColumn("c", round(col("c"), 6))
        .sortBy(Seq(col("cid"), col("dim")))
    }),

    "q80_bigram_lift" -> ((s, dir) =>
      // top collocations by lift (= exp(PMI); same ranking, exact
      // cross-engine arithmetic — ln would not hash-match)
      Corpus.bigramLift(t(s, dir, "documents"),
          TextFns.tokens(col("text")), minCount = 5L, k = 50)
        .sortBy(Seq(col("rank")))),

    "q81_session_window" -> ((s, dir) =>
      // Spark's BUILT-IN session_window (gap-merged event-time windows) —
      // the declarative sibling of q41's window-function sessionize and
      // q42's custom-state streaming form; one shuffle on (user_id)
      t(s, dir, "events")
        .aggregate(
          Seq(col("user_id"), session_window(col("ts"), "30 minutes").as("sw")),
          Seq(count(lit(1)).as("n_events")))
        .selectCols(Seq(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events")))
        .sortBy(Seq(col("user_id"), col("start_us")))),

    "q82_systematic_sample" -> ((s, dir) =>
      // weighted systematic sampling (data-mixing composition step): one
      // kept row per 1000 weight units per source, selection probability
      // proportional to n_chars. No RNG — the running-sum crossing rule is
      // exact cross-engine, unlike df.sample's partition-layout dependence
      t(s, dir, "documents")
        .systematicSample(col("source"), col("doc_id"), col("n_chars"), 1000L)
        .selectCols(Seq(col("doc_id"), col("source"), col("n_chars")))
        .sortBy(Seq(col("doc_id")))),

    "q83_strip_boilerplate" -> ((s, dir) => {
      // boilerplate LINE removal: the corpus has no newlines, so multi-line
      // docs are built deterministically from real columns (body + an
      // alternating per-source footer + a global footer) — same precedent
      // as q74/q75. Lines shared by >= 10 distinct docs vanish everywhere:
      // even docs lose both footers, odd docs keep their unique contact line
      val doc = concat(col("text"), lit("\n"),
        when(col("doc_id") % 2 === 0,
          concat(lit("subscribe to "), col("source"), lit(" weekly")))
          .otherwise(concat(lit("contact "), col("doc_id"))),
        lit("\n"), lit("all rights reserved"))
      Corpus.stripBoilerplate(
          t(s, dir, "documents").withColumn("doc", doc),
          col("doc_id"), col("doc"), minDocs = 10L)
        .sortBy(Seq(col("id")))
    }),

    "q84_rarity_score" -> ((s, dir) =>
      // unigram-LM rarity filtering signal (integer-exact perplexity
      // surrogate): mean inverse token probability, scaled floor division
      Corpus.rarityScore(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")))
        .sortBy(Seq(col("id")))),

    "q85_contamination_bloom" -> ((s, dir) =>
      // q59's contamination with the Bloom-prefiltered corpus side — the
      // 100 TB shape (the bloom has no false negatives and the exact semi
      // join removes false positives, so the answer is identical to q59's)
      Corpus.contaminationBloom(t(s, dir, "documents"), col("doc_id"), col("text"),
          pmod(col("doc_id"), lit(97)) === 0, ngram = 8, fpp = 0.01)
        .sortBy(Seq(col("id")))),

    "q86_edit_distance_pairs" -> ((s, dir) =>
      // fuzzy entity dedup over short strings: distinct-first + complete
      // length-band blocking, levenshtein <= 3 on candidates only
      Dedup.editDistancePairs(t(s, dir, "part"), col("p_name"), maxDist = 3)
        .sortBy(Seq(col("sa"), col("sb")))),

    "q87_frequency_spectrum" -> ((s, dir) =>
      // Zipf profile: how many distinct terms occur exactly k times
      Corpus.frequencySpectrum(t(s, dir, "documents"), TextFns.tokens(col("text")))
        .sortBy(Seq(col("occurrences")))),

    "q88_incremental_dedup" -> ((s, dir) => {
      // append-only ingestion: the second half of events dedups against the
      // key history of the first half (key = user|type|day), then
      // keep-first-within-batch by event_id. The split point is count/2
      // (event_ids are dense from 0), so the query is sf-agnostic
      val e = t(s, dir, "events")
      val mid = e.count() / 2
      val key = concat_ws("|", col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd"))
      val seen = e.filterCol(col("event_id") < mid)
        .selectCols(Seq(key.as("k"))).distinct()
      Dedup.incrementalDedup(e.filterCol(col("event_id") >= mid), key,
          Seq(col("event_id")), seen)
        .selectCols(Seq(col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value")))
        .sortBy(Seq(col("event_id")))
    }),

    "q89_winsorize" -> ((s, dir) =>
      // per-group p1/p99 outlier clipping; clipping is pure selection, so
      // row values are engine-exact (percentile interp pinned by q61)
      t(s, dir, "lineitem")
        .winsorize(Seq(col("l_returnflag")), col("l_extendedprice"), 0.01, 0.99)
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice").as("x"),
          round(col("p_lo"), 6).as("p_lo"), round(col("p_hi"), 6).as("p_hi"),
          round(col("clipped"), 6).as("clipped")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    "q90_zorder" -> ((s, dir) =>
      // Morton key over (partkey, suppkey): the 2-D layout key that
      // layoutZOrder range-partitions on before a stats-aligned write
      t(s, dir, "lineitem")
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          Relational.zorderValue(col("l_partkey"), col("l_suppkey"), 11).as("z")))
        .sortBy(Seq(col("z"), col("l_orderkey"), col("l_linenumber")))),

    "q91_pii_counts" -> ((s, dir) => {
      // link/PII density profile; corpus has no URLs or emails, so both are
      // injected deterministically from real columns (q75 precedent)
      val txt = concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" visit https://docs."), col("source"), lit(".example.com/x now")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.org")))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), TextFns.urlCount(txt).as("n_urls"),
          TextFns.emailCount(txt).as("n_emails")))
        .sortBy(Seq(col("doc_id")))
    }),

    "q92_truncate_tokens" -> ((s, dir) =>
      // context-budget cut at 24 tokens (most docs are longer)
      Corpus.truncateTokens(t(s, dir, "documents"), col("doc_id"), col("text"), 24)
        .withColumn("was_truncated", col("was_truncated").cast("long"))
        .sortBy(Seq(col("id")))),

    "q93_deterministic_shuffle" -> ((s, dir) =>
      // reproducible training order: multiplicative-hash (shard, pos) —
      // rerun/engine/partition-layout independent, unlike orderBy(rand())
      Corpus.deterministicShuffle(t(s, dir, "documents"), col("doc_id"), nShards = 16)
        .selectCols(Seq(col("doc_id"), col("shard"), col("pos")))
        .sortBy(Seq(col("shard"), col("pos")))),

    "q94_hashed_tfidf" -> ((s, dir) =>
      // hashing-trick featurization into 64 buckets, portable FNV hashing
      // so the full sparse vector (incl. collision sums) is SQL-replayable
      Corpus.hashedTfIdf(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), dim = 64, portable = true)
        .sortBy(Seq(col("id"), col("bucket")))),

    "q95_normalize_minmax" -> ((s, dir) =>
      // per-group [0,1] feature scaling; three IEEE ops on exact inputs =>
      // bit-identical, no rounding slack anywhere
      t(s, dir, "lineitem")
        .normalizeMinMax(Seq(col("l_returnflag")), col("l_extendedprice"))
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("v_min"), col("v_max"), col("normalized")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber")))),

    "q99_bigram_surprise" -> ((s, dir) =>
      // bigram-LM fluency signal (conditional sibling of q84): mean scaled
      // inverse transition probability, add-one smoothed, integer-exact
      Corpus.bigramSurprise(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")))
        .sortBy(Seq(col("id")))),

    "q100_pagerank" -> ((s, dir) => {
      // entity-centrality quality prior (the CommonCrawl recipe weights
      // domains by link centrality before sampling): 3 integer-exact
      // damped rounds over the customer -> supplier purchase graph
      // (supplier ids offset by 10^6 so the node id space is disjoint)
      val o = t(s, dir, "orders").selectCols(Seq(col("o_orderkey"), col("o_custkey")))
      val l = t(s, dir, "lineitem").selectCols(Seq(col("l_orderkey"), col("l_suppkey")))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .selectCols(Seq(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst")))
        .distinct()
      graft.operators.Graph.pagerank(edges, rounds = 3)
        .sortBy(Seq(col("id")))
    }),

    "q101_mixture_resample" -> ((s, dir) =>
      // DoReMi-style language re-mixing: en down to 60%, zh up from ~4%;
      // threshold mode (the 100 TB shape) — no window, no sort
      Corpus.mixtureResample(t(s, dir, "documents"), col("doc_id"), col("lang"),
          Map("en" -> 600, "de" -> 150, "fr" -> 100, "es" -> 100, "zh" -> 50))
        .selectCols(Seq(col("id"), col("domain"), col("epoch")))
        .sortBy(Seq(col("id"), col("epoch")))),

    "q102_pq_encode" -> ((s, dir) => {
      // 64-dim -> 8 sub-bytes: codebook j = subvectors j of the first 16
      // embeddings (deterministic, the q65 trick; kmeansCentroids is the
      // production seeding path)
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val cb = e.filterCol(col("vec_id") < 16)
        .selectCols(Seq(col("vec_id").as("cid"),
          explode(sequence(lit(0), lit(7))).as("sub"), col("embedding")))
        .selectCols(Seq(col("sub"), col("cid"),
          slice(col("embedding"), col("sub") * 8 + 1, lit(8)).as("cv")))
      Similarity.pqEncode(corpus, cb, m = 8, subDims = 8)
        .withColumn("dist_sq", round(col("dist_sq"), 6))
        .sortBy(Seq(col("id"), col("sub")))
    }),

    "q103_pq_adc_topk" -> ((s, dir) => {
      // full-precision queries (vec_id < 4) against the q102 codes: the
      // RAM-resident ANN shape — m LUT lookups per corpus vector, no
      // vector arithmetic in the scan
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val cb = e.filterCol(col("vec_id") < 16)
        .selectCols(Seq(col("vec_id").as("cid"),
          explode(sequence(lit(0), lit(7))).as("sub"), col("embedding")))
        .selectCols(Seq(col("sub"), col("cid"),
          slice(col("embedding"), col("sub") * 8 + 1, lit(8)).as("cv")))
      val codes = Similarity.pqEncode(corpus, cb, m = 8, subDims = 8)
      val queries = e.filterCol(col("vec_id") < 4)
        .selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      Similarity.pqAdcTopK(codes, cb, queries, m = 8, subDims = 8, k = 5)
        .withColumn("adist", round(col("adist"), 6))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q104_bm25" -> ((s, dir) =>
      // lexical retrieval: BM25 top-50 for a 4-term query; rational
      // (ln-free) idf — the q80 lift trick — so every step replays exactly
      // in SQL. One narrow tf pass + a 1-row broadcast stats aggregate +
      // TakeOrderedAndProject: no corpus shuffle at any scale
      Retrieval.bm25TopK(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), Seq("spark", "join", "window", "hash"),
          k = 50)
        .withColumn("score", round(col("score"), 6))
        .sortBy(Seq(col("rank")))),

    "q105_rrf_hybrid" -> ((s, dir) => {
      // hybrid retrieval: fuse the q104 lexical ranking with a semantic
      // (exact cosine) ranking for doc 0's embedding via reciprocal-rank
      // fusion — rank-only fusion, no score calibration; both inputs are
      // top-100 truncated so the fuse join is between two 100-row frames
      val lex = Retrieval.bm25TopK(t(s, dir, "documents"), col("doc_id"),
        TextFns.tokens(col("text")), Seq("spark", "join", "window", "hash"),
        k = 100)
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val sem = Similarity.bruteForceTopK(corpus, corpus.filterCol(col("id") === 0), k = 100)
        .selectCols(Seq(col("neighbor_id").as("id"), col("rank")))
      Retrieval.rrfFuse(lex.selectCols(Seq(col("id"), col("rank"))), sem, c = 60, k = 25)
        .withColumn("rrf", round(col("rrf"), 6))
        .withColumn("rank_a", coalesce(col("rank_a"), lit(-1L)))
        .withColumn("rank_b", coalesce(col("rank_b"), lit(-1L)))
        .sortBy(Seq(col("rank")))
    }),

    "q106_semdedup" -> ((s, dir) => {
      // SemDeDup: k-means cells (deterministic first-8 seeding for the
      // oracle; kmeansFit is the production path) bound the pairwise stage
      // to within-cell compares — n^1.5 total instead of n^2, the
      // embedding-space sibling of LSH banding
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val cents = e.filterCol(col("vec_id") < 8)
        .selectCols(Seq(col("vec_id").as("cid"), col("embedding").as("cv")))
      Dedup.semanticDedup(corpus, col("id"), col("v"), cents, threshold = 0.35)
        .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
        .sortBy(Seq(col("id")))
    }),

    "q140_shard_manifest" -> ((s, dir) => {
      // training-job handoff artifact: per shard of the deterministic
      // shuffle, doc/token totals and id bounds — what the loader reads
      // before touching any data file
      val docs = t(s, dir, "documents")
      Corpus.deterministicShuffle(docs, col("doc_id"), nShards = 16)
        .join(docs.selectCols(Seq(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))), "doc_id")
        .aggregate(Seq(col("shard")), Seq(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id")))
        .sortBy(Seq(col("shard")))
    }),

    "q141_pack_report" -> ((s, dir) => {
      // packing-efficiency summary over q60's layout: sequence count,
      // boundary-spanning docs, fill rate — the "how much context window
      // is wasted" number a packing parameter sweep optimizes
      val packed = Corpus.packSequences(t(s, dir, "documents"), col("doc_id"),
        TextFns.tokenCount(col("text")), ctxLen = 512, bucketSize = 64)
      packed.aggregate(Seq.empty, Seq(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("seq_offset") + col("n_tokens") > 512L, 1L).otherwise(0L))
            .as("n_spanning")))
        .withColumn("n_seqs",
          floor((col("total_tokens") - 1).cast("double") / 512).cast("long") + 1L)
        .withColumn("fill_rate",
          round(col("total_tokens").cast("double")
            / (col("n_seqs") * 512L).cast("double"), 9))
    }),

    "q142_mutual_knn_ivf" -> ((s, dir) => {
      // q117's SCALE PATH, driver-proven: the same mutual-kNN graph built
      // from the cell-partitioned IVF join instead of a whole-corpus
      // broadcast. nprobe = nlist makes IVF exhaustive (every pair scored
      // exactly once), so the result must EQUAL q117 — same oracle — while
      // broadcastQueries = false keeps both join sides hash-partitioned on
      // cell: nothing corpus-sized is ever collected or broadcast
      // (ExplainAuditSpec pins the plan shape).
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      Similarity.mutualPairs(Similarity.ivfTopK(corpus, corpus,
          nlist = 16, nprobe = 16, k = 10, broadcastQueries = false))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q143_mutual_knn_ivf_recall" -> ((s, dir) => {
      // the APPROXIMATE mutual-kNN config (nprobe 4 of 16) measured against
      // the exact graph — q46's recall pattern lifted to the pair level.
      // Fixture quantizer (first-16 cells, as q38/q46): the pruned all-pairs
      // kNN, the mutual filter, and the exact graph all replay in DuckDB,
      // so the pair recall is an independent oracle (r10; the r9 pin is
      // gone). The k-means-seeded config stays covered by q142's exact
      // sibling and SimilaritySpec's recall bounds.
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val cents = corpus.filterCol(col("id") < 16)
        .selectCols(Seq(col("id").cast("int").as("cell"), col("v").as("cv")))
      val approx = Similarity.mutualPairs(Similarity.ivfTopK(corpus, corpus,
        nlist = 16, nprobe = 4, k = 10, broadcastQueries = false,
        centroids = Some(cents)))
        .selectCols(Seq(col("id_a"), col("id_b")))
      val exact = Similarity.mutualPairs(Similarity.bruteForceTopK(corpus, corpus, k = 10))
        .selectCols(Seq(col("id_a"), col("id_b")))
      val nHit = exact.join(approx, Seq("id_a", "id_b"), "left_semi")
        .aggregate(Seq.empty, Seq(count(lit(1)).as("n_hit")))
      val nExact = exact.aggregate(Seq.empty, Seq(count(lit(1)).as("n_exact")))
      val nApprox = approx.aggregate(Seq.empty, Seq(count(lit(1)).as("n_approx")))
      nExact.crossJoin(nApprox).crossJoin(nHit)
        .withColumn("pair_recall",
          round(col("n_hit").cast("double") / col("n_exact"), 6))
    }),

    "q144_clean_corpus_lsh" -> ((s, dir) =>
      // q51's SCALE PATH, driver-proven: the composed cleaning pipeline with
      // candidate pairs from MinHash+LSH (linear shuffle, banded equi-join)
      // instead of the exact inverted index. The LSH output is
      // exact-Jaccard-verified with P[miss] ~ 5e-9 at the default banding
      // (q33 hash-matches the exact pair set on this data), so the full
      // composition replays q51's oracle verbatim.
      //
      // PROFILE NOTE (expected small-scale crossover — do not "fix"
      // backwards): at sf0.1 this is SLOWER than exact q51 (r5 bench:
      // 10.2 s vs 6.5 s) because computing 128 minhashes over every gated
      // doc's full text dominates while the exact pair join is still cheap.
      // The cost that matters is the SCALING: BENCH_r* `scale` shows
      // clean_corpus_lsh ~flat across 25k->100k docs (3.4->3.5 s, minhash
      // is linear per doc) while the exact families grow quadratically
      // (emb_cosine_pairs 0.6->5.9 s). LSH wins exactly where it is needed.
      graft.operators.Pipeline.cleanCorpus(t(s, dir, "documents"), col("doc_id"), col("text"),
          pairFn = (df, idc, txt, th) => Dedup.minhashLshPairs(df, idc, txt, threshold = th))
        .sortBy(Seq(col("id")))),

    "q145_image_decode" -> ((s, dir) => {
      // REAL image codec round trip (javax.imageio, pure JDK): synthesize a
      // deterministic gray test-pattern PNG per doc (pixel = (doc_id*31 +
      // x*7 + y*13) % 256, dims varying per doc), DECODE it, nearest-
      // neighbor RESIZE to 8x8, decode that too. PNG is lossless and the
      // resample is integer arithmetic, so the reported dims / channel
      // counts / exact pixel sums replay as plain integer math in the
      // oracle — the driver hash pins a real encode->decode->resample
      // chain, not a stub. Codec calls are UDFs by design: a codec is a
      // black-box native-style call, everything around it stays columnar.
      val withPng = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(8) + pmod(col("doc_id"), lit(9))).cast("int").as("w"),
          (lit(8) + pmod(col("doc_id"), lit(7))).cast("int").as("h")))
        .withColumn("png", Multimodal.synthGrayPngUdf(col("doc_id"), col("w"), col("h")))
      withPng
        .withColumn("info", Multimodal.decodeImage(col("png")))
        .withColumn("rinfo", Multimodal.decodeImage(Multimodal.resizeImageNN(8, 8)(col("png"))))
        .selectCols(Seq(
          col("doc_id").as("id"),
          col("info._1").cast("long").as("width"),
          col("info._2").cast("long").as("height"),
          col("info._3").cast("long").as("channels"),
          col("info._4").as("pix_sum"),
          round(col("info._4").cast("double") / (col("w") * col("h")), 6).as("mean_px"),
          col("rinfo._4").as("r_pix_sum"),
          round(col("rinfo._4").cast("double") / 64.0, 6).as("r_mean_px")))
        .sortBy(Seq(col("id")))
    }),

    "q146_audio_decode" -> ((s, dir) => {
      // REAL audio codec round trip (javax.sound.sampled, pure JDK): a
      // deterministic 16-bit PCM mono WAV per doc (sample(i) = (doc_id*31
      // + i*7) % 65536 - 32768, length varying per doc), DECODED back to
      // exact sample counts / rates / sums. PCM WAV is lossless, so every
      // reported number replays as integer arithmetic in the oracle —
      // q145's pattern for the audio modality. abs_sum/mean_abs is the
      // energy proxy an audio quality gate thresholds on.
      val withWav = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(64) + pmod(col("doc_id"), lit(41))).cast("int").as("n")))
        .withColumn("wav", Multimodal.synthPcmWavUdf(col("doc_id"), col("n")))
      withWav
        .withColumn("info", Multimodal.decodeAudio(col("wav")))
        .selectCols(Seq(
          col("doc_id").as("id"),
          col("info._1").as("n_samples"),
          col("info._2").cast("long").as("sample_rate"),
          col("info._3").cast("long").as("channels"),
          col("info._4").as("sample_sum"),
          col("info._5").as("abs_sum"),
          // mean over info._6 (total interleaved samples), not _1 (frames):
          // equal for this mono clip, but only _6 stays correct for stereo
          round(col("info._5").cast("double") / col("info._6"), 6).as("mean_abs")))
        .sortBy(Seq(col("id")))
    }),

    "q147_winsorize_approx" -> ((s, dir) =>
      // q89's 100 TB configuration surfaced as its own driver/bench entry:
      // approximate = true swaps the exact per-group percentile buffer for
      // percentile_approx (a mergeable sketch — partial aggregation, no
      // whole-group buffering on one task). Sketch cut points are
      // engine-specific => rows-only; RelationalSpec bounds the sketch's
      // deviation against the exact bounds, and BENCH_r* shows the
      // exact-vs-sketch cost gap next to q89.
      t(s, dir, "lineitem")
        .winsorize(Seq(col("l_returnflag")), col("l_extendedprice"), 0.01, 0.99,
          approximate = true)
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice").as("x"),
          round(col("p_lo"), 6).as("p_lo"), round(col("p_hi"), 6).as("p_hi"),
          round(col("clipped"), 6).as("clipped")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("x")))),

    "q148_robust_scale_approx" -> ((s, dir) =>
      // q115's 100 TB configuration (approximate median/MAD via sketch);
      // rows-only for the same reason as q147
      t(s, dir, "lineitem")
        .robustScale(Seq(col("l_returnflag")), col("l_extendedprice"),
          approximate = true)
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice").cast("double").as("x"),
          round(col("v_med"), 6).as("v_med"),
          round(col("v_mad"), 6).as("v_mad"),
          round(col("scaled"), 6).as("scaled")))
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("x")))),

    "q149_video_frames" -> ((s, dir) => {
      // REAL video frame sampling (javax.imageio animated GIF, pure JDK):
      // a deterministic multi-frame clip per doc (frame f pixel(x,y) =
      // (doc_id*31 + f*17 + x*7 + y*13) % 256, frame count and dims varying
      // per doc), demuxed back with every 2nd frame decoded to exact pixel
      // sums. GIF LZW is lossless on the indexed raster, so the whole
      // encode->demux->sample->decode chain replays as integer arithmetic
      // in the oracle — q145/q146's pattern for the video modality (and the
      // replacement for the frame-sampling stub earlier rounds carried).
      val withGif = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(6) + pmod(col("doc_id"), lit(5))).cast("int").as("w"),
          (lit(6) + pmod(col("doc_id"), lit(4))).cast("int").as("h"),
          (lit(3) + pmod(col("doc_id"), lit(4))).cast("int").as("nf")))
        .withColumn("gif",
          Multimodal.synthAnimGifUdf(col("doc_id"), col("w"), col("h"), col("nf")))
      withGif
        .withColumn("fr", explode(Multimodal.sampleFrameInfos(2)(col("gif"))))
        .selectCols(Seq(
          col("doc_id").as("id"),
          col("fr._1").cast("long").as("frame_idx"),
          col("fr._2").cast("long").as("width"),
          col("fr._3").cast("long").as("height"),
          col("fr._4").as("pix_sum"),
          round(col("fr._4").cast("double") / (col("w") * col("h")), 6).as("mean_px")))
        .sortBy(Seq(col("id"), col("frame_idx")))
    }),

    "q150_bucketed_join" -> ((s, dir) => {
      // Bucketed co-located join — the 100 TB storage-layout story as a
      // driver fact, not just a spec fact: both tables are written
      // hash-bucketed by the join key (Engine.writeBucketed pre-pays the
      // exchange ONCE at ingest), and the join + per-key aggregation then
      // run with ZERO shuffle exchanges (ExplainAuditSpec asserts the
      // Exchange-free plan; the merge hint pins SMJ so the bucketed scan's
      // partitioning is what the planner uses, not a size-based broadcast
      // that would mask it at this sf). The write cost is deliberately
      // inside the timed query: pre-paying it is the trade being measured.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf"
      Engine.writeBucketed(
        t(s, dir, "orders").selectCols(Seq(col("o_orderkey"), col("o_orderpriority"))),
        "graft_orders_b", Seq("o_orderkey"), 8, Some(s"$scratch/orders_b"))
      Engine.writeBucketed(
        t(s, dir, "lineitem").selectCols(Seq(
          col("l_orderkey"), col("l_extendedprice"))),
        "graft_lineitem_b", Seq("l_orderkey"), 8, Some(s"$scratch/lineitem_b"))
      bucketedRevenue(s).sortBy(Seq(col("o_orderkey")))
    }),

    "q151_partition_pruned_scan" -> ((s, dir) => {
      // Hive-partitioned layout + partition pruning as a driver fact:
      // events rewritten partitionBy(event_type); the equality filter on
      // the partition column prunes whole directories at planning time
      // (PartitionFilters in the scan, zero I/O for the other four types —
      // asserted in ExplainAuditSpec). At 100 TB this is the difference
      // between scanning a store and scanning 1/5th of it.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/events_by_type"
      Engine.writeParquetPartitioned(
        t(s, dir, "events").selectCols(Seq(
          col("event_id"), col("user_id"), col("value"), col("event_type"))),
        scratch, Seq("event_type"))
      s.read.parquet(scratch)
        .filterCol(col("event_type") === "click")
        .aggregate(Seq(col("user_id")), Seq(
          count(lit(1)).as("n_click"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value")))
        .sortBy(Seq(col("user_id")))
    }),

    "q152_udaf_sql" -> ((s, dir) => {
      // SURVEY §2.5's deferred extension tier made user-facing: the typed
      // partial-merge Aggregators (bounded top-k heap; decimal-exact
      // Pearson corr) registered as SQL UDAFs via functions.udaf +
      // spark.udf.register (graft.functions.Udafs — the extensions hook
      // covers scalar builders only) and exercised through plain
      // spark.sql. Both aggregate map-side to a bounded buffer per group
      // before the shuffle: shuffle volume O(groups), not O(rows).
      graft.functions.Udafs.register(s)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q152")
      s.sql("""
        WITH g AS (
          SELECT l_returnflag,
                 graft_top3(l_orderkey, l_extendedprice) AS top3,
                 graft_corr_exact(l_quantity, l_extendedprice) AS corr
          FROM lineitem_q152
          GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(t.i + 1 AS BIGINT) AS rank,
               t.s.id AS top_orderkey, t.s.score AS top_price,
               round(corr, 6) AS corr
        FROM g LATERAL VIEW posexplode(top3) t AS i, s
        ORDER BY l_returnflag, rank""")
    }),

    "q153_source_roundtrip" -> ((s, dir) => {
      // Source/sink coverage as a driver fact: documents written to ORC
      // and JSON-lines (Engine.writeOrc/writeJson), read back through
      // Engine.readOrc/readJson, and emitted verbatim — the hash match
      // against the parquet original proves BOTH round trips lossless
      // (ids, multi-byte text, short strings), so a lake standardized on
      // either format gets identical engine semantics. Parquet/CSV are
      // covered elsewhere (every query reads parquet; read-csv is the
      // reference-parity path in SourcesSpec).
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf"
      val docs = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), col("text"), col("lang")))
      Engine.writeOrc(docs, s"$scratch/docs_orc")
      Engine.writeJson(docs, s"$scratch/docs_json")
      val orc = Engine.readOrc(s, s"$scratch/docs_orc")
        .selectCols(Seq(col("doc_id"), col("text").as("text_orc")))
      val js = Engine.readJson(s, s"$scratch/docs_json")
        .selectCols(Seq(col("doc_id").cast("long").as("doc_id"),
          col("text").as("text_json"), col("lang").as("lang_json")))
      orc.join(js, Seq("doc_id"))
        .sortBy(Seq(col("doc_id")))
    }),

    "q154_dynamic_partition_pruning" -> ((s, dir) => {
      // Dynamic partition pruning as a driver fact: the fact table is
      // partitioned on event_type (q151's layout, own directory), the dim
      // side carries the selective filter (category = 'engagement'), and
      // the partition values to scan are only known AFTER the dim filter
      // runs — Spark plants a DPP subquery on the scan
      // (dynamicpruningexpression, asserted in ExplainAuditSpec) and skips
      // the other categories' directories at runtime. At 100 TB this is
      // partition pruning for the join-shaped filters static pruning
      // (q151) cannot see.
      import s.implicits._
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/events_dpp"
      Engine.writeParquetPartitioned(
        t(s, dir, "events").selectCols(Seq(
          col("event_id"), col("user_id"), col("value"), col("event_type"))),
        scratch, Seq("event_type"))
      // the dim must be a real SCAN with a surviving Filter: a literal
      // LocalRelation is constant-folded before the PartitionPruning rule
      // runs, leaving no selective predicate for DPP to latch onto
      Engine.writeParquet(Seq(
        ("click", "engagement"), ("view", "engagement"),
        ("purchase", "commerce"), ("signup", "account"), ("error", "ops"))
        .toDF("event_type", "category"), s"$scratch-dim")
      val dim = s.read.parquet(s"$scratch-dim")
      s.read.parquet(scratch)
        .join(dim.filterCol(col("category") === "engagement"), Seq("event_type"))
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value")))
        .sortBy(Seq(col("event_type")))
    }),

    "q155_streaming_partitioned_ingest" -> ((s, dir) => {
      // TRUE streaming run joining the streaming surface to the layout
      // story: a file-source stream drains events through an exactly-once
      // FileStreamSink into an event_type-partitioned parquet layout
      // (Trigger.AvailableNow + checkpoint = the incremental-backfill
      // invocation that tails a landing zone at 100 TB), then the ingested
      // store is read back and aggregated — the hash match proves the
      // streamed layout carries exactly the source rows.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/stream_ingest"
      EventStreams.runPartitionedIngest(s, s"$dir/events.parquet",
        s"$scratch/data", s"$scratch/ckpt", Seq("event_type"),
        Seq("event_id", "user_id", "value", "event_type"))
      s.read.parquet(s"$scratch/data")
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value")))
        .sortBy(Seq(col("event_type")))
    }),

    "q156_tpch_q11" -> ((s, dir) => {
      // TPC-H Q11 shape (Q3/Q18 are q124/q128): per-group value kept only
      // when it beats a fraction of the GLOBAL total — the scalar-subquery
      // HAVING. Both the per-part values and the 1-row total come from the
      // same decimal-exact aggregate; the total broadcasts (no collect),
      // so the threshold is evaluated where the groups live.
      val l = t(s, dir, "lineitem")
      val value = l.aggregate(Seq(col("l_partkey")), Seq(
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("value")))
      val total = l.aggregate(Seq.empty, Seq(
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("total")))
      value.crossJoin(broadcast(total))
        .filterCol(col("value") > col("total") * 0.0005)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .selectCols(Seq(col("p_partkey"), col("p_name"), col("value")))
        .sortExprs(Seq(col("value").desc, col("p_partkey").asc))
    }),

    "q157_tpch_q4" -> ((s, dir) => {
      // TPC-H Q4 shape: order-priority checking — EXISTS becomes a
      // left-semi join with a cross-side predicate (an R-flagged line
      // shipped > 60 days after the order date). The semi join keeps one
      // row per qualifying order with no dedup pass, and the count
      // shuffles 5 priority groups, not orders.
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_returnflag") === "R" &&
            col("l_shipdate").cast("date") >
              date_add(col("o_orderdate").cast("date"), 60),
          "left_semi")
        .aggregate(Seq(col("o_orderpriority")), Seq(
          count(lit(1)).as("n_orders")))
        .sortBy(Seq(col("o_orderpriority")))
    }),

    "q158_tpch_q10" -> ((s, dir) => {
      // TPC-H Q10 shape: returned-item revenue per customer over one
      // order-date quarter, nation name resolved through a broadcast dim.
      // Revenue is decimal-exact; c_acctbal passes through untouched so
      // both engines emit the identical stored double.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filterCol(col("o_orderdate").cast("date") >=
            lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("o_orderdate").cast("date") <
            lit(java.sql.Date.valueOf("1997-04-01")))
      val l = t(s, dir, "lineitem").filterCol(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .aggregate(Seq(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name")), Seq(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double"), 4).as("revenue")))
        .sortExprs(Seq(col("revenue").desc, col("c_custkey").asc))
        .limitOffset(0, Some(20))
    }),

    "q159_tpch_q16" -> ((s, dir) => {
      // TPC-H Q16 shape: supplier diversity per (brand, size) — the
      // part/supplier association distilled from lineitem (distinct pairs,
      // partial-aggregated before the shuffle), complaint suppliers
      // removed by a broadcast left-anti join, then COUNT(DISTINCT
      // suppkey) per group (NOT IN is safe as anti here: s_suppkey is
      // never null).
      val assoc = t(s, dir, "lineitem")
        .selectCols(Seq(col("l_partkey"), col("l_suppkey"))).distinctAll
      val negSupp = t(s, dir, "supplier")
        .filterCol(col("s_acctbal") < 0.0)
        .selectCols(Seq(col("s_suppkey")))
      val p = t(s, dir, "part")
        .filterCol(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 7, 14, 23, 36, 45))
        .selectCols(Seq(col("p_partkey"), col("p_brand"), col("p_size")))
      assoc.join(broadcast(negSupp),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .aggregate(Seq(col("p_brand"), col("p_size")), Seq(
          countDistinct(col("l_suppkey")).as("supplier_cnt")))
        .sortExprs(Seq(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_size").asc))
    }),

    "q160_tpch_q15" -> ((s, dir) => {
      // TPC-H Q15 shape (Q18 is q128): top supplier by quarterly revenue —
      // argmax via scalar subquery, ties INCLUDED (the reason this is not
      // a LIMIT 1: equality against the broadcast 1-row max keeps every
      // tied supplier). Revenue and max come off the same decimal-exact
      // aggregate, so the double equality compares identical bits.
      val rev = t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date") >=
            lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_shipdate").cast("date") <
            lit(java.sql.Date.valueOf("1997-04-01")))
        .aggregate(Seq(col("l_suppkey")), Seq(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("total_revenue")))
      val mx = rev.aggregate(Seq.empty, Seq(max(col("total_revenue")).as("m")))
      rev.crossJoin(broadcast(mx))
        .filterCol(col("total_revenue") === col("m"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .selectCols(Seq(col("s_suppkey"), col("s_name"),
          round(col("total_revenue"), 4).as("total_revenue")))
        .sortBy(Seq(col("s_suppkey")))
    }),

    "q161_tpch_q21" -> ((s, dir) => {
      // TPC-H Q21 shape: suppliers who were the SOLE R-flag supplier on a
      // multi-supplier order — EXISTS(other supplier on the order) as a
      // left-semi self-join and NOT EXISTS(other R-flag supplier) as a
      // left-anti self-join. Both self-joins shuffle on the same
      // l_orderkey key, so the exchange is planned once; the supplier dim
      // broadcasts.
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val l1 = l.filterCol(col("l_returnflag") === "R")
        .selectCols(Seq(col("l_orderkey"), col("l_suppkey")))
      val others = l.selectCols(Seq(
        col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey")))
      val othersR = l.filterCol(col("l_returnflag") === "R")
        .selectCols(Seq(
          col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey")))
      l1.join(others,
          col("l_orderkey") === col("o2_orderkey") &&
            col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(othersR,
          col("l_orderkey") === col("o3_orderkey") &&
            col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .aggregate(Seq(col("s_suppkey"), col("s_name")), Seq(
          count(lit(1)).as("numwait")))
        .sortExprs(Seq(col("numwait").desc, col("s_suppkey").asc))
        .limitOffset(0, Some(10))
    }),

    "q162_tpch_q7" -> ((s, dir) => {
      // TPC-H Q7 shape: bilateral shipping volume between two nations by
      // ship year. The nation pair predicate is pushed INTO both dim scans
      // (each side reduced to 2 rows before joining) and the asymmetric
      // pair filter runs after — so the fact tables only carry rows whose
      // both endpoints are in the pair set.
      val pair = Seq("NATION_1", "NATION_2")
      val n = t(s, dir, "nation")
      val sn = n.filterCol(col("n_name").isin(pair: _*)).selectCols(Seq(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
      val cn = n.filterCol(col("n_name").isin(pair: _*)).selectCols(Seq(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
      val l = t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date").between(
          lit(java.sql.Date.valueOf("1996-01-01")),
          lit(java.sql.Date.valueOf("1997-12-31"))))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .filterCol(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .aggregate(Seq(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate").cast("date")).cast("long").as("l_year")), Seq(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_lines")))
        .sortBy(Seq(col("supp_nation"), col("cust_nation"), col("l_year")))
    }),

    "q163_dup_substr_stats" -> ((s, dir) =>
      // exact duplicated-substring measurement (Lee et al. ExactSubstr,
      // distributed): per-doc maximal spans of 8-token windows that repeat
      // anywhere in the corpus — memorization fuel that document-level
      // dedup (q31/q33) cannot see when the surrounding text differs
      Dedup.dupSubstrStats(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), k = 8)
        .withColumnRenamed("id", "doc_id")
        .sortBy(Seq(col("doc_id")))),

    "q164_dup_substr_spans_hashed" -> ((s, dir) =>
      // the 100 TB configuration of q163: shuffle keys are xxhash64 of the
      // shingle text (8 bytes through the exchange instead of ~8 words).
      // The span OUTPUT carries only positions, so the same exact-text SQL
      // oracle hash-matches — driver-proving the hashed scale path equals
      // the exact instrument (the q142/q144 pattern)
      Dedup.dupSubstrSpans(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), k = 8, hashShingles = true)
        .withColumnRenamed("id", "doc_id")
        .sortBy(Seq(col("doc_id"), col("span_start")))),

    "q165_bpe_merges" -> ((s, dir) =>
      // distributed BPE tokenizer training, first 8 merges: the merge
      // table compounds (round 6 merges 'm'+'er', consuming round 1's
      // 'er') — proof the greedy rewrite, not just the pair counts, is
      // exact. All counting/rewriting distributed; 1 argmax row per round
      // is the only driver state (kmeansFit precedent)
      Corpus.bpeMerges(t(s, dir, "documents"),
          TextFns.tokens(col("text")), rounds = 8)
        .sortBy(Seq(col("merge_round")))),

    "q166_dsir_weights" -> ((s, dir) =>
      // DSIR-style target-domain selection: English docs as the target
      // distribution, the whole corpus as raw; per-doc mean scaled
      // unigram likelihood ratio, ln-free integer-exact, selected =
      // above parity. The en docs themselves should dominate `selected`
      Corpus.dsirWeights(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), col("lang") === "en")
        .withColumnRenamed("id", "doc_id")
        .sortBy(Seq(col("doc_id")))),

    "q167_bpe_segment" -> ((s, dir) => {
      // tokenizer INFERENCE closing the train->apply loop: learn q165's 8
      // merges, segment the corpus with them, emit the top-20 subword
      // histogram. Collecting the merge table is the tokenizer-artifact
      // handoff every real pipeline does; the corpus-sized work stays
      // distributed in both phases
      val docs = t(s, dir, "documents")
      val toks = TextFns.tokens(col("text"))
      val merges = Corpus.bpeMerges(docs, toks, rounds = 8)
        .orderBy("merge_round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Corpus.bpeSegment(docs, toks, merges)
        .select(explode(col("subtokens")).as("subtoken"), col("wc"))
        .aggregate(Seq(col("subtoken")), Seq(sum(col("wc")).as("n_occurrences")))
        .sortExprs(Seq(col("n_occurrences").desc, col("subtoken").asc))
        .limitOffset(0, Some(20))
    }),

    "q168_window_frames" -> ((s, dir) => {
      // the window-FRAME family q132's constructors don't touch: a ROWS
      // frame (last 3 events per user, total order via the event_id
      // tie-break) and a RANGE frame (trailing 1 hour on epoch micros —
      // peer rows included regardless of tie order). Both sums
      // decimal-exact; one window exchange on user_id serves both frames
      val ev = t(s, dir, "events")
        .filterCol(col("user_id") < 2000)
        .selectCols(Seq(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value")))
      ev.rollingAgg(Seq(col("user_id")), Seq(col("ts_us"), col("event_id")),
          rowsBefore = 2, Seq(
          "rows3_dec" -> sum(col("value").cast(DecimalType(18, 6)))))
        .rollingRangeAgg(Seq(col("user_id")), col("ts_us"), 3600000000L, Seq(
          "range1h_dec" -> sum(col("value").cast(DecimalType(18, 6))),
          "range1h_n" -> count(lit(1))))
        .selectCols(Seq(col("event_id"), col("user_id"), col("ts_us"),
          col("rows3_dec").cast("double").as("rows3_sum"),
          col("range1h_dec").cast("double").as("range1h_sum"),
          col("range1h_n")))
        .sortBy(Seq(col("user_id"), col("ts_us"), col("event_id")))
    }),

    "q169_streaming_upsert" -> ((s, dir) => {
      // TRUE streaming keyed upsert: the source is staged as 3 parquet
      // files and drained one file per micro-batch (maxFilesPerTrigger=1),
      // so the latest-event-per-user store is built across MULTIPLE
      // merge rounds — each rewriting only its dirty hash buckets via
      // dynamic partition overwrite (the no-table-format SCD-1 sink).
      // The hash match proves the multi-batch merge converges to exactly
      // the batch latest-per-key answer regardless of file order.
      // Bench note: ~5-8 s at sf0.1 — three sequential micro-batches,
      // each a store read + dirty-bucket rewrite; the cost is the
      // multi-round merge instrument, not a plan problem (a single
      // AvailableNow batch would be 3x cheaper and test nothing).
      // r8's unexplained 23 s: the merged store was written WITHOUT
      // repartitioning on the bucket column, so every batch emitted up to
      // shufflePartitions x nBuckets (~500) small files and later batches
      // re-read the accumulated fragments — FS-cache-sensitive, hence the
      // run-to-run swings. Fixed in runKeyedUpsert (one file per bucket
      // per rewrite); per-batch phase timings now print to stderr so any
      // future drift self-attributes in the bench log.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/upsert"
      // the 3-file landing is input prep, identical every run — staged
      // once per JVM (the store + checkpoint below stay per-run fresh)
      val landing = EventStreams.stagedOnce(s"upsert_landing|$dir") { d =>
        t(s, dir, "events")
          .selectCols(Seq(col("event_id"), col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("event_type"), col("value")))
          .repartition(3)
          .write.mode("overwrite").parquet(d)
      }
      EventStreams.runKeyedUpsert(s, landing, s"$scratch/store",
        s"$scratch/ckpt", keyCol = "user_id", seqCol = "ts_us",
        tieBreak = "event_id", cols = Seq("event_type", "value"),
        nBuckets = 16)
      s.read.parquet(s"$scratch/store")
        .selectCols(Seq(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"), col("value")))
        .sortBy(Seq(col("user_id")))
    }),

    "q170_compaction" -> ((s, dir) => {
      // driver-visible small-files compaction: the events store is written
      // FRAGMENTED (8 files per event_type partition — the steady state a
      // streaming ingest like q155 drifts into), compacted to one file per
      // partition (Engine.compactPartitionedParquet — fully distributed,
      // no driver file juggling), and aggregated from the COMPACTED copy.
      // The hash match proves compaction preserves content exactly;
      // SourcesSpec asserts the file-count collapse itself
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/compact"
      t(s, dir, "events")
        .selectCols(Seq(col("event_id"), col("user_id"), col("value"),
          col("event_type")))
        .repartition(8)
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(s"$scratch/fragmented")
      Engine.compactPartitionedParquet(s, s"$scratch/fragmented",
        s"$scratch/compacted", Seq("event_type"))
      s.read.parquet(s"$scratch/compacted")
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n_events"),
          sum(col("event_id").cast(DecimalType(18, 0))).cast("long").as("sum_ids"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value")))
        .sortBy(Seq(col("event_type")))
    }),

    "q171_observed_metrics" -> ((s, dir) => {
      // Dataset.observe: pipeline telemetry accumulated DURING the pass
      // (CollectMetrics in the plan) instead of a second scan — how a
      // 100 TB job reports row counts / null rates / value sums without
      // re-reading anything. The observation must not change the result
      // (hash-matched); ObserveSpec asserts the metric values themselves
      val ev = t(s, dir, "events")
        .observe("q171_metrics",
          count(lit(1)).as("n_rows"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("obs_sum"))
      ev.filterCol(col("event_type") === "purchase")
        .aggregate(Seq(col("user_id")), Seq(
          count(lit(1)).as("n_purchases"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("spend")))
        .sortBy(Seq(col("user_id")))
    }),

    "q172_streaming_trending" -> ((s, dir) => {
      // TRUE streaming trending: watermarked tumbling-window counts
      // drained in complete mode, then top-3 event types per hour ranked
      // batch-side. The hash match proves the streaming aggregation path
      // equals the batch tumbling counts exactly (q40's windowed family,
      // now as a streaming driver fact). FileStreamSource needs a
      // directory — q42's staging idiom
      val staged = java.nio.file.Files.createTempDirectory("graft_q172")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"g172_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runWindowedTopK(s, staged.toString, qn, "1 hour", k = 3)
          .selectCols(Seq(
            unix_micros(col("win_start").cast("timestamp")).as("win_us"),
            col("event_type"), col("n"), col("rank")))
          .sortBy(Seq(col("win_us"), col("rank")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q173_cms_heavy_hitters" -> ((s, dir) =>
      // count-min sketch with an EXACT oracle (portable FNV rows): the
      // width x depth counter matrix is the bounded-state scale path the
      // exact vocab-sized count (q58) cannot offer; CMS never undercounts,
      // and the overestimate column shows exactly which top tokens hit a
      // collided cell at width=512
      Corpus.cmsHeavyHitters(t(s, dir, "documents"), col("text"),
          width = 512, depth = 4, k = 20)
        .withColumnRenamed("tok", "token")
        .sortExprs(Seq(col("exact_n").desc, col("token").asc))),

    "q174_ivfpq_adc" -> ((s, dir) => {
      // IVFADC — the production ANN composition (coarse cells + PQ over
      // RESIDUALS + per-cell asymmetric LUTs) with, unusually, an exact
      // oracle: centroids = first 8 vectors, codebooks = residual
      // subvectors of the first 16 (the q65/q102 deterministic-fixture
      // trick), everything in double so both engines run the identical
      // IEEE sequence. kmeansCentroids + residual-trained codebooks are
      // the production seeding; this query pins the MACHINERY exactly
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")))
      val (cents, cb) = pqFixture(corpus)
      Similarity.ivfPqAdcTopK(corpus, corpus.filterCol(col("id") < 4),
          cents, cb, m = 8, subDims = 8, nprobe = 2, k = 5)
        .withColumn("adist", round(col("adist"), 6))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q175_tpch_q6" -> ((s, dir) =>
      // TPC-H Q6 shape: pure scan-side revenue probe — every predicate
      // (date window, discount band, quantity cap) pushes to the parquet
      // scan, the aggregate is one decimal-exact partial-combined row.
      // The simplest query worth having: it measures scan + pushdown cost
      // with zero join noise
      t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date") >=
            lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_shipdate").cast("date") <
            lit(java.sql.Date.valueOf("1998-01-01")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .aggregate(Seq.empty, Seq(
          round(sum((col("l_extendedprice") * col("l_discount"))
            .cast(DecimalType(18, 4))).cast("double"), 4).as("revenue"),
          count(lit(1)).as("n_lines")))),

    "q176_tpch_q12" -> ((s, dir) =>
      // TPC-H Q12 shape: conditional priority counts per line status over
      // a ship-year window (shipmode isn't in the synthetic schema;
      // linestatus plays its role). One join, one aggregate, the CASE
      // pair fused in a single pass
      t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date") >=
            lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_shipdate").cast("date") <
            lit(java.sql.Date.valueOf("1998-01-01")))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .aggregate(Seq(col("l_linestatus")), Seq(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_count")))
        .sortBy(Seq(col("l_linestatus")))),

    "q177_tpch_q13" -> ((s, dir) => {
      // TPC-H Q13 shape: customer order-count DISTRIBUTION including the
      // zero bucket — the left outer join is the point (an inner join
      // silently drops orderless customers), counting o_orderkey (not *)
      // keeps the null rows at zero
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "5-LOW", "left_outer")
        .aggregate(Seq(col("c_custkey")), Seq(
          count(col("o_orderkey")).as("c_count")))
        .aggregate(Seq(col("c_count")), Seq(count(lit(1)).as("custdist")))
        .sortExprs(Seq(col("custdist").desc, col("c_count").desc))
    }),

    "q178_tpch_q17" -> ((s, dir) => {
      // TPC-H Q17 shape: small-quantity-order revenue — the correlated
      // per-part average becomes a partial-aggregated (sum, count) frame
      // joined back; the comparison stays in DECIMAL x integer arithmetic
      // (qty * n * 5 < sum), so no division touches the predicate
      val l = t(s, dir, "lineitem")
      val pq = l.aggregate(Seq(col("l_partkey").as("pk")), Seq(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("sq"),
        count(lit(1)).as("n")))
      l.join(pq, col("l_partkey") === col("pk"))
        .filterCol(col("l_quantity").cast(DecimalType(18, 2)) * col("n") * 5 <
          col("sq"))
        .aggregate(Seq.empty, Seq(
          round(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double") / 7.0, 4).as("avg_yearly"),
          count(lit(1)).as("n_small")))
    }),

    "q179_tpch_q20" -> ((s, dir) => {
      // TPC-H Q20 shape: suppliers dominating a part's yearly flow —
      // nested aggregates ((part, supplier) then part) with the >50%%
      // condition in integer-decimal arithmetic, semi-ish join resolved
      // as a count per supplier. Both aggregates partial-combine; the
      // second reuses the first's output (no rescan)
      val ps = t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date") >=
            lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_shipdate").cast("date") <
            lit(java.sql.Date.valueOf("1998-01-01")))
        .aggregate(Seq(col("l_partkey"), col("l_suppkey")), Seq(
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("sq")))
      val pt = ps.aggregate(Seq(col("l_partkey").as("pk")), Seq(
        sum(col("sq")).as("tq")))
      ps.join(pt, col("l_partkey") === col("pk"))
        .filterCol(col("sq") * 2 > col("tq"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .aggregate(Seq(col("s_suppkey"), col("s_name")), Seq(
          count(lit(1)).as("n_dominant_parts")))
        .sortExprs(Seq(col("n_dominant_parts").desc, col("s_suppkey").asc))
        .limitOffset(0, Some(25))
    }),

    "q180_tpch_q8" -> ((s, dir) => {
      // TPC-H Q8 shape: market share — one nation's slice of another
      // nation's import revenue per year. Both the conditional and total
      // sums are decimal-exact out of the same aggregate; the share is
      // ONE double division
      val n = t(s, dir, "nation")
      val cn = n.selectCols(Seq(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation")))
      val sn = n.selectCols(Seq(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .filterCol(col("cust_nation") === "NATION_1")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .aggregate(Seq(year(col("o_orderdate").cast("date")).cast("long")
          .as("o_year")), Seq(
          sum(when(col("supp_nation") === "NATION_2", rev)
            .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double")
            .as("nation2_rev"),
          sum(rev).cast("double").as("total_rev")))
        .selectCols(Seq(col("o_year"),
          round(col("nation2_rev") / col("total_rev"), 6).as("mkt_share"),
          round(col("total_rev"), 4).as("total_rev")))
        .sortBy(Seq(col("o_year")))
    }),

    "q181_tpch_q9" -> ((s, dir) =>
      // TPC-H Q9 shape: product-line profit by supplier nation and year —
      // the LIKE filter prunes parts BEFORE the fact join, nation/supplier
      // broadcast, decimal-exact revenue (no ps_supplycost in the
      // synthetic schema; revenue stands in for profit)
      t(s, dir, "lineitem")
        .join(t(s, dir, "part")
            .filterCol(col("p_name").like("%widget%"))
            .selectCols(Seq(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .aggregate(Seq(col("n_name").as("supp_nation"),
          year(col("o_orderdate").cast("date")).cast("long").as("o_year")), Seq(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double"), 4).as("profit")))
        .sortExprs(Seq(col("supp_nation").asc, col("o_year").desc))),

    "q182_tpch_q2" -> ((s, dir) => {
      // TPC-H Q2 shape: cheapest-supplier-per-part — the correlated MIN
      // becomes a per-(part, supplier) aggregate and a per-part argmin
      // (row_number, ties to the lower suppkey). unit_price is one
      // IEEE division per row, min'd exactly
      val up = t(s, dir, "lineitem")
        .filterCol(col("l_quantity") > 0)
        .aggregate(Seq(col("l_partkey"), col("l_suppkey")), Seq(
          min(col("l_extendedprice") / col("l_quantity")).as("unit_price")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"))
        .orderBy(col("unit_price").asc, col("l_suppkey").asc)
      up.withColumn("rn", row_number().over(w))
        .filterCol(col("rn") === 1)
        .join(t(s, dir, "part").filterCol(col("p_size") <= 5),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .selectCols(Seq(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("n_name"),
          round(col("unit_price"), 6).as("unit_price")))
        .sortBy(Seq(col("p_partkey")))
        .limitOffset(0, Some(30))
    }),

    "q183_quality_ensemble" -> ((s, dir) =>
      // the ensemble gate: gopher structural rules (q113) + DSIR target
      // affinity (q166) fused into one integer score with an auditable
      // reason bitmask — a dropped doc SAYS why. Threshold at parity +
      // all-rules-pass
      graft.operators.Pipeline.qualityEnsembleGate(
          t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), col("lang") === "en")
        .withColumnRenamed("id", "doc_id")
        .sortBy(Seq(col("doc_id")))),

    "q184_length_batching" -> ((s, dir) =>
      // inference-serving cost report: batches of 8 similar-length docs
      // (bucket width 16 tokens, descending length within bucket) with
      // integer padding-waste per batch — the number that decides whether
      // a serving fleet re-sorts its queue
      Corpus.lengthBatching(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokenCount(col("text")), batchSize = 8, bucketWidth = 16)
        .sortBy(Seq(col("bucket"), col("batch_idx")))),

    "q185_embedding_pool" -> ((s, dir) =>
      // chunk-embeddings -> document-embedding mean pooling (groups of 4
      // consecutive vec_ids stand in for a doc's chunks) with L2 norm;
      // per-dim means decimal-exact, output exploded to scalar rows so
      // the hash compare sees plain doubles
      Similarity.meanPoolVectors(
          t(s, dir, "embeddings").filterCol(col("vec_id") < 256),
          expr("vec_id DIV 4"), col("embedding"))
        .selectCols(Seq(col("gid"), col("l2_norm"),
          posexplode(col("v_pooled")).as(Seq("dim", "pooled"))))
        .selectCols(Seq(col("gid"), col("dim").cast("long").as("dim"),
          round(col("pooled"), 6).as("pooled"),
          round(col("pooled") / col("l2_norm"), 6).as("normalized")))
        .sortBy(Seq(col("gid"), col("dim")))),

    "q186_exact_k_sample" -> ((s, dir) =>
      // eval-set construction: exactly 5 docs per language, picked by the
      // engine-replayable Knuth hash — reruns, engines, and partition
      // layouts all select the SAME five
      t(s, dir, "documents")
        .exactKSample(col("lang"), col("doc_id"), k = 5)
        .selectCols(Seq(col("doc_id"), col("lang"), col("sample_rank")))
        .sortBy(Seq(col("lang"), col("sample_rank")))),

    "q187_corpus_diff" -> ((s, dir) => {
      // versioned-lake snapshot diff — the one FULL OUTER join in the
      // suite: v2 derives deterministically from v1 (every 11th doc
      // removed, every remaining 7th edited, one added doc per 13th),
      // and every id is classified added/removed/changed/unchanged
      val v1 = t(s, dir, "documents")
      val v2base = v1.filterCol(pmod(col("doc_id"), lit(11)) =!= 0)
        .selectCols(Seq(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" v2-edit"))).otherwise(col("text"))
            .as("text")))
      val v2 = v2base.unionAll(
        v1.filterCol(pmod(col("doc_id"), lit(13)) === 0)
          .selectCols(Seq((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new doc "), col("doc_id")).as("text"))))
      Corpus.corpusDiff(v1, v2, col("doc_id"), col("text"))
        .sortBy(Seq(col("id")))
    }),

    "q188_backoff_lm" -> ((s, dir) => {
      // held-out stupid-backoff trigram LM (the full CCNet perplexity
      // filter whose bigram core is q99): train counts on the even-id
      // half of the corpus, score EVERY doc — odd docs genuinely hit
      // the backoff ladder (unseen trigrams -> bigram -> unigram -> OOV)
      val d = t(s, dir, "documents")
      Corpus.stupidBackoffScore(
          d.filterCol(pmod(col("doc_id"), lit(2)) === 0),
          TextFns.tokens(col("text")),
          d, col("doc_id"), TextFns.tokens(col("text")))
        .sortBy(Seq(col("id")))
    }),

    "q189_validation_report" -> ((s, dir) => {
      // Deequ-style batch gate: predicate rules folded into one scan per
      // table, key-uniqueness, and FK checks, unioned into a small report.
      // The rule mix is deliberately half-failing on this data (price cap,
      // short docs, duplicated (orderkey, linenumber) pairs) so both report
      // branches are exercised.
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      val d = t(s, dir, "documents"); val c = t(s, dir, "customer")
      Validation.report(
          Validation.checkRules(o, Seq(
            "orders_custkey_complete" -> col("o_custkey").isNull,
            "orders_status_domain" -> !col("o_orderstatus").isin("O", "F", "P"),
            "orders_totalprice_cap_400k" -> (col("o_totalprice") > 400000.0),
            "orders_totalprice_positive" -> (col("o_totalprice") <= 0.0))),
          Validation.checkRules(d, Seq(
            "docs_min_100_chars" -> (col("n_chars") < 100L),
            "docs_nchars_consistent" ->
              (length(col("text")).cast("long") =!= col("n_chars")))),
          Validation.checkUnique(o, "orders_pk_unique", Seq(col("o_orderkey"))),
          Validation.checkUnique(l, "lineitem_line_unique",
            Seq(col("l_orderkey"), col("l_linenumber"))),
          Validation.checkForeignKey(l, "lineitem_orderkey_fk",
            col("l_orderkey"), o, col("o_orderkey")),
          Validation.checkForeignKey(o, "orders_custkey_fk",
            col("o_custkey"), c, col("c_custkey")))
        .sortBy(Seq(col("rule")))
    }),

    "q318_rolling_p95" -> ((s, dir) => {
      // the SLO read: exact lower p95 of event value (micros) over every
      // rolling 24 h window at hourly steps — q302's horizon-bounded
      // fan-out feeding q290's integer percentile rule; a latency monitor
      // with zero approximation and no per-window rescan
      val fanned = t(s, dir, "events")
        .selectCols(Seq(
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmic"),
          unix_micros(date_trunc("hour", col("ts"))).as("h")))
        .selectCols(Seq(col("vmic"), col("h"),
          explode(sequence(lit(0), lit(23))).as("k")))
        .selectCols(Seq(col("vmic"),
          (col("h") - col("k") * (3600L * 1000000L)).as("win_start_us")))
      fanned.weightedPercentile(Seq(col("win_start_us")), col("vmic"),
          lit(1L), pPpm = 950000L)
        .selectCols(Seq(col("g0").as("win_start_us"),
          col("total_w").as("n_values"), col("p_value").as("p95_mic"),
          col("cum_w")))
        .sortBy(Seq(col("win_start_us")))
    }),

    "q319_blocking_threshold_sweep" -> ((s, dir) => {
      // q309 swept across ground-truth strictness: the same candidates
      // scored against exact-Jaccard truth at 0.5 / 0.7 / 0.9 — one row
      // per threshold, recall and precision in floor ppm. The blocking
      // config is judged across the whole operating range in one pass.
      val docs = t(s, dir, "documents")
      val truth = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          ngram = 3, threshold = 0.5)
        .selectCols(Seq(col("id_a"), col("id_b"), col("jaccard")))
      val cand = Dedup.sortedNeighborhoodPairs(docs, col("doc_id"),
          TextFns.fingerprint(
            array_join(slice(TextFns.tokens(col("text")), 1, 3), " "),
            portable = true), w = 8)
        .selectCols(Seq(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b")))
        .distinct()
        .withColumn("in_cand", lit(1L))
      val joined = truth.join(cand, Seq("id_a", "id_b"), "left")
        .withColumn("in_cand", coalesce(col("in_cand"), lit(0L)))
      val nCand = cand.agg(count(lit(1)).as("n_cand"))
      joined
        .selectCols(Seq(col("jaccard"), col("in_cand"),
          explode(array(lit(0.5), lit(0.7), lit(0.9))).as("t")))
        .filterCol(col("jaccard") >= col("t"))
        .groupBy(col("t").as("threshold"))
        .agg(count(lit(1)).as("n_truth"),
          sum(col("in_cand")).as("n_tp"))
        .crossJoin(broadcast(nCand))
        .selectExpr("threshold", "n_truth", "n_tp", "n_cand",
          "(n_tp * 1000000L) DIV n_truth AS recall_ppm",
          "(n_tp * 1000000L) DIV n_cand AS precision_ppm")
        .sortBy(Seq(col("threshold")))
    }),

    "q320_token_budget_quota" -> ((s, dir) =>
      // mixture planning that SUMS TO THE BUDGET: a 1M-token budget
      // apportioned across sources proportionally to their token counts
      // by Hamilton largest remainder — floor division alone leaks up to
      // (sources-1) units; the remainder ranking hands them back
      // deterministically
      Corpus.largestRemainderQuota(
          t(s, dir, "documents").selectCols(Seq(col("source"),
            graft.plans.TextExprs.tokenCount(col("text")).cast("long").as("ntok"))),
          col("source"), col("ntok"), budget = 1000000L)
        .sortBy(Seq(col("group")))),

    // Spatial coordinates for q321/q322: deterministic fixed-point projection
    // of the keys onto a 10000x10000 non-negative grid (prime multipliers,
    // BIGINT-safe — no 64-bit overflow at any SF). Supplier is the 9x fan-out
    // side (the smaller frame); customer is the single-cell side.
    "q321_spatial_nearest" -> ((s, dir) => {
      // per-customer supplier catchment: how many suppliers sit within
      // radius 700 of each customer, and which one is nearest (exact
      // integer d^2, ties to the smaller supplier id). Grid equi-join on
      // (cx, cy) — never a cross join; the DuckDB oracle IS the cross join.
      val cust = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 10000).as("x"),
        (col("c_custkey") * 104729 % 10000).as("y")))
      val supp = t(s, dir, "supplier").selectCols(Seq(
        col("s_suppkey").as("id"),
        (col("s_suppkey") * 12553 % 10000).as("x"),
        (col("s_suppkey") * 30011 % 10000).as("y")))
      Spatial.nearestWithinRadius(supp, cust, radius = 700L)
        .sortBy(Seq(col("id")))
    }),

    "q322_spatial_knn" -> ((s, dir) => {
      // bounded-radius kNN: the 3 nearest suppliers within radius 1500 of
      // each customer, ranked. The radius cap is the contract that keeps
      // exact kNN grid-partitionable (no outward ring search per point).
      val cust = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 10000).as("x"),
        (col("c_custkey") * 104729 % 10000).as("y")))
      val supp = t(s, dir, "supplier").selectCols(Seq(
        col("s_suppkey").as("id"),
        (col("s_suppkey") * 12553 % 10000).as("x"),
        (col("s_suppkey") * 30011 % 10000).as("y")))
      Spatial.knnWithinRadius(supp, cust, radius = 1500L, k = 3)
        .sortBy(Seq(col("id"), col("rank")))
    }),

    "q323_jw_name_pairs" -> ((s, dir) => {
      // entity-resolution scoring: distinct part names under brand
      // blocking, scored with the native Jaro-Winkler expression (IEEE
      // op order pinned to DuckDB — raw doubles hash-match). 0.9 keeps
      // the one-word-apart color-name variants.
      Dedup.jaroWinklerPairs(t(s, dir, "part"), col("p_name"), col("p_brand"),
          minSim = 0.9)
        .sortBy(Seq(col("blk"), col("sa"), col("sb")))
    }),

    "q324_jw_reconcile" -> ((s, dir) => {
      // fuzzy catalog reconciliation: each part name with one char
      // deterministically deleted (position p_partkey % len) is matched
      // back against the distinct clean-name catalog under first-char
      // blocking; best candidate per row by (sim DESC, name ASC), plus a
      // hit flag against the true origin — the ER accuracy harness.
      val part = t(s, dir, "part")
      val cat = part.selectCols(Seq(col("p_name").as("cand"))).distinct()
      val k = (col("p_partkey") % length(col("p_name"))).cast("int")
      val dirty = concat(
        col("p_name").substr(lit(1), k),
        col("p_name").substr(k + lit(2), length(col("p_name"))))
      val d = part.selectCols(Seq(col("p_partkey").as("id"),
        col("p_name").as("truth"), dirty.as("dirty")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("sim").desc, col("cand").asc)
      d.join(cat, substring(col("dirty"), 1, 1) === substring(col("cand"), 1, 1))
        .withColumn("sim", TextFns.jaroWinkler(col("dirty"), col("cand")))
        .withColumn("rn", row_number().over(w))
        .filterCol(col("rn") === 1)
        .selectCols(Seq(col("id"), col("dirty"), col("cand").as("best_match"),
          col("sim"), (col("cand") === col("truth")).cast("long").as("hit")))
        .sortBy(Seq(col("id")))
    }),

    "q325_token_bucket" -> ((s, dir) => {
      // rate-limiter tuning harness: replay the event log through a
      // per-user token bucket (3000 mtok cap, 1000/event, 100 mtok/h
      // refill) — exact integer-microsecond arithmetic, emitting the
      // admit/reject trace a limiter rollout is tuned on. The clamp
      // makes the fold non-linear: bounded-group mapGroups, oracle is a
      // recursive CTE.
      EventStreams.tokenBucketAdmission(t(s, dir, "events"), col("user_id"),
          col("ts"), col("event_id"),
          capacity = 3000L, cost = 1000L, refillPerHour = 100L)
        .sortBy(Seq(col("user_id"), col("rn")))
    }),

    "q326_phrase_search" -> ((s, dir) => {
      // quoted-query evaluation over positional postings: each phrase's
      // terms are filtered BEFORE any join (postings cost ∝ term df, not
      // corpus size), then k-1 equi-joins on (doc, aligned start). Two
      // selective trigrams + one frequent bigram, all occurrences.
      val docs = t(s, dir, "documents")
      Seq("slow hash batch", "part filter scan", "row column").map { p =>
        Retrieval.phraseOccurrences(docs, col("doc_id"), col("text"),
            p.split(" ").toSeq)
          .selectCols(Seq(lit(p).as("phrase"), col("doc_id"), col("pos")))
      }.reduce(_ union _)
        .sortBy(Seq(col("phrase"), col("doc_id"), col("pos")))
    }),

    "q327_weighted_jaccard" -> ((s, dir) => {
      // tf-aware near-dup pairs: multiset Jaccard ≥ 0.6 in floor ppm
      // over df-capped tokens (df ≤ 64 — ubiquitous tokens are pruned
      // from BOTH multiset sides, the stopword-pruning semantics that
      // also bounds the inverted-index fan-out), equi-join on shared
      // tokens only (Σ max via the n_a + n_b − Σ min identity).
      Dedup.weightedJaccardPairs(t(s, dir, "documents"), col("doc_id"),
          col("text"), minPpm = 600000L, maxDf = 64)
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q328_interval_coverage" -> ((s, dir) => {
      // per-supplier in-transit coverage: half-open [ship_day, ship_day
      // + 1 + (orderkey+linenumber)%7) intervals swept into islands —
      // union length, island count, span. O(n log n) sweep per key, no
      // pair materialization.
      val li = t(s, dir, "lineitem")
        .withColumn("sday", unix_date(to_date(col("l_shipdate"))))
      Relational.intervalCoverage(li, col("l_suppkey"), col("sday"),
          col("sday") + lit(1) + (col("l_orderkey") + col("l_linenumber")) % 7)
        .sortBy(Seq(col("key")))
    }),

    "q329_multi_pattern" -> ((s, dir) => {
      // blocklist probe: 4 raw-substring patterns counted in ONE
      // Aho-Corasick pass per document (overlaps included) vs the
      // oracle's 4 per-position scans — the N-patterns-one-scan shape
      // contamination checks need at scale.
      val pats = Seq("scan", "scan slow", "table table", "row c")
      val patArr = array(pats.map(lit): _*)
      t(s, dir, "documents")
        .withColumn("counts", TextFns.multiPatternCounts(col("text"), pats))
        .select(col("doc_id"), posexplode(col("counts")).as(Seq("pi", "n")))
        .filterCol(col("n") > 0)
        .selectCols(Seq(col("doc_id"),
          element_at(patArr, col("pi") + 1).as("pattern"), col("n")))
        .sortBy(Seq(col("doc_id"), col("pattern")))
    }),

    "q330_group_ols" -> ((s, dir) => {
      // per-supplier price-vs-quantity trend line: exact closed-form OLS
      // over five decimal sums (one partial-agg groupBy), slope/
      // intercept/r² in truncation ppm. The per-segment regression scan.
      val li = t(s, dir, "lineitem").selectCols(Seq(
        col("l_suppkey").as("k"),
        col("l_quantity").cast("long").as("x"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("y")))
      Relational.groupOls(li, col("k"), col("x"), col("y"))
        .sortBy(Seq(col("key")))
    }),

    "q331_winnow_fingerprints" -> ((s, dir) => {
      // MOSS robust winnowing: rightmost-min FNV hash per window of 4
      // consecutive token 3-grams — the guarantee-carrying plagiarism
      // sketch (any ≥6-token match shares a fingerprint), fully
      // declarative in both engines.
      Dedup.winnowFingerprints(t(s, dir, "documents"), col("doc_id"),
          col("text"), k = 3, w = 4)
        .sortBy(Seq(col("doc_id"), col("pos"), col("h")))
    }),

    "q332_point_in_polygon" -> ((s, dir) => {
      // geofence containment: q321's projected customers against three
      // convex CCW polygons via bbox-cell equi-join + exact integer
      // cross-product test (boundary inclusive). Overlapping fences
      // multi-report, as geofencing must.
      import s.implicits._
      val cust = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 10000).as("x"),
        (col("c_custkey") * 104729 % 10000).as("y")))
      val polys = Seq(
        ("pent", Seq((6500L, 5000L), (5464L, 6427L), (3787L, 5882L),
          (3787L, 4118L), (5464L, 3573L))),
        ("sq", Seq((2000L, 2000L), (7000L, 2000L), (7000L, 7000L),
          (2000L, 7000L))),
        ("tri", Seq((0L, 0L), (9999L, 0L), (0L, 9999L)))
      ).toDF("poly_id", "vraw")
        .withColumn("vs", transform(col("vraw"),
          v => struct(v("_1").as("x"), v("_2").as("y"))))
      Spatial.pointInConvexPolygon(cust, polys, cellSize = 2000L)
        .sortBy(Seq(col("poly_id"), col("id")))
    }),

    "q333_edit_distance_pairs" -> ((s, dir) => {
      // fuzzy key matching: every customer-name pair within one edit,
      // FastSS deletion-neighborhood candidates + exact Levenshtein
      // verify — the oracle IS the quadratic cross join, the operator
      // never builds it. NOT editDistancePairs: these names are uniform-
      // length, the degenerate case where length banding is the cross
      // join in disguise (q137 keeps banding — part names vary).
      Dedup.deletionNeighborhoodPairs(t(s, dir, "customer"), col("c_name"),
          maxDist = 1)
        .sortBy(Seq(col("sa"), col("sb")))
    }),

    "q334_dag_critical_path" -> ((s, dir) => {
      // critical-path depth over a layered co-purchase DAG: parts of
      // size k point at co-purchased parts of size k+1 (acyclic by
      // construction), edge weight = co-purchase order count; dist(v) =
      // heaviest dependency chain ending at v. 25 layers ⇒ rounds=24 is
      // the structural convergence bound at ANY scale factor; the oracle
      // replays it as (node, pathsum) pair enumeration in a recursive
      // CTE (bounded by distinct sums, never path count).
      val ps = t(s, dir, "part")
        .filterCol(col("p_size").between(1, 25))
        .selectCols(Seq(col("p_partkey"), col("p_size")))
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 30)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"))).distinctAll
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") =!= col("y.l_partkey"))
        .join(broadcast(ps.alias("a")),
          col("a.p_partkey") === col("x.l_partkey"))
        .join(broadcast(ps.alias("b")),
          col("b.p_partkey") === col("y.l_partkey") &&
            col("b.p_size") === col("a.p_size") + 1)
        .aggregate(Seq(col("x.l_partkey").as("src"),
          col("y.l_partkey").as("dst")), Seq(count(lit(1)).as("w")))
      graft.operators.Graph.dagLongestPath(e, rounds = 24)
        .sortBy(Seq(col("id")))
    }),

    "q335_theil_sen" -> ((s, dir) => {
      // q330's trend line, robustified: per-supplier Theil-Sen median
      // slope of price-vs-quantity over one ship-year — the panel slice
      // that bounds the O(g²) pair fan-out. Lower-median ppm keeps both
      // engines on the same integer.
      val li = t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date") >=
            lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("l_shipdate").cast("date") <
            lit(java.sql.Date.valueOf("1997-01-01")))
        .selectCols(Seq(
          col("l_suppkey").as("k"),
          col("l_quantity").cast("long").as("x"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("y")))
      Relational.theilSenSlope(li, col("k"), col("x"), col("y"))
        .sortBy(Seq(col("key")))
    }),

    "q336_holt_linear" -> ((s, dir) => {
      // trend-aware smoothing baseline: Holt linear over each event
      // type's daily value total (exact micros), α=0.3 β=0.1 in ppm with
      // truncation division — the recurrence replays bit-for-bit in the
      // recursive-CTE oracle.
      graft.streaming.EventStreams.holtLinear(
          t(s, dir, "events"), col("event_type"), col("ts"), col("value"),
          alphaPpm = 300000L, betaPpm = 100000L)
        .sortBy(Seq(col("key"), col("r")))
    }),

    "q337_grid_density_clusters" -> ((s, dir) => {
      // grid density clustering over five planted diagonal blobs plus
      // 1-in-11 uniform noise (all integer arithmetic both engines
      // replay): dense cells (>= 8 pts at cell 250) connect over the
      // 8-neighborhood, labels = min cell key per component, sparse
      // cells are noise and drop out.
      val blob = col("c_custkey") % 5
      val noise = col("c_custkey") % 11 === 0
      val c = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("id"),
        when(noise, (col("c_custkey") * 7919) % 10000)
          .otherwise(lit(1000) + blob * 1700 +
            (col("c_custkey") * 7919) % 1001).as("x"),
        when(noise, (col("c_custkey") * 104729) % 10000)
          .otherwise(lit(1000) + blob * 1700 +
            (col("c_custkey") * 104729) % 1001).as("y")))
      Spatial.gridDensityClusters(c, cellSize = 250L, minPts = 8L)
        .sortBy(Seq(col("cluster"), col("id")))
    }),

    "q338_image_patch_grid" -> ((s, dir) => {
      // ViT-style patch tokenization over a REAL decode: q145's synthetic
      // gray PNGs split into 4x4 patches, exact integer gray sum per
      // patch (edge patches partial, n_px says how). PNG lossless ⇒ every
      // patch sum replays as plain integer math in the oracle.
      val withPng = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(8) + pmod(col("doc_id"), lit(9))).cast("int").as("w"),
          (lit(8) + pmod(col("doc_id"), lit(7))).cast("int").as("h")))
        .withColumn("png", Multimodal.synthGrayPngUdf(col("doc_id"), col("w"), col("h")))
      withPng
        .withColumn("p", explode(Multimodal.patchGridUdf(4, 4)(col("png"))))
        .selectCols(Seq(col("doc_id").as("id"),
          col("p._1").cast("long").as("pr"), col("p._2").cast("long").as("pc"),
          col("p._3").as("n_px"), col("p._4").as("px_sum")))
        .sortBy(Seq(col("id"), col("pr"), col("pc")))
    }),

    "q339_vad_segments" -> ((s, dir) => {
      // voice-activity segmentation over a REAL decode: burst-gated noise
      // WAVs (320-sample talk/silence blocks), 48-sample energy frames —
      // deliberately NOT aligned to the block length, so the threshold
      // genuinely decides the straddling frames — merged into islands of
      // mean|s| >= 4000. PCM lossless ⇒ the oracle replays every sample.
      val wavs = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(2080) + pmod(col("doc_id"), lit(5L)).cast("int") * lit(32))
            .cast("int").as("n")))
        .withColumn("wav", Multimodal.synthBurstPcmWavUdf(col("doc_id"), col("n")))
      Multimodal.vadSegments(wavs, col("doc_id").as("id"), col("wav"),
          window = 48, thrMilli = 4000000L, minFrames = 2)
        .sortBy(Seq(col("id"), col("w_start")))
    }),

    "q340_golden_record" -> ((s, dir) => {
      // MDM survivorship: each customer's order history as a dirty
      // version feed (status nulled on 1-in-3 versions, balance on
      // 1-in-5), merged to one golden record per field independently —
      // latest non-null wins, ordered by (date, orderkey).
      val v = t(s, dir, "orders").selectCols(Seq(
        col("o_custkey").as("k"),
        struct(col("o_orderdate").cast("date").as("d"),
          col("o_orderkey").as("i")).as("ord"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("bal_c")))
      Relational.goldenRecord(v, col("k"), col("ord"), Seq("status", "bal_c"))
        .sortBy(Seq(col("key")))
    }),

    "q341_fence_occupancy" -> ((s, dir) => {
      // geofence occupancy report: q332's three fences with exact
      // shoelace metrics (2·area, 6A·centroid — integers, no division)
      // and the contained-point count per fence; density as points per
      // million area units, floor ppm of (2M·n)/area2.
      import s.implicits._
      val cust = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("id"),
        (col("c_custkey") * 7919 % 10000).as("x"),
        (col("c_custkey") * 104729 % 10000).as("y")))
      val polys = Seq(
        ("pent", Seq((6500L, 5000L), (5464L, 6427L), (3787L, 5882L),
          (3787L, 4118L), (5464L, 3573L))),
        ("sq", Seq((2000L, 2000L), (7000L, 2000L), (7000L, 7000L),
          (2000L, 7000L))),
        ("tri", Seq((0L, 0L), (9999L, 0L), (0L, 9999L)))
      ).toDF("poly_id", "vraw")
        .withColumn("vs", transform(col("vraw"),
          v => struct(v("_1").as("x"), v("_2").as("y"))))
      val inside = Spatial.pointInConvexPolygon(cust, polys, cellSize = 2000L)
        .aggregate(Seq(col("poly_id")), Seq(count(lit(1)).as("n_inside")))
      Spatial.polygonMetrics(polys)
        .join(inside, Seq("poly_id"), "left")
        .withColumn("n_inside", coalesce(col("n_inside"), lit(0L)))
        .withColumn("density_ppm", expr("(n_inside * 2000000L) DIV area2"))
        .sortBy(Seq(col("poly_id")))
    }),

    "q342_greedy_max_coverage" -> ((s, dir) => {
      // submodular curation: the 3 documents that greedily maximize
      // distinct word-3-gram coverage (q34's exact shingles, as strings —
      // coverage must not depend on hash collisions). The oracle unrolls
      // the same 3 greedy rounds.
      Corpus.greedyMaxCoverage(t(s, dir, "documents"), col("doc_id"),
          col("text"), k = 3)
        .sortBy(Seq(col("rank")))
    }),

    "q343_weighted_sssp" -> ((s, dir) => {
      // bounded-hop weighted routing: cheapest ≤4-hop path from the seed
      // parts (id % 97 = 0) over the undirected co-purchase graph, edge
      // cost 1 + count % 3 (coarse integer costs keep the oracle's
      // (node, dist, hops) enumeration bounded). Unreached-within-bound
      // nodes absent by the bfsDistances contract.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"))).distinctAll
      val e0 = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .aggregate(Seq(col("x.l_partkey").as("a"),
          col("y.l_partkey").as("b")), Seq(count(lit(1)).as("n")))
        .withColumn("w", lit(1L) + col("n") % 3)
      val und = e0.selectCols(Seq(col("a").as("src"), col("b").as("dst"), col("w")))
        .union(e0.selectCols(Seq(col("b").as("src"), col("a").as("dst"), col("w"))))
      val seeds = und.selectCols(Seq(col("src").as("id"))).distinctAll
        .filterCol(col("id") % 97 === 0)
      graft.operators.Graph.shortestPaths(und, seeds, rounds = 4)
        .sortBy(Seq(col("id")))
    }),

    "q344_review_pair_matching" -> ((s, dir) => {
      // one-partner-each allocation: local-max greedy matching over the
      // co-purchase graph (strongest-association pairs first, no part
      // reused) — 3 deterministic rounds, oracle unrolls the same three.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"))).distinctAll
      val e0 = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .aggregate(Seq(col("x.l_partkey").as("a"),
          col("y.l_partkey").as("b")), Seq(count(lit(1)).as("w")))
      graft.operators.Graph.localMaxMatching(e0, rounds = 3)
        .sortBy(Seq(col("round"), col("a"), col("b")))
    }),

    "q345_stratified_ate" -> ((s, dir) => {
      // experimentation analytics: treatment (custkey % 7 = 0) vs control
      // compared WITHIN exact account-balance deciles (q214's rank rule),
      // outcome = lifetime order spend in cents (0 for orderless). Per
      // stratum: arm sizes, exact outcome sums, and the mean difference
      // as one sign-split micro-cent integer (DECIMAL(38,0) cross
      // products — no float means); NULL when an arm is empty.
      val cust = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("id"),
        (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("bal_c")))
      val spend = t(s, dir, "orders")
        .aggregate(Seq(col("o_custkey").as("id")), Seq(
          sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("out_c")))
      val bins = Relational.quantileBins(cust, col("id"), col("bal_c"), 10)
        .selectCols(Seq(col("id"), col("bin")))
      cust.join(spend, Seq("id"), "left")
        .withColumn("out_c", coalesce(col("out_c"), lit(0L)))
        .join(bins, Seq("id"))
        .withColumn("treat", (col("id") % 7 === 0).cast("long"))
        .aggregate(Seq(col("bin")), Seq(
          sum(col("treat")).as("n_t"),
          sum(lit(1L) - col("treat")).as("n_c"),
          sum(col("out_c") * col("treat")).as("sum_t"),
          sum(col("out_c") * (lit(1L) - col("treat"))).as("sum_c")))
        .withColumn("num", expr(
          "CAST(sum_t AS DECIMAL(38,0)) * n_c - CAST(sum_c AS DECIMAL(38,0)) * n_t"))
        .withColumn("diff_micro", expr(
          """CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
             WHEN num >= 0 THEN CAST((num * 1000000)
               DIV (CAST(n_t AS DECIMAL(38,0)) * n_c) AS BIGINT)
             ELSE CAST(-((-num * 1000000)
               DIV (CAST(n_t AS DECIMAL(38,0)) * n_c)) AS BIGINT) END"""))
        .selectCols(Seq(col("bin"), col("n_t"), col("n_c"), col("sum_t"),
          col("sum_c"), col("diff_micro")))
        .sortBy(Seq(col("bin")))
    }),

    "q346_rolling_ols" -> ((s, dir) => {
      // 7-day rolling trend per event type: exact OLS slope of daily
      // value micros over the trailing week at every day — q330's
      // decimal-exact regression as a RANGE-window monitor.
      val daily = t(s, dir, "events")
        .aggregate(Seq(col("event_type").as("k"),
          (unix_micros(date_trunc("day", col("ts"))) / 86400000000L)
            .cast("long").as("d")), Seq(
          sum((col("value").cast(DecimalType(18, 6)) * 1000000)
            .cast("long")).as("y")))
      Relational.rollingOls(daily, col("k"), col("d"), col("y"),
          windowRange = 6L)
        .sortBy(Seq(col("key"), col("x")))
    }),

    "q347_bitemporal_asof" -> ((s, dir) => {
      // bitemporal query: "what did we BELIEVE on 1997-07-01 about each
      // customer's latest state as of their own probe date" — orders as
      // a version feed (valid = order date, txn = valid + 0..4 late
      // days), corrections resolved by per-(key, valid) max-txn
      // struct-max ≤ the cutoff, then the one-shuffle as-of join on
      // valid time against per-customer probe dates.
      val day = 86400000000L
      val cutUs = unix_micros(lit("1997-07-01 00:00:00").cast("timestamp"))
      val baseUs = unix_micros(lit("1997-01-01 00:00:00").cast("timestamp"))
      val vers = t(s, dir, "orders").selectCols(Seq(
          col("o_custkey").as("k"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("valid_us"),
          (unix_micros(col("o_orderdate").cast("timestamp")) +
            (col("o_orderkey") % 5) * day).as("txn_us"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("val_c")))
        .filterCol(col("txn_us") <= cutUs)
        .aggregate(Seq(col("k"), col("valid_us")), Seq(
          max(struct(col("txn_us"), col("val_c"))).as("m")))
        .selectCols(Seq(col("k"), col("valid_us"),
          col("m.txn_us").as("txn_us"), col("m.val_c").as("val_c")))
      val probe = t(s, dir, "customer").selectCols(Seq(
        col("c_custkey").as("k"),
        (baseUs + (col("c_custkey") % 365) * day).as("probe_us")))
      probe.asofJoin(vers, Seq("k"), Seq("k"), "probe_us", "valid_us")
        .selectCols(Seq(col("l.k").as("custkey"),
          (col("l.probe_us") / day).cast("long").as("probe_day"),
          (col("r.valid_us") / day).cast("long").as("valid_day"),
          (col("r.txn_us") / day).cast("long").as("txn_day"),
          col("r.val_c").as("val_c")))
        .sortBy(Seq(col("custkey")))
    }),

    "q348_temporal_pairs" -> ((s, dir) => {
      // what follows what within the hour, per user: gap-bounded ordered
      // type pairs via the bucketed interval-join discipline (probe own
      // + next hour bucket, candidate Δt filter), share of each source
      // type's outgoing pairs in floor ppm. The oracle is the per-user
      // theta
      // join the operator exists to avoid.
      graft.streaming.EventStreams.temporalPairs(t(s, dir, "events"),
          col("user_id"), col("ts"), col("event_type"), gapUs = 3600000000L)
        .sortBy(Seq(col("type_a"), col("type_b")))
    }),

    "q349_bipartite_check" -> ((s, dir) => {
      // two-colorability audit: the customer-part purchase graph is
      // bipartite by construction; part-part co-purchase edges (qty=50)
      // inject odd cycles. Components (min-label), BFS parity from each
      // component's min node (15-hop horizon — both engines cap
      // identically), conflict = edge whose endpoints share parity.
      // one lineitem scan feeds both thresholds (qty>=49 superset, >=50
      // flag) — the >=50 frame is a filter over the same projection, so
      // the scan + its pushed filter run once
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 49)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"),
          (col("l_quantity") >= 50).as("is50")))
      val withCust = hi.join(t(s, dir, "orders")
          .selectCols(Seq(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .selectCols(Seq((col("o_custkey") + 1000000L).as("id_a"),
          col("l_partkey").as("id_b"))).distinctAll
      val hi49 = hi.filterCol(col("is50"))
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"))).distinctAll
      val pp = hi49.alias("x").join(hi49.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b"))).distinctAll
      // materialize the edge list once: components, the BFS (via its own
      // nbrs frame), and the conflict-audit joins below all consume it —
      // without the checkpoint the scan+join+distinct pipeline re-executes
      // three times (measured ~2x of this query's wall time)
      val tq0 = System.nanoTime()
      val edges = graft.operators.Iterative.truncate(
        withCust.union(pp).distinctAll, None)
      val tq1 = System.nanoTime()
      // comps feeds three consumers (seeds, the conflict join, node stats)
      // and its tail is a compose join over checkpointed label frames —
      // one more truncate stops that join re-executing per consumer
      val comps = graft.operators.Iterative.truncate(
        Dedup.nearDupComponents(edges), None)
      val tq2 = System.nanoTime()
      val seeds = comps.selectCols(Seq(col("component_id").as("id"))).distinctAll
      val dist = graft.operators.Graph.bfsDistances(edges, seeds, rounds = 15)
      val tq3 = System.nanoTime()
      System.err.println(f"[q349] edges=${(tq1-tq0)/1e9}%.2fs comps=${(tq2-tq1)/1e9}%.2fs bfs=${(tq3-tq2)/1e9}%.2fs")
      val e2 = edges
        .join(dist.selectCols(Seq(col("id").as("id_a"), col("dist").as("da"))), Seq("id_a"))
        .join(dist.selectCols(Seq(col("id").as("id_b"), col("dist").as("db"))), Seq("id_b"))
        .join(comps.selectCols(Seq(col("id").as("id_a"), col("component_id").as("comp"))), Seq("id_a"))
      val edgeStats = e2.aggregate(Seq(col("comp")), Seq(
        count(lit(1)).as("n_edges"),
        sum(((col("da") + col("db")) % 2 === 0).cast("long")).as("n_conflicts")))
      val nodeStats = comps.aggregate(Seq(col("component_id").as("comp")), Seq(
        count(lit(1)).as("n_nodes")))
      nodeStats.join(edgeStats, Seq("comp"), "left")
        .withColumn("n_edges", coalesce(col("n_edges"), lit(0L)))
        .withColumn("n_conflicts", coalesce(col("n_conflicts"), lit(0L)))
        .withColumn("bipartite", col("n_conflicts") === 0)
        .sortBy(Seq(col("comp")))
    }),

    "q350_decayed_heavy_hitters" -> ((s, dir) => {
      // recency-weighted heavy hitters: per event type, the top-5 users
      // by half-life-decayed activity — day weight = 1e6 >> age_days
      // (exact integer halving, zero past 20 days), so yesterday's spam
      // outweighs last month's. One partial-agg groupBy + per-type rank.
      val daily = t(s, dir, "events")
        .aggregate(Seq(col("event_type").as("typ"), col("user_id").as("u"),
          (unix_micros(date_trunc("day", col("ts"))) / 86400000000L)
            .cast("long").as("d")), Seq(count(lit(1)).as("n")))
      val mx = daily.aggregate(Seq.empty, Seq(max(col("d")).as("dmax")))
      val scored = daily.crossJoin(broadcast(mx))
        .withColumn("w", expr(
          "n * (CAST(1000000 AS BIGINT) DIV shiftleft(CAST(1 AS BIGINT), CAST(dmax - d AS INT)))"))
        .aggregate(Seq(col("typ"), col("u")), Seq(
          sum(col("w")).as("decayed_micro"), sum(col("n")).as("n_raw")))
      scored.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("typ"))
            .orderBy(col("decayed_micro").desc, col("u").asc)).cast("long"))
        .filterCol(col("rank") <= 5)
        .selectCols(Seq(col("typ"), col("rank"), col("u"),
          col("decayed_micro"), col("n_raw")))
        .sortBy(Seq(col("typ"), col("rank")))
    }),

    "q351_timeline_resolve" -> ((s, dir) => {
      // override-layer timelines: each sampled supplier's Q1-1996
      // transit intervals as claims (priority = linenumber, value =
      // orderkey), resolved so the highest-priority covering claim wins
      // every instant, merged into maximal segments. The quarter slice
      // is the bounded-group contract.
      val ivl = t(s, dir, "lineitem")
        .filterCol(col("l_suppkey") % 10 === 0 &&
          col("l_shipdate").cast("date") >=
            lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("l_shipdate").cast("date") <
            lit(java.sql.Date.valueOf("1996-04-01")))
        .withColumn("sday", unix_date(to_date(col("l_shipdate"))).cast("long"))
        .selectCols(Seq(col("l_suppkey").as("k"),
          col("sday").as("s"),
          (col("sday") + lit(1) + (col("l_orderkey") + col("l_linenumber")) % 7)
            .cast("long").as("e"),
          col("l_linenumber").cast("long").as("p"),
          col("l_orderkey").as("v")))
      Relational.timelineResolve(ivl, col("k"), col("s"), col("e"),
          col("p"), col("v"))
        .sortBy(Seq(col("key"), col("seg_start")))
    }),

    "q352_pseudonymize_audit" -> ((s, dir) => {
      // privacy rewrite with referential integrity: customer and order
      // keys replaced by the SAME keyed hash (FNV-1a + one xorshift64
      // round — the q315 mixer), then orders re-joined to customers ON
      // THE PSEUDONYM. Per nation: customers, distinct pseudonyms
      // (injectivity witness), and orders surviving the pseudonym join
      // (must equal the raw-key join — the integrity claim the oracle
      // hash pins cross-engine).
      def mix64(c: Column): Column = {
        val z1 = c.bitwiseXOR(shiftleft(c, 13))
        val z2 = z1.bitwiseXOR(shiftrightunsigned(z1, 7))
        z2.bitwiseXOR(shiftleft(z2, 17))
      }
      def pid(c: Column): Column =
        mix64(graft.plans.TextExprs.fnv64(concat(lit("p:"), c.cast("string"))))
      val custP = t(s, dir, "customer").selectCols(Seq(
        col("c_nationkey").cast("long").as("nation"),
        pid(col("c_custkey")).as("h")))
      val ordP = t(s, dir, "orders").selectCols(Seq(
        pid(col("o_custkey")).as("h")))
      val perNation = custP.aggregate(Seq(col("nation")), Seq(
        count(lit(1)).as("n_cust"),
        countDistinct(col("h")).as("n_pids")))
      val joined = ordP.join(custP, Seq("h"))
        .aggregate(Seq(col("nation")), Seq(count(lit(1)).as("n_orders")))
      perNation.join(joined, Seq("nation"), "left")
        .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        .sortBy(Seq(col("nation")))
    }),

    "q353_gram_matrix" -> ((s, dir) => {
      // PCA-prep statistic: exact upper-triangle Gram matrix of the
      // corpus embeddings, quantized floor(x·1000) — join-free per-row
      // outer products into one partial-agg groupBy; the shuffle carries
      // ≤ d(d+1)/2 cells per partition however many rows there are.
      Similarity.gramMatrix(t(s, dir, "embeddings"), col("vec_id"),
          col("embedding"), scale = 1000L)
        .sortBy(Seq(col("i"), col("j")))
    }),

    "q354_trigram_search" -> ((s, dir) => {
      // pg_trgm-style exact substring search: inverted trigram index →
      // all-trigrams candidate count → contains verify on candidates
      // only; the oracle is the full-scan LIKE the index exists to avoid.
      Retrieval.trigramSubstringSearch(t(s, dir, "documents"),
          col("doc_id"), col("text"),
          Seq("fast sort", "table table", "scan query big", "merge batch"))
        .sortBy(Seq(col("pattern"), col("id")))
    }),

    "q355_bandit_replay" -> ((s, dir) => {
      // offline policy evaluation: ε-greedy (explore every 5th round,
      // cross-multiplied exact argmax otherwise) replayed over the
      // logged event stream per user cohort — pulls bank the logged
      // reward only when policy and log agree (the replay method).
      // Recursive-CTE oracle carries the full 10-register state.
      graft.streaming.EventStreams.epsilonGreedyReplay(
          t(s, dir, "events"), col("user_id") % 8, col("ts"),
          col("event_id"), col("event_type"), col("value"),
          arms = Seq("click", "error", "purchase", "signup", "view"))
        .sortBy(Seq(col("cohort"), col("arm_idx")))
    }),

    "q356_shapley_attribution" -> ((s, dir) => {
      // data valuation: exact Shapley payout of "distinct users covered"
      // to each event type (coverage game, k=5 players, x120 so every
      // value is an exact BIGINT). One data-sized shuffle (per-user
      // bit_or mask); the 32-coalition lattice is broadcast algebra.
      graft.streaming.EventStreams.shapleyCoverage(
          t(s, dir, "events"), col("user_id"), col("event_type"),
          players = Seq("click", "error", "purchase", "signup", "view"))
        .sortBy(Seq(col("player_idx")))
    }),

    "q357_kendall_concordance" -> ((s, dir) => {
      // rank-correlation audit per nation: does a customer's order count
      // move with its total spend — exact concordant/discordant/tie pair
      // counts via the O(n log n) Fenwick fold (the oracle runs the
      // O(n^2) pair join this operator exists to avoid) + tau-a ppm.
      val cust = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .aggregate(Seq(col("c_nationkey").as("nk"), col("o_custkey").as("ck")),
          Seq(count(lit(1)).as("x"),
            sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
              .cast("long")).as("y")))
      graft.operators.Validation.kendallConcordance(
          cust, col("nk"), col("x"), col("y"))
        .sortBy(Seq(col("grp")))
    }),

    "q358_lpm_enrichment" -> ((s, dir) => {
      // log enrichment by CIDR ownership: nations own deterministic /8,
      // /16 (nested in another nation's /8) and /24 blocks; each event
      // derives an IPv4 and is tagged by longest-prefix match — zero
      // shuffles, one broadcast join per prefix length. Report matched
      // traffic per (owner, prefix length) with distinct users.
      val n = t(s, dir, "nation").selectCols(Seq(
        col("n_nationkey").cast("long").as("k"), col("n_name").as("owner")))
      val pfx = n.select(expr("shiftleft(k * 5 % 64 + 16, 24)").as("net"),
          lit(8).as("len"), col("owner"))
        .union(n.select(
          expr("shiftleft((k + 3) % 25 * 5 % 64 + 16, 24) + shiftleft(k * 41 % 256, 16)").as("net"),
          lit(16).as("len"), col("owner")))
        .union(n.select(
          expr("""shiftleft((k + 7) % 25 * 5 % 64 + 16, 24)
                  + shiftleft((k * 41 + 64) % 256, 16)
                  + shiftleft(k * 13 % 256, 8)""").as("net"),
          lit(24).as("len"), col("owner")))
      val ev = t(s, dir, "events")
        .selectCols(Seq(col("event_id").cast("long").as("eid"), col("user_id")))
        .withColumn("ip", expr(
          """CASE WHEN eid % 97 = 0 THEN
               shiftleft((eid % 25 + 7) % 25 * 5 % 64 + 16, 24)
               + shiftleft((eid % 25 * 41 + 64) % 256, 16)
               + shiftleft(eid % 25 * 13 % 256, 8) + eid % 256
             WHEN eid % 13 = 0 THEN
               shiftleft((eid % 25 + 3) % 25 * 5 % 64 + 16, 24)
               + shiftleft(eid % 25 * 41 % 256, 16) + eid * 7 % 65536
             WHEN eid % 7 = 0 THEN
               shiftleft(200 + eid % 40, 24) + eid * 3 % 16777216
             ELSE shiftleft(eid % 25 * 5 % 64 + 16, 24)
               + shiftleft(eid * 11 % 256, 16)
               + shiftleft(eid * 13 % 256, 8) + eid * 17 % 256 END"""))
      graft.operators.Relational.lpmEnrich(ev, col("ip"), pfx)
        .aggregate(
          Seq(coalesce(col("lpm_owner"), lit("(unmatched)")).as("owner"),
            coalesce(col("lpm_len"), lit(-1)).cast("long").as("plen")),
          Seq(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users")))
        .sortBy(Seq(col("owner"), col("plen")))
    }),

    "q359_lis_persistence" -> ((s, dir) => {
      // trend persistence per user: longest strictly-increasing and
      // strictly-decreasing subsequences of the event-value stream via
      // patience sorting — the oracle replays the same pile-top state as
      // a recursive CTE carrying two BIGINT lists.
      graft.streaming.EventStreams.lisLengths(
          t(s, dir, "events"), col("user_id"), col("ts"),
          col("event_id"), col("value"))
        .sortBy(Seq(col("u")))
    }),

    "q360_ols_two_regressors" -> ((s, dir) => {
      // multivariate step q330 can't take: price vs quantity AFTER
      // controlling for discount, per (returnflag, linestatus) — exact
      // 3x3 normal equations via Cramer in DECIMAL(38,0); one 9-sum
      // map-side-combined groupBy carries the whole fit.
      val li = t(s, dir, "lineitem").selectCols(Seq(
        concat(col("l_returnflag"), lit("|"), col("l_linestatus")).as("k"),
        col("l_quantity").cast("long").as("q"),
        expr("CAST(CAST(l_discount AS DECIMAL(18,6)) * 10000 AS BIGINT)")
          .as("disc_bp"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("price_c")))
      graft.operators.Relational.olsTwo(
          li, col("k"), col("q"), col("disc_bp"), col("price_c"))
        .sortBy(Seq(col("key")))
    }),

    "q361_rank_biased_overlap" -> ((s, dir) => {
      // judgment-free ranking agreement per nation: do "top-10 customers
      // by revenue" and "by order count" agree — RBO(p=0.9, depth 10) as
      // exact pinned-weight integers; each common doc contributes one
      // cumulative weight at max(rank_a, rank_b).
      import org.apache.spark.sql.expressions.Window
      val per = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .aggregate(
          Seq(col("c_nationkey").as("qid"), col("o_custkey").as("doc_id")),
          Seq(sum(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("rev"), count(lit(1)).as("cnt")))
      val byRev = Window.partitionBy(col("qid"))
        .orderBy(col("rev").desc, col("doc_id"))
      val byCnt = Window.partitionBy(col("qid"))
        .orderBy(col("cnt").desc, col("doc_id"))
      val a = per.withColumn("rank", row_number().over(byRev))
        .filterCol(col("rank") <= 10).selectCols(Seq(col("qid"),
          col("doc_id"), col("rank")))
      val b = per.withColumn("rank", row_number().over(byCnt))
        .filterCol(col("rank") <= 10).selectCols(Seq(col("qid"),
          col("doc_id"), col("rank")))
      graft.operators.Retrieval.rankBiasedOverlap10(a, b)
        .sortBy(Seq(col("qid")))
    }),

    "q362_ndcg" -> ((s, dir) => {
      // graded ranking quality per user: rank events by value, grade by
      // conversion strength (purchase 3, signup 2, click 1) — NDCG@10
      // with pinned integer log2 discounts; IDCG from the same grade
      // multiset sorted descending, no second shuffle.
      import org.apache.spark.sql.expressions.Window
      val byVal = Window.partitionBy(col("qid")).orderBy(
        col("value_micro").desc, col("event_id"))
      val ranked = t(s, dir, "events").selectCols(Seq(
          col("user_id").as("qid"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
            .as("value_micro"),
          expr("""CASE event_type WHEN 'purchase' THEN 3
                  WHEN 'signup' THEN 2 WHEN 'click' THEN 1
                  ELSE 0 END""").as("grade")))
        .withColumn("rank", row_number().over(byVal))
        .filterCol(col("rank") <= 10)
      graft.operators.Retrieval.ndcg10(ranked)
        .sortBy(Seq(col("qid")))
    }),

    "q363_dtw_profile_drift" -> ((s, dir) => {
      // phase-tolerant behavior drift per user: 12-bucket (2-hour)
      // activity profile on even vs odd days, compared by BOTH L1 and
      // DTW — a shifted-but-same-shape profile shows high L1, low DTW.
      // One groupBy builds both dense profiles; DTW is a row-local map.
      val prof = t(s, dir, "events")
        .selectCols(Seq(col("user_id").as("u"),
          expr("CAST(hour(ts) AS INT) DIV 2").as("bkt"),
          expr("day(ts) % 2").as("half")))
        .groupBy(col("u"))
        .agg(
          array((0 until 12).map(i => sum(when(col("bkt") === i &&
            col("half") === 0, 1L).otherwise(0L))): _*).as("a"),
          array((0 until 12).map(i => sum(when(col("bkt") === i &&
            col("half") === 1, 1L).otherwise(0L))): _*).as("b"))
      graft.streaming.EventStreams.dtwDistance(
          prof, col("u"), col("a"), col("b"))
        .sortBy(Seq(col("u")))
    }),

    "q364_allen_census" -> ((s, dir) => {
      // temporal-topology census: each user's per-type activity span
      // [first, last event], every ordered type pair classified into
      // Allen's 13 interval relations — one bounded per-user self-join
      // (≤10 pairs/user), endpoint-only comparisons.
      val iv = t(s, dir, "events").aggregate(
        Seq(col("user_id").as("u"), col("event_type").as("ty")),
        Seq(min(unix_micros(col("ts"))).as("st"),
          max(unix_micros(col("ts"))).as("en")))
      iv.alias("x").join(iv.alias("y"),
          col("x.u") === col("y.u") && col("x.ty") < col("y.ty"))
        .selectCols(Seq(col("x.u").as("u"),
          graft.operators.Relational.allenRelation(col("x.st"), col("x.en"),
            col("y.st"), col("y.en")).as("rel")))
        .aggregate(Seq(col("rel")), Seq(count(lit(1)).as("n_pairs"),
          countDistinct(col("u")).as("n_users")))
        .sortBy(Seq(col("rel")))
    }),

    "q365_huffman_budget" -> ((s, dir) => {
      // compression leverage of the corpus: exact Huffman bit budget for
      // the top-32 tokens (sum-of-merged-weights identity, no tree, no
      // logs) vs the 5-bit fixed-width budget. Real work = one (term,
      // count) groupBy + TakeOrdered; the greedy is a bounded 32-row fold.
      graft.operators.Corpus.huffmanBudget(
        t(s, dir, "documents"), graft.functions.TextFns.tokens(col("text")),
        k = 32)
    }),

    "q366_isotonic_calibration" -> ((s, dir) => {
      // monotone calibration of P(status=F) vs order-size bin: PAVA with
      // cross-multiplied exact pooling; the oracle computes the minimax
      // closed form max_{j<=i} min_{k>=i} avg(j..k) — an independent
      // characterization of the same optimum (floor commutes with
      // min/max, so ppm floors agree exactly).
      graft.operators.Validation.isotonicCalibration(
          t(s, dir, "orders"),
          least(lit(19L), expr("CAST(FLOOR(o_totalprice / 30000) AS BIGINT)")),
          col("o_orderstatus") === "F")
        .sortBy(Seq(col("bin")))
    }),

    "q367_skyline3d" -> ((s, dir) => {
      // part value frontier in three dimensions: cheapest list price,
      // most units sold, broadest order reach — no part on the frontier
      // is beaten on all three. Streaming BNL local pass + broadcast
      // anti-dominance join over candidates; oracle is NOT EXISTS.
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .aggregate(Seq(col("p_partkey").as("pk"),
          expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("price_c")),
          Seq(sum(col("l_quantity").cast("long")).as("qty"),
            countDistinct(col("l_orderkey")).as("ords")))
      graft.operators.Relational.skyline3D(per, col("pk"),
          col("price_c"), -col("qty"), -col("ords"))
        .sortBy(Seq(col("id")))
    }),

    "q368_activity_selection" -> ((s, dir) => {
      // scheduling capacity per user: events become sessions
      // [ts, ts + value seconds]; the earliest-finish greedy (optimal)
      // counts how many could run back-to-back without overlap —
      // q328's union sweep measures covered TIME, this counts JOBS.
      val iv = t(s, dir, "events").selectCols(Seq(
        col("user_id").as("u"), col("event_id").as("i"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("en")))
      graft.streaming.EventStreams.activitySelection(
          iv, col("u"), col("st"), col("en"), col("i"))
        .sortBy(Seq(col("u")))
    }),

    "q369_cuped" -> ((s, dir) => {
      // variance-reduced A/B readout: arm = user parity, Y = spend
      // (cents) on days 16+, X = pre-period spend on days 1-15; CUPED
      // adjusts each arm's mean by theta = Cov(X,Y)/Var(X), all exact
      // rationals with one sign-split ppm floor at the end.
      val per = t(s, dir, "events").aggregate(
        Seq(col("user_id").as("u")),
        Seq(sum(when(expr("day(ts) <= 15"),
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)"))
          .otherwise(0L)).as("x"),
          sum(when(expr("day(ts) > 15"),
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)"))
          .otherwise(0L)).as("y")))
      graft.operators.Validation.cupedAdjustment(
          per, col("u") % 2, col("x"), col("y"))
        .sortBy(Seq(col("arm")))
    }),

    "q403_dataset_card" -> ((s, dir) =>
      // one-call dataset-card export (round-10 surface growth): column
      // profile + n_chars histogram + top-10 token heavy hitters composed
      // into ONE long-format driver fact (section, key, metric,
      // value_str) — the card a lake publishes next to a dataset version.
      // Three partial-agg passes over one scan; every cell is a count, an
      // exact distinct, a bucket id, or a raw min/max string, so the
      // whole card replays in DuckDB.
      Validation.datasetCard(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"),
          col("n_chars").cast("double"), histLo = 0.0, histHi = 2000.0,
          histBuckets = 8, tokens = TextFns.tokens(col("text")), topK = 10)
        .sortBy(Seq(col("section"), col("key"), col("metric")))),

    "q404_arrow_roundtrip" -> ((s, dir) => {
      // Arrow IPC interchange round trip (the reference's SRecordBatch
      // surface, main.rs:103-105, distributed): every partition encodes
      // to Arrow record batches and decodes back; hash-matching the plain
      // projection proves the interchange is lossless for ids,
      // categoricals, numerics AND free text (Arrow UTF-8 is exact, so
      // text rides along — unlike the XML roundtrip where readers trim).
      val docs = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text")))
      Engine.fromArrowBatches(s, Engine.toArrowBatches(docs), docs.schema)
        .sortBy(Seq(col("doc_id")))
    }),

    "q405_ivf_index_persist" -> ((s, dir) => {
      // Build-once/serve-many ANN (r11): the IVF index — centroids plus
      // the corpus cell assignments PARTITIONED BY cell — persists to
      // parquet and top-k is served from the stored layout: no centroid
      // training, no corpus re-assignment, and with nprobe < nlist only
      // the probed cell directories are read (partition pruning applied
      // to vector search). Same fixture quantizer and probe config as
      // q38, so the served answer must hash-match q38's independent
      // DuckDB replay verbatim — the layout changes the plan, never the
      // answer (the q150 pattern). The write is inside the timed query:
      // amortizing it across queries is exactly the trade being measured.
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val queries = corpus.filterCol(col("id") < 10)
      val cents = corpus.filterCol(col("id") < 16)
        .selectCols(Seq(col("id").cast("int").as("cell"), col("v").as("cv")))
      val sf = new java.io.File(dir).getName
      val idx = s"${scratchRoot}/$sf/ivf_index"
      Similarity.writeIvfIndex(corpus, idx, nlist = 16, centroids = Some(cents))
      Similarity.ivfTopKIndexed(s, idx, queries, nprobe = 4, k = 5)
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q406_ivfpq_index_persist" -> ((s, dir) => {
      // q174's IVFADC served from a PERSISTED quantizer pair (coarse
      // centroids + PQ residual codebooks reloaded from parquet): codebook
      // training is the once-per-corpus cost, serving pays only LUT build
      // + probed-cell ADC scan. The SAME pqFixture builder as q174, so
      // "identical quantizer, hash-match q174's oracle verbatim" is true
      // by construction, not by keeping two copied blocks in lockstep.
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")))
      val (cents, cb) = pqFixture(corpus)
      val sf = new java.io.File(dir).getName
      val idx = s"${scratchRoot}/$sf/pq_index"
      Similarity.writePqIndex(cents, cb, idx)
      val (centsR, cbR) = Similarity.readPqIndex(s, idx)
      Similarity.ivfPqAdcTopK(corpus, corpus.filterCol(col("id") < 4),
          centsR, cbR, m = 8, subDims = 8, nprobe = 2, k = 5)
        .withColumn("adist", round(col("adist"), 6))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q408_leak_safe_split" -> ((s, dir) => {
      // Leakage-safe train/validation split (r11): a per-doc random
      // holdout strands near-dup twins on opposite sides of the boundary
      // — val contamination by construction; splitting by the near-dup
      // COMPONENT id keeps every clique on one side, provably (leak_group
      // must be 0). One row: corpus size, ≥0.8-Jaccard pair volume, val
      // sizes and cross-split pair counts under both keys. Exact pair
      // generation + recursive-CTE components + the HUGEINT FNV fold all
      // replay in DuckDB, so the oracle verifies the leak numbers, not
      // just the split arithmetic. At 100 TB swap the exact pair oracle
      // for minhashLshPairs — groupHoldout itself is one stateless
      // projection either way.
      val docs = t(s, dir, "documents").selectCols(Seq(col("doc_id"), col("text")))
      // pairs feed components (consumed eagerly inside) AND the leak
      // join; sp feeds one aggregate and both sides of that join — both
      // persist so the quadratic pair generation and the split projection
      // run once (tiny frames; the bench's clearCache drops them between
      // passes, the repo's minhashLshPairs convention)
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          threshold = 0.8)
        .selectCols(Seq(col("id_a"), col("id_b")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val comp = Dedup.nearDupComponents(pairs)
      val fam = docs.join(comp, docs("doc_id") === comp("id"), "left")
        .selectCols(Seq(col("doc_id"),
          coalesce(col("component_id"), col("doc_id")).as("family")))
      val naive = Corpus.groupHoldout(fam, col("doc_id"), col("doc_id"), 128)
        .selectCols(Seq(col("id"), col("split").as("s_naive")))
      val grp = Corpus.groupHoldout(fam, col("doc_id"), col("family"), 128)
        .selectCols(Seq(col("id").as("gid"), col("split").as("s_group")))
      val sp = naive.join(grp, col("id") === col("gid"))
        .selectCols(Seq(col("id"), col("s_naive"), col("s_group")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val agg = sp.aggregate(Seq.empty, Seq(
        count(lit(1)).as("n_docs"),
        sum(when(col("s_naive") === "val", 1L).otherwise(0L)).as("n_val_naive"),
        sum(when(col("s_group") === "val", 1L).otherwise(0L)).as("n_val_group")))
      val a = sp.selectCols(Seq(col("id").as("id_a"),
        col("s_naive").as("na"), col("s_group").as("ga")))
      val b = sp.selectCols(Seq(col("id").as("id_b"),
        col("s_naive").as("nb"), col("s_group").as("gb")))
      val leak = pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
        .aggregate(Seq.empty, Seq(
          count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("na") =!= col("nb"), 1L).otherwise(0L)), lit(0L))
            .as("leak_naive"),
          coalesce(sum(when(col("ga") =!= col("gb"), 1L).otherwise(0L)), lit(0L))
            .as("leak_group")))
      agg.crossJoin(leak)
        .selectCols(Seq(col("n_docs"), col("n_pairs"), col("n_val_naive"),
          col("n_val_group"), col("leak_naive"), col("leak_group")))
    }),

    "q409_quality_filter_eval" -> ((s, dir) =>
      // the learned filter's HONEST number (r11): deterministic hash
      // holdout (the groupHoldout FNV low-bit rule, 128/1024 held out),
      // depth-2 tree trained on the train partition ONLY, confusion
      // matrix on the held-out partition — training, feature selection,
      // every leaf's majority vote, and the val-side scoring all replay
      // in DuckDB via the generated eval oracle. q246/q407 report
      // training-set fit; this is the generalization metric a learned
      // quality filter must clear before replacing the q28 heuristics
      Validation.decisionTree2Eval(t(s, dir, "documents"),
        Seq("len" -> col("n_chars"),
          "ntok" -> size(TextFns.tokens(col("text"))).cast("long")),
        col("lang") === "en",
        isTrain = pmod(graft.plans.TextExprs.fnv64(
          col("doc_id").cast("string")), lit(1024L)) >= 128)),

    "q407_decision_tree2" -> ((s, dir) =>
      // the learned-quality-filter baseline (r11): exact depth-2 decision
      // tree over (n_chars, token count) predicting lang='en' — feature
      // SELECTION at every node (decile-edge candidates, integer Gini,
      // (wg, feature, threshold) tie order), root winner splits, branches
      // train their own stumps. The whole training run — which feature
      // each node picked included — replays in DuckDB via the generated
      // 3-node oracle (treeOracle); q246's one-split stump is the
      // baseline this must beat on reduction_ppm to justify depth
      Validation.decisionTree2(t(s, dir, "documents"),
          Seq("len" -> col("n_chars"),
            "ntok" -> size(TextFns.tokens(col("text"))).cast("long")),
          col("lang") === "en")
        .sortBy(Seq(col("node")))),

    "q402_mst_distributed" -> ((s, dir) => {
      // q370's forest through the DISTRIBUTED Borůvka rounds
      // (maxLocalEdges=0 — the 100 TB code path; q370 itself takes the
      // driver Kruskal at sf scales): per-component lightest edge,
      // functional-graph merge, geometric edge shrink — against the SAME
      // Kruskal-replaying oracle. Three independent algorithms (driver
      // Kruskal, distributed Borůvka, recursive-CTE Kruskal) now pin one
      // verified edge set, and the cluster-scale tier is driver-verified
      // per round rather than spec-only.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"))).distinctAll
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .aggregate(Seq(col("x.l_partkey").as("a"),
          col("y.l_partkey").as("b")), Seq(count(lit(1)).as("n")))
        .selectCols(Seq(col("a"), col("b"),
          (lit(1L) + col("n") % 7).as("w")))
      graft.operators.Graph.boruvkaMst(e, maxLocalEdges = 0L)
        .sortBy(Seq(col("w"), col("a"), col("b")))
    }),

    "q370_boruvka_mst" -> ((s, dir) => {
      // minimum spanning forest of the weighted co-purchase graph by
      // Borůvka (per-component lightest edge, components halve per
      // round); (w, a, b) tuple order makes the forest unique, so the
      // Kruskal-replaying oracle must select the IDENTICAL edge set —
      // two different algorithms, one verified answer.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey"))).distinctAll
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .aggregate(Seq(col("x.l_partkey").as("a"),
          col("y.l_partkey").as("b")), Seq(count(lit(1)).as("n")))
        .selectCols(Seq(col("a"), col("b"),
          (lit(1L) + col("n") % 7).as("w")))
      graft.operators.Graph.boruvkaMst(e)
        .sortBy(Seq(col("w"), col("a"), col("b")))
    }),

    "q371_concentration" -> ((s, dir) => {
      // revenue inequality per nation: exact Gini (sorted-rank identity,
      // tie-invariant), Herfindahl, and top-customer share — the
      // "is this market one whale or many minnows" readout, one window
      // + one five-sum groupBy.
      val per = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .aggregate(Seq(col("c_nationkey").as("nk"),
          col("o_custkey").as("ck")),
          Seq(sum(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("rev")))
      graft.operators.Relational.concentrationReport(
          per, col("nk"), col("rev"))
        .sortBy(Seq(col("key")))
    }),

    "q372_weighted_scheduling" -> ((s, dir) => {
      // value-optimal session selection per user (q368 maximizes COUNT;
      // under weights the greedy is suboptimal): classic weighted
      // interval scheduling DP, sessions [ts, ts + value s] worth their
      // value in micros.
      val iv = t(s, dir, "events").selectCols(Seq(
        col("user_id").as("u"), col("event_id").as("i"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("en"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("vm")))
      graft.streaming.EventStreams.weightedIntervalSchedule(
          iv, col("u"), col("st"), col("en"), col("i"), col("vm"))
        .sortBy(Seq(col("u")))
    }),

    "q373_kaplan_meier" -> ((s, dir) => {
      // time-to-failure survival per cohort: entry = first signup, event
      // = first error at-or-after entry, right-censored at the global
      // horizon; Kaplan-Meier steps as the ppm floor recurrence
      // S <- floor(S * (n-d)/n), replayed by a recursive-CTE oracle.
      val ev = t(s, dir, "events").selectCols(Seq(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tm")))
      val entry = ev.filterCol(col("event_type") === "signup")
        .aggregate(Seq(col("user_id").as("u")), Seq(min(col("tm")).as("ent")))
      val hz = ev.aggregate(Nil, Seq(max(col("tm")).as("hz")))
      val subj = entry
        .join(ev.filterCol(col("event_type") === "error")
            .selectCols(Seq(col("user_id").as("du"), col("tm").as("dts"))),
          col("u") === col("du") && col("dts") >= col("ent"), "left")
        .aggregate(Seq(col("u"), col("ent")), Seq(min(col("dts")).as("dt")))
        .crossJoin(broadcast(hz))
        .selectCols(Seq((col("u") % 3).as("g"),
          expr("(coalesce(dt, hz) - ent) DIV 1000000").as("dur"),
          when(col("dt").isNotNull, 1L).otherwise(0L).as("evt")))
      graft.operators.Validation.kaplanMeier(
          subj, col("g"), col("dur"), col("evt"))
        .sortBy(Seq(col("g"), col("t")))
    }),

    "q374_did" -> ((s, dir) => {
      // difference-in-differences readout per event family: treatment =
      // user parity, post = days 16+, metric = value in micros; the
      // causal delta as one exact rational per group.
      val e = t(s, dir, "events").selectCols(Seq(
        col("event_type").as("g"), (col("user_id") % 2).as("tr"),
        when(expr("day(ts) > 15"), 1).otherwise(0).as("po"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("v")))
      graft.operators.Validation.didReadout(
          e, col("g"), col("tr"), col("po"), col("v"))
        .sortBy(Seq(col("g")))
    }),

    "q375_ccf_lag" -> ((s, dir) => {
      // does purchasing FOLLOW clicking, and by how many hours: hourly
      // click/purchase counts cross-correlated at lags 0-6, exact signed
      // r-squared ppm per lag.
      val hb = t(s, dir, "events")
        .filterCol(col("event_type").isin("click", "purchase"))
        .aggregate(Seq(expr("unix_micros(ts) DIV 3600000000").as("hb")),
          Seq(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y")))
      graft.streaming.EventStreams.crossCorrelation(
          hb, col("hb"), col("x"), col("y"), maxLag = 6)
        .sortBy(Seq(col("lag")))
    }),

    "q376_drawdown" -> ((s, dir) => {
      // per-user net ledger (purchases credit, errors debit, micros):
      // running-peak drawdown report — max depth and the step where the
      // worst trough FIRST occurs, ordered by (ts, event_id).
      val fl = t(s, dir, "events")
        .filterCol(col("event_type").isin("purchase", "error"))
        .selectCols(Seq(col("user_id").as("u"),
          unix_micros(col("ts")).as("tm"), col("event_id").as("i"),
          when(col("event_type") === "purchase",
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
            .otherwise(
              -expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
            .as("v")))
      graft.streaming.EventStreams.drawdownReport(
          fl, col("u"), Seq(col("tm"), col("i")), col("v"))
        .sortBy(Seq(col("k")))
    }),

    "q377_uplift_qini" -> ((s, dir) => {
      // uplift evaluation: users ranked by pre-period click count,
      // treatment = parity, outcome = post-period purchases; per-decile
      // uplift and the cumulative Qini curve as exact rationals.
      val per = t(s, dir, "events").aggregate(
        Seq(col("user_id").as("u")),
        Seq(sum(when(expr("day(ts) <= 15") &&
            col("event_type") === "click", 1L).otherwise(0L)).as("sc"),
          sum(when(expr("day(ts) > 15") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("oc")))
      graft.operators.Validation.upliftDeciles(
          per, col("sc"), col("u"), col("u") % 2, col("oc"), buckets = 10)
        .sortBy(Seq(col("bucket")))
    }),

    "q378_seasonal_decompose" -> ((s, dir) => {
      // weekly-seasonal additive decomposition of daily revenue (micros)
      // per event family: centered 7-day integer moving-average trend,
      // phase means sign-split, residual exact.
      val daily = t(s, dir, "events").aggregate(
        Seq(col("event_type").as("k"),
          expr("unix_micros(ts) DIV 86400000000").as("d")),
        Seq(sum(expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("v")))
      graft.streaming.EventStreams.seasonalDecompose(
          daily, col("k"), col("d"), col("v"), period = 7)
        .sortBy(Seq(col("k"), col("t")))
    }),

    "q379_runs_test" -> ((s, dir) => {
      // is the per-event value sequence random around its median: runs
      // count vs the Wald-Wolfowitz expectation, exact ppm.
      val e = t(s, dir, "events").selectCols(Seq(
        col("event_type").as("k"), unix_micros(col("ts")).as("tm"),
        col("event_id").as("i"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("v")))
      graft.streaming.EventStreams.runsTest(
          e, col("k"), Seq(col("tm"), col("i")), col("v"))
        .sortBy(Seq(col("k")))
    }),

    "q380_pettitt" -> ((s, dir) => {
      // nonparametric single-changepoint scan over daily revenue per
      // event family: doubled-midrank Pettitt statistic, first argmax.
      val daily = t(s, dir, "events").aggregate(
        Seq(col("event_type").as("k"),
          expr("unix_micros(ts) DIV 86400000000").as("d")),
        Seq(sum(expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("v")))
      graft.streaming.EventStreams.pettittChangepoint(
          daily, col("k"), Seq(col("d")), col("v"))
        .sortBy(Seq(col("k")))
    }),

    "q381_seq_patterns" -> ((s, dir) => {
      // GSP-style sequential-pattern mining: which ordered event-type
      // triples do users actually traverse — exact support via the
      // first/last-extremes identity, no triple self-join.
      val ev = t(s, dir, "events").selectCols(Seq(col("user_id").as("u"),
        col("event_type").as("ty"), unix_micros(col("ts")).as("tm")))
      graft.streaming.EventStreams.seqPatternSupport(
          ev, col("u"), col("ty"), col("tm"))
        .sortBy(Seq(col("a"), col("b"), col("c")))
    }),

    "q382_cvm" -> ((s, dir) => {
      // whole-distribution drift check per user cohort: click vs view
      // value distributions under the two-sample Cramer-von Mises
      // statistic, doubled midranks, exact ppm.
      val e = t(s, dir, "events")
        .filterCol(col("event_type").isin("click", "view"))
        .selectCols(Seq((col("user_id") % 2).as("k"),
          when(col("event_type") === "view", 1).otherwise(0).as("s"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
            .as("v")))
      graft.operators.Validation.cramerVonMises(
          e, col("k"), col("s"), col("v"))
        .sortBy(Seq(col("k")))
    }),

    "q383_mcnemar" -> ((s, dir) => {
      // did the SAME users purchase differently before vs after mid-
      // month: McNemar discordant-pair statistic per cohort.
      val per = t(s, dir, "events").aggregate(
        Seq(col("user_id").as("u")),
        Seq(max(when(expr("day(ts) <= 15") &&
            col("event_type") === "purchase", 1).otherwise(0)).as("p0"),
          max(when(expr("day(ts) > 15") &&
            col("event_type") === "purchase", 1).otherwise(0)).as("p1")))
      graft.operators.Validation.mcnemarReadout(
          per, col("u") % 3, col("p0"), col("p1"))
        .sortBy(Seq(col("g")))
    }),

    "q384_spearman" -> ((s, dir) => {
      // monotone association between event value and time per event
      // family: Spearman over doubled midranks, signed rho-squared ppm.
      val e = t(s, dir, "events").selectCols(Seq(
        col("event_type").as("k"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("x"),
        unix_micros(col("ts")).as("y")))
      graft.operators.Validation.spearmanReport(
          e, col("k"), col("x"), col("y"))
        .sortBy(Seq(col("k")))
    }),

    "q385_pr_curve" -> ((s, dir) => {
      // operating-point sweep for the q377 ranking used as a converter
      // classifier: precision/recall/F1 at each score-decile threshold,
      // exact ppm.
      val per = t(s, dir, "events").aggregate(
        Seq(col("user_id").as("u")),
        Seq(sum(when(expr("day(ts) <= 15") &&
            col("event_type") === "click", 1L).otherwise(0L)).as("sc"),
          max(when(expr("day(ts) > 15") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("y")))
      graft.operators.Validation.prCurveDeciles(
          per, col("sc"), col("u"), col("y"), buckets = 10)
        .sortBy(Seq(col("bucket")))
    }),

    "q386_corr_matrix" -> ((s, dir) => {
      // all-pairs association screen over four small-integer lineitem
      // variables from ONE scan: 15 sufficient statistics, 6 pair rows
      // exploded from the single aggregate.
      graft.operators.Relational.corrMatrix(t(s, dir, "lineitem"), Seq(
          "qty" -> col("l_quantity").cast("long"),
          "disc_pct" ->
            expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"),
          "tax_pct" ->
            expr("CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)"),
          "ship_day" -> dayofmonth(col("l_shipdate"))))
        .sortBy(Seq(col("var_a"), col("var_b")))
    }),

    "q387_holt_winters" -> ((s, dir) => {
      // weekly-seasonal exponential smoothing of daily revenue per event
      // family: additive Holt-Winters, ppm weights, truncated integer
      // steps, 3-day-ahead forecasts; recursive-CTE oracle carries the
      // seasonal circular queue as a BIGINT list.
      val daily = t(s, dir, "events").aggregate(
        Seq(col("event_type").as("k"),
          expr("unix_micros(ts) DIV 86400000000").as("d")),
        Seq(sum(expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("v")))
      graft.streaming.EventStreams.holtWinters(
          daily, col("k"), col("d"), col("v"), period = 7,
          alphaPpm = 300000L, betaPpm = 100000L, gammaPpm = 200000L)
        .sortBy(Seq(col("k")))
    }),

    "q388_cdc_apply" -> ((s, dir) => {
      // materialize the current user table from the event log read as a
      // CDC changelog: signup inserts, interactions upsert, errors
      // delete, later activity resurrects — last writer wins inside the
      // aggregate, no window.
      val ch = t(s, dir, "events").selectCols(Seq(col("user_id").as("u"),
        unix_micros(col("ts")).as("tm"), col("event_id").as("i"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D").otherwise("U").as("op"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("v")))
      graft.streaming.EventStreams.cdcApply(
          ch, col("u"), Seq(col("tm"), col("i")), col("op"), col("v"))
        .sortBy(Seq(col("k")))
    }),

    "q389_burst_viterbi" -> ((s, dir) => {
      // which event families have genuine burst DAYS (vs noise): the
      // integer L1 two-state Viterbi over daily counts, burst rate 3x
      // the key's own median, fewest-burst-days tie break.
      val daily = t(s, dir, "events").aggregate(
        Seq(col("event_type").as("k"),
          expr("unix_micros(ts) DIV 86400000000").as("d")),
        Seq(count(lit(1)).as("y")))
      graft.streaming.EventStreams.burstViterbi(
          daily, col("k"), col("d"), col("y"))
        .sortBy(Seq(col("k")))
    }),

    "q390_best_streak" -> ((s, dir) => {
      // best contiguous net-positive run of the q376 ledger per user —
      // Kadane's DP as two prefix windows, zero sequential code.
      val fl = t(s, dir, "events")
        .filterCol(col("event_type").isin("purchase", "error"))
        .selectCols(Seq(col("user_id").as("u"),
          unix_micros(col("ts")).as("tm"), col("event_id").as("i"),
          when(col("event_type") === "purchase",
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
            .otherwise(
              -expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
            .as("v")))
      graft.streaming.EventStreams.bestStreak(
          fl, col("u"), Seq(col("tm"), col("i")), col("v"))
        .sortBy(Seq(col("k")))
    }),

    "q391_lorenz" -> ((s, dir) => {
      // the curve behind q371's Gini: cumulative revenue share by
      // customer decile, cents-exact.
      val per = t(s, dir, "orders").aggregate(
        Seq(col("o_custkey").as("ck")),
        Seq(sum(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("rev")))
      graft.operators.Validation.lorenzDeciles(
          per, col("rev"), col("ck"), buckets = 10)
        .sortBy(Seq(col("bucket")))
    }),

    "q392_simpson_diversity" -> ((s, dir) => {
      // language concentration per document source: Simpson match
      // probability and Gini-Simpson diversity, exact rationals.
      graft.operators.Validation.simpsonDiversity(
          t(s, dir, "documents"), col("source"), col("lang"))
        .sortBy(Seq(col("g")))
    }),

    "q393_motifs" -> ((s, dir) => {
      // SAX-lite: daily event counts symbolized into within-key rank
      // quartiles, most frequent 3-day shape per event family.
      val daily = t(s, dir, "events").aggregate(
        Seq(col("event_type").as("k"),
          expr("unix_micros(ts) DIV 86400000000").as("d")),
        Seq(count(lit(1)).as("y")))
      graft.streaming.EventStreams.quartileMotifs(
          daily, col("k"), Seq(col("d")), col("y"))
        .sortBy(Seq(col("k")))
    }),

    "q394_sql_variables" -> ((s, dir) => {
      // Spark 4 SQL-surface trio in one pass: a SESSION VARIABLE holds
      // the mean order value in cents (exact SUM DIV COUNT), EXECUTE
      // IMMEDIATE binds it into parameterized dynamic SQL via USING
      // (never string interpolation), and the statement itself uses
      // GROUP BY ALL / ORDER BY ALL.
      t(s, dir, "orders").createOrReplaceTempView("graft_q394_orders")
      s.sql("DECLARE OR REPLACE VARIABLE graft_q394_cut BIGINT")
      s.sql("""SET VARIABLE graft_q394_cut =
           (SELECT SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) DIV COUNT(*) FROM graft_q394_orders)""")
      s.sql("""EXECUTE IMMEDIATE
           'SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  * 100 AS BIGINT) > ? THEN 1 ELSE 0 END) AS BIGINT)
                AS n_above,
              ? AS cut_cents
            FROM graft_q394_orders GROUP BY ALL ORDER BY ALL'
           USING graft_q394_cut, graft_q394_cut""")
    }),

    "q395_clustering_coeff" -> ((s, dir) => {
      // neighborhood cliquishness of the near-dup graph: local
      // clustering coefficient per doc — near-1 inside true duplicate
      // clusters, 0 along q50's transitive chains.
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        col("doc_id"), col("text"), threshold = 0.8)
      graft.operators.Graph.clusteringCoefficients(pairs)
        .sortBy(Seq(col("id")))
    }),

    "q396_ktruss" -> ((s, dir) => {
      // densest-core extraction from the near-dup graph: 3-truss peeling
      // (every surviving edge closes a triangle) — the edge-level
      // cohesion filter that separates true duplicate cliques from
      // borderline chains q50's closure would merge.
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        col("doc_id"), col("text"), threshold = 0.8)
      graft.operators.Graph.kTrussPeel(pairs, k = 3, rounds = 2)
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q397_rfm" -> ((s, dir) => {
      // classic RFM segmentation of the user base: recency (days from
      // the corpus horizon), frequency, monetary micros, each quintiled
      // independently, composite code 100r+10f+m.
      val per = t(s, dir, "events").aggregate(
        Seq(col("user_id").as("u")),
        Seq(max(expr("unix_micros(ts) DIV 86400000000")).as("last_d"),
          count(lit(1)).as("fq"),
          sum(expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
            .as("mo")))
      val hz = per.aggregate(Nil, Seq(max(col("last_d")).as("hz")))
      val rf = per.crossJoin(broadcast(hz)).selectCols(Seq(col("u"),
        (col("hz") - col("last_d")).as("rd"), col("fq"), col("mo")))
      graft.operators.Validation.rfmScores(
          rf, col("u"), col("rd"), col("fq"), col("mo"), buckets = 5)
        .sortBy(Seq(col("u")))
    }),

    "q398_logrank" -> ((s, dir) => {
      // does the odd-parity cohort hit its first error faster than
      // chance: log-rank O-E per event time over the q373 subjects.
      val ev = t(s, dir, "events").selectCols(Seq(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("tm")))
      val entry = ev.filterCol(col("event_type") === "signup")
        .aggregate(Seq(col("user_id").as("u")), Seq(min(col("tm")).as("ent")))
      val hz = ev.aggregate(Nil, Seq(max(col("tm")).as("hz")))
      val subj = entry
        .join(ev.filterCol(col("event_type") === "error")
            .selectCols(Seq(col("user_id").as("du"), col("tm").as("dts"))),
          col("u") === col("du") && col("dts") >= col("ent"), "left")
        .aggregate(Seq(col("u"), col("ent")), Seq(min(col("dts")).as("dt")))
        .crossJoin(broadcast(hz))
        .selectCols(Seq((col("u") % 2).as("g"),
          expr("(coalesce(dt, hz) - ent) DIV 1000000").as("dur"),
          when(col("dt").isNotNull, 1L).otherwise(0L).as("evt")))
      graft.operators.Validation.logRank(
          subj, col("g"), col("dur"), col("evt"))
        .sortBy(Seq(col("t")))
    }),

    "q399_read_csv" -> ((s, dir) => {
      // read-csv as a driver fact (closing the one §2 row without an
      // oracle-backed CORRECTNESS entry): orders written to CSV through
      // Engine.writeCsv, read back through Engine.readCsv — header row =
      // column names, schema inferred: the reference's exact
      // CsvReadOptions::new() defaults (main.rs:574) — and hash-matched
      // against the parquet original. Proves header naming, type
      // inference, quoting, and double textual round-trip (Java
      // shortest-repr Double.toString reparses exactly) are lossless.
      // Inference correctly picks the narrowest integer type (INT at
      // this key range); the cast restores the parquet width so the
      // driver's dtype-sensitive hash compares like for like.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/orders_csv"
      Engine.writeCsv(t(s, dir, "orders").selectCols(Seq(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))), scratch)
      Engine.readCsv(s, scratch).selectCols(Seq(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          col("o_orderpriority")))
        .sortBy(Seq(col("o_orderkey")))
    }),

    "q400_udtf_ngrams" -> ((s, dir) => {
      // UDTF (generator) surface end-to-end through SQL: a positional
      // 3-gram shingler registered as a table function (functions/Udtfs
      // — a Catalyst Generator planned by GenerateExec, row-local, no
      // shuffle), LATERAL VIEW'd over documents and aggregated. The
      // generator tier completes the UDF family beyond the reference's
      // scalar-only stub (main.rs:598-636). Tokenization mirrors
      // TextFns.tokens / the q50 oracle: lower(trim), split \s+, drop
      // empties; docs with < 3 tokens emit nothing.
      graft.functions.Udtfs.defineUdtf(s, "q400_ngrams",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("gram",
            org.apache.spark.sql.types.StringType))),
        args => {
          val n = 3
          val toks = Option(args.head).map(_.asInstanceOf[String]).getOrElse("")
            .trim.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          (0 to toks.length - n).iterator.map(i =>
            Seq(i.toLong, toks.slice(i, i + n).mkString(" ")))
        }, arity = 1)
      t(s, dir, "documents").createOrReplaceTempView("q400_docs")
      s.sql("""
        SELECT g.gram AS gram, count(*) AS n, sum(g.pos) AS pos_sum
        FROM q400_docs d
        LATERAL VIEW q400_ngrams(d.text) g AS pos, gram
        GROUP BY g.gram
        HAVING count(*) >= 3
        ORDER BY n DESC, gram
        LIMIT 100""")
    }),

    "q401_udtf_sql_function" -> ((s, dir) => {
      // UDTF composed INTO a catalog object: the Scala-closure generator
      // (q400's tier) wrapped by a SQL CREATE FUNCTION ... RETURNS TABLE
      // (q277's tier), so downstream SQL users call a PARAMETERIZED table
      // function — q401_long_toks(minLen) — with zero knowledge that a
      // JVM closure sits underneath. The registration chain this
      // exercises: FunctionRegistry (generator) -> SQL function catalog
      // (wrapper) -> analyzer inlining the wrapper body with the bound
      // parameter; the generator stays a row-local Generate node (no
      // shuffle) inside the inlined plan.
      graft.functions.Udtfs.defineUdtf(s, "q401_tok",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("tok",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("nchars",
            org.apache.spark.sql.types.LongType))),
        args => {
          val toks = Option(args.head).map(_.asInstanceOf[String]).getOrElse("")
            .trim.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          toks.iterator.zipWithIndex.map { case (tk, i) =>
            Seq(i.toLong, tk, tk.length.toLong)
          }
        }, arity = 1)
      t(s, dir, "documents").createOrReplaceTempView("q401_docs")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION q401_long_toks(minLen BIGINT)
           RETURNS TABLE (doc_id BIGINT, pos BIGINT, tok STRING)
           RETURN SELECT d.doc_id, t.pos, t.tok
             FROM q401_docs d
             LATERAL VIEW q401_tok(d.text) t AS pos, tok, nchars
             WHERE t.nchars >= minLen""")
      s.sql("""
        SELECT tok, count(*) AS n, min(pos) AS first_pos,
               count(DISTINCT doc_id) AS n_docs
        FROM q401_long_toks(5)
        GROUP BY tok
        HAVING count(*) >= 3
        ORDER BY n DESC, tok
        LIMIT 50""")
    }),

    "q316_ivf_cell_drift" -> ((s, dir) => {
      // ANN index maintenance signal: assign the OLD half and the NEW
      // half of the corpus to the same centroids (q65's fixed first-8,
      // exact l2) and compare per-cell populations — a cell whose share
      // moves is where the IVF index goes stale first; growth in
      // sign-split floor ppm. Two broadcast assignments + cell-sized
      // aggregates.
      val e = t(s, dir, "embeddings")
      val cents = e.filterCol(col("vec_id") < 8)
        .selectCols(Seq(col("vec_id").as("cid"), col("embedding").as("cv")))
      def cells(half: Long) = Similarity.assignToCentroids(
          e.filterCol(pmod(col("vec_id"), lit(2L)) === half)
            .selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v"))),
          cents)
        .groupBy(col("cid")).agg(count(lit(1)).as(s"n_$half"))
      cells(0L).join(cells(1L), Seq("cid"), "full")
        .selectCols(Seq(col("cid"),
          coalesce(col("n_0"), lit(0L)).as("n_old"),
          coalesce(col("n_1"), lit(0L)).as("n_new")))
        .withColumn("growth_ppm", expr(
          """CASE WHEN n_old = 0 THEN NULL
               WHEN n_new >= n_old THEN ((n_new - n_old) * 1000000L) DIV n_old
               ELSE -(((n_old - n_new) * 1000000L) DIV n_old) END"""))
        .sortBy(Seq(col("cid")))
    }),

    "q317_order_reconciliation" -> ((s, dir) => {
      // money-column reconciliation: does each order's header total equal
      // the sum of its lines' extendedprice·(1−disc)·(1+tax)? Compared in
      // exact integer MICROS (decimal sums — never a float equality);
      // headerless/lineless orders counted separately, one report row.
      // The cross-table consistency gate a finance pipeline runs nightly.
      val o = t(s, dir, "orders").selectCols(Seq(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("o_mic")))
      val l = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
          .as("rev_mic"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "full")
        .selectCols(Seq(col("o_orderkey"), col("l_orderkey"), col("o_mic"),
          col("rev_mic")))
        .aggregate(Seq.empty, Seq(
          count(lit(1)).as("n"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_orphan_lines"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_lineless"),
          sum(when(col("o_mic") === col("rev_mic"), 1L).otherwise(0L)).as("n_exact"),
          sum(when(abs(col("o_mic") - col("rev_mic")) <= 10000L, 1L).otherwise(0L))
            .as("n_within_cent"),
          max(abs(col("o_mic") - col("rev_mic"))).as("max_abs_diff_mic")))
    }),

    "q315_rendezvous_resize" -> ((s, dir) => {
      // HRW sharding's resize promise, measured: assign every customer at
      // 8 shards and again at 9 — only keys whose NEW shard's hash wins
      // move (~1/9 of them), where mod-n hashing reshuffles nearly all.
      // Per-shard movement + the global moved share in ppm; portable FNV
      // makes every assignment (and so the movement ratio) replayable.
      val keys = t(s, dir, "customer").selectCols(Seq(col("c_custkey")))
      val a8 = Relational.rendezvousAssign(keys, col("c_custkey"), 8)
        .withColumnRenamed("shard", "shard8")
      val a9 = Relational.rendezvousAssign(keys, col("c_custkey"), 9)
        .withColumnRenamed("shard", "shard9")
      val j = a8.join(a9, Seq("id"))
      val total = j.agg(count(lit(1)).as("n_total"),
        sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved_total"))
      j.groupBy(col("shard8").as("shard"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L)).as("n_moved"))
        .crossJoin(broadcast(total))
        .selectCols(Seq(col("shard"), col("n"), col("n_moved"),
          expr("(n_moved * 1000000L) DIV n").as("moved_ppm"),
          col("n_total"), col("n_moved_total"),
          expr("(n_moved_total * 1000000L) DIV n_total").as("moved_total_ppm")))
        .sortBy(Seq(col("shard")))
    }),

    "q313_embedding_drift" -> ((s, dir) => {
      // did the embedding space move: even vs odd vec_id splits as two
      // "versions" — per-dim DECIMAL-exact centroids (q79's mean rule),
      // per-dim diff, squared centroid shift as the dim-ordered IEEE fold
      // (q185's norm discipline). The ANN-index-rebuild monitor.
      val e = t(s, dir, "embeddings")
      Similarity.embeddingDrift(
          e.filterCol(pmod(col("vec_id"), lit(2L)) === 0L),
          e.filterCol(pmod(col("vec_id"), lit(2L)) === 1L),
          col("embedding"))
        .sortBy(Seq(col("dim")))
    }),

    "q314_dup_cluster_sizes" -> ((s, dir) => {
      // dedup observability: the near-dup component SIZE distribution —
      // near-cliques vs chain over-merge shows up here first (q129's
      // triangle census is the other lens); plus how many docs pair at
      // all. Composition of q34 pairs -> q50 components -> histogram.
      val comps = Dedup.nearDupComponents(
        Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"),
          col("text"), threshold = 0.8))
      val sizes = comps.groupBy(col("component_id")).agg(count(lit(1)).as("sz"))
      val totals = sizes.agg(count(lit(1)).as("n_components"),
        sum(col("sz")).as("n_docs_paired"), max(col("sz")).as("largest"))
      sizes.groupBy(col("sz")).agg(count(lit(1)).as("n_comps"))
        .crossJoin(broadcast(totals))
        .selectCols(Seq(col("sz"), col("n_comps"), col("n_components"),
          col("n_docs_paired"), col("largest")))
        .sortBy(Seq(col("sz")))
    }),

    "q310_bootstrap_grouped" -> ((s, dir) =>
      // q298's deterministic Poisson bootstrap PER SEGMENT: 16 replicate
      // revenue sums per event type from one corpus scan — the
      // per-segment error bar; same pinned hash and CDF cuts
      Relational.bootstrapSumsGrouped(t(s, dir, "events"), col("event_type"),
          col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"),
          replicates = 16)
        .withColumnRenamed("g", "event_type")
        .sortBy(Seq(col("event_type"), col("rep")))),

    "q311_lateness_profile" -> ((s, dir) => {
      // watermark-delay measurement: the testdata feed is perfectly
      // ordered, so simulate a realistic ingest by jittering each event's
      // ARRIVAL ±1 h with the pinned xor-mix hash (deterministic — both
      // engines replay the same feed), then profile event-time disorder:
      // lateness vs the running event-time max, worst case, and the exact
      // lower p95 — "set withWatermark to p95 and you drop <= 5%".
      val ev = t(s, dir, "events")
        .withColumn("__tus", unix_micros(col("ts")))
        .withColumn("__h1", expr(
          "((((event_id * 1000003L) % 2147483648L) * 2654435761L) % 4294967296L)"))
        .withColumn("__u", expr(
          "(((__h1 ^ (__h1 DIV 65536L)) * 40503L) % 4294967296L) DIV 65536L"))
        // unique arrival key: jittered micros, event_id breaking ties
        .withColumn("__arrival",
          expr("(__tus + __u * 109863L - 3600000000L) * 1000L + event_id % 1000L"))
      EventStreams.latenessProfile(ev, col("event_type"), col("__arrival"),
          col("ts"))
        .sortBy(Seq(col("key")))
    }),

    "q312_vocab_drift" -> ((s, dir) =>
      // which WORDS moved between corpus halves: q195's categorical-drift
      // machinery over exploded tokens — per-term shares, diffs, TVD; the
      // vocabulary-drift read before retraining a tokenizer or trusting a
      // frequency-sensitive filter on a new crawl
      Validation.categoricalDrift(
          t(s, dir, "documents").filterCol(pmod(col("doc_id"), lit(2)) === 0)
            .selectCols(Seq(explode(TextFns.tokens(col("text"))).as("term"))),
          t(s, dir, "documents").filterCol(pmod(col("doc_id"), lit(2)) === 1)
            .selectCols(Seq(explode(TextFns.tokens(col("text"))).as("term"))),
          col("term"))
        .sortBy(Seq(col("category")))),

    "q307_sliding_dau_hll" -> ((s, dir) => {
      // q302's rolling 24 h distinct users through SKETCHES — the scale
      // path its Scaladoc promises: per-hour HLL register vectors (2^6
      // longs each), each hour's registers fanned to its 24 covering
      // window starts, merged by element-wise max (the HLL union law —
      // raw user ids never enter the window fan-out), per-window scaled
      // harmonic sum EXACT in a long; q302's exact count rides along as
      // the instrument. Registers + sums hash-match; only the final
      // alpha/s double is approximate BY NATURE and stays out.
      val ev = t(s, dir, "events")
      val hourly = Corpus.hllSketchGrouped(
        ev.selectCols(Seq(unix_micros(date_trunc("hour", col("ts"))).as("h"),
          col("user_id").cast("string").as("u"))),
        col("h"), col("u"), b = 6)
      val merged = hourly
        .selectCols(Seq(col("group").as("h"), col("bucket"), col("register"),
          explode(sequence(lit(0), lit(23))).as("k")))
        .selectCols(Seq((col("h") - col("k") * (3600L * 1000000L)).as("win_start_us"),
          col("bucket"), col("register")))
        .groupBy(col("win_start_us"), col("bucket"))
        .agg(max(col("register")).as("register"))
      // b = 6 -> sum scale 56 (the q191 constant)
      val sums = merged.groupBy(col("win_start_us"))
        .agg(sum(expr(
          "CAST(CASE WHEN register <= 56 THEN shiftleft(1L, 56 - register) ELSE 0L END AS BIGINT)"))
          .as("s_scaled"))
      val exact = EventStreams.slidingDistinct(ev, col("user_id"), col("ts"),
        windowHours = 24).withColumnRenamed("n_users", "n_exact")
      merged.join(sums, Seq("win_start_us")).join(exact, Seq("win_start_us"))
        .selectCols(Seq(col("win_start_us"), col("bucket"), col("register"),
          col("s_scaled"), col("n_exact")))
        .sortBy(Seq(col("win_start_us"), col("bucket")))
    }),

    "q308_ohlc_stream" -> ((s, dir) => {
      // q301's candle chart running MID-INGEST: the same per-(type, hour)
      // OHLC aggregate in complete mode — min_by/max_by state is one
      // (order, value) pair per group; the oracle is the batch SQL
      // verbatim (stream == batch is the claim)
      val staged = java.nio.file.Files.createTempDirectory("graft_q308")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q308_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runOhlcStreamSmoke(s, staged.toString, qn,
            "event_type", "event_id",
            "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .selectCols(Seq(col("key"), unix_micros(col("bucket")).as("bucket_us"),
            col("n"), col("open"), col("close"), col("high"), col("low"),
            col("sum_v")))
          .sortBy(Seq(col("key"), col("bucket_us")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q309_blocking_eval" -> ((s, dir) => {
      // dedup-pipeline evaluation as a driver fact: the linear
      // sorted-neighborhood blocker (q208) scored against exact trigram
      // Jaccard >= 0.5 ground truth (q34's instrument) — TP counts,
      // precision and recall in floor ppm. The number that justifies (or
      // indicts) a blocking configuration BEFORE it gates a 100 TB dedup.
      val docs = t(s, dir, "documents")
      val truth = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          ngram = 3, threshold = 0.5)
        .selectCols(Seq(col("id_a"), col("id_b")))
      // q213's similarity-preserving 3-token-PREFIX key — a whole-doc
      // fingerprint would scatter near-dups (one changed token flips the
      // rolling hash; measured recall 0 on this corpus), the prefix key
      // blocks them together
      val cand = Dedup.sortedNeighborhoodPairs(docs, col("doc_id"),
          TextFns.fingerprint(
            array_join(slice(TextFns.tokens(col("text")), 1, 3), " "),
            portable = true), w = 8)
        .selectCols(Seq(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b")))
        .distinct()
      val tp = truth.join(cand, Seq("id_a", "id_b"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(tp.agg(count(lit(1)).as("n_tp")))
        .selectExpr("n_truth", "n_cand", "n_tp",
          "CASE WHEN n_cand = 0 THEN NULL ELSE (n_tp * 1000000L) DIV n_cand END AS precision_ppm",
          "CASE WHEN n_truth = 0 THEN NULL ELSE (n_tp * 1000000L) DIV n_truth END AS recall_ppm")
    }),

    "q305_jl_projection" -> ((s, dir) => {
      // RNG-free Johnson-Lindenstrauss: 64-dim embeddings -> int8 codes
      // (q76's codec) -> 16-dim ±1 sign projection with the sign matrix a
      // pure function of (i, j) — every output an exact integer, the
      // cheap pre-filter in front of exact re-rank. No shuffle at all.
      val q = t(s, dir, "embeddings")
        .selectCols(Seq(col("vec_id"),
          graft.plans.VectorExprs.quantizeInt8(col("embedding"))
            .getField("q").as("codes")))
      Similarity.jlProjectCodes(q, col("vec_id"), col("codes"), outDim = 16)
        .selectCols(Seq(col("id").as("vec_id"), col("j"), col("y")))
        .sortBy(Seq(col("vec_id"), col("j")))
    }),

    "q306_profile_drift" -> ((s, dir) => {
      // the dataset-card diff per refresh: q187's derived v2 (every 11th
      // doc dropped, every remaining 7th edited, one added per 13th with
      // a NEW source) profiled against v1 — row/null/distinct deltas and
      // min/max excursions per column; the schema-level companion of the
      // row-level corpusDiff. Two single-pass profiles + a columns-sized
      // join.
      val v1 = t(s, dir, "documents")
      val edited = v1.filterCol(pmod(col("doc_id"), lit(11)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" v2-edit"))).otherwise(col("text")))
        .withColumn("n_chars",
          when(pmod(col("doc_id"), lit(7)) === 0,
            length(col("text")).cast("long")).otherwise(col("n_chars")))
      val v2 = edited.unionByName(
        v1.filterCol(pmod(col("doc_id"), lit(13)) === 0)
          .selectCols(Seq((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new doc "), col("doc_id")).as("text"),
            lit("xx").as("lang"), lit("new-src").as("source"),
            length(concat(lit("new doc "), col("doc_id"))).cast("long")
              .as("n_chars"))))
      Validation.profileDrift(v1, v2, Seq("text", "lang", "source", "n_chars"))
        .sortBy(Seq(col("column")))
    }),

    "q304_tfidf_cosine_pairs" -> ((s, dir) => {
      // lexical document-similarity join WITHOUT embeddings: bigram
      // hashed-TF-IDF sparse vectors (q94's integer weights, scale 1000
      // for the Σw² overflow contract) through the inverted-index cosine
      // join — sqrt-free (dot²·1e6 vs t²·n2·n2 in DECIMAL), every pair
      // exact. Pairs sharing no bucket never materialize; PPJoin (q222)
      // is the prefix-filtered sibling for unweighted sets.
      // even-doc subset: this corpus is ADVERSARIALLY dense for a sparse
      // join (a ~930-bigram vocabulary shared by every doc — candidate
      // mass Σ df² grows with corpus² on identical vocab); real corpora
      // get sparser as they grow, this one doesn't. A third of the docs
      // keeps the bench honest without changing any semantics.
      Dedup.sparseCosinePairs(tfidfBigramVecs(s, dir),
          thresholdThousandths = 300)
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q301_ohlc_bars" -> ((s, dir) =>
      // canonical value-stream downsampling: hourly open/high/low/close
      // per event type — open/close via min_by/max_by over the
      // (ts, event_id) total order, ONE partial-agg pass, constant state
      // per group (never a window over the events)
      EventStreams.ohlcBars(t(s, dir, "events"), col("event_type"),
          col("ts"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"))
        .selectCols(Seq(col("key"), unix_micros(col("bucket")).as("bucket_us"),
          col("n"), col("open"), col("close"), col("high"), col("low"),
          col("sum_v")))
        .sortBy(Seq(col("key"), col("bucket_us")))),

    "q302_sliding_dau" -> ((s, dir) =>
      // rolling 24 h distinct users at hourly steps: each event fans out
      // to the 24 hour-aligned window starts covering it (horizon-bounded
      // explode — never a per-window rescan), one distinct aggregate;
      // the exact sliding metric, HLL-by-start being the sketch sibling
      EventStreams.slidingDistinct(t(s, dir, "events"), col("user_id"),
          col("ts"), windowHours = 24)
        .sortBy(Seq(col("win_start_us")))),

    "q303_churn_hazard" -> ((s, dir) =>
      // life table without the unreplayable cumulative product: per
      // lifetime day, users still observed (at_risk), uncensored users
      // ending exactly there (churned), hazard in floor ppm; last-week
      // actives are censored — at risk, never churned
      EventStreams.churnHazard(t(s, dir, "events"), col("user_id"),
          col("ts"), censorDays = 7)
        .sortBy(Seq(col("lifetime")))),

    "q297_forget_rewrite" -> ((s, dir) => {
      // deletion compliance over a plain parquet lake: land events in a
      // partitioned store, purge every 10th user by anti-join rewrite
      // into a NEW layout (the no-table-format delete; immutability rule
      // of compactPartitionedParquet), and hash-audit the survivors —
      // n_forgotten = 0 is the load-bearing witness column.
      val sf = new java.io.File(dir).getName
      val base = s"${scratchRoot}/$sf/forget"
      val ev = t(s, dir, "events").selectCols(Seq(col("event_id"),
        col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmic")))
      Engine.writeParquetPartitioned(ev, s"$base/src", Seq("event_type"))
      val forget = ev.filterCol(pmod(col("user_id"), lit(10L)) === 0L)
        .selectCols(Seq(col("user_id")))
      Engine.forgetRewrite(s, s"$base/src", s"$base/dst", "user_id",
          forget, Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(pmod(col("user_id"), lit(10L)) === 0L, 1L).otherwise(0L))
            .as("n_forgotten"),
          sum(col("vmic")).as("sum_vmic"))
        .sortBy(Seq(col("event_type")))
    }),

    "q298_bootstrap_ci" -> ((s, dir) =>
      // sampling spread of the revenue total without RNG: 32 deterministic
      // Poisson-bootstrap replicates of sum(value) over events — pinned
      // Poisson(1) CDF cuts on the xor-mix hash, every replicate
      // bit-replayable. The spread around total_sum is the error bar a
      // point estimate can't give.
      Relational.bootstrapSums(t(s, dir, "events"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"),
          replicates = 32)
        .sortBy(Seq(col("rep")))),

    "q299_span_dedup_by_source" -> ((s, dir) => {
      // which sources carry boilerplate: q107's corpus-duplicated 64-char
      // windows rolled up per source — docs flagged, windows flagged,
      // flagged-doc share ppm; zero-flag sources kept (a LEFT join, the
      // honest denominator). The observability read before tuning any
      // span-cut threshold.
      val docs = t(s, dir, "documents")
      val spans = Corpus.repeatedSpans(docs, col("doc_id"), col("text"),
        winLen = 64, step = 16, minDocs = 2L)
      val flagged = spans
        .join(docs.selectCols(Seq(col("doc_id").as("id"), col("source"))), Seq("id"))
        .groupBy(col("source"))
        .agg(countDistinct(col("id")).as("n_docs_flagged"),
          count(lit(1)).as("n_windows_flagged"))
      docs.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .join(flagged, Seq("source"), "left")
        .selectCols(Seq(col("source"), col("n_docs"),
          coalesce(col("n_docs_flagged"), lit(0L)).as("n_docs_flagged"),
          coalesce(col("n_windows_flagged"), lit(0L)).as("n_windows_flagged")))
        .withColumn("flagged_share_ppm",
          expr("(n_docs_flagged * 1000000L) DIV n_docs"))
        .sortBy(Seq(col("source")))
    }),

    "q300_two_hop_features" -> ((s, dir) => {
      // message passing STACKED: round 2 aggregates round 1's neighbor
      // sums — the 2-hop receptive field a GNN builds, as two plain
      // joins; proves neighborAgg's feed-the-output-back contract as a
      // driver fact, not a Scaladoc claim.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      val feats = t(s, dir, "part").selectCols(Seq(col("p_partkey"),
        (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents")))
      val round1 = graft.operators.Graph.neighborAgg(e, feats)
        .selectCols(Seq(col("id"), col("f_sum")))
      graft.operators.Graph.neighborAgg(e, round1)
        .sortBy(Seq(col("id")))
    }),

    "q295_neighbor_agg" -> ((s, dir) => {
      // one round of graph message passing: each part in the q199
      // co-purchase graph aggregates its NEIGHBORS' retail price (cents)
      // — count/sum/min/max + exact floor-ppk mean, the feature a
      // graph-aware quality or recommendation model consumes. One
      // orientation union, one feature equi-join, one partial-agg groupBy.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      val feats = t(s, dir, "part").selectCols(Seq(col("p_partkey"),
        (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents")))
      graft.operators.Graph.neighborAgg(e, feats)
        .sortBy(Seq(col("id")))
    }),

    "q296_markov_backtest" -> ((s, dir) => {
      // the zero-parameter sequence baseline: argmax next-event-type per
      // current type learned on EVEN users, scored on ODD users' actual
      // consecutive pairs — per-state accuracy in floor ppm; q288's
      // seasonal-naive idea for categorical sequences (and the number a
      // session model must beat).
      val ev = t(s, dir, "events")
      EventStreams.markovBacktest(
          ev.filterCol(pmod(col("user_id"), lit(2L)) === 0L),
          ev.filterCol(pmod(col("user_id"), lit(2L)) === 1L),
          col("user_id"), Seq(col("ts"), col("event_id")), col("event_type"))
        .sortBy(Seq(col("from_state")))
    }),

    "q294_textrank_keywords" -> ((s, dir) => {
      // TextRank keyword extraction (Mihalcea-Tarau): corpus-level word
      // graph from q235's skip-gram co-occurrence (window 3, minCount 5
      // prunes noise edges), then 3 integer-exact PageRank rounds — the
      // centrality ranking IS the keyword list, no supervision. Pure
      // composition of two spec-covered operators; the oracle unrolls
      // q235's pair SQL into q100's round SQL with string node ids.
      val cooc = Corpus.skipgramCounts(t(s, dir, "documents"), col("doc_id"),
        TextFns.tokens(col("text")), window = 3, minCount = 5L)
      val edges = cooc
        .selectCols(Seq(col("w_a").as("src"), col("w_b").as("dst")))
        .union(cooc.selectCols(Seq(col("w_b").as("src"), col("w_a").as("dst"))))
      graft.operators.Graph.pagerank(edges, rounds = 3)
        .selectCols(Seq(col("id").as("word"), col("rank")))
        .sortExprs(Seq(col("rank").desc, col("word").asc))
    }),

    "q293_video_frameset_neardup" -> ((s, dir) => {
      // VIDEO near-dup by shared frame content: synth animated GIFs
      // (content groups of 3 sharing a seed, frame COUNTS differing inside
      // a group — shorter cuts of the same clip), REAL-demux every frame,
      // fingerprint each clip as its distinct (frame_idx, pixel_sum) set,
      // and join clips on shared frames (the q34 inverted-index shape over
      // narrow keys — pairs sharing no frame never materialize). The
      // index RIDES IN THE KEY on purpose: the synthesis formula is
      // mod-256 affine, so bare pixel sums take only 256 values and
      // collide across unrelated clips (measured: 1875 pairs vs the 499
      // planted); time-aligned (idx, sum) keys make the witness honest.
      // Set Jaccard >= 0.6 keeps the planted prefix cuts; GIF is lossless
      // so the oracle replays every frame sum from the synthesis formula.
      val clips = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), expr("doc_id DIV 3").as("seed"),
          (lit(6) + pmod(col("doc_id"), lit(4L)).cast("int")).as("nf")))
        .withColumn("gif", Multimodal.synthAnimGifUdf(
          col("seed"), lit(16), lit(12), col("nf")))
      val frames = clips
        .selectCols(Seq(col("doc_id").as("id"),
          explode(Multimodal.sampleFrameInfos(1)(col("gif"))).as("fr")))
        .selectCols(Seq(col("id"), col("fr._1").as("fidx"), col("fr._4").as("fsum")))
        .distinct()
      val sizes = frames.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      frames.alias("a")
        .join(frames.alias("b"),
          col("a.fidx") === col("b.fidx") && col("a.fsum") === col("b.fsum") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.selectCols(Seq(col("id").as("id_a"), col("sz").as("sz_a"))), Seq("id_a"))
        .join(sizes.selectCols(Seq(col("id").as("id_b"), col("sz").as("sz_b"))), Seq("id_b"))
        .withColumn("jaccard_ppm",
          expr("(shared * 1000000L) DIV (sz_a + sz_b - shared)"))
        .filterCol(col("jaccard_ppm") >= 600000L)
        .selectCols(Seq(col("id_a"), col("id_b"), col("shared"),
          col("sz_a"), col("sz_b"), col("jaccard_ppm")))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q292_audio_fingerprint_neardup" -> ((s, dir) => {
      // perceptual AUDIO near-dup — the q190 story for sound: synth a
      // noise-like PCM WAV per doc (content groups of 3, lengths
      // varying INSIDE a group), REAL-decode into the 65-window
      // energy-delta sign print, and find all Hamming<=3 pairs with the
      // exact pigeonhole join. Same content + different byte length =>
      // identical print — the perceptual-match-across-binaries claim,
      // pinned because PCM is lossless and the print is integer
      // arithmetic the oracle replays from the synth formula.
      val wavs = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), expr("doc_id DIV 3").as("seed"),
          (lit(2080) + pmod(col("doc_id"), lit(5L)).cast("int") * lit(32))
            .cast("int").as("n")))
        .withColumn("wav", Multimodal.synthNoisePcmWavUdf(col("seed"), col("n")))
        .withColumn("sig", Multimodal.audioFingerprint64(32)(col("wav")))
      Dedup.hamming64Pairs(wavs, col("doc_id"), col("sig"), maxHamming = 3)
        .selectCols(Seq(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming")))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q291_encoding_advisor" -> ((s, dir) =>
      // per-column RLE/dictionary compressibility, measured: exact run
      // counts under the write order (event_id) vs the one-run-per-value
      // best case a sort-by-that-column rewrite reaches — the encoding
      // decision parquet writers make implicitly, priced per column.
      // zoneMapSkipReport (q223) prices scan skipping; this prices
      // encoding. Neighbor pairing via the two-level rank, never a global
      // single-partition window.
      Relational.encodingAdvisor(t(s, dir, "events"), col("event_id"),
          Seq("event_type", "user_id", "value"))
        .sortBy(Seq(col("col_name")))),

    "q289_fairness_report" -> ((s, dir) =>
      // group-fairness audit of a length gate (n_chars >= 500) across
      // sources, with lang='en' as the "relevant" label: selection rate +
      // demographic-parity gap, TPR + equal-opportunity gap, all integer
      // ppm vs the global rates — the corpus-composition decision a gate
      // silently makes, surfaced per segment. One groupBy scan; globals
      // reduced from the cells, never a second pass.
      Validation.fairnessReport(t(s, dir, "documents"), col("source"),
          col("n_chars") >= 500L, col("lang") === "en")
        .sortBy(Seq(col("grp")))),

    "q290_weighted_median" -> ((s, dir) =>
      // token-weighted percentiles, exact: the quantity-weighted median
      // unit price per return flag — lower weighted quantile by integer
      // contract (no interpolation), duplicates collapsed per (group,
      // value) BEFORE ordering so row layout can't matter. Weight = qty
      // turns a per-line median into a per-unit one.
      t(s, dir, "lineitem")
        .weightedPercentile(Seq(col("l_returnflag")),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long"),
          col("l_quantity"), pPpm = 500000L)
        .withColumnRenamed("g0", "l_returnflag")
        .sortBy(Seq(col("l_returnflag")))),

    "q286_cusum_changepoints" -> ((s, dir) =>
      // structural level-shift detection per event type: scaled cumulative
      // deviation dev_r = C_r·T − r·N over hourly counts (division-free
      // CUSUM, exact longs), peak |dev| = the single-changepoint estimate.
      // q127's z-scores flag outlier HOURS; this finds the rate SHIFT.
      EventStreams.cusumChangepoints(t(s, dir, "events"),
          col("event_type"), col("ts"))
        .selectCols(Seq(col("key"), unix_micros(col("bucket")).as("bucket_us"),
          col("n"), col("r"), col("cum"), col("t_buckets"), col("n_total"),
          col("dev"), col("is_peak")))
        .sortBy(Seq(col("key"), col("r")))),

    "q287_dow_profile" -> ((s, dir) =>
      // calendar seasonality read per event type: weekday share in ppm,
      // deviation vs the uniform 1/7, peak weekday (tie to smaller dow) —
      // what a seasonal adjustment consults before trusting any
      // day-over-day comparison. dow: 1 = Sunday … 7 = Saturday.
      EventStreams.dowProfile(t(s, dir, "events"), col("event_type"),
          col("ts"))
        .sortBy(Seq(col("key"), col("dow")))),

    "q288_seasonal_naive_backtest" -> ((s, dir) =>
      // the zero-parameter forecast baseline: predict each day's value
      // total as the same type's total 7 days earlier, score days where
      // both sides exist — exact integer micro sums, MAE/bias as floor
      // divisions. The number a real forecaster must beat.
      EventStreams.seasonalNaiveBacktest(t(s, dir, "events"),
          col("event_type"), col("ts"), col("value"), seasonDays = 7)
        .sortBy(Seq(col("key")))),

    "q284_degree_stats" -> ((s, dir) => {
      // first diagnostic read on a derived graph: the q199/q220 co-purchase
      // part graph's degree histogram — a fat degree-1 tail means mostly
      // noise edges, a heavy head means hub parts that will dominate wedge
      // joins (q231's maxWedgeDegree decision input). One endpoint union +
      // two partial-agg groupBys + a 1-row totals broadcast.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      graft.operators.Graph.degreeStats(e)
        .sortBy(Seq(col("degree")))
    }),

    "q285_assortativity" -> ((s, dir) => {
      // do hub parts co-purchase with other hubs? Newman's degree
      // assortativity over the same graph — EXACTLY RATIONAL on an
      // undirected graph (symmetry collapses Pearson's sqrt), so the ppm
      // replays bit-for-bit; negative = hub-and-spoke (the typical
      // purchase-graph shape). One degree groupBy + two lookup joins +
      // a 1-row reduction.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      graft.operators.Graph.degreeAssortativity(e)
        .selectCols(Seq(col("m"), col("sx"), col("sxy"), col("sxx"),
          col("num").cast("long").as("num"), col("den").cast("long").as("den"),
          col("r_ppm")))
    }),

    "q283_chained_stateful" -> ((s, dir) => {
      // CHAINED stateful operators in one streaming query: the source
      // arrives in duplicate (two unioned file streams), dropDuplicates
      // absorbs the copies, and the tumbling 1-day window aggregation
      // counts the survivors — dedup state and window state live in the
      // same query, the shape Spark only allows with aligned event-time
      // semantics. Append emits a day once the watermark passes its end;
      // the oracle replays the finalized-window set exactly.
      val qn = s"graft_q283_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runChainedStatefulSmoke(s, s"$dir/events.parquet",
          qn, Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00"), "1 hour")
        .sortBy(Seq(col("day_start_us")))
    }),

    "q282_skew_rebalance" -> ((s, dir) => {
      // AQE runtime skew handling — the AUTOMATIC counterpart of q47's
      // manual salting: two thirds of the rows share one synthetic key,
      // and the REBALANCE hint's shuffle lets AQE both SPLIT the hot
      // key's oversized partition into advisory-sized pieces and coalesce
      // the slivers ("coalesced and skewed" on the read, asserted
      // post-execution in ExplainAuditSpec). This is the write-path skew
      // answer at 100 TB: balanced output tasks from organically skewed
      // keys, no salting column, no code change. Advisory size is scaled
      // down so sf-sized shuffles exhibit what production defaults
      // reserve for multi-GB partitions; the relayout changes
      // partitioning, not the answer.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/skew_rebalance"
      val reb = skewRebalanced(s, dir)
      // the balanced WRITE is the demo: the skewed partition lands as
      // several advisory-sized files, the slivers coalesce
      reb.write.mode("overwrite").parquet(scratch)
      reb.sparkSession.read.parquet(scratch)
        .aggregate(Seq(pmod(col("k"), lit(7L)).as("bucket")), Seq(
          count(lit(1)).as("n"),
          countDistinct(col("k")).as("n_keys"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value")))
        .sortBy(Seq(col("bucket")))
    }),

    "q281_lateral_join" -> ((s, dir) =>
      // correlated LATERAL derived table: each nation's two highest-value
      // customers computed by a per-row subquery — the SQL morphology for
      // "top-N per key without a window over the whole table" (Catalyst
      // decorrelates it into the same ranked join) plus deterministic
      // acctbal/custkey tie-break.
      s.sql(s"""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM parquet.`$dir/nation.parquet` n,
        LATERAL (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
          FROM parquet.`$dir/customer.parquet`
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t""")
        .sortBy(Seq(col("n_name"), col("c_custkey")))),

    "q280_union_by_name" -> ((s, dir) => {
      // schema-drift union — the ingestion reality where shards disagree
      // on columns: unionByName(allowMissingColumns) aligns by NAME and
      // null-fills the gaps (positional union would silently mis-bind);
      // the profile then aggregates with GROUP BY inferred from the
      // aggregation (the Dataset groupBy shape). Old shard: no props;
      // new shard: no value.
      val ev = t(s, dir, "events")
      val oldShard = ev.filterCol(pmod(col("event_id"), lit(2L)) === 0L)
        .selectCols(Seq(col("event_id"), col("event_type"), col("value")))
      val newShard = ev.filterCol(pmod(col("event_id"), lit(2L)) === 1L)
        .selectCols(Seq(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k")))
      oldShard.unionByName(newShard, allowMissingColumns = true)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("value")).as("n_with_value"),
          count(col("k")).as("n_with_k"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"),
          sum(col("k")).as("sum_k"))
        .sortBy(Seq(col("event_type")))
    }),

    "q279_stream_full_outer_join" -> ((s, dir) => {
      // q269's contract extended to FULL OUTER: unmatched views emit when
      // the watermark closes their join window (l_ts + 2h < W), unmatched
      // purchases when it passes them outright (r_ts < W — any matching
      // view would be wholly behind the watermark). Same pinned three-
      // batch drain; the oracle replays all three emission sets.
      val qn = s"graft_q279_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runStreamLeftOuterJoinSmoke(s, s"$dir/events.parquet",
          qn, "user_id", "view", "purchase", 7200L,
          Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00"), "1 hour",
          joinType = "full_outer")
        .selectCols(Seq(col("l_event_id"), col("l_user_id"),
          unix_micros(col("l_ts")).as("l_ts_us"),
          col("r_event_id"), col("r_user_id"),
          unix_micros(col("r_ts")).as("r_ts_us")))
        .sortBy(Seq(col("l_event_id"), col("r_event_id")))
    }),

    "q278_sql_scripting" -> ((s, dir) => {
      // SQL scripting (Spark 4 BEGIN…END): DECLARE/SET/WHILE driving an
      // iterative-doubling search — the smallest power-of-2 price cap
      // with fewer than 100 orders above it — entirely inside the SQL
      // surface; the script's last SELECT is the result. The oracle
      // replays the doubling rule as a generate-series argmin (the count
      // is monotone in the cap, so first-power-under-100 == loop exit).
      t(s, dir, "orders").createOrReplaceTempView("graft_q278_orders")
      s.sql("""BEGIN
           DECLARE c BIGINT DEFAULT 1024;
           WHILE (SELECT COUNT(*) FROM graft_q278_orders WHERE o_totalprice > c) >= 100 DO
             SET c = c * 2;
           END WHILE;
           SELECT c AS cap,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM graft_q278_orders WHERE o_totalprice > c) AS n_above;
         END""")
    }),

    "q277_sql_udf" -> ((s, dir) => {
      // SQL-DEFINED functions (Spark 4 CREATE FUNCTION … RETURN): a
      // scalar ppm ratio and a PARAMETERIZED TABLE FUNCTION — reusable
      // logic shipped as catalog objects with zero Scala on the user
      // side; the reference's define-udf tier expressed in pure SQL.
      t(s, dir, "events").createOrReplaceTempView("graft_q277_events")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_q277_share_ppm(
             x BIGINT, y BIGINT) RETURNS BIGINT
           RETURN CASE WHEN y = 0 THEN 0 ELSE x * 1000000 DIV y END""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_q277_by_type(tt STRING)
           RETURNS TABLE (user_id BIGINT, value DOUBLE)
           RETURN SELECT user_id, value FROM graft_q277_events
           WHERE event_type = tt""")
      s.sql("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
          graft_q277_share_ppm(COUNT(*),
            (SELECT COUNT(*) FROM graft_q277_by_type('purchase'))) AS share_ppm
        FROM graft_q277_by_type('purchase')
        GROUP BY user_id ORDER BY user_id""")
    }),

    "q276_tws_timers" -> ((s, dir) => {
      // TWS EVENT-TIME TIMERS (q271 covers ValueState; this covers the
      // timer half): one open inactivity session per purchasing user,
      // timer re-armed at last-purchase + 6h, fired — emitting the closed
      // session — when a batch's watermark passes the horizon with no
      // newer rows to re-arm it. Three time-split batches pin watermark
      // progression; rows-processed-before-timers is pinned by the
      // StreamingSpec hand case, so the emission set is an exact
      // two-phase state machine the oracle replays.
      val qn = s"graft_q276_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runTimerSessionsSmoke(s, s"$dir/events.parquet",
          qn, "purchase", 21600L,
          Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00"), "1 hour")
        .sortBy(Seq(col("user_id")))
    }),

    "q275_map_groups" -> ((s, dir) =>
      // the TYPED Dataset API as a driver fact: groupByKey + mapGroups
      // with case-class encoders (the Scala applyInPandas) walking each
      // customer's order-day series imperatively — max inter-order gap
      // and active span. The oracle is the declarative LAG-window form:
      // same answer, two APIs, and the Scaladoc says when each is right.
      Relational.groupGapStats(
          t(s, dir, "orders"),
          col("o_custkey"),
          datediff(to_date(col("o_orderdate")),
            lit("1970-01-01").cast("date")))
        .sortBy(Seq(col("key")))),

    "q274_restart_ingest" -> ((s, dir) => {
      // exactly-once ACROSS RESTARTS: half the events land, the
      // AvailableNow file-stream ingest drains them into the partitioned
      // store and STOPS; the other half lands, a NEW query restarts from
      // the SAME checkpoint and drains only the new files. The hash match
      // against the all-events batch aggregate proves checkpoint recovery
      // delivered every row exactly once — the property a 100 TB
      // incremental backfill stands on (q155 proves one drain; this
      // proves the restart).
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/restart"
      val landing = s"$scratch/landing"
      val ev = t(s, dir, "events")
        .selectCols(Seq(col("event_id"), col("user_id"), col("value"),
          col("event_type")))
      ev.filterCol(pmod(col("event_id"), lit(2L)) === 0L)
        .write.mode("overwrite").parquet(landing)
      EventStreams.runPartitionedIngest(s, landing, s"$scratch/data",
        s"$scratch/ckpt", Seq("event_type"),
        Seq("event_id", "user_id", "value", "event_type"), fresh = true)
      ev.filterCol(pmod(col("event_id"), lit(2L)) === 1L)
        .write.mode("append").parquet(landing)
      EventStreams.runPartitionedIngest(s, landing, s"$scratch/data",
        s"$scratch/ckpt", Seq("event_type"),
        Seq("event_id", "user_id", "value", "event_type"), fresh = false)
      s.read.parquet(s"$scratch/data")
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value")))
        .sortBy(Seq(col("event_type")))
    }),

    "q273_pipe_syntax" -> ((s, dir) =>
      // Spark 4 SQL pipe syntax (|>): the dataflow-ordered dialect —
      // FROM … |> WHERE … |> AGGREGATE — planning to the identical
      // Catalyst tree as the classic form; the oracle is that classic
      // form. Surface parity for users arriving from pipe-first engines.
      s.sql(s"""
        FROM parquet.`$dir/lineitem.parquet`
        |> WHERE l_quantity >= 30
        |> AGGREGATE COUNT(*) AS n_items,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, revenue""")
        .sortBy(Seq(col("l_returnflag"), col("l_linestatus")))),

    "q272_listagg" -> ((s, dir) =>
      // ordered string aggregation (LISTAGG … WITHIN GROUP — the ANSI
      // form warehouses standardized on): per event_type, the ordered id
      // list of its sampled events. The explicit WITHIN GROUP order is
      // what makes a concatenated string hash-checkable at all.
      t(s, dir, "events")
        .filterCol(pmod(col("event_id"), lit(500L)) === 0L)
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n"),
          expr("listagg(CAST(event_id AS STRING), ',') WITHIN GROUP (ORDER BY event_id)")
            .as("ids")))
        .sortBy(Seq(col("event_type")))),

    "q271_transform_with_state" -> ((s, dir) => {
      // Spark 4 transformWithState — the arbitrary-stateful API running a
      // per-user online profile (count, exact micros sum, batches seen)
      // in a ValueState over the RocksDB store, drained across THREE
      // micro-batches (event_id % 3 split, so active users span batches).
      // Commutative accumulators make the final per-key emission equal
      // the batch groupBy exactly; batches_seen (= distinct event_id % 3
      // per user) proves the state survived batch boundaries.
      val qn = s"graft_q271_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runTransformWithStateSmoke(s, s"$dir/events.parquet", qn)
        .sortBy(Seq(col("user_id")))
    }),

    "q270_recursive_cte" -> ((s, dir) =>
      // Spark 4 recursive CTEs (WITH RECURSIVE … UNION ALL): the ancestor
      // closure of the halving hierarchy node → node DIV 2 — each node
      // has ONE parent, so the recursion is acyclic with unique paths and
      // terminates in ⌈log2 n⌉ rounds; the iterative-plan morphology
      // (UnionLoop) the engine previously only reached through
      // hand-unrolled joins, now driven from the SQL surface.
      s.sql(s"""
        WITH RECURSIVE anc(node, anc, depth) AS (
          SELECT p_partkey AS node, p_partkey DIV 2L AS anc, 1L AS depth
          FROM parquet.`$dir/part.parquet` WHERE p_partkey BETWEEN 2 AND 2000
          UNION ALL
          SELECT a.node, a.anc DIV 2L, a.depth + 1L
          FROM anc a WHERE a.anc >= 2
        )
        SELECT node, anc, depth FROM anc""")
        .sortBy(Seq(col("node"), col("depth")))),

    "q269_stream_left_outer_join" -> ((s, dir) => {
      // TRUE left-outer stream-stream join: inner matches emit with the
      // data; unmatched views emit null-extended only when the advancing
      // watermark EVICTS them — the harness pins watermark progression
      // (three time-split files, one per micro-batch, watermark before
      // the type filter) so the emission set is an exact contract the
      // oracle replays: matches ∪ unmatched with window-end < final-batch
      // watermark. The outer-join semantics Structured Streaming is
      // genuinely hard about, made hash-checkable.
      val qn = s"graft_q269_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runStreamLeftOuterJoinSmoke(s, s"$dir/events.parquet",
          qn, "user_id", "view", "purchase", 7200L,
          Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00"), "1 hour")
        .selectCols(Seq(col("l_event_id"), col("l_user_id"),
          unix_micros(col("l_ts")).as("l_ts_us"),
          col("r_event_id"), unix_micros(col("r_ts")).as("r_ts_us")))
        .sortBy(Seq(col("l_event_id"), col("r_event_id")))
    }),

    "q268_collation" -> ((s, dir) =>
      // Spark 4 collations: UTF8_LCASE makes case-insensitivity a COLUMN
      // TYPE property the whole engine honors (groupBy/join/distinct),
      // not a lower() call sprinkled per query — the i18n-correct dedup
      // key for web-scale text where 'EN', 'En', 'en' are one value.
      // Planted mixed case (odd doc_ids upper their source), then the
      // sensitive vs collated distinct counts side by side.
      t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 1, upper(col("source")))
            .otherwise(col("source")).as("src_mixed")))
        .aggregate(Seq.empty, Seq(
          count(lit(1)).as("n_rows"),
          countDistinct(col("src_mixed")).as("n_distinct_cs"),
          countDistinct(expr("collate(src_mixed, 'UTF8_LCASE')"))
            .as("n_distinct_ci")))),

    "q267_nullsafe_join" -> ((s, dir) => {
      // null-safe equality join (<=>): NULL keys match each other instead
      // of vanishing — the semantic a sessionless-events enrichment needs
      // when "no user" is itself a group. Every 10th user id is nulled,
      // per-key counts computed INCLUDING the NULL group, then joined
      // back null-safely; a plain equi-join would drop the NULL rows
      // (the bug this query exists to contrast).
      val e = t(s, dir, "events")
        .selectCols(Seq(col("event_id"),
          when(pmod(col("user_id"), lit(10L)) === 0L, lit(null))
            .otherwise(col("user_id")).cast("long").as("uid_n")))
      val cnt = e.groupBy(col("uid_n")).agg(count(lit(1)).as("n_for_uid"))
      e.alias("ev").join(cnt.alias("ct"),
          col("ev.uid_n") <=> col("ct.uid_n"))
        .selectCols(Seq(col("ev.event_id").as("event_id"),
          col("ev.uid_n").as("uid_n"), col("ct.n_for_uid").as("n_for_uid")))
        .sortBy(Seq(col("event_id")))
    }),

    "q266_xml_roundtrip" -> ((s, dir) => {
      // the fifth lake format: documents written through the built-in XML
      // source (Spark 4 folded spark-xml into core) and read back
      // losslessly — ids, categoricals, numerics; free text stays with
      // q153's ORC/JSON roundtrip, since XML readers legitimately trim
      // surrounding whitespace. Hash match vs the parquet original proves
      // a lake standardized on XML interchange gets identical semantics.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf"
      val docs = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"), col("lang"), col("source"), col("n_chars")))
      Engine.writeXml(docs, s"$scratch/docs_xml", "doc")
      Engine.readXml(s, s"$scratch/docs_xml", "doc")
        .selectCols(Seq(col("doc_id").cast("long").as("doc_id"), col("lang"),
          col("source"), col("n_chars").cast("long").as("n_chars")))
        .sortBy(Seq(col("doc_id")))
    }),

    "q265_variant_json" -> ((s, dir) =>
      // Spark 4 VARIANT for semi-structured columns: parse_json lands the
      // payload in the binary variant encoding ONCE at the scan (shredded
      // typed access thereafter — the scale answer to per-query string
      // re-parsing that q62's get_json_object does), variant_get extracts
      // with a type. Same answer as the string path, different storage
      // posture; the oracle is plain json_extract.
      t(s, dir, "events")
        .selectCols(Seq(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k")))
        .aggregate(Seq(col("event_type")), Seq(
          count(lit(1)).as("n"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max")))
        .sortBy(Seq(col("event_type")))),

    "q264_unpivot" -> ((s, dir) =>
      // wide→long relayout (UNPIVOT/melt — the inverse of q73's pivot):
      // three measure columns fold into (metric, val) rows via one Expand
      // (no union of three scans), then a per-metric decimal-exact profile
      t(s, dir, "lineitem")
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount")))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "metric", "val")
        .aggregate(Seq(col("metric")), Seq(
          count(lit(1)).as("n"),
          sum(col("val").cast(DecimalType(18, 2))).cast("double").as("total")))
        .sortBy(Seq(col("metric")))),

    "q263_bitmap_distinct" -> ((s, dir) =>
      // EXACT distinct counting that merges across shards — the bitmap
      // aggregate family (Spark 3.5+): per (event_type, bucket, shard)
      // the member bit positions become a bitmap, shard bitmaps OR-merge
      // (associative — the re-aggregation HLL can't do exactly), and the
      // popcount sum is the exact distinct-user count. At 100 TB this is
      // the pre-aggregated distinct: shards build bitmaps independently,
      // only 4 KB bitmaps cross the wire, never user ids. The shard split
      // here (user_id % 4) simulates independent ingest shards; the
      // oracle is the plain COUNT(DISTINCT).
      t(s, dir, "events")
        .selectCols(Seq(col("event_type"), col("user_id")))
        .groupBy(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bucket"),
          pmod(col("user_id"), lit(4L)).as("shard"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy(col("event_type"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        .sortBy(Seq(col("event_type")))),

    "q262_cbo_join_reorder" -> ((s, dir) => {
      // Cost-based optimization as a driver fact: catalog tables with
      // ANALYZE'd row counts + column NDVs (the statistics layer a 100 TB
      // warehouse runs on), then a star query planned under
      // spark.sql.cbo.enabled + joinReorder — Catalyst picks the join
      // order from measured cardinalities instead of the textual order
      // the query happens to be written in (scan stats asserted in
      // ExplainAuditSpec). Stats attach to catalog entries, so the tables
      // are saveAsTable'd (Engine.writeTable), not read from bare paths.
      // Conf is isolated in a newSession; stats change the plan, not the
      // answer — the oracle is the plain 3-way join.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf"
      Engine.writeTable(t(s, dir, "customer")
        .selectCols(Seq(col("c_custkey"), col("c_mktsegment"))),
        "graft_customer_cbo", Some(s"$scratch/customer_cbo"))
      Engine.writeTable(t(s, dir, "orders")
        .selectCols(Seq(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),
        "graft_orders_cbo", Some(s"$scratch/orders_cbo"))
      Engine.writeTable(t(s, dir, "lineitem")
        .selectCols(Seq(col("l_orderkey"), col("l_extendedprice"))),
        "graft_lineitem_cbo", Some(s"$scratch/lineitem_cbo"))
      Seq("graft_customer_cbo", "graft_orders_cbo", "graft_lineitem_cbo")
        .foreach(tn => s.sql(s"ANALYZE TABLE $tn COMPUTE STATISTICS FOR ALL COLUMNS"))
      val s2 = s.newSession()
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // written biggest-first on purpose: the reorder has something to fix
      s2.table("graft_lineitem_cbo")
        .join(s2.table("graft_orders_cbo")
            .filterCol(col("o_totalprice") > 150000.0),
          col("l_orderkey") === col("o_orderkey"))
        .join(s2.table("graft_customer_cbo"),
          col("o_custkey") === col("c_custkey"))
        .aggregate(Seq(col("c_mktsegment")), Seq(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue")))
        .sortBy(Seq(col("c_mktsegment")))
    }),

    "q261_fd_audit" -> ((s, dir) =>
      // functional-dependency audit — does the denormalized column obey
      // its contract? Two rules, one report row each: documents'
      // source→lang (mostly clean) and orders' custkey→orderpriority
      // (emphatically not a dependency — the negative control);
      // n_violation_rows is the minimum fix-to-majority repair size.
      Validation.functionalDependency(
          t(s, dir, "documents"), "docs_source_determines_lang",
          col("source"), col("lang"))
        .union(Validation.functionalDependency(
          t(s, dir, "orders"), "orders_custkey_determines_priority",
          col("o_custkey"), col("o_orderpriority")))
        .sortBy(Seq(col("rule")))),

    "q260_bloom_join" -> ((s, dir) => {
      // Runtime bloom-filter join pruning — Spark's row-level semi-join
      // pushdown for the 100 TB fact⋈dim shape: the selective dim side
      // (p_size = 1, ~2% of part) builds a bloom filter during its own
      // scan, Catalyst injects it as a might_contain predicate on the
      // FACT scan, and rows that cannot match die before the shuffle
      // instead of after it. An isolated newSession turns the feature on
      // (and disables broadcast so the shuffle join it targets exists)
      // without leaking config into sibling queries — the returned frame
      // carries its session, so the driver's later action still plans
      // under it. Layout/filter changes the plan, not the answer: the
      // oracle is the plain join+agg.
      val s2 = s.newSession()
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s2.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Engine.readParquet(s2, s"$dir/lineitem.parquet")
      val p = Engine.readParquet(s2, s"$dir/part.parquet")
        .filterCol(col("p_size") === 1)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
        .sortBy(Seq(col("p_brand")))
    }),

    "q259_rand_index" -> ((s, dir) =>
      // chance-corrected agreement between two labelings of the corpus —
      // here lang vs source, the "does provenance predict language?"
      // diagnostic; the same operator scores a dedup clustering against
      // ground truth. Pure pair counting: every component an exact
      // integer, ppm sign-split over non-negative DECIMAL(38,0) integral
      // division so floor-vs-truncate never diverges across engines.
      Validation.adjustedRandIndex(
        t(s, dir, "documents"), col("lang"), col("source"))),

    "q258_ewma_revenue" -> ((s, dir) => {
      // exact geometric-decay smoothed daily revenue (EWMA ×256): absent
      // dates decay the average (calendar semantics, not previous-rows),
      // every term an integer-weighted DECIMAL product — the alerting
      // baseline a metrics pipeline lays over daily totals. No global
      // window: contribution fan-out + date-keyed groupBy, calendar-
      // bounded shuffles.
      val daily = t(s, dir, "orders")
        .selectCols(Seq(to_date(col("o_orderdate")).as("d"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("p")))
        .groupBy(col("d"))
        .agg(sum(col("p")).cast(DecimalType(28, 2)).as("v"))
      // decimal internally, DOUBLE at the output boundary (the dsum
      // pattern): both engines cast the same exact decimal, and the
      // magnitudes (≤ daily revenue × 256, cents-scaled) sit far inside
      // the 2^53 exact-integer range
      Relational.geometricDateSmoothing(daily, col("d"), col("v"), 8)
        .selectCols(Seq(col("d"), col("v").cast("double").as("v"),
          col("smoothed_scaled").cast("double").as("smoothed_x256"),
          col("n_terms")))
        .sortBy(Seq(col("d")))
    }),

    "q257_wht_bands" -> ((s, dir) => {
      // integer-exact "spectral" profile over REAL decoded PCM: q146's
      // synth WAV cut into 8-sample frames, each frame's 8 Walsh–Hadamard
      // coefficients (±1 matrix — every c_k an exact integer, unlike a
      // float FFT) abs-summed per band. Band 0 is DC, band 7 the fastest
      // alternation: the energy-by-frequency witness an audio-quality
      // filter thresholds on (hiss = high bands, hum = low), and the
      // oracle replays it with bit_count arithmetic because PCM is
      // lossless.
      val withWav = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(64) + pmod(col("doc_id"), lit(41))).cast("int").as("n")))
        .withColumn("wav", Multimodal.synthPcmWavUdf(col("doc_id"), col("n")))
      withWav
        .selectCols(Seq(col("doc_id").as("id"),
          explode(Multimodal.whtBands(col("wav"))).as("b")))
        .selectCols(Seq(col("id"), col("b._1").cast("long").as("band"),
          col("b._2").as("c_abs_sum")))
        .sortBy(Seq(col("id"), col("band")))
    }),

    "q256_video_motion" -> ((s, dir) => {
      // REAL scene-change detection: q149's animated clips demuxed with
      // EVERY frame decoded, SAD = Σ|p_next − p_prev| per consecutive
      // pair, and a cut flag from one integer compare (mean per-pixel
      // diff ≥ 30 ⟺ sad·100 ≥ 30·w·h). The synth pattern shifts +17 mod
      // 256 each frame, so per-pixel diffs are 17 or 239 (wraparound) —
      // the oracle replays both branches exactly because GIF LZW is
      // lossless on the indexed raster.
      val withGif = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(6) + pmod(col("doc_id"), lit(5))).cast("int").as("w"),
          (lit(6) + pmod(col("doc_id"), lit(4))).cast("int").as("h"),
          (lit(3) + pmod(col("doc_id"), lit(4))).cast("int").as("nf")))
        .withColumn("gif",
          Multimodal.synthAnimGifUdf(col("doc_id"), col("w"), col("h"), col("nf")))
      withGif
        .withColumn("m", explode(Multimodal.frameMotion(col("gif"))))
        .selectCols(Seq(
          col("doc_id").as("id"),
          col("m._1").cast("long").as("to_frame"),
          col("m._2").as("sad"),
          (col("m._2") * lit(100L) >= lit(30L) * col("w") * col("h")).as("cut")))
        .sortBy(Seq(col("id"), col("to_frame")))
    }),

    "q255_drift_stream" -> ((s, dir) => {
      // q195's mix-shift monitor running MID-INGEST: the odd-user split's
      // event_type counts as a complete-mode streaming aggregation,
      // drained through the identical batch drift decoration against the
      // even-user reference — stream == batch, and the oracle replays the
      // batch shape
      val staged = java.nio.file.Files.createTempDirectory("graft_q255")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q255_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runDriftStreamSmoke(s, staged.toString, qn,
            "event_type", "user_id % 2 = 0", "user_id % 2 = 1")
          .sortBy(Seq(col("category")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q254_power_iteration" -> ((s, dir) =>
      // the corpus's dominant principal direction (uncentered PCA axis) —
      // the anisotropy axis retrieval pipelines remove — by two power
      // iteration rounds whose every number is exactly replayable: IEEE
      // dot folds, floor()-quantized terms, DECIMAL sums, sign-split
      // integer normalization. The corpus never shuffles; each round
      // collects 64 driver rows.
      Similarity.powerIteration(
          t(s, dir, "embeddings").selectCols(Seq(
            col("vec_id").as("id"), col("embedding").as("v"))),
          dim = 64, rounds = 2)
        .sortBy(Seq(col("dim")))),

    "q253_conversion_lag" -> ((s, dir) =>
      // how long does signup -> purchase take? First strictly-after
      // purchase per signed-up user (the funnel rule), lag decomposed
      // into exact deciles — ten (bin, n, lo, hi) rows instead of one
      // opaque mean; non-converters absent by funnel semantics
      EventStreams.conversionLagDeciles(
          t(s, dir, "events"), col("user_id"), col("ts"),
          col("event_type") === "signup", col("event_type") === "purchase")
        .sortBy(Seq(col("bin")))),

    "q252_event_paths" -> ((s, dir) =>
      // what do users ACTUALLY do: every consecutive event_type trigram
      // per user under (ts, event_id), counted — the n-gram view of
      // behavior a hypothesized funnel can't surface; one per-user window
      // pass, minCount prunes the tail
      EventStreams.eventPaths(
          t(s, dir, "events"), col("user_id"),
          Seq(col("ts"), col("event_id")), col("event_type"),
          depth = 3, minCount = 10L)
        .sortBy(Seq(col("path")))),

    "q251_html_strip" -> ((s, dir) => {
      // web-corpus text extraction as a driver fact: markup planted
      // deterministically (q83's pattern), tags to spaces, the five core
      // entities decoded with &amp; LAST — the cleaned STRING hash-matches,
      // so both engines strip byte-identically
      val planted = t(s, dir, "documents").selectCols(Seq(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(lit("<p class=\"x\">"), col("text"),
            lit("</p><br><a href=\"https://e.x/y?q=1\">link &amp; more &lt;b&gt;</a>")))
          .otherwise(col("text")).as("t")))
      planted.selectCols(Seq(col("doc_id"),
          TextFns.stripHtml(col("t")).as("clean_text"),
          (length(col("t")) - length(TextFns.stripHtml(col("t")))).cast("long")
            .as("removed_chars")))
        .sortBy(Seq(col("doc_id")))
    }),

    "q250_quantile_normalize" -> ((s, dir) => {
      // distribution matching: odd-user event values remapped onto the
      // even-user cohort's distribution by exact rank — the batch-effect
      // removal / recalibration transform; two two-level rank passes and
      // one equi-join on the mapped rank
      val ev = t(s, dir, "events").selectCols(Seq(col("user_id"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmicros")))
      Relational.quantileNormalize(
          ev.filterCol(col("user_id") % 2 === 0),
          ev.filterCol(col("user_id") % 2 === 1),
          col("event_id"), col("vmicros"))
        .sortBy(Seq(col("id")))
    }),

    "q249_hits" -> ((s, dir) => {
      // hubs vs authorities over the purchase bipartite graph — the two
      // roles q100's single PageRank score conflates: prolific customers
      // (hubs) vs widely-bought suppliers (authorities). Max-normalized
      // integer rounds (no sqrt), unrolled exactly by the oracle.
      val o = t(s, dir, "orders").selectCols(Seq(col("o_orderkey"), col("o_custkey")))
      val l = t(s, dir, "lineitem").selectCols(Seq(col("l_orderkey"), col("l_suppkey")))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .selectCols(Seq(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst")))
        .distinct()
      graft.operators.Graph.hits(edges, rounds = 2)
        .sortBy(Seq(col("kind"), col("id")))
    }),

    "q248_attribution" -> ((s, dir) =>
      // what action immediately precedes a purchase? Last-touch credit
      // within 24h per user — user-keyed join, per-conversion argmax, the
      // '(none)' bucket for unattributable conversions; deterministic
      // larger-id tie at equal timestamps
      EventStreams.lastTouchAttribution(
          t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
          col("event_type") === "purchase", col("event_type"),
          windowHours = 24)
        .sortBy(Seq(col("channel")))),

    "q247_autocorrelation" -> ((s, dir) =>
      // daily-cycle detector: lag-1 and lag-24 autocorrelation of hourly
      // event counts per type, from exact DECIMAL co-moments with q78's
      // IEEE tail — pairs exist only where both hours do (sparse
      // semantics)
      EventStreams.autocorrelation(
          t(s, dir, "events"), col("event_type"), col("ts"), Seq(1, 24))
        .sortBy(Seq(col("key"), col("lag")))),

    "q246_decision_stump" -> ((s, dir) =>
      // the strongest cheap baseline: one exact Gini-optimal threshold on
      // n_chars predicting lang='en', candidates = the exact decile edges,
      // majority-vote accuracy attached — a learned quality classifier
      // must beat this number to justify its cost
      Validation.decisionStump(t(s, dir, "documents"),
        col("n_chars"), col("lang") === "en")),

    "q245_gini_importance" -> ((s, dir) =>
      // which metadata column carries signal about language? Gini
      // impurity reduction per feature (source, and the n_chars/100
      // length bucket) — entropy's logs fail the no-log rule, Gini ranks
      // the same and stays integer
      Validation.giniFeatureImportance(t(s, dir, "documents"),
          col("lang"), Seq(
            "lenbucket" -> expr("n_chars DIV 100"),
            "source" -> col("source")))
        .sortBy(Seq(col("feature")))),

    "q244_audio_energy" -> ((s, dir) => {
      // windowed audio energy / silence map over REAL decoded PCM: q146's
      // synth WAV folded into 32-sample windows of exact integer
      // (abs_sum, energy = Σ s²) — the VAD/silence-trim primitive; the
      // silence flag is one integer compare (mean |s| < 16384 ⟺ abs_sum <
      // 16384·n). PCM is lossless, so every window replays from the synth
      // formula in the oracle.
      val withWav = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          (lit(64) + pmod(col("doc_id"), lit(41))).cast("int").as("n")))
        .withColumn("wav", Multimodal.synthPcmWavUdf(col("doc_id"), col("n")))
      withWav
        .selectCols(Seq(col("doc_id").as("id"),
          explode(Multimodal.decodeAudioWindows(col("wav"), lit(32))).as("w")))
        .selectCols(Seq(col("id"), col("w._1").as("win"), col("w._2").as("n"),
          col("w._3").as("abs_sum"), col("w._4").as("energy"),
          (col("w._3") < lit(16384L) * col("w._2")).as("silence")))
        .sortBy(Seq(col("id"), col("win")))
    }),

    "q243_benford_stream" -> ((s, dir) => {
      // q234's fabricated-feed alarm running MID-INGEST: leading-digit
      // counts as a complete-mode streaming aggregation (9 longs of state),
      // drained through the identical batch decoration — the oracle is
      // q234's, row for row
      val staged = java.nio.file.Files.createTempDirectory("graft_q243")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q243_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runBenfordStreamSmoke(s, staged.toString, qn,
            "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .sortBy(Seq(col("digit")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q242_personalized_pagerank" -> ((s, dir) => {
      // trust radiating from seed customers (every 10th) over the q100
      // purchase graph: teleport mass lands ONLY on seeds, so rank is
      // proximity to the trusted set — zero means unreachable within 3
      // rounds of the seed flow. Same DIV-floor arithmetic as q100,
      // unrolled exactly by the oracle.
      val o = t(s, dir, "orders").selectCols(Seq(col("o_orderkey"), col("o_custkey")))
      val l = t(s, dir, "lineitem").selectCols(Seq(col("l_orderkey"), col("l_suppkey")))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .selectCols(Seq(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst")))
        .distinct()
      val seeds = edges.selectCols(Seq(col("src").as("id")))
        .filterCol(col("id") % 10 === 0).distinct()
      graft.operators.Graph.personalizedPagerank(edges, seeds, rounds = 3)
        .sortBy(Seq(col("id")))
    }),

    "q241_cluster_purity" -> ((s, dir) => {
      // do embedding clusters recover the ground-truth labels? q79's
      // deterministic first-8 centroids assign every vector; per-cluster
      // majority label + global purity ppm (NMI's logs fail the no-log
      // rule — purity is the integer-exact quick read)
      val e = t(s, dir, "embeddings")
      Similarity.clusterPurity(
          e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v"),
            col("label").cast("long").as("label"))),
          e.filterCol(col("vec_id") < 8)
            .selectCols(Seq(col("vec_id").as("cid"), col("embedding").as("cv"))))
        .sortBy(Seq(col("cid")))
    }),

    "q240_ab_test" -> ((s, dir) => {
      // did the even-user cohort convert (any purchase) differently? The
      // two-proportion z² fraction-cleared in DECIMAL — significance is
      // one integer compare against the pinned 3841459 ppm (z=1.96)
      // threshold, no sqrt anywhere
      val units = t(s, dir, "events")
        .aggregate(Seq(col("user_id")),
          Seq(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c")))
      Validation.abTestProportions(units,
        col("user_id") % 2 === 0, col("c") === 1L)
    }),

    "q239_calibration" -> ((s, dir) => {
      // is the stopword score honest as an English-probability proxy?
      // Fixed-decile reliability report: per-bin empirical P(lang=en) vs
      // mean score, ECE as the one-number answer — q228's AUC says the
      // score ranks; this says whether its VALUE can be thresholded as-is
      val toks = TextFns.tokens(col("text"))
      val en = TextFns.StopwordSets.head._2
      val scored = t(s, dir, "documents").selectCols(Seq(
        size(toks).cast("long").as("nt"),
        TextFns.stopwordHits(toks, en).cast("long").as("nh"),
        (col("lang") === "en").as("is_en")))
        .selectCols(Seq(
          expr("CASE WHEN nt = 0 THEN 0L ELSE (nh * 1000000L) DIV nt END").as("score"),
          col("is_en")))
      Validation.calibrationReport(scored, col("score"), col("is_en"))
        .sortBy(Seq(col("bin")))
    }),

    "q238_association_rules" -> ((s, dir) =>
      // market-basket rules over (user, day) baskets of event types:
      // "users who did X that day also did Y" with integer conf/lift ppm
      // — the q80 no-log rule keeps lift exact. Joint support >= 20
      // bounds the rule set; all arithmetic replays in SQL.
      EventStreams.associationRules(
          t(s, dir, "events"),
          Seq(col("user_id"), date_trunc("day", col("ts"))),
          col("event_type"), minSupport = 20L)
        .sortBy(Seq(col("antecedent"), col("consequent")))),

    "q237_source_overlap" -> ((s, dir) => {
      // split-contamination audit: every source vs a deterministic mirror
      // slice (every 7th doc re-labeled) — the operator joins 8-byte FNV
      // fingerprints, the oracle joins raw text; identical counts up to
      // 2^-64 collisions (q57 convention). Real sources share nothing on
      // this corpus, which is itself the finding the mirror makes visible.
      val d = t(s, dir, "documents")
      val mirrored = d.filterCol(col("doc_id") % 7 === 0)
        .selectCols(Seq(lit("mirror").as("source"), col("text")))
      Corpus.crossSourceOverlap(
          d.selectCols(Seq(col("source"), col("text"))).union(mirrored),
          col("source"), col("text"))
        .sortBy(Seq(col("src_a"), col("src_b")))
    }),

    "q236_pii_redact" -> ((s, dir) => {
      // privacy scrub as a driver fact: PII planted deterministically
      // (q83's same-construction-both-sides pattern), counted per family
      // on the raw text, redacted sequentially — the output IS the
      // redacted string, so the hash match proves both engines scrub
      // byte-identically under the shared Java-regex/RE2 pattern subset
      val planted = t(s, dir, "documents").selectCols(Seq(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" contact u"), col("doc_id"),
            lit("@ex"), col("doc_id") % 7, lit(".org ip 10."),
            col("doc_id") % 256, lit(".0.1 acct 90000000"), col("doc_id")))
          .otherwise(col("text")).as("t")))
      Corpus.piiScan(planted, col("doc_id"), col("t"))
        .sortBy(Seq(col("id")))
    }),

    "q235_skipgram_cooc" -> ((s, dir) =>
      // word2vec/GloVe preprocessing: within-document skip-gram pairs at
      // distance <= 3 with 1/d floor-ppm weights; one (doc, position)
      // equi-join, partial-agg pair counts, minCount prunes the tail
      Corpus.skipgramCounts(
          t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), window = 3, minCount = 5L)
        .sortBy(Seq(col("w_a"), col("w_b")))),

    "q234_benford" -> ((s, dir) =>
      // first-digit audit of event values (micros): shares vs the pinned
      // Benford ppm constants, TVD as the drift number — synthetic
      // uniform-ish values SHOULD fail Benford, and the distance says by
      // how much
      Validation.benfordAudit(
          t(s, dir, "events").selectCols(Seq(
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmicros"))),
          col("vmicros"))
        .sortBy(Seq(col("digit")))),

    "q233_cohens_kappa" -> ((s, dir) =>
      // do two cheap quality gates agree beyond chance? rater A =
      // character length >= 200, rater B = whitespace token count >= 40 —
      // kappa in exact sign-split ppm; the gates are correlated by
      // construction, and kappa says how much
      Validation.cohensKappa(
          t(s, dir, "documents").selectCols(Seq(
            (col("n_chars") >= 200).as("ra"),
            (size(TextFns.tokens(col("text"))) >= 40).as("rb"))),
          col("ra"), col("rb"))),

    "q232_numeric_drift" -> ((s, dir) => {
      // numeric-column drift between two event cohorts: the even-user
      // split's exact deciles (rank rule, never approxQuantile) bin both
      // splits; TVD in ppm is the drift number. Edges are value-determined
      // (ties shift ids between bins, never the bin's max value), so the
      // report replays as integer SQL.
      val ev = t(s, dir, "events").selectCols(Seq(col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmicros")))
      Validation.numericDrift(
          ev.filterCol(col("user_id") % 2 === 0),
          ev.filterCol(col("user_id") % 2 === 1),
          col("vmicros"), nBins = 10)
        .sortBy(Seq(col("bin")))
    }),

    "q231_link_prediction" -> ((s, dir) => {
      // "edges that should exist" over the q220 co-purchase graph:
      // common-neighbor count + neighborhood Jaccard for every non-edge
      // pair sharing a neighbor — the wedge join bounds candidates to
      // Σ deg², the anti join removes known edges, zero-overlap pairs
      // never materialize
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      graft.operators.Graph.linkPrediction(e)
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q230_kcenter" -> ((s, dir) =>
      // diversity selection: greedy farthest-first over the embedding
      // corpus — 8 exemplars maximally spread in L2, the coverage-radius
      // sequence attached. One new-center broadcast + one narrow min-dist
      // update + one argmax per round; the k×n score table never exists.
      // Distances are q79's IEEE-sequence doubles, so the oracle unrolls
      // every round exactly.
      Similarity.kCenterSelect(
          t(s, dir, "embeddings").selectCols(Seq(
            col("vec_id").as("id"), col("embedding").as("v"))), k = 8)
        .selectCols(Seq(col("rank"), col("id"),
          round(col("dist_sq"), 6).as("dist_sq")))
        .sortBy(Seq(col("rank")))),

    "q229_chi2_independence" -> ((s, dir) =>
      // is language independent of source? per-cell chi-square
      // contributions in exact integer ppm — margins from the cell table,
      // DECIMAL(38,0) clears overflow at any corpus size; the statistic is
      // the contrib_ppm sum at (R-1)(C-1) dof
      Validation.chiSquareIndependence(
          t(s, dir, "documents"), col("lang"), col("source"))
        .sortBy(Seq(col("a"), col("b")))),

    "q228_roc_auc" -> ((s, dir) =>
      // does document length separate English from the rest? Exact
      // Mann-Whitney AUC with half-credit ties, integer end to end — the
      // quality-signal evaluation a threshold sweep starts from. The
      // corpus collapses to the score histogram before any ranking work.
      Validation.rocAuc(t(s, dir, "documents"),
          col("n_chars"), col("lang") === "en")),

    "q227_markov_transitions" -> ((s, dir) =>
      // behavioral model over user event sequences: every adjacent
      // event_type pair per user under the (ts, event_id) total order,
      // row-normalized to floor-ppm probabilities — the lead() window is
      // per-user (never global), the normalizing window runs over the
      // |states|^2 aggregate, not the events
      EventStreams.transitionMatrix(
          t(s, dir, "events"),
          col("user_id"), Seq(col("ts"), col("event_id")), col("event_type"))
        .sortBy(Seq(col("from_state"), col("to_state")))),

    "q226_skyline" -> ((s, dir) =>
      // multi-objective shortlist: parts no other part beats on both
      // (cheaper-or-equal price, bigger-or-equal size, strict somewhere) —
      // the Pareto frontier computed by the two-level running-max pattern,
      // never the O(n^2) dominance join the oracle uses. Price in exact
      // cents via DECIMAL.
      Relational.skyline2D(
          t(s, dir, "part"),
          col("p_partkey"),
          expr("CAST(CAST(p_retailprice AS DECIMAL(18,6)) * 100 AS BIGINT)"),
          col("p_size"))
        .sortBy(Seq(col("id")))),

    "q225_concurrency" -> ((s, dir) =>
      // capacity-planning sweep: each event opens a session lasting its
      // value in seconds; every boundary carries the exact number of
      // concurrently-open sessions after it (max(active) = the peak a
      // capacity plan provisions for). No interval pair ever materializes;
      // the running sum is the two-level bucketed pattern, not a global
      // window. Half-open [s, e): a session ending exactly at another's
      // start never overlaps it.
      Relational.concurrencyProfile(
          t(s, dir, "events").selectCols(Seq(col("event_id"),
            expr("unix_micros(ts)").as("s_us"),
            expr("unix_micros(ts) + CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
              .as("e_us"))),
          col("event_id"), col("s_us"), col("e_us"))
        .sortBy(Seq(col("seq")))),

    "q224_table_fingerprint" -> ((s, dir) => {
      // replication audit as a driver fact: the same table fingerprinted
      // twice — once as stored, once re-shuffled into a different
      // partitioning — produces the SAME mod-2^64 FNV row-hash sum, so
      // two 100 TB copies compare by exchanging one row each. The oracle
      // replays the full checksum in HUGEINT arithmetic, proving the
      // fingerprint is engine-portable, not just layout-portable.
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      Validation.tableFingerprint(li, "lineitem", cols)
        .union(Validation.tableFingerprint(
          li.repartition(7, col("l_partkey")), "lineitem_shuffled", cols))
        .sortBy(Seq(col("tbl")))
    }),

    "q223_zone_map_skip" -> ((s, dir) =>
      // what would a sort-by-value rewrite buy this predicate? The
      // layout-advisor report over event values (micros-exact, q214's
      // rendering): arrival order leaves every file's zone straddling the
      // band; value order confines it — the scan_ppm gap IS the read
      // amplification a 100 TB rewrite would remove, measured for two
      // scans instead of a full shuffle.
      Relational.zoneMapSkipReport(
          t(s, dir, "events").selectCols(Seq(col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmicros"))),
          col("event_id"), col("vmicros"), nFiles = 32,
          lo = 30000000L, hi = 40000000L)
        .sortBy(Seq(col("layout")))),

    "q222_ppjoin" -> ((s, dir) =>
      // EXACT Jaccard >= 0.9 over token sets via prefix filtering — the
      // no-false-negative sibling of the MinHash families (q33/q144): at
      // t=0.9 each doc indexes ~10% of its tokens, so the inverted-index
      // candidate join stays linear-ish while the result is the full
      // threshold join, boundary inclusive. Oracle is the brute-force
      // quadratic — feasible at sf0.01, which is exactly why the exact
      // operator needs the sub-quadratic candidate path at scale.
      Dedup.ppJoinPairs(
          t(s, dir, "documents").selectCols(Seq(col("doc_id"),
            array_distinct(TextFns.tokens(col("text"))).as("tk"))),
          col("doc_id"), col("tk"), tPpm = 900000L)
        .sortBy(Seq(col("id_a"), col("id_b")))),

    "q221_bfs_distance" -> ((s, dir) => {
      // graph-proximity feature from seed nodes: multi-source BFS over the
      // q199 co-purchase graph, 3 rounds of frontier relaxation — the
      // hops-from-trusted-seed signal a curation pipeline thresholds on.
      // Unreached nodes absent by contract (the reached set is the small
      // output at 100 TB; its complement is not).
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      val src = e.selectCols(Seq(col("id_a").as("id")))
        .union(e.selectCols(Seq(col("id_b").as("id")))).distinct()
        .filterCol(col("id") % 7 === 0)
      graft.operators.Graph.bfsDistances(e, src, rounds = 3)
        .sortBy(Seq(col("id")))
    }),

    "q220_label_propagation" -> ((s, dir) => {
      // community detection over the co-purchase graph: 3 synchronous
      // rounds with deterministic smallest-label ties — splits the graph
      // into locally-dense product families where components (q50/q199's
      // sibling question) would merge everything reachable into one blob
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      graft.operators.Graph.labelPropagation(e, rounds = 3)
        .sortBy(Seq(col("id")))
    }),

    "q219_schema_evolution" -> ((s, dir) => {
      // additive schema evolution as a driver fact: batch 1 written before
      // n_chars existed, batch 2 after; the merged read unions footers and
      // pads old files with NULL — the no-table-format evolution contract
      // every long-lived ingest keeps (batch rides along as a partition
      // column, so the provenance of each row is visible too)
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf"
      val docs = t(s, dir, "documents")
      Engine.writeParquet(docs.filterCol(col("doc_id") % 2 === 0)
        .selectCols(Seq(col("doc_id"), col("lang"))), s"$scratch/evo/batch=1")
      Engine.writeParquet(docs.filterCol(col("doc_id") % 2 === 1)
        .selectCols(Seq(col("doc_id"), col("lang"), col("n_chars"))),
        s"$scratch/evo/batch=2")
      Engine.readParquetMerged(s, s"$scratch/evo")
        .selectCols(Seq(col("doc_id"), col("lang"), col("n_chars"),
          col("batch").cast("long").as("batch")))
        .sortBy(Seq(col("doc_id")))
    }),

    "q218_join_card_estimate" -> ((s, dir) => {
      // join-size + skew forecast WITHOUT running the joins: the 1:N
      // orders-lineitem join (est_rows == lineitem's matched rows — safe)
      // next to the lineitem self-join on partkey (the quadratic-key
      // blowup a planner must refuse or salt). Histograms only — the
      // candidate output never materializes; this is the pre-flight check
      // a 100 TB pipeline runs before committing shuffle capacity.
      import graft.operators.Relational
      val li = t(s, dir, "lineitem")
      val cols = Seq(col("pair"), col("est_rows"), col("n_keys_left"),
        col("n_keys_right"), col("n_matched_keys"), col("max_key"),
        col("max_key_rows"), col("max_share_ppm"))
      val a = Relational.joinCardinalityEstimate(
          t(s, dir, "orders"), col("o_orderkey"), li, col("l_orderkey"))
        .withColumn("pair", lit("orders_lineitem")).selectCols(cols)
      val b = Relational.joinCardinalityEstimate(
          li, col("l_partkey"), li, col("l_partkey"))
        .withColumn("pair", lit("lineitem_self_partkey")).selectCols(cols)
      a.union(b).sortBy(Seq(col("pair")))
    }),

    "q217_t_closeness" -> ((s, dir) =>
      // the third release-gate leg after q202 (class size) and q210 (class
      // variety): does any source's lang DISTRIBUTION diverge more than
      // 10% TVD from the corpus-wide one (the skewness attack k-anonymity
      // and l-diversity both miss)? Genuinely mixed on this data — some
      // sources sit within the band, some outside.
      Validation.tCloseness(t(s, dir, "documents"), "docs_lang_by_source_t10",
          Seq(col("source")), col("lang"), tPpm = 100000L)
        .sortBy(Seq(col("rule")))),

    "q216_hilbert" -> ((s, dir) =>
      // Hilbert layout key over (partkey, suppkey) — q90's Morton key with
      // strictly tighter 2-D locality (every consecutive code is
      // grid-adjacent; RelationalSpec proves the property). Inputs masked
      // into the grid: Hilbert's flip arithmetic is grid-relative, so high
      // bits cannot be benignly ignored the way Morton's are.
      t(s, dir, "lineitem")
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          Relational.hilbertValue(col("l_partkey").bitwiseAND(lit(255L)),
            col("l_suppkey").bitwiseAND(lit(255L)), 8).as("h")))
        .sortBy(Seq(col("h"), col("l_orderkey"), col("l_linenumber")))),

    "q215_retrieval_eval" -> ((s, dir) => {
      // retrieval metrics with the ranking signal deliberately WEAKER than
      // the judgment (rank by 2-term containment, judge by all-3-term
      // containment): precision/recall@10 and MRR are then genuinely
      // informative, not 1.0 by construction. All integer ppm. The rank
      // window runs over the bounded top-50 frame only.
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents").selectCols(Seq(col("doc_id"),
        array_distinct(TextFns.tokens(col("text"))).as("tk")))
      val ranked = toks
        .selectCols(Seq(col("doc_id"),
          size(array_intersect(col("tk"), array(lit("spark"), lit("join"))))
            .cast("long").as("m2")))
        .orderBy(col("m2").desc, col("doc_id").asc).limit(50)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("m2").desc, col("doc_id").asc)).cast("long"))
        .withColumn("qid", lit(1L))
        .selectCols(Seq(col("qid"), col("doc_id"), col("rank")))
      val qrels = toks
        .filterCol(size(array_intersect(col("tk"),
          array(lit("spark"), lit("join"), lit("window")))) === 3)
        .selectCols(Seq(lit(1L).as("qid"), col("doc_id")))
      Retrieval.evalRetrieval(ranked, qrels, k = 10)
        .sortBy(Seq(col("qid")))
    }),

    "q214_quantile_bins" -> ((s, dir) =>
      // exact decile assignment over event values (micros-scaled decimal ->
      // long, so the sort key is integer-exact): rank-proportional bins via
      // the two-level rank with quantile-probed buckets — no global
      // single-partition window, probe epsilon never reaches the output
      Relational.quantileBins(
          t(s, dir, "events").selectCols(Seq(col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("vmicros"))),
          col("event_id"), col("vmicros"), nBins = 10)
        .sortBy(Seq(col("id")))),

    "q213_entity_resolution" -> ((s, dir) => {
      // the composed entity-resolution story: prefix-key sorted-
      // neighborhood blocking -> trigram-Jaccard verification on the
      // w-window candidates ONLY -> connected components -> longest-text
      // canonical record (q111's rule). The linear blocking stream
      // replaces the corpus-wide inverted-index candidate generation of
      // q50 (which stays as the exhaustive instrument); on this corpus
      // the 3-token-prefix key recalls every q34 pair (same-prefix runs
      // of <= 3 docs sit inside the w=8 window). The oracle replays the
      // same blocking algorithm, so the contract is exact replay.
      val docs = t(s, dir, "documents")
      val pfxFp = TextFns.fingerprint(
        array_join(slice(TextFns.tokens(col("text")), 1, 3), " "),
        portable = true)
      val cand = Dedup.sortedNeighborhoodPairs(docs, col("doc_id"), pfxFp, w = 8)
        .selectCols(Seq(col("id_a"), col("id_b")))
      // NOT materialized: both verification join sides consume this frame,
      // but their subtrees are canonically identical, so exchange reuse
      // already computes the ngram pass once (a truncate here measured
      // 1.4 s SLOWER — it forces a full materialization the plan avoids)
      val sh = docs.selectCols(Seq(col("doc_id"),
        array_distinct(TextFns.wordNgrams(col("text"), 3)).as("sh")))
      val verified = cand
        .join(sh.selectCols(Seq(col("doc_id").as("id_a"), col("sh").as("sh_a"))), "id_a")
        .join(sh.selectCols(Seq(col("doc_id").as("id_b"), col("sh").as("sh_b"))), "id_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("uni",
          size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long") - col("inter"))
        .filterCol(expr("inter * 1000000L DIV uni >= 800000L"))
        .selectCols(Seq(col("id_a"), col("id_b")))
      val comps = Dedup.nearDupComponents(verified)
      val scores = docs.selectCols(Seq(col("doc_id").as("id"),
        length(col("text")).cast("long").as("score")))
      Dedup.componentRepresentatives(comps, scores)
        .sortBy(Seq(col("id")))
    }),

    "q212_mmr_rerank" -> ((s, dir) => {
      // diversified top-k: MMR (lambda=0.5) over the 20 best documents for
      // a 3-term query — rel = query-term containment ppm, sim = token-set
      // Jaccard ppm, both integers, so the greedy argmax chain replays
      // exactly in the unrolled oracle. The quadratic sim stage runs over
      // the BOUNDED candidate pool (20 rows), never the corpus.
      val qterms = array(lit("spark"), lit("join"), lit("window"))
      val toks = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          array_distinct(TextFns.tokens(col("text"))).as("tk")))
      val cand = toks
        .selectCols(Seq(col("doc_id"),
          (size(array_intersect(col("tk"), qterms)).cast("long") * lit(1000000L))
            .as("num")))
        .selectCols(Seq(col("doc_id"), expr("num DIV 3").as("rel_ppm")))
        .orderBy(col("rel_ppm").desc, col("doc_id").asc).limit(20)
        .withColumn("qid", lit(1L))
      // identity limit: the equi-join on the unique doc_id key returns
      // exactly the 20 candidate rows, but only a static Limit gives the
      // plan a provable maxRows — which is what lets ExplainAudit verify
      // the theta-join below is bounded rather than exempting it
      val ct = cand.join(toks, "doc_id").limit(20)
      val a = ct.selectCols(Seq(col("doc_id").as("id_a"), col("tk").as("tk_a")))
      val b = ct.selectCols(Seq(col("doc_id").as("id_b"), col("tk").as("tk_b")))
      val sims = a.join(b, col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("tk_a"), col("tk_b"))).cast("long"))
        .withColumn("uni",
          size(col("tk_a")).cast("long") + size(col("tk_b")).cast("long") - col("inter"))
        .selectCols(Seq(lit(1L).as("qid"), col("id_a"), col("id_b"),
          expr("inter * 1000000L DIV uni").as("sim_ppm")))
      Retrieval.mmrSelect(cand, sims, k = 8)
        .sortBy(Seq(col("round")))
    }),

    "q211_temperature_weights" -> ((s, dir) =>
      // alpha=0.5 temperature rebalancing of the source mixture: weight
      // proportional to sqrt(count), integer-exact via floor(1000*sqrt(n))
      // = FLOOR(SQRT(n*1e6)) (exact double below 2^53, correctly-rounded
      // IEEE sqrt), then ppm floor division — engine-replayable end to end
      Corpus.temperatureWeights(t(s, dir, "documents"), col("source"))
        .sortBy(Seq(col("group")))),

    "q210_l_diversity" -> ((s, dir) =>
      // homogeneity-attack audit: is every source's lang distribution at
      // least 3-diverse? k-anonymity (q202) bounds class SIZE; this bounds
      // class VARIETY — the pair gates a release together
      Validation.lDiversity(t(s, dir, "documents"), "docs_lang_by_source_l3",
          Seq(col("source")), col("lang"), l = 3)
        .sortBy(Seq(col("rule")))),

    "q209_profile" -> ((s, dir) =>
      // dataset-card column profile: ONE aggregate pass over one scan ->
      // per-column rows via a literal stack (no reshuffle); exact distincts
      // are the oracle/audit mode, approx_count_distinct the 100 TB switch.
      // Integral + string columns only — their min/max string rendering is
      // engine-portable (double rendering is not).
      Validation.profileColumns(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"))
        .sortBy(Seq(col("column")))),

    "q208_sorted_neighborhood" -> ((s, dir) =>
      // sorted-neighborhood candidate pairs (Hernández-Stolfo) over the
      // portable-fingerprint order, w=8: linear candidate volume where hot
      // blocking keys go quadratic; global rank is two-level (per-bucket
      // windows + a buckets-sized offset frame), pairs are an explode +
      // equi-join on rank targets — no range join, no cross product
      Dedup.sortedNeighborhoodPairs(t(s, dir, "documents"), col("doc_id"),
          TextFns.fingerprint(col("text"), portable = true), w = 8)
        .sortBy(Seq(col("id_a"), col("id_b")))),

    "q207_stream_funnel" -> ((s, dir) => {
      // TRUE streaming daily conversion funnel: per (user, day) the
      // view->click->purchase strictly-after cascade, computed when the
      // watermark passes the day end (event-time timeout), one row per
      // REACHED stage. Day windows the watermark never passes stay open
      // and emit nothing — the q42 last-session contract — and the oracle
      // replays the cascade for exactly the closed days.
      val staged = java.nio.file.Files.createTempDirectory("graft_q207")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q207_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runFunnelSmoke(s, staged.toString, qn, Seq(
            "view" -> (col("event_type") === "view"),
            "click" -> (col("event_type") === "click"),
            "purchase" -> (col("event_type") === "purchase")))
          .selectCols(Seq(col("user_id"), col("win_us"), col("stage"), col("t_us")))
          .sortBy(Seq(col("user_id"), col("win_us"), col("stage")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q206_streaming_ivm" -> ((s, dir) => {
      // STREAMING materialized-view maintenance: a 4-file changelog
      // (every event as an insert + a delete row for every 7th event_id,
      // hash-scattered across files so retractions can precede their
      // inserts) folded batch-by-batch into a versioned store — each batch
      // costs the batch, never a fact rescan. The final snapshot must
      // equal a from-scratch rollup of the surviving events, which is
      // what the oracle computes. Decimal-exact, so fold == recompute
      // bit-for-bit regardless of batch order.
      val sf = new java.io.File(dir).getName
      val scratch = s"${scratchRoot}/$sf/ivm"
      val e = t(s, dir, "events")
      val changelog = e.selectCols(Seq(col("event_type"),
          col("value").cast("decimal(18,6)").as("v"), lit(false).as("is_del")))
        .unionAll(e.filterCol(pmod(col("event_id"), lit(7)) === 0)
          .selectCols(Seq(col("event_type"),
            col("value").cast("decimal(18,6)").as("v"), lit(true).as("is_del"))))
      changelog.repartition(4).write.mode("overwrite")
        .parquet(s"$scratch/landing")
      EventStreams.runStreamingViewMaintenance(s, s"$scratch/landing",
        s"$scratch/view", s"$scratch/ckpt", "is_del",
        keys = Seq("event_type"), sums = Seq("revenue" -> col("v")))
      EventStreams.readMaintainedView(s, s"$scratch/view")
        .selectCols(Seq(col("event_type"), col("n"),
          col("revenue").cast("double").as("revenue")))
        .sortBy(Seq(col("event_type")))
    }),

    "q205_temporal_split" -> ((s, dir) =>
      // leakage-safe evaluation split: 3-day embargo before the cutoff,
      // labeled and kept (auditable), per-split boundary stats proving the
      // bands never overlap
      t(s, dir, "events")
        .temporalSplit(col("ts"), "2024-01-24 00:00:00", 3L * 86400)
        .aggregate(Seq(col("split")), Seq(
          count(lit(1)).as("n"),
          min(expr("unix_micros(ts)")).as("min_us"),
          max(expr("unix_micros(ts)")).as("max_us")))
        .sortBy(Seq(col("split")))),

    "q204_hll_windowed_stream" -> ((s, dir) => {
      // distinct-per-hour over a TRUE stream without storing values:
      // register max grouped by (tumbling hour, bucket) — 64 longs of
      // state per window — drained dense; the oracle computes every
      // window's registers from the batch table
      val staged = EventStreams.stagedOnce(s"events_copy|$dir") { d =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          java.nio.file.Paths.get(d, "events.parquet"))
        ()
      }
      val qn = s"graft_q204_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runHllWindowedSmoke(s, staged, qn, "event_id")
        .selectCols(Seq(col("win_start").cast("long").as("win_epoch"),
          col("bucket"), col("register"), col("n_exact")))
        .sortBy(Seq(col("win_epoch"), col("bucket")))
    }),

    "q203_hll_overlap" -> ((s, dir) => {
      // sketch set algebra: en/de vocabulary overlap by inclusion-exclusion
      // over three HLL sketches (registers only — raw tokens never
      // co-shuffle); exact distinct counts ride along as instruments so
      // the compounded estimate error is visible, not asserted
      val d = t(s, dir, "documents")
      def tok(l: String) = d.filterCol(col("lang") === l)
        .selectCols(Seq(explode(TextFns.tokens(col("text"))).as("tok")))
      Corpus.hllOverlap(tok("en"), tok("de"), col("tok"))
    }),

    "q202_k_anonymity" -> ((s, dir) =>
      // release-gate audit: (lang, source) as quasi-identifiers over the
      // document corpus at k=3 — the count-1 cells seen in q195 make this
      // a genuinely failing (non-anonymous) report, not a vacuous pass
      Validation.kAnonymity(t(s, dir, "documents"), "docs_lang_source_k3",
          Seq(col("lang"), col("source")), k = 3)
        .sortBy(Seq(col("rule")))),

    "q201_hll_stream" -> ((s, dir) => {
      // q191's sketch as a TRUE streaming aggregation: bucket-wise register
      // max in complete mode (64 longs of state for any stream length),
      // drained and finalized through the identical batch math — the
      // oracle computes the batch registers over event_id directly.
      val staged = EventStreams.stagedOnce(s"events_copy|$dir") { d =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          java.nio.file.Paths.get(d, "events.parquet"))
        ()
      }
      val qn = s"graft_q201_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      EventStreams.runHllStreamSmoke(s, staged, qn, "event_id")
        .sortBy(Seq(col("bucket")))
    }),

    "q200_image_dedup_pipeline" -> ((s, dir) => {
      // the composed MULTIMODAL dedup pipeline: synth -> REAL decode ->
      // dHash -> pigeonhole pairs (q190) -> connected components (q50's
      // operator) -> largest-area representative per cluster. One driver
      // fact for the whole image-dedup story; the oracle recomputes every
      // stage from the synthesis formula, recursive CTE included.
      // Bench note: the ~6 s at sf0.1 is CODEC-bound (one PNG encode +
      // decode per doc) plus component rounds — strictly linear in corpus
      // size; the pair join stays pigeonhole-bounded (no quadratic term).
      val d = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          pmod(col("doc_id"), lit(47)).as("g"),
          expr("doc_id div 47").as("off")))
        .selectCols(Seq(col("doc_id"), col("g"), col("off"),
          (lit(8) + pmod(col("g"), lit(9))).cast("int").as("w"),
          (lit(8) + pmod(col("g"), lit(7))).cast("int").as("h")))
        .withColumn("png", Multimodal.synthGrayPatternPngUdf(
          col("g"), col("off"), col("w"), col("h")))
        .withColumn("sig", Multimodal.dHash64(col("png")))
      val pairs = Dedup.hamming64Pairs(d, col("doc_id"), col("sig"), maxHamming = 3)
      val comps = Dedup.nearDupComponents(pairs)
      val scores = d.selectCols(Seq(col("doc_id").as("id"),
        (col("w") * col("h")).cast("long").as("score")))
      Dedup.componentRepresentatives(comps, scores)
        .sortBy(Seq(col("id")))
    }),

    "q199_kcore" -> ((s, dir) => {
      // dense-core extraction: high-quantity co-purchase part graph peeled
      // 4 rounds at k=3 — a real cascade on this data (1494 -> 533 -> 241
      // -> 112 -> 74 nodes at sf0.01: round-1 survivors starve as their
      // fringe vanishes). Fixed rounds = mechanically unrollable oracle,
      // the q100 pagerank contract.
      val hi = t(s, dir, "lineitem").filterCol(col("l_quantity") >= 45)
        .selectCols(Seq(col("l_orderkey"), col("l_partkey")))
      val e = hi.alias("x").join(hi.alias("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .selectCols(Seq(col("x.l_partkey").as("id_a"),
          col("y.l_partkey").as("id_b")))
        .distinct()
      graft.operators.Graph.kCorePeel(e, k = 3, rounds = 4)
        .sortBy(Seq(col("id")))
    }),

    "q198_weighted_sample" -> ((s, dir) =>
      // sequential Poisson sampling: 50 docs weighted by n_chars — long
      // docs win proportionally more often, reproducibly (Knuth-hash
      // uniforms, integer floor-division priorities, id tie-break)
      t(s, dir, "documents")
        .weightedSample(col("doc_id"), col("n_chars"), k = 50)
        .selectCols(Seq(col("doc_id"), col("n_chars"), col("u"),
          col("priority"), col("sample_rank")))
        .sortBy(Seq(col("sample_rank")))),

    "q197_hll_merge" -> ((s, dir) => {
      // HLL union law as a DRIVER fact, not just a spec: per-source shard
      // sketches merged by element-wise register max must equal the global
      // sketch — which is exactly what the oracle computes, never seeing
      // the grouping. Count-distinct across shards, no raw-value shuffle.
      val d = t(s, dir, "documents")
      Corpus.hllMerge(
          Corpus.hllSketchGrouped(d, col("source"), col("doc_id")),
          d.aggregate(Nil, Seq(countDistinct(col("doc_id")).as("n_exact"))))
        .sortBy(Seq(col("bucket")))
    }),

    "q196_stream_validation_gate" -> ((s, dir) => {
      // q189's rule math as a TRUE streaming aggregation (complete mode,
      // rule-count-sized state): the final per-batch report must equal the
      // batch report over the same events — which is what the oracle
      // computes. Mixed pass/fail rules on live data (value cap fires).
      val staged = java.nio.file.Files.createTempDirectory("graft_q196")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q196_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        EventStreams.runValidationGateSmoke(s, staged.toString, qn, Seq(
            "type_domain" -> !col("event_type").isin(
              "click", "error", "purchase", "signup", "view"),
            "user_complete" -> col("user_id").isNull,
            "value_cap_400" -> (col("value") > 400.0),
            "value_positive" -> (col("value") <= 0.0)))
          .sortBy(Seq(col("rule")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q195_categorical_drift" -> ((s, dir) => {
      // distribution-shift monitor: even-id docs as the reference snapshot,
      // odd-id docs as the current batch, (lang, source) as the category —
      // 97 cells, some one-sided (count-1 cells fall entirely into one
      // half), so the outer-join zero path is live data, not just spec
      val d = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          concat(col("lang"), lit(":"), col("source")).as("cat")))
      Validation.categoricalDrift(
          d.filterCol(pmod(col("doc_id"), lit(2)) === 0),
          d.filterCol(pmod(col("doc_id"), lit(2)) === 1),
          col("cat"))
        .sortBy(Seq(col("category")))
    }),

    "q194_ann_sq8" -> ((s, dir) => {
      // int8 scalar-quantized ANN: q76's codec feeding a pure-INTEGER dot
      // product — the one ANN variant whose whole search path (codes,
      // scores, ranking) hash-matches an oracle instead of needing a
      // recall measurement. Same query set as q36 for comparability.
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val queries = corpus.filterCol(col("id") < 10)
      Similarity.sq8TopK(corpus, queries, k = 5)
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    // q193 — historically a numbering gap; filled in r9 with the
    // distributed-tier gate for connected components. q50 takes the
    // step-0 driver union-find at sf scales (the graph fits); this runs
    // the IDENTICAL pair graph through the distributed label-propagation
    // + star-contraction phases (maxLocalEdges=0, the 100 TB code path)
    // against the SAME recursive-CTE oracle — so the tier that actually
    // runs at cluster scale is itself driver-verified per round, not
    // just spec-pinned at toy sizes.
    "q193_components_distributed" -> ((s, dir) =>
      Dedup.nearDupComponents(
          Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"),
            col("text"), threshold = 0.8),
          maxLocalEdges = 0L)
        .sortBy(Seq(col("id")))),

    "q192_incremental_agg" -> ((s, dir) => {
      // incremental view maintenance: the pre-cutoff rollup is NEVER
      // recomputed — a changelog (post-cutoff inserts + every-13th-key
      // deletes) folds in as a signed delta, and the result must equal a
      // from-scratch rollup of the final state (which is what the oracle
      // computes). Decimal-exact sums make merge == recompute bit-for-bit.
      val o = t(s, dir, "orders")
      val cut = lit("2000-01-01").cast("timestamp")
      val keys = Seq(col("o_orderstatus"), col("o_orderpriority"))
      val rev = Seq("revenue" -> col("o_totalprice").cast("decimal(18,2)"))
      val base = Relational.groupedAgg(
        o.filterCol(col("o_orderdate") < cut), keys, rev)
      val changelog = o.filterCol(col("o_orderdate") >= cut)
        .withColumn("is_del", lit(false))
        .unionAll(o.filterCol(col("o_orderdate") < cut &&
            pmod(col("o_orderkey"), lit(13)) === 0)
          .withColumn("is_del", lit(true)))
      val delta = Relational.deltaAgg(changelog, col("is_del"), keys, rev)
      Relational.maintainAgg(base, delta)
        .selectCols(Seq(col("o_orderstatus"), col("o_orderpriority"),
          col("n").as("n_orders"), col("revenue").cast("double").as("revenue")))
        .sortBy(Seq(col("o_orderstatus"), col("o_orderpriority")))
    }),

    "q191_hll_distinct" -> ((s, dir) =>
      // bounded-state distinct counter (HLL, portable-FNV hashed like
      // q173's CMS): 64 integer registers + exact scaled harmonic sum;
      // the float estimate is one shared IEEE op sequence, so even it
      // hash-matches. n_exact rides along as the oracle instrument.
      Corpus.hllSketch(t(s, dir, "lineitem"), col("l_orderkey"), b = 6)
        .sortBy(Seq(col("bucket")))),

    "q190_image_dhash_neardup" -> ((s, dir) => {
      // perceptual image near-dup: synthesize a nonlinear gray test pattern
      // per doc (47 structural groups, brightness offset varying inside a
      // group), REAL-decode each PNG into a 64-bit dHash, and find all
      // Hamming<=3 pairs with the exact 4x16-bit pigeonhole join (no cross
      // join). PNG is lossless + dHash is integer arithmetic, so the oracle
      // replays the exact bits from the synthesis formula and brute-forces
      // the 500-doc pair set — the driver hash pins decode + hash + join.
      val d = t(s, dir, "documents")
        .selectCols(Seq(col("doc_id"),
          pmod(col("doc_id"), lit(47)).as("g"),
          expr("doc_id div 47").as("off")))
        .selectCols(Seq(col("doc_id"), col("g"), col("off"),
          (lit(8) + pmod(col("g"), lit(9))).cast("int").as("w"),
          (lit(8) + pmod(col("g"), lit(7))).cast("int").as("h")))
        .withColumn("png", Multimodal.synthGrayPatternPngUdf(
          col("g"), col("off"), col("w"), col("h")))
        .withColumn("sig", Multimodal.dHash64(col("png")))
      Dedup.hamming64Pairs(d, col("doc_id"), col("sig"), maxHamming = 3)
        .selectCols(Seq(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming")))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q137_tpch_q19" -> ((s, dir) => {
      // TPC-H Q19 shape: disjunctive multi-column predicate over the part
      // join — the OR-of-ANDs Catalyst must keep partially pushable
      // (common conjunct l_quantity <= 36 extracted to the scan)
      val l = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 12)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(8, 24)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(16, 36))
      l.join(p, col("l_partkey") === col("p_partkey") && cond)
        .aggregate(Seq.empty, Seq(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"),
          count(lit(1)).as("n_lines")))
        .withColumn("revenue", round(col("revenue"), 4))
    }),

    "q138_tpch_q22" -> ((s, dir) => {
      // TPC-H Q22 shape: positive-balance customers above the global
      // average balance (decimal-exact scalar, broadcast — no collect)
      // with no RECENT orders (anti join on the filtered order set —
      // "lapsed high-value customers"), grouped by nation
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val avgBal = c.filterCol(col("c_acctbal") > 0.0)
        .aggregate(Seq.empty, Seq(
          (sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
            / count(lit(1))).as("avg_bal")))
      c.crossJoin(broadcast(avgBal))
        .filterCol(col("c_acctbal") > col("avg_bal"))
        .join(o.filterCol(col("o_orderdate").cast("date") >=
            lit(java.sql.Date.valueOf("2000-01-01")))
            .selectCols(Seq(col("o_custkey"))),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .aggregate(Seq(col("c_nationkey")), Seq(
          count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("total_bal")))
        .sortBy(Seq(col("c_nationkey")))
    }),

    "q139_sql_surface" -> ((s, dir) => {
      // the engine serves PLAIN SQL text end to end (the reference's
      // DataFusion ctx also executes SQL strings): temp views + spark.sql,
      // same text shape as the DuckDB oracle
      t(s, dir, "lineitem").createOrReplaceTempView("g139_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g139_orders")
      s.sql("""
        SELECT o.o_orderpriority, COUNT(*) AS n_lines,
          CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM g139_lineitem l JOIN g139_orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority""")
    }),

    "q136_passage_retrieval" -> ((s, dir) =>
      // the retrieval-family flagship composition: docs -> overlapping
      // 32/16 chunks (q112) -> BM25 over the CHUNK corpus (q104) -> top-20
      // passages; chunk identity packed as doc_id*1000 + chunk_id
      Retrieval.passageTopK(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), Seq("spark", "join", "window", "hash"),
          k = 20)
        .withColumn("score", round(col("score"), 6))
        .sortBy(Seq(col("rank")))),

    "q132_window_family" -> ((s, dir) => {
      // the remaining §2.2 window constructors in one query: lag/lead with
      // defaults, ntile, percent_rank, cume_dist — the window ordering
      // covers every output column, so tied rows yield identical output
      // rows (an ntile boundary swap permutes equal rows only)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filterCol(col("l_quantity") <= 2)
        .selectCols(Seq(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("price"),
          col("l_orderkey"), col("l_linenumber")))
        .withColumn("prev_price", lag(col("price"), 1, -1.0).over(w))
        .withColumn("next_price", lead(col("price"), 1, -1.0).over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 9))
        .withColumn("cdist", round(cume_dist().over(w), 9))
        .sortBy(Seq(col("l_returnflag"), col("price"), col("l_orderkey"),
          col("l_linenumber"), col("quartile")))
    }),

    "q133_multiset_ops" -> ((s, dir) => {
      // INTERSECT ALL / EXCEPT ALL multiset semantics (the distinct forms
      // are q19/q20): quantity-flag multisets of the two shipdate halves
      val l = t(s, dir, "lineitem")
      val cut = lit(java.sql.Date.valueOf("1997-06-01"))
      val a = l.filterCol(col("l_shipdate").cast("date") < cut)
        .selectCols(Seq(col("l_quantity").cast("long").as("qty"), col("l_returnflag").as("flag")))
      val b = l.filterCol(col("l_shipdate").cast("date") >= cut)
        .selectCols(Seq(col("l_quantity").cast("long").as("qty"), col("l_returnflag").as("flag")))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
        .aggregate(Seq(col("op"), col("qty"), col("flag")),
          Seq(count(lit(1)).as("n")))
        .sortBy(Seq(col("op"), col("qty"), col("flag")))
    }),

    "q134_tpch_q14" -> ((s, dir) => {
      // TPC-H Q14 shape: promo (ECONOMY-type) revenue share for one month
      // — conditional aggregate over the part join, decimal-exact sums,
      // one final division
      val l = t(s, dir, "lineitem")
        .filterCol(col("l_shipdate").cast("date") >= lit(java.sql.Date.valueOf("1996-03-01")) &&
          col("l_shipdate").cast("date") < lit(java.sql.Date.valueOf("1996-04-01")))
      val p = t(s, dir, "part")
      val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .aggregate(Seq.empty, Seq(
          sum(when(col("p_type") === "ECONOMY", disc).otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast("double").as("promo_revenue"),
          sum(disc).cast("double").as("total_revenue")))
        .withColumn("promo_share",
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 9))
        .withColumn("promo_revenue", round(col("promo_revenue"), 4))
        .withColumn("total_revenue", round(col("total_revenue"), 4))
    }),

    "q135_grouping_sets" -> ((s, dir) =>
      // explicit GROUPING SETS beyond q72's rollup/cube: (flag, status),
      // (flag), (status) — one Expand + single aggregate pass,
      // grouping_id disambiguates
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          grouping_id().cast("long").as("gid"))
        .selectCols(Seq(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"), col("gid")))
        .sortBy(Seq(col("gid"), col("flag"), col("status")))),

    "q131_lang_confusion" -> ((s, dir) => {
      // language-ID QA: ground-truth lang x predicted lang counts with
      // per-truth share — the accuracy surface behind the q28/q51 gates;
      // truth totals broadcast back (no window)
      val docs = t(s, dir, "documents")
      val truth = docs.aggregate(Seq(col("lang")), Seq(count(lit(1)).as("n_truth")))
      docs
        .withColumn("lang_pred", TextFns.langId(col("text")))
        .aggregate(Seq(col("lang"), col("lang_pred")), Seq(count(lit(1)).as("n")))
        .join(broadcast(truth), "lang")
        .selectCols(Seq(col("lang"), col("lang_pred"), col("n"), col("n_truth"),
          round(col("n").cast("double") / col("n_truth").cast("double"), 9).as("share")))
        .sortBy(Seq(col("lang"), col("lang_pred")))
    }),

    "q130_ks_drift" -> ((s, dir) =>
      // source drift monitor: exact two-sample KS on doc-length
      // distributions (max|c1*n2 - c2*n1| / (n1*n2) — integer-exact to
      // the final division)
      t(s, dir, "documents")
        .ksDrift(col("n_chars"), col("source"), "src0", "src1")
        .withColumn("ks", round(col("ks"), 9))
        .sortBy(Seq(col("label_a")))),

    "q128_tpch_q18" -> ((s, dir) => {
      // TPC-H Q18 shape: big-order HAVING pre-aggregate, then join the
      // survivors (tiny) to orders and customers — the aggregate feeds
      // the join as its broadcast side
      val big = t(s, dir, "lineitem")
        .aggregate(Seq(col("l_orderkey")), Seq(dsum(col("l_quantity")).as("sum_qty")))
        .filterCol(col("sum_qty") > 300.0)
      big
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .selectCols(Seq(col("c_name"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
          col("o_totalprice").cast("double").as("o_totalprice"), col("sum_qty")))
        .orderBy(col("o_totalprice").desc, col("od_us"), col("o_orderkey"))
        .limit(50)
    }),

    "q129_triangles" -> ((s, dir) => {
      // triangle census of the near-dup graph: dup clusters are
      // near-cliques, borderline chains are triangle-free — the
      // over-merge diagnostic for q50's transitive closure
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        threshold = 0.8)
      graft.operators.Graph.triangleCounts(pairs)
        .sortBy(Seq(col("id")))
    }),

    "q126_hard_negatives" -> ((s, dir) => {
      // contrastive pair mining: top-5 positives + ranks 6-20 as
      // semi-hard negatives for 10 query vectors, one kNN pass
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      Similarity.hardNegatives(corpus, corpus.filterCol(col("id") < 10),
          kPos = 5, kNeg = 15)
        .withColumn("cosine", round(col("cosine"), 6))
        .withColumn("rank", col("rank").cast("long"))
        .sortBy(Seq(col("query_id"), col("rank")))
    }),

    "q127_rate_anomalies" -> ((s, dir) =>
      // hourly event-rate z-scores per type from exact integer co-moments
      // (the corrStats discipline applied to rate monitoring)
      EventStreams.rateAnomalies(t(s, dir, "events"), col("event_type"),
          col("ts"), z = 3.0)
        .selectCols(Seq(col("key"), unix_micros(col("bucket")).as("bucket_us"),
          col("n"), round(col("mean"), 6).as("mean"),
          round(col("std"), 6).as("std"),
          round(col("zscore"), 6).as("zscore"), col("is_anomaly")))
        .sortBy(Seq(col("key"), col("bucket_us")))),

    "q124_tpch_q3" -> ((s, dir) => {
      // TPC-H Q3 (shippriority dropped — not in the synthetic schema):
      // 3-way join narrows via two pushed-down date/segment filters before
      // the fact join; revenue is decimal-exact
      val cutoff = lit(java.sql.Date.valueOf("1996-06-30"))
      val c = t(s, dir, "customer").filterCol(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filterCol(col("o_orderdate").cast("date") < cutoff)
      val l = t(s, dir, "lineitem").filterCol(col("l_shipdate").cast("date") > cutoff)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .aggregate(Seq(col("l_orderkey"), col("o_orderdate")), Seq(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue")))
        .selectCols(Seq(col("l_orderkey"),
          // o_orderdate is TIMESTAMP_NTZ in parquet; session is UTC, so
          // the LTZ cast is instant-preserving
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
          col("revenue")))
        .orderBy(col("revenue").desc, col("od_us"), col("l_orderkey"))
        .limit(10)
    }),

    "q125_tpch_q5" -> ((s, dir) => {
      // TPC-H Q5: 6-way snowflake join, local-supplier condition
      // (c_nationkey = s_nationkey), one-year window; region/nation are
      // broadcast dims, revenue decimal-exact
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .filterCol(col("o_orderdate").cast("date") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("o_orderdate").cast("date") < lit(java.sql.Date.valueOf("1997-01-01")))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey") &&
          col("r_name") === "ASIA")
        .aggregate(Seq(col("n_name")), Seq(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue")))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q123_novelty_curve" -> ((s, dir) => {
      // corpus saturation: 10 ingestion batches by doc_id range
      // (count-based => sf-agnostic); novelty = share of 3-gram shingles
      // first seen in that batch
      val docs = t(s, dir, "documents")
      val bs = (docs.count() + 9) / 10
      Corpus.noveltyCurve(docs,
          floor(col("doc_id").cast("double") / bs).cast("long"),
          TextFns.wordNgrams(col("text"), 3))
        .withColumn("novelty", round(col("novelty"), 9))
        .sortBy(Seq(col("batch")))
    }),

    "q121_cohort_retention" -> ((s, dir) =>
      // daily cohort retention matrix in long form (the 30-day synthetic
      // event span yields a dense matrix at day granularity); integer
      // microsecond offsets, one distinct-count shuffle
      EventStreams.cohortRetention(t(s, dir, "events"), col("user_id"),
          col("ts"), period = "day")
        .withColumn("retention", round(col("retention"), 9))
        .sortBy(Seq(col("cohort_us"), col("period_offset")))),

    "q122_state_intervals" -> ((s, dir) =>
      // SCD-2 interval build: runs of consecutive identical event_type per
      // user with [valid_from, valid_to) bounds; event_id breaks ts ties
      EventStreams.stateIntervals(t(s, dir, "events"), col("user_id"),
          col("ts"), col("event_type"), col("event_id"))
        .selectCols(Seq(col("key").as("user_id"), col("state"),
          unix_micros(col("valid_from")).as("from_us"),
          unix_micros(col("valid_to")).as("to_us")))
        .withColumn("to_us", coalesce(col("to_us"), lit(-1L)))
        .sortBy(Seq(col("user_id"), col("from_us"), col("state")))),

    "q119_source_health" -> ((s, dir) =>
      // per-source corpus health report: doc count, decimal-exact mean
      // quality / token count, language spread, exact-dup rate (keyed on
      // raw text for oracle parity — xxhash64 the key at scale, q31's rule)
      t(s, dir, "documents")
        .withColumn("q", TextFns.qualityScore(col("text")))
        .withColumn("ntok", TextFns.tokenCount(col("text")).cast("long"))
        .aggregate(Seq(col("source")), Seq(
          count(lit(1)).as("n_docs"),
          (sum(col("q").cast(DecimalType(18, 9))).cast("double")
            / count(lit(1))).as("mean_quality"),
          (sum(col("ntok")).cast("double") / count(lit(1))).as("mean_tokens"),
          count_distinct(col("lang")).as("n_langs"),
          (count(lit(1)) - count_distinct(col("text"))).as("n_exact_dups")))
        .withColumn("mean_quality", round(col("mean_quality"), 6))
        .withColumn("mean_tokens", round(col("mean_tokens"), 6))
        .sortBy(Seq(col("source")))),

    "q120_funnel" -> ((s, dir) =>
      // ordered conversion funnel view -> click -> purchase: per user the
      // earliest stage time strictly after the previous stage; one narrow
      // min-aggregate per stage, no per-user event lists
      EventStreams.funnel(t(s, dir, "events"), col("user_id"), col("ts"), Seq(
          "view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
        .selectCols(Seq(col("user_id"),
          unix_micros(col("t_view")).as("t_view_us"),
          unix_micros(col("t_click")).as("t_click_us"),
          unix_micros(col("t_purchase")).as("t_purchase_us"),
          col("stages_completed")))
        .sortBy(Seq(col("user_id")))),

    "q118_component_split" -> ((s, dir) => {
      // leakage-safe 80/20 split: near-dup cluster members always land on
      // the same side (per-doc splits leak near-dups into eval); singleton
      // docs hash their own id
      val docs = t(s, dir, "documents")
      val comps = Dedup.nearDupComponents(
        Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), threshold = 0.8))
      Dedup.componentSplit(docs, col("doc_id"), comps)
        .sortBy(Seq(col("id")))
    }),

    "q116_oov_rate" -> ((s, dir) =>
      // tokenizer-fit signal: OOV rate against the corpus's own top-50
      // vocab (small cap so the synthetic ~30-word vocabulary still
      // yields OOV mass); vocab broadcast to an anti join
      Corpus.oovRate(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), vocabSize = 25)
        .withColumn("oov_rate", round(col("oov_rate"), 9))
        .sortBy(Seq(col("id")))),

    "q117_mutual_knn" -> ((s, dir) => {
      // reciprocal-NN graph: (a,b) kept iff each is in the other's top-10
      // — the hub-pruned symmetric graph clustering consumes. Exact brute
      // kNN here (the oracle-checkable config — full corpus as queries is
      // the q37-style verify tool); at scale feed mutualPairs from
      // ivfTopK, which partitions instead of broadcasting
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      Similarity.mutualPairs(Similarity.bruteForceTopK(corpus, corpus, k = 10))
        .sortBy(Seq(col("id_a"), col("id_b")))
    }),

    "q115_robust_scale" -> ((s, dir) =>
      // outlier-insensitive feature scaling: (x - median) / MAD per group
      // (q95's min-max sibling; one extreme value can't move the bounds)
      t(s, dir, "lineitem")
        .robustScale(Seq(col("l_returnflag")), col("l_extendedprice"))
        .selectCols(Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice").cast("double").as("x"),
          round(col("v_med"), 6).as("v_med"),
          round(col("v_mad"), 6).as("v_mad"),
          round(col("scaled"), 6).as("scaled")))
        // (orderkey, linenumber) is NOT unique in the synthetic lineitem —
        // returnflag + x make the order total
        .sortBy(Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("x")))),

    "q114_stream_lsh_ingest" -> ((s, dir) => {
      // TRUE streaming near-dup ingestion: documents arrive as two
      // micro-batches (count/2 split, mod-time ordered); each batch checks
      // the accumulated LSH index then joins it. Because the index holds
      // every prior doc, the result is batch-cut-INDEPENDENT — the oracle
      // is the one-shot global keep-first rule
      val staged = EventStreams.stagedOnce(s"doc_halves|$dir") { d =>
        val stagedP = java.nio.file.Paths.get(d)
        def writeHalf(cond: Column, name: String, modTime: Long): Unit = {
          val tmp = stagedP.resolve(name + "_tmp")
          t(s, dir, "documents").filterCol(cond).coalesce(1)
            .write.parquet(tmp.toString)
          val part = java.nio.file.Files.list(tmp).iterator().asScala
            .find(_.toString.endsWith(".parquet")).get
          val dest = stagedP.resolve(name + ".parquet")
          java.nio.file.Files.move(part, dest)
          dest.toFile.setLastModified(modTime)
          java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
        val mid = t(s, dir, "documents").count() / 2
        writeHalf(col("doc_id") < mid, "b0", 1000000000L)
        writeHalf(col("doc_id") >= mid, "b1", 2000000000L)
      }
      EventStreams.runLshIngestSmoke(s, staged, "doc_id", "text",
          threshold = 0.8)
        .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
        .sortBy(Seq(col("id")))
    }),

    "q112_sliding_chunks" -> ((s, dir) =>
      // RAG-index chunking: 32-token windows every 16 tokens, last start
      // pinned so the final chunk ends at the doc end; narrow explode,
      // no shuffle
      Corpus.slidingChunks(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")), chunkTokens = 32, stride = 16)
        .sortBy(Seq(col("id"), col("chunk_id")))),

    "q113_gopher_rules" -> ((s, dir) =>
      // Gopher-style composite gate with per-rule diagnosis flags; only
      // the repetition rule needs an aggregate (bounded by distinct
      // (doc, term) pairs)
      Corpus.gopherQualityFlags(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokens(col("text")))
        .sortBy(Seq(col("id")))),

    "q111_component_best" -> ((s, dir) => {
      // near-dup clusters keep their LONGEST member (ties to smaller id)
      // instead of q50/q51's min-id rule — the complete copy of a page
      // beats its truncated variant regardless of crawl order
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        threshold = 0.8)
      val comps = Dedup.nearDupComponents(pairs)
      val scores = docs.selectCols(Seq(col("doc_id").as("id"),
        length(col("text")).cast("long").as("score")))
      Dedup.componentRepresentatives(comps, scores)
        .sortBy(Seq(col("id")))
    }),

    "q109_difficulty_bins" -> ((s, dir) =>
      // curriculum schedule input: quartile bins over token count (exact
      // global percentile thresholds — one aggregate, one broadcast row;
      // approximate=true is the 100 TB path); scores AT a cut point land
      // in the lower bin
      Corpus.difficultyBins(t(s, dir, "documents"), col("doc_id"),
          TextFns.tokenCount(col("text")))
        .sortBy(Seq(col("id")))),

    "q110_key_skew" -> ((s, dir) =>
      // pre-join skew profiling: hottest 20 order keys by row count with
      // share-of-table and skew-vs-mean-key factors
      t(s, dir, "lineitem").keySkewStats(col("l_orderkey"), k = 20)
        .withColumn("share", round(col("share"), 9))
        .withColumn("skew", round(col("skew"), 6))
        .sortBy(Seq(col("rank")))),

    "q108_incremental_lsh" -> ((s, dir) => {
      // near-dup ingestion: the second half of documents (count/2 midpoint,
      // doc_ids dense from 0 — sf-agnostic) checks against an LSH index of
      // the first half; history is banded once, only the batch is shingled
      // at "ingest". k=128/b=32 => the exact-Jaccard oracle applies (miss
      // prob ~5e-9, the q33 argument)
      val docs = t(s, dir, "documents")
      val mid = docs.count() / 2
      val index = Dedup.lshIndex(docs.filterCol(col("doc_id") < mid),
        col("doc_id"), col("text"))
      Dedup.incrementalLshDedup(docs.filterCol(col("doc_id") >= mid),
          col("doc_id"), col("text"), index, threshold = 0.8)
        .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
        .sortBy(Seq(col("id")))
    }),

    "q107_repeated_spans" -> ((s, dir) =>
      // exact-substring dedup signal (Lee et al.): 64-char windows every
      // 16 chars, flagged when the same text appears in >= 2 docs; hashes
      // move through the shuffle, never window text
      Corpus.repeatedSpans(t(s, dir, "documents"), col("doc_id"), col("text"),
          winLen = 64, step = 16, minDocs = 2L)
        .sortBy(Seq(col("id"), col("pos")))),

    "q98_stream_static_enrich" -> ((s, dir) => {
      // TRUE streaming stateless enrichment: the events file stream joins
      // the static customer dim (broadcast per micro-batch, no state
      // stores); append output equals the batch left join => exact oracle
      val staged = java.nio.file.Files.createTempDirectory("graft_q98")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        staged.resolve("events.parquet"))
      val qn = s"graft_q98_${java.util.UUID.randomUUID().toString.replace('-', '_')}"
      try {
        val dim = t(s, dir, "customer")
          .selectCols(Seq(col("c_custkey").as("user_id"),
            col("c_mktsegment"), col("c_nationkey")))
        EventStreams.runStreamEnrichSmoke(s, staged.toString, qn, dim, Seq("user_id"))
          .selectCols(Seq(col("event_id"), col("user_id"), col("event_type"),
            col("c_mktsegment"), col("c_nationkey")))
          .sortBy(Seq(col("event_id")))
      } finally {
        java.nio.file.Files.deleteIfExists(staged.resolve("events.parquet"))
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),

    "q97_containment_pairs" -> ((s, dir) => {
      // asymmetric (doc-inside-doc) dedup: every 10th doc gets a synthetic
      // "digest" page wrapping it plus its neighbor — containment ~1 where
      // Jaccard stays ~0.5, exactly what the symmetric metric misses
      val base = t(s, dir, "documents").selectCols(Seq(col("doc_id"), col("text")))
      val nxt = base.selectCols(Seq((col("doc_id") - 1).as("doc_id"),
        col("text").as("text_next")))
      val digests = base.join(nxt, Seq("doc_id"))
        .filterCol(pmod(col("doc_id"), lit(10)) === 0)
        .selectCols(Seq((col("doc_id") + 10000).as("doc_id"),
          concat_ws(" ", col("text"), col("text_next")).as("text")))
      Dedup.containmentPairs(base.union(digests), col("doc_id"), col("text"),
          ngram = 3, threshold = 0.9)
        .withColumn("containment", round(col("containment"), 6))
        .sortBy(Seq(col("id_in"), col("id_out")))
    }),

    "q96_training_pipeline" -> ((s, dir) => {
      // the flagship end-to-end composition: q83's multi-line construction
      // -> boilerplate strip -> lang/quality gate -> exact dedup ->
      // 24-token truncation -> 256-token sequence packing. Every stage is
      // replayed in the oracle
      val doc = concat(col("text"), lit("\n"),
        when(col("doc_id") % 2 === 0,
          concat(lit("subscribe to "), col("source"), lit(" weekly")))
          .otherwise(concat(lit("contact "), col("doc_id"))),
        lit("\n"), lit("all rights reserved"))
      graft.operators.Pipeline.prepareTrainingData(
          t(s, dir, "documents").withColumn("doc", doc),
          col("doc_id"), col("doc"),
          minDocsBoiler = 10L, minQuality = 0.66,
          maxTokens = 24, ctxLen = 256, bucketSize = 64)
        .withColumn("quality", round(col("quality"), 6))
        .withColumn("was_truncated", col("was_truncated").cast("long"))
        .sortBy(Seq(col("id")))
    }),

    "q65_centroid_assign" -> ((s, dir) => {
      // nearest-centroid labeling; centroids = the first 8 embeddings (exact
      // float values from parquet => bit-identical distances cross-engine)
      val e = t(s, dir, "embeddings")
      val corpus = e.selectCols(Seq(col("vec_id").as("id"), col("embedding").as("v")))
      val cents = e.filterCol(col("vec_id") < 8)
        .selectCols(Seq(col("vec_id").as("cid"), col("embedding").as("cv")))
      Similarity.assignToCentroids(corpus, cents)
        .withColumn("dist_sq", round(col("dist_sq"), 6))
        .sortBy(Seq(col("id")))
    })
  )

  /** DuckDB oracle SQL per query (same parquet tables). The driver records
    * a weaker rows-only check for queries omitted here; every omission is
    * INTENTIONAL, each pinned by a deterministic ScalaTest spec instead.
    *
    * Not-SQL-derivable but DETERMINISTIC-on-the-gate-data queries carry
    * PINNED expected-value oracles (measured byte-identical across
    * independent runs) — `SELECT * FROM (VALUES ...)` constants
    * regenerable with tools/pin_oracle.py when testdata changes. A pin is
    * a determinism/regression check, NOT independent verification, so the
    * set is kept minimal and tagged in [[oracleProvenance]] (dumped by
    * Verify as oracle_provenance.json): only the two sketch outputs (q70
    * GK percentiles, q77 HLL registers — engine-internal sketch state)
    * remain pinned. All r9 pins besides those were upgraded to full
    * DuckDB replays in r10: the IVF family (q38/q46/q143) over a fixture
    * coarse quantizer, q25's describe stats derived directly in SQL, and
    * q43's sign-LSH including its splitmix64 hyperplane generator —
    * wrapping 64-bit arithmetic replays in HUGEINT mod 2^64, so "needs
    * wrapping multiply" turned out not to be a blocker.
    *
    * Remaining true omissions:
    *   - q26_explain: Spark plan text has no SQL equivalent (and pinning
    *     it would break on every legitimate plan improvement);
    *   - q147_winsorize_approx, q148_robust_scale_approx: 60k-row outputs
    *     of percentile sketches — a pin would be a 60k-row constant whose
    *     stability across task schedules is not guaranteed; their exact
    *     hash-matched siblings are q89/q115 and specs bound sketch error.
    */
  def oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    // The persisted-index queries serve the SAME fixture quantizer and
    // probe config as their inline siblings, so the siblings' independent
    // replays apply VERBATIM — a stored layout that changed the answer
    // would hash-mismatch here (the q150 layout-not-answer contract).
    "q405_ivf_index_persist" -> "q38_ann_ivf",
    "q406_ivfpq_index_persist" -> "q174_ivfpq_adc"
  ).map { case (q, sibling) => q -> oracleSqlBase(sibling) } +
    // the depth-2 tree oracle is GENERATED: 3 nodes x k features of the
    // q246 stump-replay block is mechanical SQL — building it from the
    // same template that names the nodes keeps the replay and the Spark
    // tie-break contract in one place
    ("q407_decision_tree2" -> treeOracle("documents",
      Seq("len" -> "n_chars",
        "ntok" -> ("len(list_filter(string_split_regex(trim(lower(text)), " +
          "'\\s+'), x -> len(x) > 0))")),
      labelSql = "lang = 'en'", nBins = 10)) +
    ("q409_quality_filter_eval" -> treeEvalOracle("documents",
      Seq("len" -> "n_chars",
        "ntok" -> ("len(list_filter(string_split_regex(trim(lower(text)), " +
          "'\\s+'), x -> len(x) > 0))")),
      labelSql = "lang = 'en'",
      trainSql = s"${fnvFoldSql("CAST(doc_id AS VARCHAR)")} % 1024 >= 128",
      nBins = 10)) +
    // Full leak-audit replay: q50's exact pair + recursive-CTE component
    // blocks, the HUGEINT mod-2^64 FNV-1a fold for both split keys (low
    // 10 bits — power-of-two residue, identical signed/unsigned), and the
    // cross-split pair counts under each key.
    ("q408_leak_safe_split" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
         fam AS (SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS family
                 FROM (SELECT doc_id FROM documents) d
                 LEFT JOIN comp c ON c.id = d.doc_id),
         sp AS (SELECT doc_id,
             CASE WHEN list_reduce(
                 list_prepend(CAST('14695981039346656037' AS HUGEINT),
                   list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                     ch -> CAST(unicode(ch) AS HUGEINT))),
                 (acc, c) -> (xor(acc, c) * 1099511628211)
                   % CAST('18446744073709551616' AS HUGEINT)) % 1024 < 128
               THEN 'val' ELSE 'train' END AS s_naive,
             CASE WHEN list_reduce(
                 list_prepend(CAST('14695981039346656037' AS HUGEINT),
                   list_transform(string_split(CAST(family AS VARCHAR), ''),
                     ch -> CAST(unicode(ch) AS HUGEINT))),
                 (acc, c) -> (xor(acc, c) * 1099511628211)
                   % CAST('18446744073709551616' AS HUGEINT)) % 1024 < 128
               THEN 'val' ELSE 'train' END AS s_group
           FROM fam),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN s_naive = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val_naive,
             CAST(SUM(CASE WHEN s_group = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val_group
           FROM sp),
         leak AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COALESCE(SUM(CASE WHEN a.s_naive <> b.s_naive THEN 1 ELSE 0 END), 0) AS BIGINT) AS leak_naive,
             CAST(COALESCE(SUM(CASE WHEN a.s_group <> b.s_group THEN 1 ELSE 0 END), 0) AS BIGINT) AS leak_group
           FROM pairs p JOIN sp a ON a.doc_id = p.id_a JOIN sp b ON b.doc_id = p.id_b)
         SELECT agg.n_docs, leak.n_pairs, agg.n_val_naive, agg.n_val_group,
           leak.leak_naive, leak.leak_group
         FROM agg, leak""")

  /** Generated oracle for [[graft.operators.Validation.decisionTree2]]:
    * the full depth-2 training replay — per (node, feature) the rank-rule
    * decile edges of the NODE SUBSET, value-binned class counts, prefix
    * sums, fraction-cleared integer Gini, and the (wg, feature,
    * threshold) argmin; branch membership is re-derived in SQL from the
    * root argmax via a CASE over the feature columns, so feature
    * SELECTION — not just the winning thresholds — is independently
    * verified. Every bin 0..edges-1 is provably non-empty (each edge is a
    * data value attaining its own bin), so the prefix join covers every
    * candidate in both engines.
    */
  /** The portable FNV-1a fold as DuckDB SQL (HUGEINT mod-2^64, per code
    * point) — replays [[graft.plans.TextExprs.fnv64]] exactly; power-of-two
    * residues of the result equal Spark's pmod on the signed long.
    */
  private def fnvFoldSql(valueSql: String): String =
    s"""list_reduce(
         list_prepend(CAST('14695981039346656037' AS HUGEINT),
           list_transform(string_split($valueSql, ''),
             ch -> CAST(unicode(ch) AS HUGEINT))),
         (acc, c) -> (xor(acc, c) * 1099511628211)
           % CAST('18446744073709551616' AS HUGEINT))"""

  private def treeOracle(table: String, feats: Seq[(String, String)],
      labelSql: String, nBins: Int): String = {
    val g = new TreeOracleGen(feats, nBins)
    val featSelects = feats.map { case (n, e) => s"$e AS f_$n" }.mkString(", ")
    def nodeRow(node: String): String =
      s"""SELECT '$node' AS node, b.feature, b.threshold, s.n, s.n_pos,
            s.gini_ppm, b.wg AS weighted_gini_ppm,
            s.gini_ppm - b.wg AS reduction_ppm, b.acc AS acc_ppm,
            b.nl AS n_left, b.lp AS pos_left
          FROM best_$node AS b, stat_$node AS s"""
    s"""WITH base_root AS (${g.cleanBase(featSelects, labelSql, table)}),
      ${g.nodeSql("root")},
      base_left AS (SELECT b.* FROM base_root AS b, best_root
        WHERE (${g.featCase("best_root", "b")}) <= best_root.threshold),
      base_right AS (SELECT b.* FROM base_root AS b, best_root
        WHERE (${g.featCase("best_root", "b")}) > best_root.threshold),
      ${g.nodeSql("left")},
      ${g.nodeSql("right")}
      SELECT * FROM (${nodeRow("root")} UNION ALL ${nodeRow("left")}
        UNION ALL ${nodeRow("right")}) AS t
      ORDER BY node"""
  }

  /** [[treeOracle]]'s held-out sibling ([[graft.operators.Validation
    * .decisionTree2Eval]]): train CTEs over the `trainSql` partition,
    * then replay the leaf predictions (each side's strict majority, ties
    * negative; missing branches LEFT-JOIN to NULL and fall back to the
    * root side's majority) over the validation partition into one
    * confusion row.
    */
  private def treeEvalOracle(table: String, feats: Seq[(String, String)],
      labelSql: String, trainSql: String, nBins: Int): String = {
    val g = new TreeOracleGen(feats, nBins)
    val featSelects = feats.map { case (n, e) => s"$e AS f_$n" }.mkString(", ")
    def majority(b: String, left: Boolean): String =
      if (left) s"(CASE WHEN $b.lp > $b.ln THEN 1 ELSE 0 END)"
      else s"(CASE WHEN $b.rp > $b.rn THEN 1 ELSE 0 END)"
    def branchPred(b: String, rootSide: Boolean): String =
      s"""CASE WHEN $b.feature IS NULL THEN ${majority("br", rootSide)}
            WHEN (${g.featCase(b, "vv")}) <= $b.threshold
              THEN ${majority(b, left = true)}
            ELSE ${majority(b, left = false)} END"""
    s"""WITH base_all AS (${g.cleanBase(featSelects, labelSql, table,
          extraCols = s", ($trainSql) AS is_train")}),
      base_root AS (SELECT * FROM base_all WHERE is_train),
      ${g.nodeSql("root")},
      base_left AS (SELECT b.* FROM base_root AS b, best_root
        WHERE (${g.featCase("best_root", "b")}) <= best_root.threshold),
      base_right AS (SELECT b.* FROM base_root AS b, best_root
        WHERE (${g.featCase("best_root", "b")}) > best_root.threshold),
      ${g.nodeSql("left")},
      ${g.nodeSql("right")},
      vv AS (SELECT * FROM base_all WHERE NOT is_train),
      pv AS (SELECT vv.p,
          CASE WHEN br.feature IS NULL
            THEN (CASE WHEN tt.tp * 2 > tt.n THEN 1 ELSE 0 END)
          WHEN (${g.featCase("br", "vv")}) <= br.threshold
            THEN ${branchPred("bl", rootSide = true)}
            ELSE ${branchPred("bb", rootSide = false)} END AS yhat
        FROM vv CROSS JOIN tt_root AS tt
        LEFT JOIN best_root AS br ON TRUE
        LEFT JOIN best_left AS bl ON TRUE
        LEFT JOIN best_right AS bb ON TRUE),
      conf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_val,
          CAST(COALESCE(SUM(p * yhat), 0) AS BIGINT) AS tp,
          CAST(COALESCE(SUM((1 - p) * yhat), 0) AS BIGINT) AS fp,
          CAST(COALESCE(SUM(p * (1 - yhat)), 0) AS BIGINT) AS fn,
          CAST(COALESCE(SUM((1 - p) * (1 - yhat)), 0) AS BIGINT) AS tn
        FROM pv)
      SELECT (SELECT n FROM tt_root) AS n_train, conf.n_val, conf.tp,
        conf.fp, conf.fn, conf.tn,
        CASE WHEN conf.n_val = 0 THEN 0
          ELSE ((conf.tp + conf.tn) * 1000000) // conf.n_val END AS acc_ppm
      FROM conf"""
  }

  /** The shared per-node CTE blocks of [[treeOracle]] / [[treeEvalOracle]]
    * — one stump-replay block per (node, feature), the cross-feature
    * (wg, feature, threshold) argmin, and the node stats.
    */
  private final class TreeOracleGen(feats: Seq[(String, String)], nBins: Int) {
    def featCase(best: String, rowAlias: String): String =
      feats.map { case (n, _) =>
        s"WHEN $best.feature = '$n' THEN $rowAlias.f_$n"
      }.mkString("CASE ", " ", " END")
    /** The base projection with decisionTree2's na.drop() policy
      * mirrored: the label CASE yields NULL (not 0) on a NULL label, and
      * rows with a NULL feature or label are filtered — Spark and SQL
      * train on the same row set even if a regenerated fixture
      * introduces nulls.
      */
    def cleanBase(featSelects: String, labelSql: String, table: String,
        extraCols: String = ""): String = {
      val notNull = (feats.map { case (n, _) => s"f_$n IS NOT NULL" } :+
        "p IS NOT NULL").mkString(" AND ")
      s"""SELECT * FROM (SELECT $featSelects,
            CASE WHEN $labelSql THEN 1 WHEN NOT ($labelSql) THEN 0 END AS p$extraCols
          FROM $table) AS raw WHERE $notNull"""
    }
    private def block(node: String, f: String): String = s"""
      nn_${node}_$f AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base_$node),
      rk_${node}_$f AS (SELECT f_$f AS v,
          ((CAST(ROW_NUMBER() OVER (ORDER BY f_$f) AS BIGINT) - 1) * $nBins)
            // nn.nn AS bin
        FROM base_$node, nn_${node}_$f AS nn),
      ed0_${node}_$f AS (SELECT bin, MAX(v) AS e FROM rk_${node}_$f
        WHERE bin < ${nBins - 1} GROUP BY bin),
      ed_${node}_$f AS (SELECT e, ROW_NUMBER() OVER (ORDER BY e) - 1 AS i
        FROM (SELECT DISTINCT e FROM ed0_${node}_$f)),
      bb_${node}_$f AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT)
          FROM ed_${node}_$f ed WHERE b.f_$f > ed.e) AS bin, p
        FROM base_$node b),
      pb_${node}_$f AS (SELECT bin, CAST(SUM(p) AS BIGINT) AS bp,
          CAST(SUM(1 - p) AS BIGINT) AS bn
        FROM bb_${node}_$f GROUP BY bin),
      pre_${node}_$f AS (SELECT bin,
          CAST(SUM(bp) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lp,
          CAST(SUM(bn) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ln
        FROM pb_${node}_$f),
      cand_${node}_$f AS (SELECT '$f' AS feature, ed.e AS threshold,
          pre.lp, pre.ln
        FROM pre_${node}_$f pre JOIN ed_${node}_$f ed ON ed.i = pre.bin)"""
    def nodeSql(node: String): String = {
      val blocks = feats.map(f => block(node, f._1)).mkString(",")
      val unioned = feats.map(f => s"SELECT * FROM cand_${node}_${f._1}")
        .mkString(" UNION ALL ")
      s"""
      tt_$node AS (SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS tp,
          CAST(COUNT(*) - COALESCE(SUM(p), 0) AS BIGINT) AS tn,
          CAST(COUNT(*) AS BIGINT) AS n FROM base_$node),
      $blocks,
      sc_$node AS (SELECT feature, threshold, lp, ln,
          tt.tp - lp AS rp, tt.tn - ln AS rn,
          lp + ln AS nl, tt.n - lp - ln AS nr, tt.n AS n
        FROM ($unioned) AS u, tt_$node AS tt),
      w_$node AS (SELECT feature, threshold, lp, ln, rp, rn, nl,
          CAST((CAST(nl AS HUGEINT) *
              (CASE WHEN nl = 0 THEN 0 ELSE 1000000 -
                CAST(((CAST(lp AS HUGEINT) * lp + CAST(ln AS HUGEINT) * ln)
                  * 1000000) // (CAST(nl AS HUGEINT) * nl) AS BIGINT) END)
            + CAST(nr AS HUGEINT) *
              (CASE WHEN nr = 0 THEN 0 ELSE 1000000 -
                CAST(((CAST(rp AS HUGEINT) * rp + CAST(rn AS HUGEINT) * rn)
                  * 1000000) // (CAST(nr AS HUGEINT) * nr) AS BIGINT) END))
            // n AS BIGINT) AS wg,
          ((GREATEST(lp, ln) + GREATEST(rp, rn)) * 1000000) // n AS acc
        FROM sc_$node),
      best_$node AS (SELECT * FROM w_$node
        ORDER BY wg, feature, threshold LIMIT 1),
      stat_$node AS (SELECT n, tp AS n_pos,
          1000000 - CAST(((CAST(tp AS HUGEINT) * tp + CAST(tn AS HUGEINT) * tn)
            * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_ppm
        FROM tt_$node)"""
    }
  }

  private lazy val oracleSqlBase: Map[String, String] = Map(
    // Full IVF replay (r10, replacing the r9 pin): fixture coarse quantizer
    // (first-16 vectors as cells) -> corpus cell assignment (argmax cosine,
    // tie to lower cell), query probe selection (top-4 cells), probe join,
    // exact cosine, top-5 — every stage re-derived by DuckDB from the raw
    // parquet, nothing quoted from the implementation.
    "q38_ann_ivf" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         cent AS (SELECT id AS cell, v AS cv FROM e WHERE id < 16),
         ca AS (SELECT id, cell FROM (
             SELECT e.id, cent.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent) WHERE rn = 1),
         qp AS (SELECT id AS q_id, cell FROM (
             SELECT e.id, cent.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent WHERE e.id < 10) WHERE rn <= 4),
         s AS (SELECT qp.q_id, ca.id AS c_id,
                 list_cosine_similarity(qv.v, cv.v) AS score
               FROM qp JOIN ca USING (cell)
               JOIN e qv ON qv.id = qp.q_id
               JOIN e cv ON cv.id = ca.id
               WHERE ca.id <> qp.q_id),
         r AS (SELECT q_id, c_id, score,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
               FROM s)
         SELECT q_id AS query_id, c_id AS neighbor_id,
                round(score, 6) AS cosine, rnk AS rank
         FROM r WHERE rnk <= 5 ORDER BY query_id, rank""",

    // Describe stats derived directly in SQL (r10, replacing the r9 pin):
    // counts as longs, numeric stats printed through DECIMAL(38,6) (the
    // engine-independent fixed-point print describeDf uses), median =
    // quantile_cont == Spark's exact interpolated percentile (q61-pinned
    // equivalence).
    "q25_describe" ->
      """SELECT 'count' AS "describe",
           CAST(COUNT(l_quantity) AS VARCHAR) AS l_quantity,
           CAST(COUNT(l_extendedprice) AS VARCHAR) AS l_extendedprice,
           CAST(COUNT(l_returnflag) AS VARCHAR) AS l_returnflag
         FROM lineitem
         UNION ALL
         SELECT 'null_count',
           CAST(COUNT(*) - COUNT(l_quantity) AS VARCHAR),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS VARCHAR),
           CAST(COUNT(*) - COUNT(l_returnflag) AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'mean',
           CAST(CAST(AVG(l_quantity) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(CAST(AVG(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(NULL AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'std',
           CAST(CAST(STDDEV_SAMP(l_quantity) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(CAST(STDDEV_SAMP(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(NULL AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'min',
           CAST(CAST(MIN(l_quantity) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(CAST(MIN(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
           MIN(l_returnflag)
         FROM lineitem
         UNION ALL
         SELECT 'max',
           CAST(CAST(MAX(l_quantity) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(CAST(MAX(l_extendedprice) AS DECIMAL(38,6)) AS VARCHAR),
           MAX(l_returnflag)
         FROM lineitem
         UNION ALL
         SELECT 'median',
           CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(NULL AS VARCHAR)
         FROM lineitem""",

    // The interchange must be exactly the identity — the oracle is the
    // plain projection.
    "q404_arrow_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, text
         FROM documents ORDER BY doc_id""",

    // Full card replay: per-column profile stats (the q25 discipline —
    // counts as strings, raw min/max), the clamped-bucket histogram rule,
    // and the (count desc, term asc) top-k over the shared token
    // tokenization.
    "q403_dataset_card" ->
      """WITH d AS (SELECT doc_id, lang, source, n_chars, text FROM documents)
         SELECT * FROM (
         SELECT 'profile' AS section, 'doc_id' AS key, 'n_rows' AS metric, CAST(COUNT(*) AS VARCHAR) AS value_str FROM d
         UNION ALL SELECT 'profile', 'doc_id', 'n_nulls', CAST(COUNT(*) - COUNT(doc_id) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'doc_id', 'n_distinct', CAST(COUNT(DISTINCT doc_id) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'doc_id', 'min', CAST(MIN(doc_id) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'doc_id', 'max', CAST(MAX(doc_id) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'lang', 'n_rows', CAST(COUNT(*) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'lang', 'n_nulls', CAST(COUNT(*) - COUNT(lang) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'lang', 'n_distinct', CAST(COUNT(DISTINCT lang) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'lang', 'min', MIN(lang) FROM d
         UNION ALL SELECT 'profile', 'lang', 'max', MAX(lang) FROM d
         UNION ALL SELECT 'profile', 'source', 'n_rows', CAST(COUNT(*) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'source', 'n_nulls', CAST(COUNT(*) - COUNT(source) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'source', 'n_distinct', CAST(COUNT(DISTINCT source) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'source', 'min', MIN(source) FROM d
         UNION ALL SELECT 'profile', 'source', 'max', MAX(source) FROM d
         UNION ALL SELECT 'profile', 'n_chars', 'n_rows', CAST(COUNT(*) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'n_chars', 'n_nulls', CAST(COUNT(*) - COUNT(n_chars) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'n_chars', 'n_distinct', CAST(COUNT(DISTINCT n_chars) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'n_chars', 'min', CAST(MIN(n_chars) AS VARCHAR) FROM d
         UNION ALL SELECT 'profile', 'n_chars', 'max', CAST(MAX(n_chars) AS VARCHAR) FROM d
         UNION ALL
         SELECT 'histogram', CAST(b AS VARCHAR), 'count', CAST(COUNT(*) AS VARCHAR)
         FROM (SELECT CAST(LEAST(GREATEST(FLOOR(CAST(n_chars AS DOUBLE) / 250.0), 0), 7) AS BIGINT) AS b FROM d)
         GROUP BY b
         UNION ALL
         SELECT 'top_terms', term, 'count', CAST(n AS VARCHAR) FROM (
           SELECT term, COUNT(*) AS n FROM (
             SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0)) AS term FROM d)
           GROUP BY term ORDER BY n DESC, term LIMIT 10)
         ) ORDER BY section, key, metric""",

    // Full sign-LSH replay (r10, replacing the r9 pin): the splitmix64
    // hyperplane generator IS portable SQL after all — wrapping 64-bit
    // arithmetic runs in HUGEINT mod 2^64 (the 64x64-bit multiply split
    // into 32-bit halves so no intermediate exceeds 2^97; logical shifts
    // are floor-divisions on the non-negative representative; the final
    // signed reinterpretation routes through BIGINT because DuckDB's
    // HUGEINT->DOUBLE cast double-rounds). Bit-exact vs the Scala
    // coefficients (4608/4608 measured equal); everything downstream —
    // per-(table, plane) dots in Scala's summation order, sign buckets,
    // band equi-join, exact-cosine verify — is the q174-style replay.
    "q43_emb_lsh" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         grid AS (SELECT t.t, p.p, d.d
           FROM (SELECT unnest(range(6)) AS t) t,
                (SELECT unnest(range(12)) AS p) p,
                (SELECT unnest(range(64)) AS d) d),
         c AS (SELECT t, p, d,
           CAST(11400714819323198485 AS HUGEINT) AS C1,
           CAST(13787848793156543929 AS HUGEINT) AS C2,
           CAST(10723151780598845931 AS HUGEINT) AS C3,
           CAST(18446744073709551616 AS HUGEINT) AS M
           FROM grid),
         z0 AS (SELECT *, (t*C1 + p*C2 + d*C3) % M AS z FROM c),
         x1 AS (SELECT *, xor(z, z // 1073741824) AS x FROM z0),
         z1 AS (SELECT *, ((x % 4294967296) * C2 +
             ((x // 4294967296) * (C2 % 4294967296)) % 4294967296 * 4294967296) % M AS z2
           FROM x1),
         x2 AS (SELECT *, xor(z2, z2 // 134217728) AS y FROM z1),
         z2b AS (SELECT *, ((y % 4294967296) * C3 +
             ((y // 4294967296) * (C3 % 4294967296)) % 4294967296 * 4294967296) % M AS z3
           FROM x2),
         fin AS (SELECT t, p, d, xor(z3, z3 // 2147483648) AS zf FROM z2b),
         co AS (SELECT t, p, d,
           CAST(CAST(CASE WHEN zf >= CAST(9223372036854775808 AS HUGEINT)
                          THEN zf - CAST(18446744073709551616 AS HUGEINT)
                          ELSE zf END AS BIGINT) AS DOUBLE)
             / 9223372036854775807.0 AS coeff
           FROM fin),
         pl AS (SELECT t, p, list(coeff ORDER BY d) AS w FROM co GROUP BY t, p),
         dots AS (SELECT e.id, pl.t, pl.p,
             list_sum(list_transform(range(1, 65), i -> e.v[i] * pl.w[i])) AS dot
           FROM e CROSS JOIN pl),
         bkt AS (SELECT id, t,
             CAST(SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
               AS BIGINT) AS bucket
           FROM dots GROUP BY id, t),
         cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                  FROM bkt a JOIN bkt b
                  ON a.t = b.t AND a.bucket = b.bucket AND a.id < b.id),
         outp AS (SELECT c.id_a, c.id_b, list_cosine_similarity(ea.v, eb.v) AS cos
                  FROM cand c JOIN e ea ON ea.id = c.id_a
                  JOIN e eb ON eb.id = c.id_b)
         SELECT id_a, id_b, round(cos, 6) AS cosine
         FROM outp WHERE cos >= 0.35 ORDER BY id_a, id_b""",

    "q01_select" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS disc_price
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
         CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem WHERE l_quantity < 5 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",

    "q03_with_column" ->
      """SELECT o_orderkey AS order_id, o_totalprice / 100000.0 AS price_ratio
         FROM orders ORDER BY order_id""",

    "q04_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q05_agg_global" ->
      """SELECT COUNT(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         COUNT(DISTINCT l_orderkey) AS n_orders
         FROM lineitem""",

    "q06_window" ->
      """SELECT l_orderkey, l_linenumber, w0, w1, w2 FROM (
           SELECT l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS w0,
             rank()       OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS w1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey) AS DOUBLE) AS w2
           FROM lineitem)
         WHERE w0 <= 2 ORDER BY l_orderkey, w0""",

    "q07_sort_nulls" ->
      """SELECT event_id, CASE WHEN value < 1 THEN NULL ELSE value END AS v
         FROM events ORDER BY v ASC NULLS LAST, event_id LIMIT 100""",

    "q08_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 10 OFFSET 100""",

    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",

    "q10_distinct_on" ->
      """SELECT * FROM (
           SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
           FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey)
         ORDER BY o_custkey""",

    "q11_join_names" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_retailprice
         FROM lineitem JOIN part ON l_partkey = p_partkey AND p_retailprice > 990.0
         ORDER BY l_orderkey, l_linenumber""",

    "q12_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS LAST""",

    "q13_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         ORDER BY o_orderkey""",

    "q14_join_anti" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         ORDER BY o_orderkey""",

    "q15_join_theta" ->
      """SELECT s_suppkey, s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey AND s_acctbal > 2000.0
         ORDER BY s_suppkey""",

    "q16_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",

    "q17_union_all" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
         UNION ALL
         SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000.0
         ORDER BY o_orderkey, o_totalprice""",

    "q18_union_distinct" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000.0
         UNION
         SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000.0
         ORDER BY o_orderkey, o_totalprice""",

    "q19_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""",

    "q20_except" ->
      """SELECT c_custkey AS ck FROM customer
         EXCEPT SELECT o_custkey AS ck FROM orders
                WHERE CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
         ORDER BY ck""",

    // DuckDB has native ASOF JOIN (largest right ts <= left ts, inner) —
    // the oracle for the union+window formulation. Both sides compare at
    // microsecond precision (CAST truncates ns, matching Spark's div 1000).
    "q56_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click')
         SELECT p.event_id AS purchase_id, p.user_id AS user_id,
                c.event_id AS click_id,
                epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY purchase_id""",

    "q53_histogram" ->
      """WITH b AS (
           SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 5205.0), 0.0), 19.0) AS BIGINT) AS bucket
           FROM lineitem)
         SELECT bucket, round(900.0 + bucket * 5205.0, 6) AS bucket_lo, COUNT(*) AS n
         FROM b GROUP BY bucket ORDER BY bucket""",

    "q54_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE CAST(((doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296 AS DOUBLE)
               < (CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.1 END) * 4294967296.0
         ORDER BY doc_id""",

    // The salted join must equal the plain join — the oracle is unsalted.
    "q47_salted_join" ->
      """SELECT l_orderkey, l_linenumber, o_totalprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         ORDER BY l_orderkey, l_linenumber""",

    "q21_case" ->
      """SELECT o_orderkey,
         CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open' END AS status_word,
         CASE WHEN o_totalprice > 300000.0 THEN 'big'
              WHEN o_totalprice > 100000.0 THEN 'mid'
              ELSE 'small' END AS size_bucket
         FROM orders ORDER BY o_orderkey""",

    "q22_like" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_name ILIKE '%RED%' AND p_name NOT LIKE '%bolt%'
         ORDER BY p_partkey""",

    "q23_arith" ->
      """SELECT l_orderkey, l_linenumber,
         l_quantity + l_tax + l_discount AS s3,
         l_extendedprice - l_tax - l_discount AS d3,
         l_quantity * l_extendedprice AS m2,
         l_extendedprice / l_quantity / 2.0 AS v3
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q24_udf" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 + l_tax) * (1 - l_discount) AS charge
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q27_text_stats" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n
           FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
           END AS mean_tok_len,
           CAST(n AS BIGINT) AS n_chars_calc
         FROM t ORDER BY doc_id""",

    "q28_lang_quality" ->
      """WITH t AS (
           SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n,
             len(text) - len(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
           FROM documents),
         h AS (
           SELECT doc_id, lang, toks, n, cjk,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','it','was','with','for'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['el','la','los','las','que','es','por','con','una','del'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['le','les','des','une','est','dans','pour','qui','sur','avec'], x))) AS h_fr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END AS mtl,
             CASE WHEN n = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / n END AS pr
           FROM t)
         SELECT doc_id, lang,
           CASE WHEN cjk * 4 > n THEN 'zh'
                WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           round(((CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
                  (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) +
                  (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
         FROM h ORDER BY doc_id""",

    "q44_stopword_ratio" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents)
         SELECT doc_id, lang,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE CAST(len(list_filter(toks, x -> list_contains(
                       ['the','and','of','to','is','that','it','was','with','for'], x))) AS DOUBLE)
                     / len(toks) END AS sw_ratio
         FROM t ORDER BY doc_id""",

    // Same URL-then-email replacement order, RE2/Java-agnostic patterns;
    // the full redacted text is hash-compared, not just counts.
    "q55_redact" ->
      """WITH r AS (
           SELECT doc_id, text,
             regexp_replace(regexp_replace(text, 'https?://[^ \t\n\x0B\f\r]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS clean_text
           FROM documents)
         SELECT doc_id, clean_text,
           CAST(len(text) - len(clean_text) AS BIGINT) AS removed_chars
         FROM r ORDER BY doc_id""",

    // Repetition signals recomputed exactly: same non-blank-line filter,
    // same code-point window count, identical double-division op order.
    "q52_repetition" ->
      """WITH t AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\n'), x -> len(trim(x)) > 0) AS lines
           FROM documents)
         SELECT doc_id,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
           END AS dup_line_ratio,
           CASE WHEN greatest(len(text) - 4, 0) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(list_transform(
                       range(1, greatest(len(text) - 4, 0) + 1),
                       i -> text[i:i+4]))) AS DOUBLE) / greatest(len(text) - 4, 0)
           END AS rep_5gram_ratio
         FROM t ORDER BY doc_id""",

    // BPE-ish subword count re-derived from the split-regex semantics:
    // a maximal letter run of length L yields ceil(L/4) pieces (the \G.{4}
    // boundary), any maximal non-letter non-space run yields 1 piece
    // (boundaries exist only at letter<->other transitions).
    "q48_bpeish_tokens" ->
      """SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(
             regexp_extract_all(text, '[\p{L}]+|[^\p{L}\s]+'),
             r -> CASE WHEN regexp_matches(r[1:1], '[\p{L}]')
                  THEN CAST(ceil(len(r)/4.0) AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END)), 0) AS BIGINT) AS n_bpeish
         FROM documents ORDER BY doc_id""",

    // Exact replay of the portable fingerprint: FNV-1a per token over code
    // points (HUGEINT fold mod 2^64), then rotl(acc,5)^h over tokens in
    // order (rotl = acc*32 mod 2^64 + acc >> 59 — disjoint bits, so + = |),
    // finally two's-complement narrowing to BIGINT.
    "q29_fingerprint" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         hs AS (
           SELECT doc_id, list_transform(ts, tok ->
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))) AS hlist
           FROM toks),
         fp AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT), hlist),
               (acc, h) -> xor((acc * 32) % CAST('18446744073709551616' AS HUGEINT)
                               + acc // CAST('576460752303423488' AS HUGEINT), h)) AS u
           FROM hs)
         SELECT doc_id,
           CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                     THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS fp
         FROM fp ORDER BY doc_id""",

    "q30_char_ngrams" ->
      """SELECT doc_id,
         CAST(len(list_distinct(list_transform(
           range(1, greatest(len(text) - 4, 0) + 1),
           i -> text[i:i+4]))) AS BIGINT) AS n_5grams
         FROM documents ORDER BY doc_id""",

    "q31_dedup_exact" ->
      """SELECT doc_id, source, lang FROM (
           SELECT doc_id, source, lang,
             row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",

    "q32_dup_map" ->
      """WITH k AS (SELECT source || '|' || lang AS k, doc_id FROM documents),
         s AS (SELECT k, MIN(doc_id) AS survivor_id FROM k GROUP BY k)
         SELECT survivor_id, doc_id AS dup_id
         FROM k JOIN s USING (k) WHERE doc_id <> survivor_id
         ORDER BY survivor_id, dup_id""",

    // NOTE: q33's hash-match against this EXACT-Jaccard oracle is
    // probabilistic by construction: LSH (k=128, b=32) misses a
    // >=0.8-Jaccard pair with P ~= 5e-9 (plus xxhash64 shingle-collision
    // risk). Deterministic and verified on this testdata; q34 runs the same
    // oracle over the exact inverted-index operator as the ground truth.
    "q33_minhash_lsh" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh)
         SELECT id_a, id_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
         ORDER BY id_a, id_b""",

    // Exact replay of the portable simhash: FNV-1a per token (same fold as
    // q29), per-bit +1/-1 votes across tokens WITH multiplicity, sign
    // vector -> 64-bit fingerprint; then brute-force all pairs at hamming
    // <= 3. The Spark side's 4x16-bit pigeonhole candidate generation is
    // exact for hamming <= 3, so the answer sets must match exactly.
    "q35_simhash" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         hs AS (
           SELECT doc_id, list_transform(ts, tok ->
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))) AS hlist
           FROM toks),
         tok AS (SELECT doc_id, unnest(hlist) AS h FROM hs),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN (h // (CAST(1 AS HUGEINT) << r.b)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
           FROM tok CROSS JOIN range(64) r(b)
           GROUP BY doc_id, r.b),
         fpu AS (
           SELECT doc_id,
             COALESCE(SUM(CASE WHEN vote > 0 THEN CAST(1 AS HUGEINT) << b ELSE 0 END), 0) AS u
           FROM bits GROUP BY doc_id),
         fp AS (
           SELECT d.doc_id,
             CAST(CASE WHEN COALESCE(f.u, 0) >= CAST('9223372036854775808' AS HUGEINT)
                       THEN COALESCE(f.u, 0) - CAST('18446744073709551616' AS HUGEINT)
                       ELSE COALESCE(f.u, 0) END AS BIGINT) AS s
           FROM documents d LEFT JOIN fpu f ON d.doc_id = f.doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.s, b.s)) <= 3
         ORDER BY id_a, id_b""",

    "q34_ngram_jaccard" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh)
         SELECT id_a, id_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
         ORDER BY id_a, id_b""",

    // Components via recursive CTE: reach(id, r) = ids reachable from id
    // over the (undirected) pair edges; component = min reachable.
    // q193 runs the identical pair graph through the DISTRIBUTED
    // components tier — same fixed point, same oracle as q50
    "q193_components_distributed" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
         SELECT id, MIN(r) AS component_id FROM reach GROUP BY id ORDER BY id""",

    "q50_neardup_components" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
         SELECT id, MIN(r) AS component_id FROM reach GROUP BY id ORDER BY id""",

    // The full pipeline, stage by stage: q28's scoring -> gate -> exact
    // dedup (min id per identical text) -> q34's pair generation on the
    // survivors -> recursive components -> drop non-representatives.
    "q51_clean_corpus" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n,
             len(text) - len(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
           FROM documents),
         h AS (
           SELECT doc_id, text, toks, n, cjk,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','it','was','with','for'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['el','la','los','las','que','es','por','con','una','del'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['le','les','des','une','est','dans','pour','qui','sur','avec'], x))) AS h_fr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END AS mtl,
             CASE WHEN n = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / n END AS pr
           FROM t),
         scored AS (
           SELECT doc_id AS id, text, toks,
             CASE WHEN cjk * 4 > n THEN 'zh'
                  WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_es >= h_fr THEN 'es'
                  ELSE 'fr' END AS lang_pred,
             round(((CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
                    (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) +
                    (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
           FROM h),
         gated AS (SELECT * FROM scored WHERE quality >= 0.66 AND lang_pred <> 'und'),
         ex AS (SELECT text, MIN(id) AS id FROM gated GROUP BY text),
         ded AS (SELECT g.id, g.toks, g.lang_pred, g.quality
                 FROM gated g JOIN ex ON g.id = ex.id),
         sh AS (
           SELECT id, list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM ded),
         inv AS (SELECT id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
           GROUP BY 1, 2),
         sizes AS (SELECT id, len(s) AS sn FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.sn + sb.sn - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id),
         losers AS (SELECT id FROM comp WHERE id <> c)
         SELECT d.id, d.lang_pred, d.quality
         FROM ded d LEFT JOIN losers l ON d.id = l.id
         WHERE l.id IS NULL ORDER BY d.id""",

    // The LSH composition is exact-Jaccard-verified (P[miss] ~ 5e-9 at
    // k=128/b=32), so it replays q51's exact-pair oracle verbatim.
    "q144_clean_corpus_lsh" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n,
             len(text) - len(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
           FROM documents),
         h AS (
           SELECT doc_id, text, toks, n, cjk,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','it','was','with','for'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['el','la','los','las','que','es','por','con','una','del'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['le','les','des','une','est','dans','pour','qui','sur','avec'], x))) AS h_fr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END AS mtl,
             CASE WHEN n = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / n END AS pr
           FROM t),
         scored AS (
           SELECT doc_id AS id, text, toks,
             CASE WHEN cjk * 4 > n THEN 'zh'
                  WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_es >= h_fr THEN 'es'
                  ELSE 'fr' END AS lang_pred,
             round(((CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
                    (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) +
                    (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
           FROM h),
         gated AS (SELECT * FROM scored WHERE quality >= 0.66 AND lang_pred <> 'und'),
         ex AS (SELECT text, MIN(id) AS id FROM gated GROUP BY text),
         ded AS (SELECT g.id, g.toks, g.lang_pred, g.quality
                 FROM gated g JOIN ex ON g.id = ex.id),
         sh AS (
           SELECT id, list_distinct(list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM ded),
         inv AS (SELECT id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
           GROUP BY 1, 2),
         sizes AS (SELECT id, len(s) AS sn FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.id = id_a
           JOIN sizes sb ON sb.id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.sn + sb.sn - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id),
         losers AS (SELECT id FROM comp WHERE id <> c)
         SELECT d.id, d.lang_pred, d.quality
         FROM ded d LEFT JOIN losers l ON d.id = l.id
         WHERE l.id IS NULL ORDER BY d.id""",

    // Replays the codec round trip as integer arithmetic: PNG is lossless,
    // so decode(synth(seed,w,h)) reports the formula's pixel sums, and the
    // 8x8 NN resample reads src pixel (x*w//8, y*h//8).
    "q145_image_decode" ->
      """WITH d AS (
           SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
         px AS (
           SELECT doc_id,
             CAST(list_sum(flatten(list_transform(range(0, h), y ->
               list_transform(range(0, w), x ->
                 (doc_id*31 + x*7 + y*13) % 256)))) AS BIGINT) AS pix_sum
           FROM d),
         rx AS (
           SELECT doc_id,
             CAST(list_sum(flatten(list_transform(range(0, 8), y ->
               list_transform(range(0, 8), x ->
                 (doc_id*31 + ((x*w)//8)*7 + ((y*h)//8)*13) % 256)))) AS BIGINT) AS r_pix_sum
           FROM d)
         SELECT d.doc_id AS id,
           CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS channels,
           px.pix_sum,
           round(CAST(px.pix_sum AS DOUBLE) / (d.w * d.h), 6) AS mean_px,
           rx.r_pix_sum,
           round(CAST(rx.r_pix_sum AS DOUBLE) / 64.0, 6) AS r_mean_px
         FROM d JOIN px USING (doc_id) JOIN rx USING (doc_id)
         ORDER BY id""",

    // PCM WAV is lossless: decode(synth(seed,n)) reports the sample
    // formula's exact sums.
    "q146_audio_decode" ->
      """WITH d AS (SELECT doc_id, 64 + doc_id % 41 AS n FROM documents),
         s AS (
           SELECT doc_id, n,
             CAST(list_sum(list_transform(range(0, n), i ->
               (doc_id*31 + i*7) % 65536 - 32768)) AS BIGINT) AS sample_sum,
             CAST(list_sum(list_transform(range(0, n), i ->
               abs((doc_id*31 + i*7) % 65536 - 32768))) AS BIGINT) AS abs_sum
           FROM d)
         SELECT doc_id AS id, CAST(n AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
           sample_sum, abs_sum,
           round(CAST(abs_sum AS DOUBLE) / n, 6) AS mean_abs
         FROM s ORDER BY id""",

    // GIF LZW is lossless on the indexed raster: demux+decode of frame f
    // reports the synth formula's pixel sums; sampling keeps even frames.
    "q149_video_frames" ->
      """WITH d AS (
           SELECT doc_id, 6 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
                  3 + doc_id % 4 AS nf
           FROM documents),
         fr AS (
           SELECT doc_id, w, h,
                  unnest(list_filter(range(0, nf), f -> f % 2 = 0)) AS f
           FROM d),
         px AS (
           SELECT doc_id, w, h, f,
             CAST(list_sum(flatten(list_transform(range(0, h), y ->
               list_transform(range(0, w), x ->
                 (doc_id*31 + f*17 + x*7 + y*13) % 256)))) AS BIGINT) AS pix_sum
           FROM fr)
         SELECT doc_id AS id, CAST(f AS BIGINT) AS frame_idx,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           pix_sum,
           round(CAST(pix_sum AS DOUBLE) / (w * h), 6) AS mean_px
         FROM px ORDER BY id, frame_idx""",

    // The bucketed layout changes the plan, not the answer: the oracle is
    // the plain join+agg over the original tables.
    "q150_bucketed_join" ->
      """SELECT o.o_orderkey, o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
         FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2 ORDER BY o.o_orderkey""",

    // Same: partition pruning is I/O elision, the answer must equal the
    // unpartitioned filter+agg.
    "q151_partition_pruned_scan" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_click,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'click'
         GROUP BY 1 ORDER BY user_id""",

    // top-k replayed by row_number (score DESC, id ASC — TopKAgg's order);
    // corr replays q78's decimal co-moment formula per group.
    "q152_udaf_sql" ->
      """WITH r AS (
           SELECT l_returnflag, l_orderkey, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey) AS rnk
           FROM lineitem),
         m AS (
           SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS sy,
             SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS sxy,
             SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS sxx,
             SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS syy
           FROM lineitem GROUP BY l_returnflag),
         d AS (
           SELECT l_returnflag,
             CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
             CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
             CAST(syy AS DOUBLE) AS syy
           FROM m),
         c AS (
           SELECT l_returnflag,
             round(CASE WHEN nd * sxx - sx * sx > 0 AND nd * syy - sy * sy > 0
               THEN (nd * sxy - sx * sy)
                 / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
               END, 6) AS corr
           FROM d)
         SELECT r.l_returnflag, CAST(rnk AS BIGINT) AS rank,
           r.l_orderkey AS top_orderkey, r.l_extendedprice AS top_price,
           c.corr
         FROM r JOIN c USING (l_returnflag)
         WHERE rnk <= 3 ORDER BY l_returnflag, rank""",

    // The storage format changes the bytes, not the rows: both round-trip
    // columns must equal the parquet original verbatim.
    "q153_source_roundtrip" ->
      """SELECT doc_id, text AS text_orc, text AS text_json,
           lang AS lang_json
         FROM documents ORDER BY doc_id""",

    // DPP is I/O elision at runtime; the answer equals the plain
    // dim-filtered join.
    "q154_dynamic_partition_pruning" ->
      """WITH dim(event_type, category) AS (VALUES
           ('click', 'engagement'), ('view', 'engagement'),
           ('purchase', 'commerce'), ('signup', 'account'), ('error', 'ops'))
         SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events e JOIN dim d USING (event_type)
         WHERE d.category = 'engagement'
         GROUP BY 1 ORDER BY e.event_type""",

    // The exactly-once streamed layout must carry exactly the source rows.
    "q155_streaming_partitioned_ingest" ->
      """SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY event_type""",

    // Scalar-subquery HAVING: both sides of the comparison come from the
    // same decimal-exact sum, surfaced as identical doubles.
    "q156_tpch_q11" ->
      """WITH val AS (
           SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
           FROM lineitem GROUP BY 1),
         tot AS (
           SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM lineitem)
         SELECT p.p_partkey, p.p_name, v.value
         FROM val v JOIN part p ON v.l_partkey = p.p_partkey CROSS JOIN tot
         WHERE v.value > tot.total * 0.0005
         ORDER BY v.value DESC, p.p_partkey""",

    // EXISTS with a correlated cross-side date predicate (integer date
    // arithmetic — exact in both engines).
    "q157_tpch_q4" ->
      """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders o
         WHERE EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_returnflag = 'R'
             AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60)
         GROUP BY 1 ORDER BY o.o_orderpriority""",

    // c_acctbal passes through raw (identical stored double both sides).
    "q158_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE l.l_returnflag = 'R'
           AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
           AND CAST(o.o_orderdate AS DATE) < DATE '1997-04-01'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c.c_custkey
         LIMIT 20""",

    // NOT IN is anti-join-safe here: s_suppkey is never null.
    "q159_tpch_q16" ->
      """WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT a.l_suppkey) AS BIGINT) AS supplier_cnt
         FROM part p JOIN assoc a ON p.p_partkey = a.l_partkey
         WHERE p.p_brand <> 'Brand#1'
           AND p.p_size IN (1, 7, 14, 23, 36, 45)
           AND a.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         GROUP BY 1, 2
         ORDER BY supplier_cnt DESC, p.p_brand, p.p_size""",

    // Argmax by scalar subquery, ties included; the equality compares the
    // same decimal-exact double on both sides.
    "q160_tpch_q15" ->
      """WITH rev AS (
           SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
             AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
           GROUP BY 1),
         mx AS (SELECT max(total_revenue) AS m FROM rev)
         SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 4) AS total_revenue
         FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey CROSS JOIN mx
         WHERE r.total_revenue = mx.m
         ORDER BY s.s_suppkey""",

    // EXISTS + NOT EXISTS self-correlation on the same order key.
    "q161_tpch_q21" ->
      """SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
         FROM supplier s
         JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
         WHERE l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY 1, 2
         ORDER BY numwait DESC, s.s_suppkey
         LIMIT 10""",

    // Bilateral nation-pair volume by ship year.
    "q162_tpch_q7" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
             OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
           AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         GROUP BY 1, 2, 3
         ORDER BY supp_nation, cust_nation, l_year""",

    // Unrolled 8-round BPE: same word-frequency state, same doubled-
    // separator greedy rewrite, same (count desc, left, right) argmax.
    "q165_bpe_merges" -> bpeOracle(8),

    // Training's final symbol state IS inference's output on the same
    // corpus — one oracle covers both directions.
    "q167_bpe_segment" -> bpeVocabOracle(8, 20),

    // Same Knuth-hash ordering as q93's oracle.
    "q186_exact_k_sample" ->
      """WITH h AS (
           SELECT doc_id, lang,
             (doc_id * 2654435761) % 4294967296 AS hv
           FROM documents),
         r AS (
           SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS BIGINT) AS sample_rank
           FROM h)
         SELECT doc_id, lang, sample_rank
         FROM r WHERE sample_rank <= 5
         ORDER BY lang, sample_rank""",

    // Same derived v2; FULL OUTER classification.
    "q187_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
         v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2-edit' ELSE text END AS text
           FROM documents WHERE doc_id % 11 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, 'new doc ' || CAST(doc_id AS VARCHAR) AS text
           FROM documents WHERE doc_id % 13 = 0)
         SELECT COALESCE(v1.doc_id, v2.doc_id) AS id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.text = v2.text THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
         ORDER BY id""",

    // Same train/score split, same integer floor divisions (alpha = 2/5
    // exact); the backoff CASE replays branch-for-branch.
    "q188_backoff_lm" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         tr AS (SELECT toks FROM tk WHERE doc_id % 2 = 0),
         n AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM tr),
         uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM (SELECT unnest(toks) AS w FROM tr) GROUP BY w),
         bi AS (SELECT toks[i] AS wa, toks[i+1] AS wb,
                  CAST(count(*) AS BIGINT) AS cb
                FROM tr, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
                WHERE len(toks) >= 2 GROUP BY 1, 2),
         tri AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
                   CAST(count(*) AS BIGINT) AS c123
                 FROM tr, LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) u
                 WHERE len(toks) >= 3 GROUP BY 1, 2, 3),
         dg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
                FROM tk, LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) u
                WHERE len(toks) >= 3),
         j AS (
           SELECT dg.doc_id,
             CASE WHEN tri.c123 IS NOT NULL THEN (tri.c123 * 1000000) // b12.cb
                  WHEN b23.cb IS NOT NULL THEN (2 * 1000000 * b23.cb) // (5 * u2.cu)
                  WHEN u3.cu IS NOT NULL THEN (4 * 1000000 * u3.cu) // (25 * n.n_tokens)
                  ELSE 0 END AS s,
             CASE WHEN tri.c123 IS NOT NULL THEN 0
                  WHEN b23.cb IS NOT NULL THEN 1
                  WHEN u3.cu IS NOT NULL THEN 2 ELSE 3 END AS lvl
           FROM dg
           LEFT JOIN tri ON tri.w1 = dg.w1 AND tri.w2 = dg.w2 AND tri.w3 = dg.w3
           LEFT JOIN bi b12 ON b12.wa = dg.w1 AND b12.wb = dg.w2
           LEFT JOIN bi b23 ON b23.wa = dg.w2 AND b23.wb = dg.w3
           LEFT JOIN uni u2 ON u2.w = dg.w2
           LEFT JOIN uni u3 ON u3.w = dg.w3
           CROSS JOIN n)
         SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hit,
           CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_hit,
           CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_hit,
           CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(sum(s) AS BIGINT) AS score_sum,
           CAST(sum(s) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_score
         FROM j GROUP BY doc_id ORDER BY id""",

    // The sweep replayed as one global running sum; ties (t, d, id) with
    // the -1 boundary first — the half-open convention both sides share.
    // q195's batch drift shape over the same even/odd split — stream ==
    // batch is the claim, so the oracle is the batch SQL.
    // q302's fan-out feeding q311's percentile replay, keyed per window.
    "q318_rolling_p95" ->
      """WITH ev AS (SELECT
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmic,
             epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h
           FROM events),
         f AS (SELECT vmic, h - k.k * 3600000000 AS w
           FROM ev, LATERAL (SELECT unnest(range(0, 24)) AS k) k),
         pv AS (SELECT w, vmic, CAST(COUNT(*) AS BIGINT) AS vw
           FROM f GROUP BY 1, 2),
         cum AS (SELECT w, vmic,
             CAST(SUM(vw) OVER (PARTITION BY w ORDER BY vmic) AS BIGINT) AS cum
           FROM pv),
         tt AS (SELECT w, MAX(cum) AS total FROM cum GROUP BY w),
         pick AS (SELECT c.w, c.vmic, c.cum,
             ROW_NUMBER() OVER (PARTITION BY c.w ORDER BY c.vmic) AS rk
           FROM cum c JOIN tt ON c.w = tt.w
           WHERE c.cum * 1000000 >= tt.total * 950000)
         SELECT p.w AS win_start_us, tt.total AS n_values,
           p.vmic AS p95_mic, p.cum AS cum_w
         FROM pick p JOIN tt ON p.w = tt.w WHERE p.rk = 1
         ORDER BY win_start_us""",

    // q309's generators with the Jaccard value carried; thresholds as a
    // VALUES list, counts per threshold.
    "q319_blocking_threshold_sweep" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         truthj AS (
           SELECT id_a, id_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS j
           FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
         hsf AS (
           SELECT doc_id, list_transform(toks[1:3], tok ->
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211)
                 % CAST('18446744073709551616' AS HUGEINT))) AS hlist
           FROM t),
         fp AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT), hlist),
               (acc, h) -> xor((acc * 32) % CAST('18446744073709551616' AS HUGEINT)
                               + acc // CAST('576460752303423488' AS HUGEINT), h)) AS u
           FROM hsf),
         k AS (
           SELECT doc_id,
             CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS k
           FROM fp),
         r AS (SELECT doc_id, k, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM k),
         cand AS (
           SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
             greatest(a.doc_id, b.doc_id) AS id_b
           FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7),
         m AS (SELECT tj.j,
             CASE WHEN cand.id_a IS NULL THEN 0 ELSE 1 END AS in_cand
           FROM truthj tj LEFT JOIN cand
             ON tj.id_a = cand.id_a AND tj.id_b = cand.id_b),
         th AS (SELECT unnest([0.5, 0.7, 0.9]) AS t),
         c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand)
         SELECT th.t AS threshold, CAST(COUNT(*) AS BIGINT) AS n_truth,
           CAST(SUM(m.in_cand) AS BIGINT) AS n_tp, c2.n_cand,
           CAST((SUM(m.in_cand) * 1000000) // COUNT(*) AS BIGINT) AS recall_ppm,
           CAST((SUM(m.in_cand) * 1000000) // c2.n_cand AS BIGINT) AS precision_ppm
         FROM m, th, c2 WHERE m.j >= th.t
         GROUP BY th.t, c2.n_cand ORDER BY threshold""",

    // per-source token totals, DECIMAL base/remainder split, leftover
    // units to the largest remainders (ties to the smaller source).
    "q320_token_budget_quota" ->
      """WITH d AS (SELECT source,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS ntok
           FROM documents),
         g AS (SELECT source AS "group", CAST(SUM(ntok) AS BIGINT) AS w
           FROM d GROUP BY source),
         tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM g),
         based AS (SELECT g."group", g.w,
             CAST((CAST(1000000 AS HUGEINT) * g.w) // tot.tw AS BIGINT) AS base,
             CAST((CAST(1000000 AS HUGEINT) * g.w) % tot.tw AS BIGINT) AS rem
           FROM g, tot),
         short AS (SELECT 1000000 - CAST(SUM(base) AS BIGINT) AS leftover FROM based),
         rk AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, "group")
             AS BIGINT) AS rnk FROM based)
         SELECT rk."group", rk.w,
           rk.base + CASE WHEN rk.rnk <= short.leftover THEN 1 ELSE 0 END AS quota,
           rk.base, rk.rem
         FROM rk, short ORDER BY rk."group"""",

    // brute-force cross join + exact integer d^2 — the ground truth the
    // grid equi-join must reproduce pair-for-pair.
    "q321_spatial_nearest" ->
      """WITH c AS (SELECT c_custkey AS id, (c_custkey*7919)%10000 AS x,
             (c_custkey*104729)%10000 AS y FROM customer),
         s AS (SELECT s_suppkey AS id, (s_suppkey*12553)%10000 AS x,
             (s_suppkey*30011)%10000 AS y FROM supplier),
         p AS (SELECT c.id AS b_id, s.id AS a_id,
             (c.x-s.x)*(c.x-s.x) + (c.y-s.y)*(c.y-s.y) AS d2
           FROM c CROSS JOIN s
           WHERE (c.x-s.x)*(c.x-s.x) + (c.y-s.y)*(c.y-s.y) <= 700*700),
         r AS (SELECT b_id, a_id, d2,
             ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY d2, a_id) AS rn,
             COUNT(*) OVER (PARTITION BY b_id) AS n_within
           FROM p)
         SELECT b_id AS id, CAST(n_within AS BIGINT) AS n_within,
           a_id AS nearest_id, CAST(d2 AS BIGINT) AS nearest_d2
         FROM r WHERE rn = 1 ORDER BY id""",

    "q322_spatial_knn" ->
      """WITH c AS (SELECT c_custkey AS id, (c_custkey*7919)%10000 AS x,
             (c_custkey*104729)%10000 AS y FROM customer),
         s AS (SELECT s_suppkey AS id, (s_suppkey*12553)%10000 AS x,
             (s_suppkey*30011)%10000 AS y FROM supplier),
         p AS (SELECT c.id AS b_id, s.id AS a_id,
             (c.x-s.x)*(c.x-s.x) + (c.y-s.y)*(c.y-s.y) AS d2
           FROM c CROSS JOIN s
           WHERE (c.x-s.x)*(c.x-s.x) + (c.y-s.y)*(c.y-s.y) <= 1500*1500),
         r AS (SELECT b_id, a_id, d2,
             ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY d2, a_id) AS rn
           FROM p)
         SELECT b_id AS id, CAST(rn AS BIGINT) AS rank,
           a_id AS neighbor_id, CAST(d2 AS BIGINT) AS d2
         FROM r WHERE rn <= 3 ORDER BY id, rank""",

    // DuckDB's jaro_winkler_similarity is the bit-compatible reference
    // the native expression is pinned to — raw doubles hash-match.
    "q323_jw_name_pairs" ->
      """WITH v AS (SELECT DISTINCT p_brand AS blk, p_name AS nm FROM part),
         p AS (SELECT a.blk, a.nm AS sa, b.nm AS sb,
             jaro_winkler_similarity(a.nm, b.nm) AS sim
           FROM v a JOIN v b ON a.blk = b.blk AND a.nm < b.nm)
         SELECT blk, sa, sb, sim FROM p WHERE sim >= 0.9
         ORDER BY blk, sa, sb""",

    "q324_jw_reconcile" ->
      """WITH cat AS (SELECT DISTINCT p_name AS cand FROM part),
         d AS (SELECT p_partkey AS id, p_name AS truth,
             substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT)) ||
             substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2,
                    length(p_name)) AS dirty
           FROM part),
         m AS (SELECT d.id, d.truth, d.dirty, c.cand,
             jaro_winkler_similarity(d.dirty, c.cand) AS sim
           FROM d JOIN cat c ON substr(d.dirty, 1, 1) = substr(c.cand, 1, 1)),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
             ORDER BY sim DESC, cand) AS rn FROM m)
         SELECT id, dirty, cand AS best_match, sim,
           CAST(cand = truth AS BIGINT) AS hit
         FROM r WHERE rn = 1 ORDER BY id""",

    // the non-linear fold (min-clamp) as a recursive CTE: one step per
    // per-user event rank; integer-us refill identical to the Scala fold.
    "q325_token_bucket" ->
      """WITH RECURSIVE e AS (
           SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         tb AS (
           SELECT user_id, event_id, tus, rn,
             CAST(3000 AS BIGINT) AS tokens_before,
             CAST(1 AS BIGINT) AS admit,
             CAST(2000 AS BIGINT) AS tokens_after
           FROM e WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.event_id, e.tus, e.rn,
             LEAST(3000, tb.tokens_after + (e.tus - tb.tus) * 100 // 3600000000),
             CAST(CASE WHEN LEAST(3000, tb.tokens_after + (e.tus - tb.tus) * 100 // 3600000000) >= 1000
                  THEN 1 ELSE 0 END AS BIGINT),
             CAST(CASE WHEN LEAST(3000, tb.tokens_after + (e.tus - tb.tus) * 100 // 3600000000) >= 1000
                  THEN LEAST(3000, tb.tokens_after + (e.tus - tb.tus) * 100 // 3600000000) - 1000
                  ELSE LEAST(3000, tb.tokens_after + (e.tus - tb.tus) * 100 // 3600000000) END AS BIGINT)
           FROM tb JOIN e ON e.user_id = tb.user_id AND e.rn = tb.rn + 1)
         SELECT user_id, event_id, rn, tokens_before, admit, tokens_after
         FROM tb ORDER BY user_id, rn""",

    "q326_phrase_search" ->
      """WITH tok0 AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0) AS tk
           FROM documents),
         t AS (SELECT doc_id, i - 1 AS pos, tk[i] AS tok
               FROM tok0, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) u),
         o1 AS (SELECT 'slow hash batch' AS phrase, t0.doc_id,
               CAST(t0.pos AS BIGINT) AS pos
             FROM t t0
             JOIN t t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
               AND t1.tok = 'hash'
             JOIN t t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
               AND t2.tok = 'batch'
             WHERE t0.tok = 'slow'),
         o2 AS (SELECT 'part filter scan' AS phrase, t0.doc_id,
               CAST(t0.pos AS BIGINT) AS pos
             FROM t t0
             JOIN t t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
               AND t1.tok = 'filter'
             JOIN t t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
               AND t2.tok = 'scan'
             WHERE t0.tok = 'part'),
         o3 AS (SELECT 'row column' AS phrase, t0.doc_id,
               CAST(t0.pos AS BIGINT) AS pos
             FROM t t0
             JOIN t t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
               AND t1.tok = 'column'
             WHERE t0.tok = 'row')
         SELECT * FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2
           UNION ALL SELECT * FROM o3)
         ORDER BY phrase, doc_id, pos""",

    "q327_weighted_jaccard" ->
      """WITH tf AS (
           SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM (
             SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0)) AS tok
             FROM documents) GROUP BY doc_id, tok),
         kept AS (SELECT tf.* FROM tf JOIN (SELECT tok FROM tf
             GROUP BY tok HAVING COUNT(*) <= 64) d USING (tok)),
         tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n
           FROM kept GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS inter
           FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         j AS (SELECT id_a, id_b, inter, ta.n + tb.n - inter AS uni
           FROM inter
           JOIN tot ta ON ta.doc_id = id_a
           JOIN tot tb ON tb.doc_id = id_b)
         SELECT id_a, id_b, inter, uni, inter * 1000000 // uni AS wjacc_ppm
         FROM j WHERE inter * 1000000 // uni >= 600000
         ORDER BY id_a, id_b""",

    // the sweep replayed with SQL windows; island totals are tie-order
    // independent (see Relational.intervalCoverage scaladoc).
    "q328_interval_coverage" ->
      """WITH iv AS (SELECT l_suppkey AS k,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               + 1 + (l_orderkey + l_linenumber) % 7 AS e
           FROM lineitem),
         m AS (SELECT k, s, e,
             max(e) OVER (PARTITION BY k ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
           FROM iv WHERE e > s),
         fl AS (SELECT k, s, e,
             CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS ni
           FROM m),
         isl AS (SELECT k, s, e,
             sum(ni) OVER (PARTITION BY k ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM fl),
         g AS (SELECT k, island, min(s) AS i_s, max(e) AS i_e,
             count(*) AS n
           FROM isl GROUP BY k, island)
         SELECT k AS key, CAST(sum(n) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_e - i_s) AS BIGINT) AS covered,
           CAST(max(i_e) - min(i_s) AS BIGINT) AS span
         FROM g GROUP BY k ORDER BY key""",

    // per-position substring equality = the automaton's overlap-inclusive
    // count, one scan per pattern (the thing the automaton amortizes).
    "q329_multi_pattern" ->
      """WITH pats AS (SELECT * FROM (VALUES ('scan'), ('scan slow'),
             ('table table'), ('row c')) AS p(pattern)),
         occ AS (
           SELECT d.doc_id, p.pattern, CAST(count(*) AS BIGINT) AS n
           FROM documents d, pats p,
             LATERAL (SELECT unnest(range(1,
               len(d.text) - len(p.pattern) + 2)) AS i) u
           WHERE substr(d.text, CAST(i AS INT), len(p.pattern)) = p.pattern
           GROUP BY 1, 2)
         SELECT doc_id, pattern, n FROM occ ORDER BY doc_id, pattern""",

    // the five-sum closed forms in HUGEINT (DuckDB's exact int128 —
    // Spark computes the same values in DECIMAL(38,0)); sign-split //
    // replicates Spark's truncation-toward-zero DIV.
    "q330_group_ols" ->
      """WITH b AS (SELECT l_suppkey AS key, CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM lineitem),
         s AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x*y) AS HUGEINT) AS sxy,
             CAST(sum(x*x) AS HUGEINT) AS sxx,
             CAST(sum(y*y) AS HUGEINT) AS syy
           FROM b GROUP BY key),
         c AS (SELECT key, n,
             n*sxx - sx*sx AS den, n*syy - sy*sy AS den2,
             n*sxy - sx*sy AS num, sy*sxx - sx*sxy AS numi
           FROM s)
         SELECT key, n,
           CASE WHEN den = 0 THEN NULL
                WHEN num >= 0 THEN CAST((num * 1000000) // den AS BIGINT)
                ELSE CAST(-((-num * 1000000) // den) AS BIGINT) END AS slope_ppm,
           CASE WHEN den = 0 THEN NULL
                WHEN numi >= 0 THEN CAST((numi * 1000000) // den AS BIGINT)
                ELSE CAST(-((-numi * 1000000) // den) AS BIGINT) END AS intercept_ppm,
           CASE WHEN den = 0 OR den2 = 0 THEN NULL
                ELSE CAST((num * num * 1000000) // (den * den2) AS BIGINT) END AS r2_ppm
         FROM c ORDER BY key""",

    // positional 3-grams via the lateral-range index, FNV HUGEINT fold
    // (q173's pattern), rightmost-min as min(struct(h, -pos)) over the
    // same 4-gram frame, distinct selections.
    "q331_winnow_fingerprints" ->
      """WITH tok0 AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0) AS tk
           FROM documents),
         g AS (SELECT doc_id, len(tk) - 2 AS m, i AS pos,
             array_to_string(tk[i+1:i+3], ' ') AS gs
           FROM tok0, LATERAL (SELECT unnest(range(0, len(tk) - 2)) AS i) u
           WHERE len(tk) >= 3),
         hh AS (SELECT doc_id, m, pos,
             CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                  THEN u - CAST('18446744073709551616' AS HUGEINT)
                  ELSE u END AS BIGINT) AS h
           FROM (SELECT doc_id, m, pos,
               list_reduce(
                 list_prepend(CAST('14695981039346656037' AS HUGEINT),
                   list_transform(string_split(gs, ''),
                     ch -> CAST(unicode(ch) AS HUGEINT))),
                 (acc, c) -> (xor(acc, c) * 1099511628211)
                   % CAST('18446744073709551616' AS HUGEINT)) AS u
             FROM g)),
         wm AS (SELECT doc_id, m, pos,
             min(struct_pack(h := h, np := -pos)) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
           FROM hh),
         sel AS (SELECT DISTINCT doc_id,
             CAST(-(wmin.np) AS BIGINT) AS pos, wmin.h AS h
           FROM wm WHERE pos <= m - 4)
         SELECT doc_id, pos, h FROM sel ORDER BY doc_id, pos, h""",

    // the polygons unrolled to edge rows; containment = bool_and of the
    // same integer cross products (the grid only bounds candidates, so
    // the oracle needs no grid).
    "q332_point_in_polygon" ->
      """WITH pts AS (SELECT c_custkey AS id, (c_custkey*7919)%10000 AS x,
             (c_custkey*104729)%10000 AS y FROM customer),
         e AS (SELECT * FROM (VALUES
             ('tri', 0, 0, 9999, 0), ('tri', 9999, 0, 0, 9999),
             ('tri', 0, 9999, 0, 0),
             ('sq', 2000, 2000, 7000, 2000), ('sq', 7000, 2000, 7000, 7000),
             ('sq', 7000, 7000, 2000, 7000), ('sq', 2000, 7000, 2000, 2000),
             ('pent', 6500, 5000, 5464, 6427), ('pent', 5464, 6427, 3787, 5882),
             ('pent', 3787, 5882, 3787, 4118), ('pent', 3787, 4118, 5464, 3573),
             ('pent', 5464, 3573, 6500, 5000))
           AS e(poly_id, x1, y1, x2, y2)),
         m AS (SELECT p.id, p.x, p.y, e.poly_id,
             bool_and((e.x2-e.x1)*(p.y-e.y1) - (e.y2-e.y1)*(p.x-e.x1) >= 0)
               AS inside
           FROM pts p CROSS JOIN e GROUP BY 1, 2, 3, 4)
         SELECT id, x, y, poly_id FROM m WHERE inside
         ORDER BY poly_id, id""",

    // the oracle is the brute-force cross join the operator exists to avoid
    "q333_edit_distance_pairs" ->
      """WITH s AS (SELECT DISTINCT c_name AS nm FROM customer
             WHERE c_name IS NOT NULL AND length(c_name) <= 64)
         SELECT a.nm AS sa, b.nm AS sb,
                CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM s a JOIN s b ON a.nm < b.nm
         WHERE levenshtein(a.nm, b.nm) <= 1
         ORDER BY sa, sb""",

    // the recursive CTE enumerates distinct (node, pathsum) pairs — the
    // UNION dedup bounds it by distinct sums, never path count — and the
    // final max per node is the converged relaxation.
    "q334_dag_critical_path" ->
      """WITH RECURSIVE
         ps AS (SELECT p_partkey, p_size FROM part WHERE p_size BETWEEN 1 AND 25),
         hi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                WHERE l_quantity >= 30),
         e AS (SELECT x.l_partkey AS src, y.l_partkey AS dst,
                      COUNT(*) AS w
               FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey <> y.l_partkey
               JOIN ps a ON a.p_partkey = x.l_partkey
               JOIN ps b ON b.p_partkey = y.l_partkey
                 AND b.p_size = a.p_size + 1
               GROUP BY 1, 2),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         d(id, dist) AS (
           SELECT id, CAST(0 AS BIGINT) FROM nodes
           UNION
           SELECT e.dst, d.dist + e.w FROM d JOIN e ON e.src = d.id)
         SELECT id, MAX(dist) AS dist FROM d GROUP BY id ORDER BY id""",

    // pairwise slopes in sign-split truncation ppm, lower median by rank
    "q335_theil_sen" ->
      """WITH b AS (SELECT l_suppkey AS key, CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM lineitem
           WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'),
         p AS (SELECT u.key,
             CASE WHEN (v.y - u.y) >= 0
                  THEN CAST(((v.y - u.y) * 1000000) // (v.x - u.x) AS BIGINT)
                  ELSE CAST(-((-(v.y - u.y) * 1000000) // (v.x - u.x)) AS BIGINT)
             END AS slope_ppm
           FROM b u JOIN b v ON u.key = v.key AND u.x < v.x),
         r AS (SELECT key, slope_ppm,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY slope_ppm) AS rn,
             COUNT(*) OVER (PARTITION BY key) AS n_pairs
           FROM p)
         SELECT key, n_pairs, slope_ppm AS ts_slope_ppm
         FROM r WHERE rn = (n_pairs + 1) // 2 ORDER BY key""",

    // the recurrence replayed row-by-row; the inner derived table computes
    // the new level once so trend can reuse it. Truncation division is the
    // sign-split CASE (all a*y terms are non-negative here, trend is not).
    "q336_holt_linear" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type AS key,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS dus,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
               AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         o AS (SELECT key, y,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY dus) AS r
           FROM daily),
         h(key, r, y, level, trend) AS (
           SELECT key, r, y, y, CAST(0 AS BIGINT) FROM o WHERE r = 1
           UNION ALL
           SELECT key, r, y, lvl,
             CASE WHEN (100000 * (lvl - plevel) + 900000 * ptrend) >= 0
                  THEN (100000 * (lvl - plevel) + 900000 * ptrend) // 1000000
                  ELSE -((-(100000 * (lvl - plevel) + 900000 * ptrend)) // 1000000)
             END
           FROM (
             SELECT o.key, o.r, o.y, h.level AS plevel, h.trend AS ptrend,
               CASE WHEN (300000 * o.y + 700000 * (h.level + h.trend)) >= 0
                    THEN (300000 * o.y + 700000 * (h.level + h.trend)) // 1000000
                    ELSE -((-(300000 * o.y + 700000 * (h.level + h.trend))) // 1000000)
               END AS lvl
             FROM h JOIN o ON o.key = h.key AND o.r = h.r + 1) t)
         SELECT key, r, y, level, trend, level + trend AS forecast
         FROM h ORDER BY key, r""",

    // dense cells, 8-neighbor adjacency as a tiny cell-level theta join,
    // min-label closure via reachable-label enumeration, points mapped back
    "q337_grid_density_clusters" ->
      """WITH RECURSIVE pts AS (
           SELECT c_custkey AS id,
             CASE WHEN c_custkey % 11 = 0 THEN (c_custkey*7919) % 10000
                  ELSE 1000 + (c_custkey % 5)*1700 + (c_custkey*7919) % 1001
             END AS x,
             CASE WHEN c_custkey % 11 = 0 THEN (c_custkey*104729) % 10000
                  ELSE 1000 + (c_custkey % 5)*1700 + (c_custkey*104729) % 1001
             END AS y
           FROM customer),
         pc AS (SELECT id, x, y, x // 250 AS cx, y // 250 AS cy FROM pts),
         dense AS (SELECT cx, cy, cx*32768 + cy AS ckey
                   FROM pc GROUP BY cx, cy HAVING COUNT(*) >= 8),
         e AS (SELECT a.ckey AS src, b.ckey AS dst
               FROM dense a JOIN dense b
                 ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
                 AND a.ckey <> b.ckey),
         l(id, lbl) AS (
           SELECT ckey, ckey FROM dense
           UNION
           SELECT e.dst, l.lbl FROM l JOIN e ON e.src = l.id),
         comp AS (SELECT id AS ckey, MIN(lbl) AS cluster FROM l GROUP BY id)
         SELECT p.id, p.x, p.y, c.cluster
         FROM pc p JOIN comp c ON p.cx*32768 + p.cy = c.ckey
         ORDER BY cluster, id""",

    // the PNG is lossless, so the oracle regenerates the raster from the
    // synth formula and sums patches as integer math
    "q338_image_patch_grid" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
                    FROM documents),
         px AS (SELECT d.doc_id, gx.x, gy.y,
                  (d.doc_id*31 + gx.x*7 + gy.y*13) % 256 AS v
                FROM d JOIN generate_series(0, 16) AS gx(x) ON gx.x < d.w
                       JOIN generate_series(0, 14) AS gy(y) ON gy.y < d.h)
         SELECT doc_id AS id, y // 4 AS pr, x // 4 AS pc,
                CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum
         FROM px GROUP BY 1, 2, 3 ORDER BY id, pr, pc""",

    // burst-gated noise replayed sample-by-sample, framed at 48, islands
    // via the w - row_number trick, slivers < 2 frames dropped
    "q339_vad_segments" ->
      """WITH docs AS (SELECT doc_id, 2080 + (doc_id % 5)*32 AS n FROM documents),
         s1 AS (SELECT d.doc_id, u.i,
             ((d.doc_id * 1000003 + u.i) * 2654435761) % 4294967296 AS h1,
             ((u.i // 320) + d.doc_id) % 3 AS blk
           FROM docs d JOIN generate_series(0, 2207) AS u(i) ON u.i < d.n),
         smp AS (SELECT doc_id, i // 48 AS w, COUNT(*) AS n,
             SUM(CASE WHEN blk = 0
               THEN ABS((((xor(h1, h1 // 65536)) * 40503) % 4294967296)
                 // 65536 - 32768)
               ELSE 0 END) AS abs_sum
           FROM s1 GROUP BY 1, 2),
         act AS (SELECT doc_id, w, abs_sum,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS rn
           FROM smp WHERE abs_sum * 1000 >= 4000000 * n),
         seg AS (SELECT doc_id, w - rn AS g, MIN(w) AS w_start,
             MAX(w) AS w_end, CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(abs_sum) AS BIGINT) AS abs_total
           FROM act GROUP BY 1, 2)
         SELECT doc_id AS id, w_start, w_end, n_frames, abs_total
         FROM seg WHERE n_frames >= 2 ORDER BY id, w_start""",

    // latest non-null per field: ordered filtered list, first element
    "q340_golden_record" ->
      """WITH v AS (SELECT o_custkey AS key, CAST(o_orderdate AS DATE) AS d,
             o_orderkey AS i,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_orderstatus END AS status,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             END AS bal_c
           FROM orders)
         SELECT key, CAST(COUNT(*) AS BIGINT) AS n_versions,
           (list(status ORDER BY d DESC, i DESC)
              FILTER (WHERE status IS NOT NULL))[1] AS status_latest,
           (list(bal_c ORDER BY d DESC, i DESC)
              FILTER (WHERE bal_c IS NOT NULL))[1] AS bal_c_latest
         FROM v GROUP BY key ORDER BY key""",

    // q332's edge rows again: shoelace sums per polygon + containment count
    "q341_fence_occupancy" ->
      """WITH pts AS (SELECT c_custkey AS id, (c_custkey*7919)%10000 AS x,
             (c_custkey*104729)%10000 AS y FROM customer),
         e AS (SELECT * FROM (VALUES
             ('tri', 0, 0, 9999, 0), ('tri', 9999, 0, 0, 9999),
             ('tri', 0, 9999, 0, 0),
             ('sq', 2000, 2000, 7000, 2000), ('sq', 7000, 2000, 7000, 7000),
             ('sq', 7000, 7000, 2000, 7000), ('sq', 2000, 7000, 2000, 2000),
             ('pent', 6500, 5000, 5464, 6427), ('pent', 5464, 6427, 3787, 5882),
             ('pent', 3787, 5882, 3787, 4118), ('pent', 3787, 4118, 5464, 3573),
             ('pent', 5464, 3573, 6500, 5000))
           AS e(poly_id, x1, y1, x2, y2)),
         met AS (SELECT poly_id, CAST(COUNT(*) AS BIGINT) AS n_vertices,
             CAST(SUM(CAST(x1 AS BIGINT)*y2 - CAST(x2 AS BIGINT)*y1) AS BIGINT) AS area2,
             CAST(SUM((CAST(x1 AS BIGINT)+x2) *
               (CAST(x1 AS BIGINT)*y2 - CAST(x2 AS BIGINT)*y1)) AS BIGINT) AS cx6,
             CAST(SUM((CAST(y1 AS BIGINT)+y2) *
               (CAST(x1 AS BIGINT)*y2 - CAST(x2 AS BIGINT)*y1)) AS BIGINT) AS cy6
           FROM e GROUP BY poly_id),
         m AS (SELECT p.id, e.poly_id,
             bool_and((e.x2-e.x1)*(p.y-e.y1) - (e.y2-e.y1)*(p.x-e.x1) >= 0)
               AS inside
           FROM pts p CROSS JOIN e GROUP BY 1, 2),
         cnt AS (SELECT poly_id, CAST(COUNT(*) AS BIGINT) AS n_inside
                 FROM m WHERE inside GROUP BY poly_id)
         SELECT met.poly_id, met.n_vertices, met.area2, met.cx6, met.cy6,
           COALESCE(cnt.n_inside, 0) AS n_inside,
           (COALESCE(cnt.n_inside, 0) * 2000000) // met.area2 AS density_ppm
         FROM met LEFT JOIN cnt ON met.poly_id = cnt.poly_id
         ORDER BY met.poly_id""",

    // q34's shingles, three greedy rounds unrolled; ANTI JOIN = the
    // covered-set subtraction, (gain DESC, doc_id) = the tie rule
    "q342_greedy_max_coverage" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh),
         p1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM inv
                GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
         c1 AS (SELECT g FROM inv WHERE doc_id = (SELECT doc_id FROM p1)),
         p2 AS (SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
                FROM inv i ANTI JOIN c1 ON i.g = c1.g
                GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
         c2 AS (SELECT g FROM c1 UNION ALL
                SELECT g FROM inv WHERE doc_id = (SELECT doc_id FROM p2)),
         p3 AS (SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
                FROM inv i ANTI JOIN c2 ON i.g = c2.g
                GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1)
         SELECT CAST(1 AS BIGINT) AS rank, doc_id, gain,
                gain AS covered_total FROM p1
         UNION ALL
         SELECT 2, doc_id, gain, (SELECT gain FROM p1) + gain FROM p2
         UNION ALL
         SELECT 3, doc_id, gain,
           (SELECT gain FROM p1) + (SELECT gain FROM p2) + gain FROM p3
         ORDER BY rank""",

    // (node, dist, hops) enumeration with the hop cap in the recursion
    // guard; coarse costs (1..3) bound distinct sums. min at the end.
    "q343_weighted_sssp" ->
      """WITH RECURSIVE hi AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem WHERE l_quantity >= 45),
         e0 AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
                  1 + COUNT(*) % 3 AS w
                FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey
                GROUP BY 1, 2),
         e AS (SELECT a AS src, b AS dst, w FROM e0
               UNION ALL SELECT b, a, w FROM e0),
         seeds AS (SELECT DISTINCT src AS id FROM e WHERE src % 97 = 0),
         d(id, dist, hops) AS (
           SELECT id, CAST(0 AS BIGINT), 0 FROM seeds
           UNION
           SELECT e.dst, d.dist + e.w, d.hops + 1
           FROM d JOIN e ON e.src = d.id WHERE d.hops < 4)
         SELECT id, MIN(dist) AS dist FROM d GROUP BY id ORDER BY id""",

    // three unrolled local-max rounds: per-node best incident edge by
    // (w DESC, a, b), matched iff both endpoints agree, matched nodes out
    "q344_review_pair_matching" ->
      """WITH hi AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             WHERE l_quantity >= 45),
         e1 AS MATERIALIZED (SELECT x.l_partkey AS a, y.l_partkey AS b,
                  CAST(COUNT(*) AS BIGINT) AS w
                FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey GROUP BY 1, 2),
         o1 AS MATERIALIZED (SELECT a AS node, a, b, w FROM e1
                UNION ALL SELECT b, a, b, w FROM e1),
         b1 AS MATERIALIZED (SELECT node, a, b FROM (SELECT node, a, b, ROW_NUMBER()
                  OVER (PARTITION BY node ORDER BY w DESC, a, b) AS rn
                FROM o1) WHERE rn = 1),
         m1 AS MATERIALIZED (SELECT e.a, e.b, e.w FROM e1 e
                JOIN b1 x ON x.node = e.a AND x.a = e.a AND x.b = e.b
                JOIN b1 y ON y.node = e.b AND y.a = e.a AND y.b = e.b),
         t1 AS MATERIALIZED (SELECT a AS n FROM m1 UNION SELECT b FROM m1),
         e2 AS MATERIALIZED (SELECT e.a, e.b, e.w FROM e1 e
                WHERE e.a NOT IN (SELECT n FROM t1)
                  AND e.b NOT IN (SELECT n FROM t1)),
         o2 AS MATERIALIZED (SELECT a AS node, a, b, w FROM e2
                UNION ALL SELECT b, a, b, w FROM e2),
         b2 AS MATERIALIZED (SELECT node, a, b FROM (SELECT node, a, b, ROW_NUMBER()
                  OVER (PARTITION BY node ORDER BY w DESC, a, b) AS rn
                FROM o2) WHERE rn = 1),
         m2 AS MATERIALIZED (SELECT e.a, e.b, e.w FROM e2 e
                JOIN b2 x ON x.node = e.a AND x.a = e.a AND x.b = e.b
                JOIN b2 y ON y.node = e.b AND y.a = e.a AND y.b = e.b),
         t2 AS MATERIALIZED (SELECT a AS n FROM m2 UNION SELECT b FROM m2),
         e3 AS MATERIALIZED (SELECT e.a, e.b, e.w FROM e2 e
                WHERE e.a NOT IN (SELECT n FROM t2)
                  AND e.b NOT IN (SELECT n FROM t2)),
         o3 AS MATERIALIZED (SELECT a AS node, a, b, w FROM e3
                UNION ALL SELECT b, a, b, w FROM e3),
         b3 AS MATERIALIZED (SELECT node, a, b FROM (SELECT node, a, b, ROW_NUMBER()
                  OVER (PARTITION BY node ORDER BY w DESC, a, b) AS rn
                FROM o3) WHERE rn = 1),
         m3 AS MATERIALIZED (SELECT e.a, e.b, e.w FROM e3 e
                JOIN b3 x ON x.node = e.a AND x.a = e.a AND x.b = e.b
                JOIN b3 y ON y.node = e.b AND y.a = e.a AND y.b = e.b)
         SELECT a, b, w, CAST(1 AS BIGINT) AS round FROM m1
         UNION ALL SELECT a, b, w, 2 FROM m2
         UNION ALL SELECT a, b, w, 3 FROM m3
         ORDER BY round, a, b""",

    // q214's exact rank-decile rule, then per-stratum arm sums and the
    // HUGEINT cross-product mean difference in sign-split micro-cents
    "q345_stratified_ate" ->
      """WITH cust AS (SELECT c_custkey AS id,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
           FROM customer),
         spend AS (SELECT o_custkey AS id,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS out_c
           FROM orders GROUP BY 1),
         r AS (SELECT id, ROW_NUMBER() OVER (ORDER BY bal_c, id) AS rank,
             COUNT(*) OVER () AS n FROM cust),
         base AS (SELECT c.id, ((r.rank - 1) * 10) // r.n AS bin,
             COALESCE(s.out_c, 0) AS out_c,
             CASE WHEN c.id % 7 = 0 THEN 1 ELSE 0 END AS treat
           FROM cust c JOIN r ON r.id = c.id
           LEFT JOIN spend s ON s.id = c.id),
         agg AS (SELECT bin, CAST(SUM(treat) AS BIGINT) AS n_t,
             CAST(SUM(1 - treat) AS BIGINT) AS n_c,
             CAST(SUM(out_c * treat) AS BIGINT) AS sum_t,
             CAST(SUM(out_c * (1 - treat)) AS BIGINT) AS sum_c
           FROM base GROUP BY bin),
         d AS (SELECT *, CAST(sum_t AS HUGEINT) * n_c -
             CAST(sum_c AS HUGEINT) * n_t AS num FROM agg)
         SELECT bin, n_t, n_c, sum_t, sum_c,
           CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
                WHEN num >= 0 THEN CAST((num * 1000000)
                  // (CAST(n_t AS HUGEINT) * n_c) AS BIGINT)
                ELSE CAST(-((-num * 1000000)
                  // (CAST(n_t AS HUGEINT) * n_c)) AS BIGINT) END AS diff_micro
         FROM d ORDER BY bin""",

    // the same five HUGEINT window sums over RANGE 6 PRECEDING, then the
    // q330 sign-split slope
    "q346_rolling_ols" ->
      """WITH daily AS (SELECT event_type AS k,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400000000
               AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
               AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         wnd AS (SELECT k AS key, x, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) OVER w AS sx,
             SUM(CAST(y AS HUGEINT)) OVER w AS sy,
             SUM(CAST(x AS HUGEINT) * y) OVER w AS sxy,
             SUM(CAST(x AS HUGEINT) * x) OVER w AS sxx
           FROM (SELECT k, d AS x, y FROM daily)
           WINDOW w AS (PARTITION BY k ORDER BY x
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
         c AS (SELECT key, x, y, n, n * sxx - sx * sx AS den,
             n * sxy - sx * sy AS num FROM wnd)
         SELECT key, x, y, n,
           CASE WHEN den = 0 THEN NULL
                WHEN num >= 0 THEN CAST((num * 1000000) // den AS BIGINT)
                ELSE CAST(-((-num * 1000000) // den) AS BIGINT) END AS slope_ppm
         FROM c ORDER BY key, x""",

    // txn-filtered snapshot, correction dedup by (txn DESC, val DESC),
    // then the as-of pick = max valid <= probe per customer
    "q347_bitemporal_asof" ->
      """WITH vers0 AS (SELECT o_custkey AS k,
             epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS valid_us,
             epoch_us(CAST(o_orderdate AS TIMESTAMP))
               + (o_orderkey % 5) * 86400000000 AS txn_us,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS val_c
           FROM orders),
         snap AS (SELECT k, valid_us, txn_us, val_c FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY k, valid_us
                 ORDER BY txn_us DESC, val_c DESC) AS rn
             FROM vers0
             WHERE txn_us <= epoch_us(TIMESTAMP '1997-07-01 00:00:00'))
           WHERE rn = 1),
         probe AS (SELECT c_custkey AS k,
             epoch_us(TIMESTAMP '1997-01-01 00:00:00')
               + (c_custkey % 365) * 86400000000 AS probe_us
           FROM customer),
         m AS (SELECT p.k, p.probe_us, s.valid_us, s.txn_us, s.val_c,
             ROW_NUMBER() OVER (PARTITION BY p.k
               ORDER BY s.valid_us DESC) AS rn
           FROM probe p JOIN snap s
             ON s.k = p.k AND s.valid_us <= p.probe_us)
         SELECT k AS custkey, probe_us // 86400000000 AS probe_day,
           valid_us // 86400000000 AS valid_day,
           txn_us // 86400000000 AS txn_day, val_c
         FROM m WHERE rn = 1 ORDER BY custkey""",

    // the per-user theta join is the oracle instrument; shares re-derived
    "q348_temporal_pairs" ->
      """WITH b AS (SELECT user_id AS u,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_type AS t
           FROM events),
         p AS (SELECT a.t AS type_a, c.t AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
           FROM b a JOIN b c ON a.u = c.u AND c.tus > a.tus
             AND c.tus - a.tus <= 3600000000
           GROUP BY 1, 2),
         tot AS (SELECT type_a, CAST(SUM(n_pairs) AS BIGINT) AS n_from_a
                 FROM p GROUP BY 1)
         SELECT p.type_a, p.type_b, p.n_pairs, tot.n_from_a,
           (p.n_pairs * 1000000) // tot.n_from_a AS share_ppm
         FROM p JOIN tot ON p.type_a = tot.type_a
         ORDER BY p.type_a, p.type_b""",

    // min-label closure for components, capped (node, dist) enumeration
    // for parity, conflicts = same-parity edges; all per component
    "q349_bipartite_check" ->
      """WITH RECURSIVE hi AS (SELECT l_orderkey, l_partkey FROM lineitem
             WHERE l_quantity >= 49),
         wc AS (SELECT DISTINCT o.o_custkey + 1000000 AS a, h.l_partkey AS b
                FROM hi h JOIN orders o ON o.o_orderkey = h.l_orderkey),
         h50 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                 WHERE l_quantity >= 50),
         pp AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM h50 x JOIN h50 y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey),
         e AS (SELECT a, b FROM wc UNION SELECT a, b FROM pp),
         u AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
         n AS (SELECT DISTINCT s AS id FROM u),
         l(id, lbl) AS (SELECT id, id FROM n
           UNION SELECT u.d, l.lbl FROM l JOIN u ON u.s = l.id),
         comp AS (SELECT id, MIN(lbl) AS comp FROM l GROUP BY id),
         seeds AS (SELECT DISTINCT comp AS id FROM comp),
         d0(id, dist) AS (SELECT id, 0 FROM seeds
           UNION SELECT u.d, d0.dist + 1 FROM d0 JOIN u ON u.s = d0.id
           WHERE d0.dist < 15),
         dist AS (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist
                  FROM d0 GROUP BY id),
         es AS (SELECT c.comp, CAST(COUNT(*) AS BIGINT) AS n_edges,
                  CAST(SUM(CASE WHEN (da.dist + db.dist) % 2 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts
                FROM e JOIN dist da ON da.id = e.a
                  JOIN dist db ON db.id = e.b
                  JOIN comp c ON c.id = e.a
                GROUP BY 1),
         ns AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_nodes
                FROM comp GROUP BY 1)
         SELECT ns.comp, ns.n_nodes, COALESCE(es.n_edges, 0) AS n_edges,
           COALESCE(es.n_conflicts, 0) AS n_conflicts,
           COALESCE(es.n_conflicts, 0) = 0 AS bipartite
         FROM ns LEFT JOIN es ON ns.comp = es.comp ORDER BY ns.comp""",

    // integer halving decay replayed with the same shift
    "q350_decayed_heavy_hitters" ->
      """WITH daily AS (SELECT event_type AS typ, user_id AS u,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
               // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2, 3),
         mx AS (SELECT MAX(d) AS dmax FROM daily),
         sc AS (SELECT typ, u,
             CAST(SUM(n * (1000000 //
               (CAST(1 AS BIGINT) << CAST(dmax - d AS INT)))) AS BIGINT)
               AS decayed_micro,
             CAST(SUM(n) AS BIGINT) AS n_raw
           FROM daily, mx GROUP BY 1, 2),
         r AS (SELECT typ, u, decayed_micro, n_raw,
             ROW_NUMBER() OVER (PARTITION BY typ
               ORDER BY decayed_micro DESC, u) AS rank
           FROM sc)
         SELECT typ, CAST(rank AS BIGINT) AS rank, u, decayed_micro, n_raw
         FROM r WHERE rank <= 5 ORDER BY typ, rank""",

    // boundary sweep: elementary segments by LEAD, winner rn=1 by
    // (p DESC, s DESC, v DESC), run merge by the lag-flag cumulative sum
    "q351_timeline_resolve" ->
      """WITH ivl AS (SELECT l_suppkey AS k,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
               + 1 + (l_orderkey + l_linenumber) % 7 AS BIGINT) AS e,
             CAST(l_linenumber AS BIGINT) AS p, l_orderkey AS v
           FROM lineitem
           WHERE l_suppkey % 10 = 0
             AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'),
         b AS (SELECT k, s AS bd FROM ivl UNION SELECT k, e FROM ivl),
         segs AS (SELECT k, bd AS seg_s,
             LEAD(bd) OVER (PARTITION BY k ORDER BY bd) AS seg_e FROM b),
         w AS (SELECT k, seg_s, seg_e, p, v FROM (
             SELECT s2.k, s2.seg_s, s2.seg_e, i.p, i.v,
               ROW_NUMBER() OVER (PARTITION BY s2.k, s2.seg_s
                 ORDER BY i.p DESC, i.s DESC, i.v DESC) AS rn
             FROM segs s2 JOIN ivl i ON i.k = s2.k
               AND i.s <= s2.seg_s AND s2.seg_s < i.e
             WHERE s2.seg_e IS NOT NULL) WHERE rn = 1),
         r AS (SELECT *, CASE WHEN LAG(seg_e) OVER w1 = seg_s
                 AND LAG(p) OVER w1 = p AND LAG(v) OVER w1 = v
               THEN 0 ELSE 1 END AS newrun
           FROM w WINDOW w1 AS (PARTITION BY k ORDER BY seg_s)),
         r2 AS (SELECT *, SUM(newrun) OVER (PARTITION BY k ORDER BY seg_s)
               AS run FROM r)
         SELECT k AS key, MIN(seg_s) AS seg_start, MAX(seg_e) AS seg_end,
           CAST(MIN(p) AS BIGINT) AS prio, CAST(MIN(v) AS BIGINT) AS value
         FROM r2 GROUP BY k, run ORDER BY key, seg_start""",

    // the q315 FNV-1a + xorshift64 replay keyed 'p:', applied to BOTH
    // tables, orders re-joined on the pseudonym
    "q352_pseudonymize_audit" ->
      """WITH ids AS (SELECT DISTINCT id FROM (
             SELECT c_custkey AS id FROM customer
             UNION ALL SELECT o_custkey FROM orders)),
         hv AS (SELECT id, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split('p:' || CAST(id AS VARCHAR), ''),
                 ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211)
               % CAST('18446744073709551616' AS HUGEINT)) AS h0
           FROM ids),
         z1 AS (SELECT id, xor(h0, (h0 * 8192)
             % CAST('18446744073709551616' AS HUGEINT)) AS z FROM hv),
         z2 AS (SELECT id, xor(z, z // 128) AS z FROM z1),
         z3 AS (SELECT id, xor(z, (z * 131072)
             % CAST('18446744073709551616' AS HUGEINT)) AS h FROM z2),
         pid AS (SELECT id,
             CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
               THEN h - CAST('18446744073709551616' AS HUGEINT)
               ELSE h END AS BIGINT) AS h
           FROM z3),
         custp AS (SELECT CAST(c.c_nationkey AS BIGINT) AS nation, p.h
           FROM customer c JOIN pid p ON p.id = c.c_custkey),
         ordp AS (SELECT p.h FROM orders o JOIN pid p ON p.id = o.o_custkey),
         pn AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_pids
           FROM custp GROUP BY nation),
         j AS (SELECT c.nation, CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM ordp o JOIN custp c ON o.h = c.h GROUP BY c.nation)
         SELECT pn.nation, pn.n_cust, pn.n_pids,
           COALESCE(j.n_orders, 0) AS n_orders
         FROM pn LEFT JOIN j ON pn.nation = j.nation
         ORDER BY pn.nation""",

    // same floor(double·1000) quantization, the pair join IS the oracle
    "q353_gram_matrix" ->
      """WITH q AS (SELECT vec_id, g.i,
             CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 1000)
               AS BIGINT) AS qx
           FROM embeddings JOIN generate_series(0, 63) AS g(i) ON TRUE),
         p AS (SELECT a.i AS i, b.i AS j, a.qx * b.qx AS prod
           FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i)
         SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(prod) AS BIGINT) AS dot
         FROM p GROUP BY 1, 2 ORDER BY i, j""",

    // the full-scan contains the index-side must equal
    "q354_trigram_search" ->
      """WITH p AS (SELECT * FROM (VALUES ('fast sort'), ('table table'),
             ('scan query big'), ('merge batch')) AS p(pattern))
         SELECT d.doc_id AS id, p.pattern
         FROM documents d JOIN p ON contains(d.text, p.pattern)
         ORDER BY p.pattern, id""",

    // the full 10-register (counts + sums per arm) state walked row by
    // row; exploit argmax = list_reduce with the cross-multiplied
    // comparator, optimistic never-pulled short-circuit, explore cycle
    "q355_bandit_replay" ->
      """WITH RECURSIVE ev AS MATERIALIZED (SELECT user_id % 8 AS co,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_id AS i,
             CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
               WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
               WHEN 'view' THEN 4 END AS a,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS rew
           FROM events),
         o AS MATERIALIZED (SELECT co, a, rew,
             ROW_NUMBER() OVER (PARTITION BY co ORDER BY tus, i) AS r
           FROM ev),
         st(co, r, c0, c1, c2, c3, c4, s0, s1, s2, s3, s4) AS (
           SELECT DISTINCT co, CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           FROM o
           UNION ALL
           SELECT co, r,
             c0 + CASE WHEN a = 0 AND ch = 0 THEN 1 ELSE 0 END,
             c1 + CASE WHEN a = 1 AND ch = 1 THEN 1 ELSE 0 END,
             c2 + CASE WHEN a = 2 AND ch = 2 THEN 1 ELSE 0 END,
             c3 + CASE WHEN a = 3 AND ch = 3 THEN 1 ELSE 0 END,
             c4 + CASE WHEN a = 4 AND ch = 4 THEN 1 ELSE 0 END,
             s0 + CASE WHEN a = 0 AND ch = 0 THEN rew ELSE 0 END,
             s1 + CASE WHEN a = 1 AND ch = 1 THEN rew ELSE 0 END,
             s2 + CASE WHEN a = 2 AND ch = 2 THEN rew ELSE 0 END,
             s3 + CASE WHEN a = 3 AND ch = 3 THEN rew ELSE 0 END,
             s4 + CASE WHEN a = 4 AND ch = 4 THEN rew ELSE 0 END
           FROM (
             SELECT st.co, o.r, o.a, o.rew,
               st.c0, st.c1, st.c2, st.c3, st.c4,
               st.s0, st.s1, st.s2, st.s3, st.s4,
               CASE WHEN o.r % 5 = 0 THEN (o.r // 5) % 5
                    WHEN st.c0 = 0 THEN 0 WHEN st.c1 = 0 THEN 1
                    WHEN st.c2 = 0 THEN 2 WHEN st.c3 = 0 THEN 3
                    WHEN st.c4 = 0 THEN 4
                    ELSE list_reduce([0, 1, 2, 3, 4], (acc, i) ->
                      CASE WHEN
                        [st.s0, st.s1, st.s2, st.s3, st.s4][i + 1] *
                          [st.c0, st.c1, st.c2, st.c3, st.c4][acc + 1] >
                        [st.s0, st.s1, st.s2, st.s3, st.s4][acc + 1] *
                          [st.c0, st.c1, st.c2, st.c3, st.c4][i + 1]
                      THEN i ELSE acc END)
               END AS ch
             FROM st JOIN o ON o.co = st.co AND o.r = st.r + 1) t),
         fin AS MATERIALIZED (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY co ORDER BY r DESC) AS rn FROM st) WHERE rn = 1)
         SELECT co AS cohort, CAST(0 AS BIGINT) AS arm_idx, 'click' AS arm,
                c0 AS pulls, s0 AS reward_micro FROM fin
         UNION ALL SELECT co, 1, 'error', c1, s1 FROM fin
         UNION ALL SELECT co, 2, 'purchase', c2, s2 FROM fin
         UNION ALL SELECT co, 3, 'signup', c3, s3 FROM fin
         UNION ALL SELECT co, 4, 'view', c4, s4 FROM fin
         ORDER BY cohort, arm_idx""",

    // per-user bit_or mask -> 32-mask histogram -> v(S) containment sum
    // over the coalition lattice -> Shapley marginals with |S|!(4-|S|)!
    // weights (x120 keeps everything integral)
    "q356_shapley_attribution" ->
      """WITH tm(player, pi) AS (VALUES ('click', 0), ('error', 1),
             ('purchase', 2), ('signup', 3), ('view', 4)),
         um AS (SELECT user_id AS u, bit_or(1 << pi) AS mask
           FROM events JOIN tm ON event_type = player GROUP BY u),
         mc AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n
           FROM um GROUP BY mask),
         co AS (SELECT UNNEST(range(32)) AS s),
         v AS (SELECT s, COALESCE((SELECT CAST(SUM(n) AS BIGINT) FROM mc
             WHERE (mask & s) <> 0), CAST(0 AS BIGINT)) AS v FROM co),
         w(sz, w) AS (VALUES (0, 24), (1, 6), (2, 4), (3, 6), (4, 24)),
         sh AS (SELECT pi, player,
             CAST(SUM(w.w * (v1.v - v0.v)) AS BIGINT) AS shapley_xkfact
           FROM tm CROSS JOIN co
           JOIN v v0 ON v0.s = co.s
           JOIN v v1 ON v1.s = (co.s | (1 << pi))
           JOIN w ON w.sz = bit_count(co.s)
           WHERE ((co.s >> pi) & 1) = 0 GROUP BY pi, player)
         SELECT CAST(pi AS BIGINT) AS player_idx, player,
           (SELECT v FROM v WHERE s = (1 << pi)) AS v_solo, shapley_xkfact
         FROM sh ORDER BY player_idx""",

    // the quadratic ground truth: every customer pair per nation CASE'd
    // into concordant/discordant/tie buckets; tau-a sign-split ppm
    "q357_kendall_concordance" ->
      """WITH c AS (SELECT c_nationkey AS nk, o_custkey AS ck,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS y
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         t AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY nk),
         p AS (SELECT a.nk,
             CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
               OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS cc,
             CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
               OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS dd,
             CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
             CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END)
               AS BIGINT) AS txy
           FROM c a JOIN c b ON a.nk = b.nk AND a.ck < b.ck GROUP BY a.nk)
         SELECT CAST(t.nk AS VARCHAR) AS grp, t.n,
           t.n * (t.n - 1) // 2 AS n_pairs,
           COALESCE(cc, 0) AS concordant, COALESCE(dd, 0) AS discordant,
           COALESCE(tx, 0) AS ties_x, COALESCE(ty, 0) AS ties_y,
           COALESCE(txy, 0) AS ties_xy,
           CASE WHEN t.n < 2 THEN NULL
                WHEN cc >= dd THEN ((cc - dd) * 1000000) // (t.n * (t.n - 1) // 2)
                ELSE -(((dd - cc) * 1000000) // (t.n * (t.n - 1) // 2))
                END AS tau_a_ppm
         FROM t LEFT JOIN p ON t.nk = p.nk ORDER BY grp""",

    // same deterministic CIDR lattice + event IPs; LPM as three masked
    // LEFT joins with a longest-first COALESCE (unique per (len, key))
    "q358_lpm_enrichment" ->
      """WITH n AS (SELECT n_nationkey AS k, n_name AS owner FROM nation),
         pf AS (
           SELECT ((k * 5 % 64 + 16) << 24) AS net, 8 AS len, owner FROM n
           UNION ALL
           SELECT (((k + 3) % 25 * 5 % 64 + 16) << 24)
             + ((k * 41 % 256) << 16), 16, owner FROM n
           UNION ALL
           SELECT (((k + 7) % 25 * 5 % 64 + 16) << 24)
             + (((k * 41 + 64) % 256) << 16) + ((k * 13 % 256) << 8),
             24, owner FROM n),
         ev AS (SELECT event_id AS eid, user_id,
           CASE WHEN event_id % 97 = 0 THEN
               (((event_id % 25 + 7) % 25 * 5 % 64 + 16) << 24)
               + (((event_id % 25 * 41 + 64) % 256) << 16)
               + ((event_id % 25 * 13 % 256) << 8) + (event_id % 256)
             WHEN event_id % 13 = 0 THEN
               (((event_id % 25 + 3) % 25 * 5 % 64 + 16) << 24)
               + ((event_id % 25 * 41 % 256) << 16) + (event_id * 7 % 65536)
             WHEN event_id % 7 = 0 THEN
               ((200 + event_id % 40) << 24) + (event_id * 3 % 16777216)
             ELSE ((event_id % 25 * 5 % 64 + 16) << 24)
               + ((event_id * 11 % 256) << 16)
               + ((event_id * 13 % 256) << 8) + (event_id * 17 % 256)
             END AS ip FROM events),
         m AS (SELECT ev.user_id,
             COALESCE(p24.owner, p16.owner, p8.owner, '(unmatched)') AS owner,
             CASE WHEN p24.owner IS NOT NULL THEN 24
                  WHEN p16.owner IS NOT NULL THEN 16
                  WHEN p8.owner IS NOT NULL THEN 8 ELSE -1 END AS plen
           FROM ev
           LEFT JOIN pf p8 ON p8.len = 8 AND (ev.ip >> 24) = (p8.net >> 24)
           LEFT JOIN pf p16 ON p16.len = 16 AND (ev.ip >> 16) = (p16.net >> 16)
           LEFT JOIN pf p24 ON p24.len = 24 AND (ev.ip >> 8) = (p24.net >> 8))
         SELECT owner, CAST(plen AS BIGINT) AS plen,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM m GROUP BY 1, 2 ORDER BY owner, plen""",

    // patience piles as recursive-CTE list state: c = tops < x decides
    // replace-vs-append for the increasing piles, d = tops > x for the
    // decreasing ones; final pile counts are the subsequence lengths
    "q359_lis_persistence" ->
      """WITH RECURSIVE ev AS (SELECT user_id AS u,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_id AS i,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x
           FROM events),
         o AS (SELECT u, x,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY tus, i) AS r
           FROM ev),
         st(u, r, L, M) AS (
           SELECT DISTINCT u, CAST(0 AS BIGINT),
             CAST([] AS BIGINT[]), CAST([] AS BIGINT[]) FROM o
           UNION ALL
           SELECT u, r,
             CASE WHEN c = len(L) THEN list_append(L, x)
                  ELSE list_slice(L, 1, c) || [x]
                    || list_slice(L, c + 2, len(L)) END,
             CASE WHEN d = len(M) THEN list_append(M, x)
                  ELSE list_slice(M, 1, d) || [x]
                    || list_slice(M, d + 2, len(M)) END
           FROM (SELECT st.u, o.r, o.x, st.L, st.M,
               len(list_filter(st.L, e -> e < o.x)) AS c,
               len(list_filter(st.M, e -> e > o.x)) AS d
             FROM st JOIN o ON o.u = st.u AND o.r = st.r + 1) t),
         fin AS (SELECT u, L, M, ROW_NUMBER() OVER
             (PARTITION BY u ORDER BY r DESC) AS rn FROM st)
         SELECT f.u, c.n, CAST(len(f.L) AS BIGINT) AS lis_len,
           CAST(len(f.M) AS BIGINT) AS lds_len
         FROM fin f JOIN (SELECT u, CAST(COUNT(*) AS BIGINT) AS n
           FROM o GROUP BY u) c USING (u)
         WHERE f.rn = 1 ORDER BY u""",

    // the same nine sufficient statistics in HUGEINT, the same four
    // Cramer determinants, det sign-normalized before the sign-split ppm
    "q360_ols_two_regressors" ->
      """WITH b AS (SELECT l_returnflag || '|' || l_linestatus AS key,
             CAST(l_quantity AS BIGINT) AS x1,
             CAST(CAST(l_discount AS DECIMAL(18,6)) * 10000 AS BIGINT) AS x2,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yy
           FROM lineitem),
         a AS (SELECT key, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
             CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
             CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
             CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
             CAST(SUM(yy) AS HUGEINT) AS sy,
             CAST(SUM(x1 * yy) AS HUGEINT) AS s1y,
             CAST(SUM(x2 * yy) AS HUGEINT) AS s2y
           FROM b GROUP BY key),
         d AS (SELECT key, CAST(n AS BIGINT) AS n_out,
             n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2) AS det,
             sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
               + s2 * (s1y * s12 - s11 * s2y) AS det0,
             n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s2y - s1y * s2) AS det1,
             n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)
               + sy * (s1 * s12 - s11 * s2) AS det2
           FROM a),
         e AS (SELECT key, n_out,
             CASE WHEN det < 0 THEN -det ELSE det END AS deta,
             CASE WHEN det < 0 THEN -det0 ELSE det0 END AS nd0,
             CASE WHEN det < 0 THEN -det1 ELSE det1 END AS nd1,
             CASE WHEN det < 0 THEN -det2 ELSE det2 END AS nd2
           FROM d)
         SELECT key, n_out AS n,
           CASE WHEN deta = 0 THEN NULL
                WHEN nd0 >= 0 THEN CAST((nd0 * 1000000) // deta AS BIGINT)
                ELSE -CAST(((-nd0) * 1000000) // deta AS BIGINT) END AS b0_ppm,
           CASE WHEN deta = 0 THEN NULL
                WHEN nd1 >= 0 THEN CAST((nd1 * 1000000) // deta AS BIGINT)
                ELSE -CAST(((-nd1) * 1000000) // deta AS BIGINT) END AS b1_ppm,
           CASE WHEN deta = 0 THEN NULL
                WHEN nd2 >= 0 THEN CAST((nd2 * 1000000) // deta AS BIGINT)
                ELSE -CAST(((-nd2) * 1000000) // deta AS BIGINT) END AS b2_ppm
         FROM e ORDER BY key""",

    // same pinned cumulative weights W(m) = sum_{d=m..10} 9^(d-1)
    // 10^(10-d) 2520/d; join on max(rank_a, rank_b); 2520(10^10-9^10)
    // is the identical-ranking normalizer
    "q361_rank_biased_overlap" ->
      """WITH per AS (SELECT c_nationkey AS qid, o_custkey AS doc,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
         a AS (SELECT qid, doc, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY rev DESC, doc) AS ra FROM per QUALIFY ra <= 10),
         b AS (SELECT qid, doc, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY cnt DESC, doc) AS rb FROM per QUALIFY rb <= 10),
         w(m, wt) AS (VALUES (1, 5932493265528), (2, 3412493265528),
           (3, 2278493265528), (4, 1598093265528), (5, 1138823265528),
           (6, 808148865528), (7, 560143065528), (8, 368824305528),
           (9, 218160782028), (10, 97629963228)),
         j AS (SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(w.wt) AS BIGINT) AS rbo_scaled
           FROM a JOIN b ON a.qid = b.qid AND a.doc = b.doc
           JOIN w ON w.m = GREATEST(a.ra, b.rb) GROUP BY a.qid)
         SELECT q.qid, COALESCE(n_common, CAST(0 AS BIGINT)) AS n_common,
           COALESCE(rbo_scaled, CAST(0 AS BIGINT)) AS rbo_scaled,
           CAST(CAST(COALESCE(rbo_scaled, 0) AS HUGEINT) * 1000000
             // 16413303309480 AS BIGINT) AS rbo_ppm
         FROM (SELECT qid FROM a UNION SELECT qid FROM b) q
         LEFT JOIN j ON q.qid = j.qid ORDER BY q.qid""",

    // same pinned floor(1e9/log2(r+1)) discounts; IDCG re-ranks the
    // grade multiset descending with a second ROW_NUMBER
    "q362_ndcg" ->
      """WITH ev AS (SELECT user_id AS qid, event_id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm,
             CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
               WHEN 'click' THEN 1 ELSE 0 END AS grade
           FROM events),
         r AS (SELECT qid, grade, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY vm DESC, event_id) AS rk FROM ev QUALIFY rk <= 10),
         d(rk, disc) AS (VALUES (1, 1000000000), (2, 630929753),
           (3, 500000000), (4, 430676558), (5, 386852807),
           (6, 356207187), (7, 333333333), (8, 315464876),
           (9, 301029995), (10, 289064826)),
         dcg AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(grade AS BIGINT) * disc) AS BIGINT) AS dcg_scaled
           FROM r JOIN d USING (rk) GROUP BY qid),
         i AS (SELECT qid, grade, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY grade DESC) AS rk FROM r),
         idcg AS (SELECT qid, CAST(SUM(CAST(grade AS BIGINT) * disc) AS BIGINT)
             AS idcg_scaled
           FROM i JOIN d USING (rk) GROUP BY qid)
         SELECT qid, n, dcg_scaled, idcg_scaled,
           CASE WHEN idcg_scaled = 0 THEN NULL
                ELSE CAST(dcg_scaled * 1000000 // idcg_scaled AS BIGINT)
                END AS ndcg_ppm
         FROM dcg JOIN idcg USING (qid) ORDER BY qid""",

    // DTW DP replayed cell-by-cell (row-major): the recursive state
    // carries the last 13 dp values, so up = win[2], up-left = win[1],
    // left = win[13]; edge rows/cols CASE around the zero init
    "q363_dtw_profile_drift" ->
      """WITH RECURSIVE ev AS (SELECT user_id AS u,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) // 2 AS bkt,
             day(CAST(ts AS TIMESTAMP)) % 2 AS half
           FROM events),
         arr AS (SELECT u,
             [CAST(SUM(CASE WHEN bkt = 0 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 1 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 2 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 3 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 4 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 5 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 6 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 7 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 8 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 9 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 10 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 11 AND half = 0 THEN 1 ELSE 0 END) AS BIGINT)] AS a,
             [CAST(SUM(CASE WHEN bkt = 0 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 1 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 2 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 3 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 4 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 5 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 6 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 7 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 8 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 9 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 10 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN bkt = 11 AND half = 1 THEN 1 ELSE 0 END) AS BIGINT)] AS b
           FROM ev GROUP BY u),
         st(u, idx, win) AS (
           SELECT u, 0, CAST([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
             AS BIGINT[]) FROM arr
           UNION ALL
           SELECT u, idx, list_slice(win, 2, 13) || [dp]
           FROM (SELECT st.u, st.idx + 1 AS idx, st.win,
               abs(arr.a[st.idx // 12 + 1] - arr.b[st.idx % 12 + 1])
               + CASE WHEN st.idx // 12 = 0 AND st.idx % 12 = 0 THEN 0
                      WHEN st.idx // 12 = 0 THEN win[13]
                      WHEN st.idx % 12 = 0 THEN win[2]
                      ELSE least(win[1], win[2], win[13]) END AS dp
             FROM st JOIN arr USING (u) WHERE st.idx < 144) t),
         fin AS (SELECT u, win[13] AS dtw FROM st WHERE idx = 144)
         SELECT arr.u AS u,
           CAST(list_sum(list_transform([1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
             11, 12], x -> abs(a[x] - b[x]))) AS BIGINT) AS l1,
           CAST(fin.dtw AS BIGINT) AS dtw
         FROM arr JOIN fin USING (u) ORDER BY u""",

    // same span construction, same classification CASE in the same
    // order (degenerate intervals resolve by clause order)
    "q364_allen_census" ->
      """WITH iv AS (SELECT user_id AS u, event_type AS ty,
             MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS st,
             MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS en
           FROM events GROUP BY 1, 2),
         p AS (SELECT x.u,
             CASE WHEN x.st = y.st AND x.en = y.en THEN 'equals'
                  WHEN x.en < y.st THEN 'before'
                  WHEN y.en < x.st THEN 'after'
                  WHEN x.en = y.st THEN 'meets'
                  WHEN y.en = x.st THEN 'met_by'
                  WHEN x.st < y.st AND x.en > y.st AND x.en < y.en
                    THEN 'overlaps'
                  WHEN y.st < x.st AND y.en > x.st AND y.en < x.en
                    THEN 'overlapped_by'
                  WHEN x.st = y.st AND x.en < y.en THEN 'starts'
                  WHEN x.st = y.st AND x.en > y.en THEN 'started_by'
                  WHEN x.st > y.st AND x.en < y.en THEN 'during'
                  WHEN x.st < y.st AND x.en > y.en THEN 'contains'
                  WHEN x.en = y.en AND x.st > y.st THEN 'finishes'
                  ELSE 'finished_by' END AS rel
           FROM iv x JOIN iv y ON x.u = y.u AND x.ty < y.ty)
         SELECT rel, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users
         FROM p GROUP BY rel ORDER BY rel""",

    // the same greedy as a recursive CTE: L sorted ascending, each step
    // merges L[1]+L[2] and banks the merged weight; fixed width by the
    // same integer ladder
    "q365_huffman_budget" ->
      """WITH RECURSIVE tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT unnest(list_filter(
               regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0)) AS term FROM documents)
           GROUP BY term ORDER BY n DESC, term LIMIT 32),
         init AS (SELECT list_sort(list(n)) AS L FROM tc),
         st(step, L, acc) AS (
           SELECT 0, L, CAST(0 AS BIGINT) FROM init
           UNION ALL
           SELECT step + 1,
             list_sort(list_slice(L, 3, len(L)) || [L[1] + L[2]]),
             acc + L[1] + L[2]
           FROM st WHERE len(L) > 1),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_symbols,
             CAST(SUM(n) AS BIGINT) AS total_count FROM tc)
         SELECT n_symbols, total_count,
           (CASE WHEN n_symbols <= 2 THEN 1 WHEN n_symbols <= 4 THEN 2
                 WHEN n_symbols <= 8 THEN 3 WHEN n_symbols <= 16 THEN 4
                 WHEN n_symbols <= 32 THEN 5 ELSE 6 END) * total_count
             AS fixed_bits,
           (SELECT CAST(acc AS BIGINT) FROM st WHERE len(L) = 1)
             AS huffman_bits
         FROM agg""",

    // minimax closed form of the isotonic fit over present bins in
    // order: segment means from prefix sums, inner MIN over k >= i,
    // outer MAX over j <= i; floor-ppm commutes with both
    "q366_isotonic_calibration" ->
      """WITH bins AS (SELECT
             LEAST(19, CAST(FLOOR(o_totalprice / 30000) AS BIGINT)) AS b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         idx AS (SELECT b, n, c, ROW_NUMBER() OVER (ORDER BY b) AS i
           FROM bins),
         pre AS (SELECT i, SUM(c) OVER (ORDER BY i) AS cc,
             SUM(n) OVER (ORDER BY i) AS nn FROM idx),
         seg AS (SELECT pj.i AS j, pk.i AS k,
             (1000000 * (pk.cc - COALESCE(p0.cc, 0)))
               // (pk.nn - COALESCE(p0.nn, 0)) AS a
           FROM pre pj JOIN pre pk ON pk.i >= pj.i
           LEFT JOIN pre p0 ON p0.i = pj.i - 1),
         fit AS (SELECT i, CAST(MAX(mn) AS BIGINT) AS iso_ppm FROM (
             SELECT x.i AS i, s.j, MIN(s.a) AS mn
             FROM idx x JOIN seg s ON s.j <= x.i AND s.k >= x.i
             GROUP BY x.i, s.j) t GROUP BY i)
         SELECT idx.b AS bin, idx.n, idx.c AS conv,
           CAST((idx.c * 1000000) // idx.n AS BIGINT) AS raw_ppm,
           fit.iso_ppm
         FROM idx JOIN fit USING (i) ORDER BY bin""",

    // the dominance definition verbatim as NOT EXISTS over the same
    // per-part aggregates (y, z negated to minimize)
    "q367_skyline3d" ->
      """WITH per AS (SELECT p_partkey AS id,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             -CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y,
             -CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS z
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2)
         SELECT id, x, y, z FROM per p
         WHERE NOT EXISTS (SELECT 1 FROM per d
           WHERE d.x <= p.x AND d.y <= p.y AND d.z <= p.z
             AND (d.x < p.x OR d.y < p.y OR d.z < p.z))
         ORDER BY id""",

    // the same two-register greedy (lastEnd, count) walked over the
    // (end, start, id)-ordered stream per user
    "q368_activity_selection" ->
      """WITH RECURSIVE iv AS (SELECT user_id AS u, event_id AS i,
             epoch_us(CAST(ts AS TIMESTAMP)) AS st,
             epoch_us(CAST(ts AS TIMESTAMP))
               + CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
               AS en
           FROM events),
         o AS (SELECT u, st, en, ROW_NUMBER() OVER (PARTITION BY u
             ORDER BY en, st, i) AS r FROM iv),
         rec(u, r, cnt, le) AS (
           SELECT DISTINCT u, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(-4611686018427387904 AS BIGINT) FROM o
           UNION ALL
           SELECT rec.u, o.r,
             CASE WHEN o.st >= rec.le THEN rec.cnt + 1 ELSE rec.cnt END,
             CASE WHEN o.st >= rec.le THEN o.en ELSE rec.le END
           FROM rec JOIN o ON o.u = rec.u AND o.r = rec.r + 1),
         fin AS (SELECT u, cnt, le, ROW_NUMBER() OVER (PARTITION BY u
             ORDER BY r DESC) AS rn FROM rec),
         tot AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY u)
         SELECT t.u, t.n AS n_intervals, f.cnt AS max_nonoverlap,
           CASE WHEN f.cnt = 0 THEN 0 ELSE f.le END AS last_end
         FROM tot t JOIN fin f ON t.u = f.u AND f.rn = 1 ORDER BY t.u""",

    // same moments in HUGEINT; theta kept as a fraction, the adjusted
    // mean assembled as one integer fraction before the ppm floor
    "q369_cuped" ->
      """WITH per AS (SELECT user_id AS u,
             CAST(SUM(CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15
               THEN CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)
               ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15
               THEN CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)
               ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY u),
         g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
           FROM per),
         a AS (SELECT u % 2 AS arm, CAST(COUNT(*) AS HUGEINT) AS na,
             CAST(SUM(x) AS HUGEINT) AS sxa,
             CAST(SUM(y) AS HUGEINT) AS sya
           FROM per GROUP BY 1),
         e AS (SELECT arm, na, sxa, sya, n, sx,
             n * sxy - sx * sy AS tn, n * sxx - sx * sx AS td
           FROM a CROSS JOIN g)
         SELECT CAST(arm AS BIGINT) AS arm, CAST(na AS BIGINT) AS n,
           CAST(sxa AS BIGINT) AS sum_x, CAST(sya AS BIGINT) AS sum_y,
           CASE WHEN sya >= 0 THEN CAST((sya * 1000000) // na AS BIGINT)
                ELSE -CAST(((-sya) * 1000000) // na AS BIGINT)
                END AS raw_mean_ppm,
           CASE WHEN td = 0 THEN NULL
                WHEN sya * td * n - tn * (sxa * n - sx * na) >= 0 THEN
                  CAST(((sya * td * n - tn * (sxa * n - sx * na)) * 1000000)
                    // (na * td * n) AS BIGINT)
                ELSE -CAST(((tn * (sxa * n - sx * na) - sya * td * n) * 1000000)
                    // (na * td * n) AS BIGINT)
                END AS adj_mean_ppm,
           CASE WHEN td = 0 THEN NULL
                WHEN tn >= 0 THEN CAST((tn * 1000000) // td AS BIGINT)
                ELSE -CAST(((-tn) * 1000000) // td AS BIGINT)
                END AS theta_ppm
         FROM e ORDER BY arm""",

    // q402: identical Kruskal oracle — the distributed Borůvka tier must
    // select the same unique forest
    "q402_mst_distributed" ->
      """WITH RECURSIVE hi AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem WHERE l_quantity >= 45),
         e0 AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
             AND x.l_partkey < y.l_partkey GROUP BY 1, 2),
         e AS (SELECT a, b, CAST(1 + n % 7 AS BIGINT) AS w FROM e0),
         nd AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS ix
           FROM (SELECT a AS id FROM e UNION SELECT b FROM e)),
         cnt AS (SELECT COUNT(*) AS n FROM nd),
         eo AS (SELECT e.a, e.b, e.w, na.ix AS ia, nb.ix AS ib,
             ROW_NUMBER() OVER (ORDER BY e.w, e.a, e.b) AS r
           FROM e JOIN nd na ON na.id = e.a JOIN nd nb ON nb.id = e.b),
         init AS (SELECT range(1, n + 1) AS L FROM cnt),
         st(r, a, b, w, acc, L) AS (
           SELECT CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE, L
           FROM init
           UNION ALL
           SELECT t.r, t.a, t.b, t.w, t.la <> t.lb,
             CASE WHEN t.la <> t.lb THEN
               list_transform(t.L, x -> CASE
                 WHEN x = greatest(t.la, t.lb) THEN least(t.la, t.lb)
                 ELSE x END)
             ELSE t.L END
           FROM (SELECT eo.r, eo.a, eo.b, eo.w, st.L,
               st.L[eo.ia] AS la, st.L[eo.ib] AS lb
             FROM st JOIN eo ON eo.r = st.r + 1) t)
         SELECT a, b, w FROM st WHERE acc ORDER BY w, a, b""",

    // Kruskal over the same (w, a, b)-ordered edges with a union-find
    // label LIST in the recursive state: accept iff labels differ, then
    // rewrite the greater label to the smaller
    "q370_boruvka_mst" ->
      """WITH RECURSIVE hi AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem WHERE l_quantity >= 45),
         e0 AS (SELECT x.l_partkey AS a, y.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
             AND x.l_partkey < y.l_partkey GROUP BY 1, 2),
         e AS (SELECT a, b, CAST(1 + n % 7 AS BIGINT) AS w FROM e0),
         nd AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS ix
           FROM (SELECT a AS id FROM e UNION SELECT b FROM e)),
         cnt AS (SELECT COUNT(*) AS n FROM nd),
         eo AS (SELECT e.a, e.b, e.w, na.ix AS ia, nb.ix AS ib,
             ROW_NUMBER() OVER (ORDER BY e.w, e.a, e.b) AS r
           FROM e JOIN nd na ON na.id = e.a JOIN nd nb ON nb.id = e.b),
         init AS (SELECT range(1, n + 1) AS L FROM cnt),
         st(r, a, b, w, acc, L) AS (
           SELECT CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), FALSE, L
           FROM init
           UNION ALL
           SELECT t.r, t.a, t.b, t.w, t.la <> t.lb,
             CASE WHEN t.la <> t.lb THEN
               list_transform(t.L, x -> CASE
                 WHEN x = greatest(t.la, t.lb) THEN least(t.la, t.lb)
                 ELSE x END)
             ELSE t.L END
           FROM (SELECT eo.r, eo.a, eo.b, eo.w, st.L,
               st.L[eo.ia] AS la, st.L[eo.ib] AS lb
             FROM st JOIN eo ON eo.r = st.r + 1) t)
         SELECT a, b, w FROM st WHERE acc ORDER BY w, a, b""",

    // same rank identity in HUGEINT; ROW_NUMBER tie order is irrelevant
    // by the tie-invariance of sum(i * x)
    "q371_concentration" ->
      """WITH per AS (SELECT c_nationkey AS nk, o_custkey AS ck,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         r AS (SELECT nk, rev, ROW_NUMBER() OVER (PARTITION BY nk
             ORDER BY rev) AS rn FROM per),
         a AS (SELECT nk AS key, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(rev) AS HUGEINT) AS sv,
             CAST(SUM(CAST(rn AS HUGEINT) * rev) AS HUGEINT) AS siv,
             CAST(SUM(CAST(rev AS HUGEINT) * rev) AS HUGEINT) AS svv,
             CAST(MAX(rev) AS HUGEINT) AS mx
           FROM r GROUP BY 1)
         SELECT key, CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS total,
           CASE WHEN sv = 0 THEN NULL ELSE
             CAST(((2 * siv - (n + 1) * sv) * 1000000) // (n * sv)
               AS BIGINT) END AS gini_ppm,
           CASE WHEN sv = 0 THEN NULL ELSE
             CAST((svv * 1000000) // (sv * sv) AS BIGINT) END AS hhi_ppm,
           CASE WHEN sv = 0 THEN NULL ELSE
             CAST((mx * 1000000) // sv AS BIGINT) END AS top1_ppm
         FROM a ORDER BY key""",

    // the DP as list state: E = processed ends (non-decreasing), D = dp
    // table with leading 0; predecessor = count of ends <= start
    "q372_weighted_scheduling" ->
      """WITH RECURSIVE iv AS (SELECT user_id AS u, event_id AS i,
             epoch_us(CAST(ts AS TIMESTAMP)) AS st,
             epoch_us(CAST(ts AS TIMESTAMP))
               + CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
               AS en,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
           FROM events),
         o AS (SELECT u, st, en, vm, ROW_NUMBER() OVER (PARTITION BY u
             ORDER BY en, st, i) AS r FROM iv),
         rec(u, r, E, D) AS (
           SELECT DISTINCT u, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
             CAST([0] AS BIGINT[]) FROM o
           UNION ALL
           SELECT t.u, t.r, list_append(t.E, t.en),
             list_append(t.D, greatest(t.D[t.r], t.vm + t.D[t.c + 1]))
           FROM (SELECT rec.u, o.r, o.en, o.vm, rec.E, rec.D,
               len(list_filter(rec.E, e -> e <= o.st)) AS c
             FROM rec JOIN o ON o.u = rec.u AND o.r = rec.r + 1) t),
         fin AS (SELECT u, D, ROW_NUMBER() OVER (PARTITION BY u
             ORDER BY r DESC) AS rn FROM rec)
         SELECT f.u, CAST(len(f.D) - 1 AS BIGINT) AS n_intervals,
           CAST(f.D[len(f.D)] AS BIGINT) AS best_value
         FROM fin f WHERE f.rn = 1 ORDER BY u""",

    // same ppm floor recurrence as a recursive CTE over rank-ordered
    // (group, time) steps; n_risk = suffix sum including the current row
    "q373_kaplan_meier" ->
      """WITH RECURSIVE ev AS (SELECT user_id,
             event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tm FROM events),
         entry AS (SELECT user_id AS u, MIN(tm) AS ent FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
         subj AS (SELECT e.u, e.ent, MIN(d.tm) AS dt
           FROM entry e LEFT JOIN ev d ON d.user_id = e.u
             AND d.event_type = 'error' AND d.tm >= e.ent
           GROUP BY 1, 2),
         base AS (SELECT u % 3 AS g,
             (COALESCE(dt, (SELECT MAX(tm) FROM ev)) - ent) // 1000000
               AS dur,
             CASE WHEN dt IS NOT NULL THEN 1 ELSE 0 END AS ev FROM subj),
         agg AS (SELECT g, dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS m FROM base GROUP BY 1, 2),
         o AS (SELECT g, dur, d,
             CAST(SUM(m) OVER (PARTITION BY g ORDER BY dur
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS nr,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY dur) AS rn
           FROM agg),
         rec(g, rn, surv) AS (
           SELECT g, CAST(0 AS BIGINT), CAST(1000000 AS BIGINT)
           FROM (SELECT DISTINCT g FROM o)
           UNION ALL
           SELECT o.g, o.rn, CASE WHEN o.d = 0 THEN rec.surv
             ELSE (rec.surv * (o.nr - o.d)) // o.nr END
           FROM rec JOIN o ON o.g = rec.g AND o.rn = rec.rn + 1)
         SELECT o.g, o.dur AS t, o.nr AS n_risk, o.d, rec.surv AS surv_ppm
         FROM rec JOIN o ON o.g = rec.g AND o.rn = rec.rn
         WHERE o.d > 0 ORDER BY o.g, t""",

    // four conditional (sum,count) cells, common-denominator rational in
    // HUGEINT, one sign-split ppm floor
    "q374_did" ->
      """WITH b AS (SELECT event_type AS g, user_id % 2 AS tr,
             CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15 THEN 1 ELSE 0 END
               AS po,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         c AS (SELECT g,
             CAST(SUM(CASE WHEN tr = 1 AND po = 1 THEN v ELSE 0 END)
               AS HUGEINT) AS s11,
             CAST(SUM(CASE WHEN tr = 1 AND po = 1 THEN 1 ELSE 0 END)
               AS HUGEINT) AS n11,
             CAST(SUM(CASE WHEN tr = 1 AND po = 0 THEN v ELSE 0 END)
               AS HUGEINT) AS s10,
             CAST(SUM(CASE WHEN tr = 1 AND po = 0 THEN 1 ELSE 0 END)
               AS HUGEINT) AS n10,
             CAST(SUM(CASE WHEN tr = 0 AND po = 1 THEN v ELSE 0 END)
               AS HUGEINT) AS s01,
             CAST(SUM(CASE WHEN tr = 0 AND po = 1 THEN 1 ELSE 0 END)
               AS HUGEINT) AS n01,
             CAST(SUM(CASE WHEN tr = 0 AND po = 0 THEN v ELSE 0 END)
               AS HUGEINT) AS s00,
             CAST(SUM(CASE WHEN tr = 0 AND po = 0 THEN 1 ELSE 0 END)
               AS HUGEINT) AS n00
           FROM b GROUP BY 1),
         r AS (SELECT *,
             s11 * n10 * n01 * n00 - s10 * n11 * n01 * n00
               - s01 * n11 * n10 * n00 + s00 * n11 * n10 * n01 AS num,
             n11 * n10 * n01 * n00 AS den FROM c)
         SELECT g, CAST(n11 AS BIGINT) AS n_treat_post,
           CAST(n10 AS BIGINT) AS n_treat_pre,
           CAST(n01 AS BIGINT) AS n_ctrl_post,
           CAST(n00 AS BIGINT) AS n_ctrl_pre,
           CASE WHEN n11 = 0 THEN NULL WHEN s11 >= 0 THEN
             CAST((s11 * 1000000) // n11 AS BIGINT)
             ELSE -CAST(((-s11) * 1000000) // n11 AS BIGINT) END
             AS m_treat_post_ppm,
           CASE WHEN n10 = 0 THEN NULL WHEN s10 >= 0 THEN
             CAST((s10 * 1000000) // n10 AS BIGINT)
             ELSE -CAST(((-s10) * 1000000) // n10 AS BIGINT) END
             AS m_treat_pre_ppm,
           CASE WHEN n01 = 0 THEN NULL WHEN s01 >= 0 THEN
             CAST((s01 * 1000000) // n01 AS BIGINT)
             ELSE -CAST(((-s01) * 1000000) // n01 AS BIGINT) END
             AS m_ctrl_post_ppm,
           CASE WHEN n00 = 0 THEN NULL WHEN s00 >= 0 THEN
             CAST((s00 * 1000000) // n00 AS BIGINT)
             ELSE -CAST(((-s00) * 1000000) // n00 AS BIGINT) END
             AS m_ctrl_pre_ppm,
           CASE WHEN den = 0 THEN NULL WHEN num >= 0 THEN
             CAST((num * 1000000) // den AS BIGINT)
             ELSE -CAST(((-num) * 1000000) // den AS BIGINT) END AS did_ppm
         FROM r ORDER BY g""",

    // lag grid via range(), shifted equi-join, HUGEINT sufficient stats
    "q375_ccf_lag" ->
      """WITH hb AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
             AS hb,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS y
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY 1),
         l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(0, 7)),
         j AS (SELECT l.lag, a.x, b.y FROM l
           JOIN hb a ON TRUE JOIN hb b ON b.hb = a.hb + l.lag),
         st AS (SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy
           FROM j GROUP BY 1),
         f AS (SELECT lag, n, n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy FROM st)
         SELECT lag, CAST(n AS BIGINT) AS n,
           CASE WHEN dx = 0 OR dy = 0 THEN NULL
             WHEN num >= 0 THEN
               CAST((num * num * 1000000) // (dx * dy) AS BIGINT)
             ELSE -CAST((num * num * 1000000) // (dx * dy) AS BIGINT) END
             AS r2_signed_ppm
         FROM f ORDER BY lag""",

    // same running-peak windows; first-step tie via MIN over rn where
    // dd equals the group max (computed as a second window)
    "q376_drawdown" ->
      """WITH fl AS (SELECT user_id AS u,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tm, event_id AS i,
             CASE WHEN event_type = 'purchase' THEN
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             ELSE -CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             END AS v
           FROM events WHERE event_type IN ('purchase', 'error')),
         w AS (SELECT u, v,
             CAST(SUM(v) OVER (PARTITION BY u ORDER BY tm, i
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY tm, i) AS rn
           FROM fl),
         w2 AS (SELECT u, v, cum, rn,
             CAST(MAX(cum) OVER (PARTITION BY u ORDER BY rn
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak FROM w),
         w3 AS (SELECT u, v, cum, rn, peak, peak - cum AS dd,
             MAX(peak - cum) OVER (PARTITION BY u) AS mx FROM w2)
         SELECT u AS k, CAST(COUNT(*) AS BIGINT) AS n_steps,
           CAST(SUM(v) AS BIGINT) AS final_cum,
           CAST(MAX(peak) AS BIGINT) AS peak,
           CAST(MAX(dd) AS BIGINT) AS max_dd,
           CAST(MIN(CASE WHEN dd = mx THEN rn END) AS BIGINT) AS dd_step
         FROM w3 GROUP BY u ORDER BY k""",

    // global ROW_NUMBER rank (the oracle may; the engine replaces it
    // with per-score offsets), same bucket formula and HUGEINT rationals
    "q377_uplift_qini" ->
      """WITH per AS (SELECT user_id AS u,
             SUM(CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15
               AND event_type = 'click' THEN 1 ELSE 0 END) AS sc,
             SUM(CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS oc
           FROM events GROUP BY 1),
         r AS (SELECT u % 2 AS tr, oc,
             ROW_NUMBER() OVER (ORDER BY sc, u) AS rank,
             COUNT(*) OVER () AS n FROM per),
         b AS (SELECT ((rank - 1) * 10) // n + 1 AS bucket, tr, oc FROM r),
         p2 AS (SELECT bucket,
             CAST(SUM(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
             CAST(SUM(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nc,
             CAST(SUM(CASE WHEN tr = 1 THEN oc ELSE 0 END) AS HUGEINT) AS ct,
             CAST(SUM(CASE WHEN tr = 0 THEN oc ELSE 0 END) AS HUGEINT) AS cc
           FROM b GROUP BY 1),
         c AS (SELECT *,
             SUM(nt) OVER (ORDER BY bucket) AS cnt,
             SUM(nc) OVER (ORDER BY bucket) AS cnc,
             SUM(ct) OVER (ORDER BY bucket) AS cct,
             SUM(cc) OVER (ORDER BY bucket) AS ccc FROM p2)
         SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
           CAST(ct AS BIGINT) AS conv_treat, CAST(cc AS BIGINT) AS conv_ctrl,
           CASE WHEN nt = 0 OR nc = 0 THEN NULL
             WHEN ct * nc - cc * nt >= 0 THEN
               CAST(((ct * nc - cc * nt) * 1000000) // (nt * nc) AS BIGINT)
             ELSE -CAST(((cc * nt - ct * nc) * 1000000) // (nt * nc)
               AS BIGINT) END AS uplift_ppm,
           CASE WHEN cnc = 0 THEN NULL
             WHEN cct * cnc - ccc * cnt >= 0 THEN
               CAST(((cct * cnc - ccc * cnt) * 1000000) // cnc AS BIGINT)
             ELSE -CAST(((ccc * cnt - cct * cnc) * 1000000) // cnc
               AS BIGINT) END AS qini_ppm
         FROM c ORDER BY bucket""",

    // same centered RANGE window and sign-split phase means
    "q378_seasonal_decompose" ->
      """WITH daily AS (SELECT event_type AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
               AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         w AS (SELECT k, d AS t, v,
             COUNT(*) OVER (PARTITION BY k ORDER BY d
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nn,
             SUM(v) OVER (PARTITION BY k ORDER BY d
               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s
           FROM daily),
         t2 AS (SELECT k, t, v, s // 7 AS trend, v - s // 7 AS detr
           FROM w WHERE nn = 7),
         seas AS (SELECT k AS sk, t % 7 AS phase,
             CASE WHEN SUM(detr) >= 0 THEN SUM(detr) // COUNT(*)
               ELSE -((-SUM(detr)) // COUNT(*)) END AS seasonal
           FROM t2 GROUP BY 1, 2)
         SELECT t2.k, CAST(t2.t AS BIGINT) AS t, t2.v,
           CAST(t2.trend AS BIGINT) AS trend,
           CAST(seas.seasonal AS BIGINT) AS seasonal,
           CAST(t2.detr - seas.seasonal AS BIGINT) AS residual
         FROM t2 JOIN seas ON seas.sk = t2.k AND seas.phase = t2.t % 7
         ORDER BY t2.k, t2.t""",

    // lower median by rank, ties at the median dropped, lag sign changes
    "q379_runs_test" ->
      """WITH e AS (SELECT event_type AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tm, event_id AS i,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         m AS (SELECT k AS mk, v AS med FROM (SELECT k, v,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY k) AS n FROM e)
           WHERE rn = (n + 1) // 2),
         s AS (SELECT e.k, tm, i,
             CASE WHEN v > med THEN 1 ELSE -1 END AS sgn
           FROM e JOIN m ON mk = e.k WHERE v <> med),
         c AS (SELECT k, sgn, CASE
             WHEN LAG(sgn) OVER (PARTITION BY k ORDER BY tm, i) IS NULL
               THEN 1
             WHEN LAG(sgn) OVER (PARTITION BY k ORDER BY tm, i) <> sgn
               THEN 1 ELSE 0 END AS chg FROM s)
         SELECT k,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(chg) AS BIGINT) AS runs,
           CAST(1000000 + (2000000
               * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
               * SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END))
             // (SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
               + SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)) AS BIGINT)
             AS expected_runs_ppm
         FROM c GROUP BY k ORDER BY k""",

    // doubled midranks 2*RANK + ties - 1, running U2, first argmax
    "q380_pettitt" ->
      """WITH daily AS (SELECT event_type AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
               AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         r AS (SELECT k, d, v,
             RANK() OVER (PARTITION BY k ORDER BY v) AS rmin,
             COUNT(*) OVER (PARTITION BY k, v) AS ties,
             COUNT(*) OVER (PARTITION BY k) AS n FROM daily),
         u AS (SELECT k, n,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY d) AS step,
             SUM(2 * (2 * rmin + ties - 1) - 2 * (n + 1))
               OVER (PARTITION BY k ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS u2
           FROM r),
         f AS (SELECT k, n, step, u2, ABS(u2) AS a FROM u WHERE step < n),
         mx AS (SELECT k AS xk, MAX(a) AS ka FROM f GROUP BY 1),
         fin AS (SELECT f.k, f.n, f.step, f.u2,
             ROW_NUMBER() OVER (PARTITION BY f.k ORDER BY f.step) AS rn
           FROM f JOIN mx ON xk = f.k AND f.a = mx.ka)
         SELECT k, CAST(n AS BIGINT) AS n, CAST(ABS(u2) AS BIGINT)
             AS k_stat,
           CAST(step AS BIGINT) AS t_star_step, CAST(u2 AS BIGINT)
             AS u2_at_star
         FROM fin WHERE rn = 1 ORDER BY k""",

    // same extremes identity: b-events strictly between the unit's first
    // a and last c
    "q381_seq_patterns" ->
      """WITH e AS (SELECT user_id AS u, event_type AS ty,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tm FROM events),
         ext AS (SELECT u, ty, MIN(tm) AS fmin, MAX(tm) AS lmax
           FROM e GROUP BY 1, 2),
         supp AS (SELECT DISTINCT e.u, xa.ty AS a, e.ty AS b, xc.ty AS c
           FROM e
           JOIN ext xa ON xa.u = e.u AND xa.fmin < e.tm
           JOIN ext xc ON xc.u = e.u AND e.tm < xc.lmax),
         tot AS (SELECT COUNT(DISTINCT u) AS nu FROM e)
         SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS support,
           CAST((COUNT(*) * 1000000) // (SELECT nu FROM tot) AS BIGINT)
             AS support_ppm
         FROM supp GROUP BY 1, 2, 3 ORDER BY a, b, c""",

    // doubled pooled midranks vs within-sample positions; sign-split T
    "q382_cvm" ->
      """WITH e AS (SELECT user_id % 2 AS k,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS s,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events WHERE event_type IN ('click', 'view')),
         r AS (SELECT k, s, v,
             2 * RANK() OVER (PARTITION BY k ORDER BY v)
               + COUNT(*) OVER (PARTITION BY k, v) - 1 AS r2,
             ROW_NUMBER() OVER (PARTITION BY k, s ORDER BY v) AS i
           FROM e),
         a AS (SELECT k,
             CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS m,
             CAST(SUM(CASE WHEN s = 0 THEN (r2 - 2 * i) * (r2 - 2 * i)
               ELSE 0 END) AS HUGEINT) AS ux,
             CAST(SUM(CASE WHEN s = 1 THEN (r2 - 2 * i) * (r2 - 2 * i)
               ELSE 0 END) AS HUGEINT) AS uy
           FROM r GROUP BY 1),
         f AS (SELECT k, n, m, n * ux + m * uy AS u2,
             3 * (n * ux + m * uy) - 2 * n * m * (4 * n * m - 1) AS tn,
             12 * n * m * (n + m) AS td FROM a)
         SELECT k, CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
           CAST(u2 AS BIGINT) AS u2,
           CASE WHEN n = 0 OR m = 0 THEN NULL
             WHEN tn >= 0 THEN CAST((tn * 1000000) // td AS BIGINT)
             ELSE -CAST(((-tn) * 1000000) // td AS BIGINT) END AS t_ppm
         FROM f ORDER BY k""",

    // per-user paired indicators, discordant-cell chi-square ppm
    "q383_mcnemar" ->
      """WITH per AS (SELECT user_id AS u,
             MAX(CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS p0,
             MAX(CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS p1
           FROM events GROUP BY 1)
         SELECT u % 3 AS g,
           CAST(SUM(CASE WHEN p0 = 1 AND p1 = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS both,
           CAST(SUM(CASE WHEN p0 = 1 AND p1 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS pre_only,
           CAST(SUM(CASE WHEN p0 = 0 AND p1 = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS post_only,
           CAST(SUM(CASE WHEN p0 = 0 AND p1 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS neither,
           CASE WHEN SUM(CASE WHEN p0 <> p1 THEN 1 ELSE 0 END) = 0
             THEN NULL
             ELSE CAST(((SUM(CASE WHEN p0 = 1 AND p1 = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN p0 = 0 AND p1 = 1 THEN 1 ELSE 0 END))
               * (SUM(CASE WHEN p0 = 1 AND p1 = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN p0 = 0 AND p1 = 1 THEN 1 ELSE 0 END))
               * 1000000)
               // (SUM(CASE WHEN p0 = 1 AND p1 = 0 THEN 1 ELSE 0 END)
                 + SUM(CASE WHEN p0 = 0 AND p1 = 1 THEN 1 ELSE 0 END))
               AS BIGINT) END AS chi2_ppm
         FROM per GROUP BY 1 ORDER BY g""",

    // centered doubled midranks (mean n+1 known), Pearson on ranks
    "q384_spearman" ->
      """WITH e AS (SELECT event_type AS k,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x,
             epoch_us(CAST(ts AS TIMESTAMP)) AS y FROM events),
         r AS (SELECT k,
             2 * RANK() OVER (PARTITION BY k ORDER BY x)
               + COUNT(*) OVER (PARTITION BY k, x) - 1
               - (COUNT(*) OVER (PARTITION BY k) + 1) AS dx,
             2 * RANK() OVER (PARTITION BY k ORDER BY y)
               + COUNT(*) OVER (PARTITION BY k, y) - 1
               - (COUNT(*) OVER (PARTITION BY k) + 1) AS dy
           FROM e),
         a AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy
           FROM r GROUP BY 1)
         SELECT k, n,
           CASE WHEN sxx = 0 OR syy = 0 THEN NULL
             WHEN sxy >= 0 THEN
               CAST((sxy * sxy * 1000000) // (sxx * syy) AS BIGINT)
             ELSE -CAST((sxy * sxy * 1000000) // (sxx * syy) AS BIGINT)
             END AS rho2_signed_ppm
         FROM a ORDER BY k""",

    // same rank -> bucket -> suffix-sum sweep
    "q385_pr_curve" ->
      """WITH per AS (SELECT user_id AS u,
             SUM(CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 15
               AND event_type = 'click' THEN 1 ELSE 0 END) AS sc,
             MAX(CASE WHEN day(CAST(ts AS TIMESTAMP)) > 15
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS y
           FROM events GROUP BY 1),
         r AS (SELECT y, ROW_NUMBER() OVER (ORDER BY sc, u) AS rank,
             COUNT(*) OVER () AS n FROM per),
         b AS (SELECT ((rank - 1) * 10) // n + 1 AS bucket, y FROM r),
         p2 AS (SELECT bucket, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
           FROM b GROUP BY 1),
         c AS (SELECT *,
             CAST(SUM(pos) OVER (ORDER BY bucket ROWS BETWEEN CURRENT ROW
               AND UNBOUNDED FOLLOWING) AS BIGINT) AS tp,
             CAST(SUM(neg) OVER (ORDER BY bucket ROWS BETWEEN CURRENT ROW
               AND UNBOUNDED FOLLOWING) AS BIGINT) AS fp,
             CAST(SUM(pos) OVER () AS BIGINT) AS p_total FROM p2)
         SELECT CAST(bucket AS BIGINT) AS bucket, pos, neg, tp, fp,
           p_total - tp AS fn,
           CASE WHEN tp + fp = 0 THEN NULL
             ELSE (tp * 1000000) // (tp + fp) END AS precision_ppm,
           CASE WHEN p_total = 0 THEN NULL
             ELSE (tp * 1000000) // p_total END AS recall_ppm,
           CASE WHEN 2 * tp + fp + p_total - tp = 0 THEN NULL
             ELSE (2 * tp * 1000000) // (2 * tp + fp + p_total - tp) END
             AS f1_ppm
         FROM c ORDER BY bucket""",

    // the same 15 sufficient statistics in HUGEINT, pairs unioned
    "q386_corr_matrix" ->
      """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS disc_pct,
             CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax_pct,
             CAST(day(l_shipdate) AS BIGINT) AS ship_day FROM lineitem),
         a AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(qty) AS HUGEINT) AS s1,
             CAST(SUM(disc_pct) AS HUGEINT) AS s2,
             CAST(SUM(tax_pct) AS HUGEINT) AS s3,
             CAST(SUM(ship_day) AS HUGEINT) AS s4,
             CAST(SUM(qty * qty) AS HUGEINT) AS p11,
             CAST(SUM(qty * disc_pct) AS HUGEINT) AS p12,
             CAST(SUM(qty * tax_pct) AS HUGEINT) AS p13,
             CAST(SUM(qty * ship_day) AS HUGEINT) AS p14,
             CAST(SUM(disc_pct * disc_pct) AS HUGEINT) AS p22,
             CAST(SUM(disc_pct * tax_pct) AS HUGEINT) AS p23,
             CAST(SUM(disc_pct * ship_day) AS HUGEINT) AS p24,
             CAST(SUM(tax_pct * tax_pct) AS HUGEINT) AS p33,
             CAST(SUM(tax_pct * ship_day) AS HUGEINT) AS p34,
             CAST(SUM(ship_day * ship_day) AS HUGEINT) AS p44
           FROM b),
         pairs AS (
           SELECT 'qty' AS var_a, 'disc_pct' AS var_b, n,
             n * p12 - s1 * s2 AS num, n * p11 - s1 * s1 AS dx,
             n * p22 - s2 * s2 AS dy FROM a
           UNION ALL SELECT 'qty', 'tax_pct', n, n * p13 - s1 * s3,
             n * p11 - s1 * s1, n * p33 - s3 * s3 FROM a
           UNION ALL SELECT 'qty', 'ship_day', n, n * p14 - s1 * s4,
             n * p11 - s1 * s1, n * p44 - s4 * s4 FROM a
           UNION ALL SELECT 'disc_pct', 'tax_pct', n, n * p23 - s2 * s3,
             n * p22 - s2 * s2, n * p33 - s3 * s3 FROM a
           UNION ALL SELECT 'disc_pct', 'ship_day', n, n * p24 - s2 * s4,
             n * p22 - s2 * s2, n * p44 - s4 * s4 FROM a
           UNION ALL SELECT 'tax_pct', 'ship_day', n, n * p34 - s3 * s4,
             n * p33 - s3 * s3, n * p44 - s4 * s4 FROM a)
         SELECT var_a, var_b, CAST(n AS BIGINT) AS n,
           CASE WHEN dx = 0 OR dy = 0 THEN NULL
             WHEN num >= 0 THEN
               CAST((num * num * 1000000) // (dx * dy) AS BIGINT)
             ELSE -CAST((num * num * 1000000) // (dx * dy) AS BIGINT) END
             AS r2_signed_ppm
         FROM pairs ORDER BY var_a, var_b""",

    // recurrence replay: truncated-division smoothing steps sign-split,
    // the seasonal circular queue as list state (consume head, append)
    "q387_holt_winters" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
               AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         o AS (SELECT k, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY d)
             AS rn FROM daily),
         cnt AS (SELECT k, COUNT(*) AS n FROM o GROUP BY 1),
         init AS (SELECT k, CAST(CASE WHEN SUM(y) >= 0 THEN SUM(y) // 7
               ELSE -((-SUM(y)) // 7) END AS BIGINT) AS l
           FROM o WHERE rn <= 7 GROUP BY k HAVING COUNT(*) = 7),
         inits AS (SELECT i.k, i.l,
             list(CAST(o.y - i.l AS BIGINT) ORDER BY o.rn) AS s
           FROM init i JOIN o ON o.k = i.k AND o.rn <= 7
           GROUP BY i.k, i.l),
         rec(k, step, l, t, s) AS (
           SELECT k, CAST(7 AS BIGINT), l, CAST(0 AS BIGINT), s FROM inits
           UNION ALL
           SELECT w.k, w.step, w.l2,
             CASE WHEN 100000 * (w.l2 - w.l) + 900000 * w.t >= 0
               THEN (100000 * (w.l2 - w.l) + 900000 * w.t) // 1000000
               ELSE -((-(100000 * (w.l2 - w.l) + 900000 * w.t)) // 1000000)
               END,
             list_concat(w.s[2:], [CASE
               WHEN 200000 * (w.y - w.l2) + 800000 * w.sold >= 0
               THEN (200000 * (w.y - w.l2) + 800000 * w.sold) // 1000000
               ELSE -((-(200000 * (w.y - w.l2) + 800000 * w.sold))
                 // 1000000) END])
           FROM (SELECT rec.k, o.rn AS step, o.y, rec.l, rec.t, rec.s,
               rec.s[1] AS sold,
               CASE WHEN 300000 * (o.y - rec.s[1])
                   + 700000 * (rec.l + rec.t) >= 0
                 THEN (300000 * (o.y - rec.s[1])
                   + 700000 * (rec.l + rec.t)) // 1000000
                 ELSE -((-(300000 * (o.y - rec.s[1])
                   + 700000 * (rec.l + rec.t))) // 1000000) END AS l2
             FROM rec JOIN o ON o.k = rec.k AND o.rn = rec.step + 1) w)
         SELECT f.k, CAST(c.n AS BIGINT) AS n, CAST(f.l AS BIGINT)
             AS level, CAST(f.t AS BIGINT) AS trend,
           CAST(f.l + f.t + f.s[1] AS BIGINT) AS f1,
           CAST(f.l + 2 * f.t + f.s[2] AS BIGINT) AS f2,
           CAST(f.l + 3 * f.t + f.s[3] AS BIGINT) AS f3
         FROM rec f JOIN cnt c ON c.k = f.k AND f.step = c.n
         ORDER BY f.k""",

    // last-row-per-key via a window instead of the engine's struct argmax
    "q388_cdc_apply" ->
      """WITH ch AS (SELECT user_id AS u,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tm, event_id AS i,
             CASE WHEN event_type = 'signup' THEN 'I'
               WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         r AS (SELECT u, op, v,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY tm DESC, i DESC)
               AS rn,
             COUNT(*) OVER (PARTITION BY u) AS n_changes,
             SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
               OVER (PARTITION BY u) AS n_deletes
           FROM ch)
         SELECT u AS k, v AS value, CAST(n_changes AS BIGINT) AS n_changes,
           CAST(n_deletes AS BIGINT) AS n_deletes
         FROM r WHERE rn = 1 AND op <> 'D' ORDER BY k""",

    // the same lexicographic (cost, burstDays) Viterbi as a recursive CTE
    "q389_burst_viterbi" ->
      """WITH RECURSIVE daily AS (SELECT event_type AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
         o AS (SELECT k, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY d)
             AS rn, COUNT(*) OVER (PARTITION BY k) AS n FROM daily),
         m AS (SELECT k AS mk, y AS med FROM (SELECT k, y,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY y) AS r,
             COUNT(*) OVER (PARTITION BY k) AS n FROM daily)
           WHERE r = (n + 1) // 2),
         o2 AS (SELECT o.k, o.rn, o.n, o.y, m.med, 3 * m.med AS r1
           FROM o JOIN m ON mk = o.k),
         rec(k, rn, c0, d0, c1, d1) AS (
           SELECT k, CAST(1 AS BIGINT), ABS(y - med), CAST(0 AS BIGINT),
             ABS(y - r1), CAST(1 AS BIGINT) FROM o2 WHERE rn = 1
           UNION ALL
           SELECT t.k, t.rn,
             ABS(t.y - t.med) + CASE WHEN t.p0 THEN t.c0
               ELSE t.c1 + t.med END,
             CASE WHEN t.p0 THEN t.d0 ELSE t.d1 END,
             ABS(t.y - t.r1) + CASE WHEN t.p1 THEN t.c1
               ELSE t.c0 + t.med END,
             CASE WHEN t.p1 THEN t.d1 ELSE t.d0 END + 1
           FROM (SELECT o2.k, o2.rn, o2.y, o2.med, o2.r1,
               rec.c0, rec.d0, rec.c1, rec.d1,
               (rec.c0 < rec.c1 + o2.med OR (rec.c0 = rec.c1 + o2.med
                 AND rec.d0 <= rec.d1)) AS p0,
               (rec.c1 < rec.c0 + o2.med OR (rec.c1 = rec.c0 + o2.med
                 AND rec.d1 <= rec.d0)) AS p1
             FROM rec JOIN o2 ON o2.k = rec.k AND o2.rn = rec.rn + 1) t)
         SELECT r.k, CAST(o2.n AS BIGINT) AS n_days, o2.med AS base_rate,
           o2.r1 AS burst_rate,
           CASE WHEN r.c0 < r.c1 OR (r.c0 = r.c1 AND r.d0 <= r.d1)
             THEN r.c0 ELSE r.c1 END AS min_cost,
           CASE WHEN r.c0 < r.c1 OR (r.c0 = r.c1 AND r.d0 <= r.d1)
             THEN r.d0 ELSE r.d1 END AS burst_days
         FROM rec r JOIN o2 ON o2.k = r.k AND o2.rn = r.rn
           AND r.rn = o2.n
         ORDER BY r.k""",

    // Kadane as prefix windows: P_t - min(0, min P_{<t}), first argmax
    "q390_best_streak" ->
      """WITH fl AS (SELECT user_id AS u,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tm, event_id AS i,
             CASE WHEN event_type = 'purchase' THEN
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             ELSE -CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             END AS v
           FROM events WHERE event_type IN ('purchase', 'error')),
         w AS (SELECT u, v,
             CAST(SUM(v) OVER (PARTITION BY u ORDER BY tm, i
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY tm, i) AS rn
           FROM fl),
         w2 AS (SELECT u, v, rn, pre - LEAST(0, COALESCE(MIN(pre)
             OVER (PARTITION BY u ORDER BY rn ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0)) AS endbest FROM w),
         w3 AS (SELECT u, v, rn, endbest,
             MAX(endbest) OVER (PARTITION BY u) AS mx FROM w2)
         SELECT u AS k, CAST(COUNT(*) AS BIGINT) AS n_steps,
           CAST(SUM(v) AS BIGINT) AS total, CAST(MAX(endbest) AS BIGINT)
             AS best_sum,
           CAST(MIN(CASE WHEN endbest = mx THEN rn END) AS BIGINT)
             AS best_end_step
         FROM w3 GROUP BY u ORDER BY k""",

    // ascending revenue rank -> equal-count buckets -> cumulative share
    "q391_lorenz" ->
      """WITH per AS (SELECT o_custkey AS ck,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS rev
           FROM orders GROUP BY 1),
         r AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, ck) AS rank,
             COUNT(*) OVER () AS n FROM per),
         b AS (SELECT ((rank - 1) * 10) // n + 1 AS bucket, rev FROM r),
         p2 AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS BIGINT) AS bucket_sum FROM b GROUP BY 1),
         c AS (SELECT *, CAST(SUM(bucket_sum) OVER (ORDER BY bucket)
               AS BIGINT) AS cum,
             CAST(SUM(bucket_sum) OVER () AS BIGINT) AS total FROM p2)
         SELECT CAST(bucket AS BIGINT) AS bucket, n, bucket_sum,
           CASE WHEN total = 0 THEN NULL
             ELSE (cum * 1000000) // total END AS cum_share_ppm
         FROM c ORDER BY bucket""",

    // category pair-match probability without replacement
    "q392_simpson_diversity" ->
      """WITH c AS (SELECT source AS g, lang, CAST(COUNT(*) AS BIGINT)
             AS ni FROM documents GROUP BY 1, 2),
         a AS (SELECT g, CAST(SUM(ni) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k_distinct,
             CAST(SUM(ni * (ni - 1)) AS BIGINT) AS match2 FROM c
           GROUP BY 1)
         SELECT g, n, k_distinct,
           CASE WHEN n < 2 THEN NULL
             ELSE (match2 * 1000000) // (n * (n - 1)) END AS simpson_ppm,
           CASE WHEN n < 2 THEN NULL
             ELSE 1000000 - (match2 * 1000000) // (n * (n - 1)) END
             AS diversity_ppm
         FROM a ORDER BY g""",

    // same rank-quartile symbols, day-lead 3-grams, (count, motif) argmax
    "q393_motifs" ->
      """WITH daily AS (SELECT event_type AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
         r AS (SELECT k, d,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY y, d) AS rnk,
             COUNT(*) OVER (PARTITION BY k) AS n FROM daily),
         s AS (SELECT k, d, n, ((rnk - 1) * 4) // n + 1 AS sym FROM r),
         g AS (SELECT k, n, sym,
             LEAD(sym, 1) OVER (PARTITION BY k ORDER BY d) AS s1,
             LEAD(sym, 2) OVER (PARTITION BY k ORDER BY d) AS s2 FROM s),
         mc AS (SELECT k, CAST(MAX(n) AS BIGINT) AS n_obs,
             CAST(sym AS VARCHAR) || '-' || CAST(s1 AS VARCHAR) || '-'
               || CAST(s2 AS VARCHAR) AS motif,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM g WHERE s2 IS NOT NULL GROUP BY k, motif),
         mx AS (SELECT k, MAX(cnt) AS mc FROM mc GROUP BY 1)
         SELECT mc.k, mc.n_obs, MIN(mc.motif) AS top_motif,
           CAST(MAX(mx.mc) AS BIGINT) AS motif_count
         FROM mc JOIN mx ON mx.k = mc.k AND mc.cnt = mx.mc
         GROUP BY mc.k, mc.n_obs ORDER BY mc.k""",

    // the variable + dynamic SQL collapse to a plain parameterized query
    "q394_sql_variables" ->
      """WITH cut AS (SELECT CAST(SUM(CAST(CAST(o_totalprice
               AS DECIMAL(18,2)) * 100 AS BIGINT)) // COUNT(*) AS BIGINT)
             AS c FROM orders)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
               * 100 AS BIGINT) > (SELECT c FROM cut) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_above,
           (SELECT c FROM cut) AS cut_cents
         FROM orders GROUP BY 1 ORDER BY 1""",

    // q129's edge chain + degrees; wedge denominator C(deg,2)
    "q395_clustering_coeff" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         e AS (
           SELECT id_a AS a, id_b AS b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
           FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
           GROUP BY 1),
         tri AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e e1 JOIN e e2 ON e1.b = e2.a
           JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
         corners AS (
           SELECT x AS id FROM tri UNION ALL
           SELECT y FROM tri UNION ALL SELECT z FROM tri),
         tc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
           FROM corners GROUP BY 1)
         SELECT d.id, d.degree,
           COALESCE(tc.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree < 2 THEN NULL
             ELSE (COALESCE(tc.n_triangles, 0) * 1000000)
               // ((d.degree * (d.degree - 1)) // 2) END AS coeff_ppm
         FROM deg d LEFT JOIN tc ON tc.id = d.id ORDER BY d.id""",

    // two mechanically-unrolled peel rounds (support >= k-2 = 1), then
    // the final support readout — the q216-style unroll discipline
    "q396_ktruss" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         e0 AS (
           SELECT id_a AS a, id_b AS b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         c1 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e0 e1
           JOIN e0 e2 ON e1.b = e2.a
           JOIN e0 e3 ON e1.a = e3.a AND e2.b = e3.b),
         n1 AS (SELECT a, b, COUNT(*) AS n FROM (
             SELECT x AS a, y AS b FROM c1 UNION ALL
             SELECT y, z FROM c1 UNION ALL SELECT x, z FROM c1)
           GROUP BY 1, 2),
         e1r AS (SELECT e0.a, e0.b FROM e0 JOIN n1 USING (a, b)
           WHERE n1.n >= 1),
         c2 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e1r e1
           JOIN e1r e2 ON e1.b = e2.a
           JOIN e1r e3 ON e1.a = e3.a AND e2.b = e3.b),
         n2 AS (SELECT a, b, COUNT(*) AS n FROM (
             SELECT x AS a, y AS b FROM c2 UNION ALL
             SELECT y, z FROM c2 UNION ALL SELECT x, z FROM c2)
           GROUP BY 1, 2),
         e2r AS (SELECT e1r.a, e1r.b FROM e1r JOIN n2 USING (a, b)
           WHERE n2.n >= 1),
         c3 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e2r e1
           JOIN e2r e2 ON e1.b = e2.a
           JOIN e2r e3 ON e1.a = e3.a AND e2.b = e3.b),
         n3 AS (SELECT a, b, COUNT(*) AS n FROM (
             SELECT x AS a, y AS b FROM c3 UNION ALL
             SELECT y, z FROM c3 UNION ALL SELECT x, z FROM c3)
           GROUP BY 1, 2)
         SELECT e2r.a AS id_a, e2r.b AS id_b,
           CAST(COALESCE(n3.n, 0) AS BIGINT) AS support
         FROM e2r LEFT JOIN n3 USING (a, b) ORDER BY id_a, id_b""",

    // three global rankings (the oracle may), same bucket formula
    "q397_rfm" ->
      """WITH per AS (SELECT user_id AS u,
             MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS last_d,
             CAST(COUNT(*) AS BIGINT) AS fq,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
               AS BIGINT)) AS BIGINT) AS mo
           FROM events GROUP BY 1),
         rf AS (SELECT u, (SELECT MAX(last_d) FROM per) - last_d AS rd,
             fq, mo FROM per),
         rr AS (SELECT u, rd, fq, mo,
             ROW_NUMBER() OVER (ORDER BY -rd, u) AS kr,
             ROW_NUMBER() OVER (ORDER BY fq, u) AS kf,
             ROW_NUMBER() OVER (ORDER BY mo, u) AS km,
             COUNT(*) OVER () AS n FROM rf),
         sc AS (SELECT u, rd, fq, mo,
             ((kr - 1) * 5) // n + 1 AS r_score,
             ((kf - 1) * 5) // n + 1 AS f_score,
             ((km - 1) * 5) // n + 1 AS m_score FROM rr)
         SELECT u, CAST(rd AS BIGINT) AS recency_days, fq AS n_events,
           mo AS monetary, CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
             AS rfm_code
         FROM sc ORDER BY u""",

    // q373's subjects with a parity cohort; suffix-sum risk sets, one
    // sign-split ppm per event time — no recursion needed
    "q398_logrank" ->
      """WITH ev AS (SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tm FROM events),
         entry AS (SELECT user_id AS u, MIN(tm) AS ent FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
         subj AS (SELECT e.u, e.ent, MIN(d.tm) AS dt
           FROM entry e LEFT JOIN ev d ON d.user_id = e.u
             AND d.event_type = 'error' AND d.tm >= e.ent
           GROUP BY 1, 2),
         base AS (SELECT u % 2 AS g,
             (COALESCE(dt, (SELECT MAX(tm) FROM ev)) - ent) // 1000000
               AS dur,
             CASE WHEN dt IS NOT NULL THEN 1 ELSE 0 END AS ev FROM subj),
         st AS (SELECT dur AS t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1
           FROM base GROUP BY 1),
         w AS (SELECT t, d, d1,
             CAST(SUM(m) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
               UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
             CAST(SUM(m1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
               UNBOUNDED FOLLOWING) AS BIGINT) AS n1_risk FROM st)
         SELECT t, n_risk, n1_risk, d, d1,
           CASE WHEN d1 * n_risk - d * n1_risk >= 0 THEN
             ((d1 * n_risk - d * n1_risk) * 1000000) // n_risk
           ELSE -(((d * n1_risk - d1 * n_risk) * 1000000) // n_risk) END
             AS oe_ppm
         FROM w WHERE d > 0 ORDER BY t""",

    // The CSV round trip is lossless, so the answer is the source rows.
    "q399_read_csv" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderpriority
         FROM orders ORDER BY o_orderkey""",

    // positional 3-gram expansion replayed relationally (range +
    // list_transform + unnest of (pos, gram) structs), same tokenizer as
    // the q50 oracle; short docs (range upper bound clamped to 0) emit
    // nothing, matching the UDTF.
    "q400_udtf_ngrams" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         g AS (
           SELECT unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
             i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
                              gram := array_to_string(toks[i:i+2], ' ')))) AS e
           FROM t)
         SELECT e.gram AS gram, count(*) AS n, CAST(sum(e.pos) AS BIGINT) AS pos_sum
         FROM g GROUP BY 1 HAVING count(*) >= 3
         ORDER BY n DESC, gram LIMIT 100""",

    // Same tokenizer replay as q400, parameter minLen=8 inlined; the
    // UDTF-through-SQL-function plumbing is the thing under test, the
    // token math replays exactly. minLen=5/support>=3 sized so the sf0.01
    // gate checks a multi-row result (15 rows), not a near-empty one.
    "q401_udtf_sql_function" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         p AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(toks) + 1),
               i -> struct_pack(pos := CAST(i - 1 AS BIGINT), tok := toks[i]))) AS e
           FROM t),
         f AS (SELECT doc_id, e.pos AS pos, e.tok AS tok FROM p WHERE len(e.tok) >= 5)
         SELECT tok, count(*) AS n, CAST(min(pos) AS BIGINT) AS first_pos,
                count(DISTINCT doc_id) AS n_docs
         FROM f GROUP BY 1 HAVING count(*) >= 3
         ORDER BY n DESC, tok LIMIT 50""",

    // q79's l2 argmin replay per half, cell counts full-outer joined,
    // growth as sign-split floor ppm.
    "q316_ivf_cell_drift" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         s AS (
           SELECT e.vec_id AS id, e.vec_id % 2 AS half, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
           FROM e CROSS JOIN c),
         a AS (SELECT id, half, cid FROM (
             SELECT id, half, cid, row_number() OVER (PARTITION BY id
               ORDER BY d, cid) AS rn FROM s) WHERE rn = 1),
         c0 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_old
           FROM a WHERE half = 0 GROUP BY cid),
         c1 AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_new
           FROM a WHERE half = 1 GROUP BY cid),
         j AS (SELECT COALESCE(c0.cid, c1.cid) AS cid,
             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
           FROM c0 FULL OUTER JOIN c1 ON c0.cid = c1.cid)
         SELECT CAST(cid AS BIGINT) AS cid, n_old, n_new,
           CAST(CASE WHEN n_old = 0 THEN NULL
             WHEN n_new >= n_old THEN ((n_new - n_old) * 1000000) // n_old
             ELSE -(((n_old - n_new) * 1000000) // n_old) END AS BIGINT) AS growth_ppm
         FROM j ORDER BY cid""",

    // per-line micros summed exactly, header micros, FULL OUTER, one
    // report row; NULL sides fall out of the equality sums on both
    // engines identically.
    "q317_order_reconciliation" ->
      """WITH o AS (SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS o_mic
           FROM orders),
         l AS (SELECT l_orderkey,
             CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
               AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS rev_mic
           FROM lineitem GROUP BY 1),
         j AS (SELECT o.o_orderkey, l.l_orderkey, o.o_mic, l.rev_mic
           FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey)
         SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphan_lines,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lineless,
           CAST(SUM(CASE WHEN o_mic = rev_mic THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN ABS(o_mic - rev_mic) <= 10000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_within_cent,
           CAST(MAX(ABS(o_mic - rev_mic)) AS BIGINT) AS max_abs_diff_mic
         FROM j""",

    // the q94 FNV chain per (key, candidate shard) pushed through one
    // xorshift64 round (<<13, >>>7, <<17) in HUGEINT mod 2^64; SIGNED
    // argmax with ties to the smaller shard.
    "q315_rendezvous_resize" ->
      """WITH k AS (SELECT c_custkey AS id FROM customer),
         cand AS (SELECT id, s.s AS s,
             CAST(s.s AS VARCHAR) || ':' || CAST(id AS VARCHAR) AS key
           FROM k, LATERAL (SELECT unnest(range(0, 9)) AS s) s),
         hv AS (SELECT id, s, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(key, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211)
               % CAST('18446744073709551616' AS HUGEINT)) AS h
           FROM cand),
         z1 AS (SELECT id, s, xor(h, (h * 8192)
             % CAST('18446744073709551616' AS HUGEINT)) AS z FROM hv),
         z2 AS (SELECT id, s, xor(z, z // 128) AS z FROM z1),
         z3 AS (SELECT id, s, xor(z, (z * 131072)
             % CAST('18446744073709551616' AS HUGEINT)) AS h FROM z2),
         hs AS (SELECT id, s,
             CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
               THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS h
           FROM z3),
         a8 AS (SELECT id, s AS shard8 FROM (
             SELECT id, s, ROW_NUMBER() OVER (PARTITION BY id
               ORDER BY h DESC, s) AS rk FROM hs WHERE s < 8) WHERE rk = 1),
         a9 AS (SELECT id, s AS shard9 FROM (
             SELECT id, s, ROW_NUMBER() OVER (PARTITION BY id
               ORDER BY h DESC, s) AS rk FROM hs) WHERE rk = 1),
         j AS (SELECT a8.id, a8.shard8, a9.shard9
           FROM a8 JOIN a9 ON a8.id = a9.id),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved_total FROM j)
         SELECT CAST(j.shard8 AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN j.shard8 <> j.shard9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           CAST((SUM(CASE WHEN j.shard8 <> j.shard9 THEN 1 ELSE 0 END) * 1000000)
             // COUNT(*) AS BIGINT) AS moved_ppm,
           tot.n_total, tot.n_moved_total,
           CAST((tot.n_moved_total * 1000000) // tot.n_total AS BIGINT)
             AS moved_total_ppm
         FROM j, tot
         GROUP BY j.shard8, tot.n_total, tot.n_moved_total
         ORDER BY shard""",

    // q79's decimal-mean rule per split, per-dim diffs, the l2 fold in
    // dim order (list_sum over list_transform — the q230 IEEE-sequence
    // convention); every output rounds to 6.
    "q313_embedding_drift" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         xr AS (SELECT t.i AS dim, CAST(v[t.i] AS DECIMAL(30,12)) AS xd
           FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) t
           WHERE vec_id % 2 = 0),
         xc AS (SELECT t.i AS dim, CAST(v[t.i] AS DECIMAL(30,12)) AS xd
           FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) t
           WHERE vec_id % 2 = 1),
         cr AS (SELECT dim, CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS c_ref,
             CAST(COUNT(*) AS BIGINT) AS n_ref FROM xr GROUP BY dim),
         cc AS (SELECT dim, CAST(SUM(xd) AS DOUBLE) / COUNT(*) AS c_cur,
             CAST(COUNT(*) AS BIGINT) AS n_cur FROM xc GROUP BY dim),
         j AS (SELECT cr.dim, cr.c_ref, cc.c_cur, cr.n_ref, cc.n_cur
           FROM cr JOIN cc USING (dim)),
         f AS (SELECT round(list_sum(list_transform(
               list_sort(list(ROW(dim, c_cur - c_ref))),
               r -> r[2] * r[2])), 6) AS shift_l2sq
           FROM j)
         SELECT CAST(j.dim AS BIGINT) AS dim, round(j.c_ref, 6) AS c_ref,
           round(j.c_cur, 6) AS c_cur, round(j.c_cur - j.c_ref, 6) AS diff,
           j.n_ref, j.n_cur, f.shift_l2sq
         FROM j, f ORDER BY dim""",

    // q50's recursive-CTE components rolled up to the size histogram.
    "q314_dup_cluster_sizes" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes0 AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes0 sa ON sa.doc_id = id_a
           JOIN sizes0 sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
         csz AS (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS sz
           FROM comp GROUP BY component_id),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(SUM(sz) AS BIGINT) AS n_docs_paired,
             CAST(MAX(sz) AS BIGINT) AS largest FROM csz)
         SELECT csz.sz, CAST(COUNT(*) AS BIGINT) AS n_comps,
           tot.n_components, tot.n_docs_paired, tot.largest
         FROM csz, tot GROUP BY csz.sz, tot.n_components, tot.n_docs_paired, tot.largest
         ORDER BY csz.sz""",

    // q298's weight chain with GROUP BY (event_type, rep); totals per
    // group ride every row.
    "q310_bootstrap_grouped" ->
      """WITH ev AS (SELECT event_type AS g, event_id AS id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         t AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS total_sum FROM ev GROUP BY g),
         r AS (SELECT g, id, v, rep
           FROM ev, LATERAL (SELECT unnest(range(0, 16)) AS rep) u),
         h AS (SELECT g, rep, v,
             ((((id * 1000003 + rep) % 2147483648) * 2654435761)
               % 4294967296) AS h1 FROM r),
         w AS (SELECT g, rep, v,
             CASE WHEN u < 24109 THEN 0 WHEN u < 48218 THEN 1
               WHEN u < 60273 THEN 2 ELSE 3 END AS w
           FROM (SELECT g, rep, v,
               (((xor(h1, h1 // 65536)) * 40503) % 4294967296) // 65536 AS u
             FROM h))
         SELECT w.g AS event_type, CAST(rep AS BIGINT) AS rep,
           CAST(SUM(w.w) AS BIGINT) AS n_eff,
           CAST(SUM(w.w * w.v) AS BIGINT) AS boot_sum, t.n, t.total_sum
         FROM w JOIN t ON w.g = t.g
         GROUP BY w.g, rep, t.n, t.total_sum
         ORDER BY event_type, rep""",

    // jittered arrival replayed with the same hash; running event-time
    // max over the arrival order; p95 = lower weighted quantile with
    // weight 1 (cum·1e6 >= n·950000 over distinct lateness values).
    "q311_lateness_profile" ->
      """WITH ev AS (SELECT event_type AS k, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus
           FROM events),
         h AS (SELECT k, event_id, tus,
             ((((event_id * 1000003) % 2147483648) * 2654435761)
               % 4294967296) AS h1 FROM ev),
         a AS (SELECT k, tus,
             (tus + ((((xor(h1, h1 // 65536)) * 40503) % 4294967296) // 65536)
               * 109863 - 3600000000) * 1000 + event_id % 1000 AS arrival
           FROM h),
         late AS (SELECT k,
             GREATEST(COALESCE(MAX(tus) OVER (PARTITION BY k ORDER BY arrival
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - tus, 0), 0) AS late
           FROM a),
         summary AS (SELECT k AS key, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(MAX(late) AS BIGINT) AS max_late_us
           FROM late GROUP BY k),
         pv AS (SELECT k, late, CAST(COUNT(*) AS BIGINT) AS vw
           FROM late GROUP BY k, late),
         cum AS (SELECT k, late,
             CAST(SUM(vw) OVER (PARTITION BY k ORDER BY late) AS BIGINT) AS cum
           FROM pv),
         tt AS (SELECT k, MAX(cum) AS total FROM cum GROUP BY k),
         pick AS (SELECT c.k, c.late,
             ROW_NUMBER() OVER (PARTITION BY c.k ORDER BY c.late) AS rk
           FROM cum c JOIN tt ON c.k = tt.k
           WHERE c.cum * 1000000 >= tt.total * 950000)
         SELECT s.key, s.n, s.n_late,
           CAST((s.n_late * 1000000) // s.n AS BIGINT) AS late_ppm,
           s.max_late_us, CAST(p.late AS BIGINT) AS p95_late_us
         FROM summary s JOIN pick p ON s.key = p.k AND p.rk = 1
         ORDER BY s.key""",

    // q195's share/TVD replay over exploded tokens.
    "q312_vocab_drift" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_filter(
             string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS term
           FROM documents),
         r AS (SELECT term, CAST(count(*) AS BIGINT) AS n_ref
               FROM tok WHERE doc_id % 2 = 0 GROUP BY term),
         c AS (SELECT term, CAST(count(*) AS BIGINT) AS n_cur
               FROM tok WHERE doc_id % 2 = 1 GROUP BY term),
         j AS (
           SELECT COALESCE(r.term, c.term) AS category,
             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
           FROM r FULL OUTER JOIN c ON r.term = c.term),
         t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
                 CAST(sum(n_cur) AS BIGINT) AS t_cur FROM j),
         sh AS (
           SELECT category, n_ref, n_cur,
             CASE WHEN t_ref = 0 THEN 0 ELSE (n_ref * 1000000) // t_ref END AS share_ref_ppm,
             CASE WHEN t_cur = 0 THEN 0 ELSE (n_cur * 1000000) // t_cur END AS share_cur_ppm
           FROM j CROSS JOIN t),
         df_ AS (
           SELECT *, abs(share_cur_ppm - share_ref_ppm) AS diff_ppm FROM sh),
         tv AS (SELECT CAST(sum(diff_ppm) // 2 AS BIGINT) AS tvd_ppm FROM df_)
         SELECT category, n_ref, n_cur,
           CAST(share_ref_ppm AS BIGINT) AS share_ref_ppm,
           CAST(share_cur_ppm AS BIGINT) AS share_cur_ppm,
           CAST(diff_ppm AS BIGINT) AS diff_ppm, tv.tvd_ppm
         FROM df_ CROSS JOIN tv ORDER BY category""",

    // q191's FNV/rho chain per (hour, bucket), window fan-out, register
    // max, per-window harmonic sum at scale 56; exact distinct rides.
    "q307_sliding_dau_hll" ->
      """WITH ev AS (SELECT
             epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h,
             CAST(user_id AS VARCHAR) AS s
           FROM events),
         hs AS (SELECT DISTINCT h, s FROM ev),
         uh AS (SELECT h, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(s, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211)
               % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM hs),
         rr AS (SELECT h, CAST(u % 64 AS BIGINT) AS bucket,
             CASE WHEN u // 64 = 0 THEN 59
               ELSE bit_count(((u // 64) & -(u // 64)) - 1) + 1 END AS rho
           FROM uh),
         hourly AS (SELECT h, bucket, MAX(rho) AS register
           FROM rr GROUP BY h, bucket),
         fan AS (SELECT h - k.k * 3600000000 AS win_start_us, bucket, register
           FROM hourly, LATERAL (SELECT unnest(range(0, 24)) AS k) k),
         sparse AS (SELECT win_start_us, bucket, MAX(register) AS register
           FROM fan GROUP BY 1, 2),
         wins AS (SELECT DISTINCT win_start_us FROM fan),
         spine AS (SELECT w.win_start_us, b.bucket
           FROM wins w, LATERAL (SELECT unnest(range(0, 64)) AS bucket) b),
         filled AS (SELECT sp.win_start_us, sp.bucket,
             CAST(COALESCE(s.register, 0) AS BIGINT) AS register
           FROM spine sp LEFT JOIN sparse s
             ON sp.win_start_us = s.win_start_us AND sp.bucket = s.bucket),
         summ AS (SELECT win_start_us,
             CAST(SUM(CASE WHEN register <= 56
               THEN CAST(1 AS BIGINT) << (56 - register) ELSE 0 END) AS BIGINT) AS s_scaled
           FROM filled GROUP BY win_start_us),
         ex AS (SELECT win_start_us,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
           FROM (SELECT user_id,
               epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) - k.k * 3600000000
                 AS win_start_us
             FROM events, LATERAL (SELECT unnest(range(0, 24)) AS k) k)
           GROUP BY win_start_us)
         SELECT f.win_start_us, CAST(f.bucket AS BIGINT) AS bucket, f.register,
           summ.s_scaled, ex.n_exact
         FROM filled f JOIN summ USING (win_start_us) JOIN ex USING (win_start_us)
         ORDER BY win_start_us, bucket""",

    // stream == batch: q301's oracle verbatim.
    "q308_ohlc_stream" ->
      """WITH ev AS (SELECT event_type AS key,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             ts, event_id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         r AS (SELECT key, bucket, v,
             ROW_NUMBER() OVER (PARTITION BY key, bucket
               ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY key, bucket
               ORDER BY ts DESC, event_id DESC) AS rd
           FROM ev)
         SELECT key, epoch_us(bucket) AS bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS open,
           CAST(MAX(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS close,
           CAST(MAX(v) AS BIGINT) AS high, CAST(MIN(v) AS BIGINT) AS low,
           CAST(SUM(v) AS BIGINT) AS sum_v
         FROM r GROUP BY key, bucket ORDER BY key, bucket_us""",

    // truth = q34's trigram-Jaccard chain at 0.5; candidates = q208's
    // rank-window pairs canonicalized; counts + floor-ppm scores.
    "q309_blocking_eval" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
               x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         truth AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
         hsf AS (
           SELECT doc_id, list_transform(toks[1:3], tok ->
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211)
                 % CAST('18446744073709551616' AS HUGEINT))) AS hlist
           FROM t),
         fp AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT), hlist),
               (acc, h) -> xor((acc * 32) % CAST('18446744073709551616' AS HUGEINT)
                               + acc // CAST('576460752303423488' AS HUGEINT), h)) AS u
           FROM hsf),
         k AS (
           SELECT doc_id,
             CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS k
           FROM fp),
         r AS (SELECT doc_id, k, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM k),
         cand AS (
           SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
             greatest(a.doc_id, b.doc_id) AS id_b
           FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7),
         tp AS (SELECT t2.id_a FROM truth t2 JOIN cand
           ON t2.id_a = cand.id_a AND t2.id_b = cand.id_b),
         c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand),
         c3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tp FROM tp)
         SELECT c1.n_truth, c2.n_cand, c3.n_tp,
           CAST(CASE WHEN c2.n_cand = 0 THEN NULL
             ELSE (c3.n_tp * 1000000) // c2.n_cand END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN c1.n_truth = 0 THEN NULL
             ELSE (c3.n_tp * 1000000) // c1.n_truth END AS BIGINT) AS recall_ppm
         FROM c1, c2, c3""",

    // q76's quantize replay feeding the same (i, j) sign-mix; list_sum
    // over 0-based range indices.
    "q305_jl_projection" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         p AS (
           SELECT vec_id, v, list_min(v) AS mn,
             (list_max(v) - list_min(v)) / 255.0 AS scale
           FROM e),
         q AS (
           SELECT vec_id,
             list_transform(v, x -> CASE WHEN scale = 0 THEN 0
               ELSE CAST(least(greatest(floor((x - mn) / scale + 0.5), 0), 255)
                 AS BIGINT) END) AS qs
           FROM p),
         proj AS (
           SELECT vec_id, jj.j AS j,
             CAST(list_sum(list_transform(range(0, len(qs)), i ->
               qs[i + 1] * (1 - 2 * ((((xor(
                 (((i * 16 + jj.j) * 1000003 % 2147483648) * 2654435761) % 4294967296,
                 ((((i * 16 + jj.j) * 1000003 % 2147483648) * 2654435761) % 4294967296)
                   // 65536) * 40503) % 4294967296) // 65536) % 2))))
               AS BIGINT) AS y
           FROM q, LATERAL (SELECT unnest(range(0, 16)) AS j) jj)
         SELECT vec_id, CAST(j AS BIGINT) AS j, y FROM proj
         ORDER BY vec_id, j""",

    // v2 derived as in q187 (plus a NEW source and recomputed n_chars on
    // edits); per-column stats replayed as UNION ALL rows, deltas v2-v1.
    "q306_profile_drift" ->
      """WITH v2 AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2-edit' ELSE text END AS text,
             lang, source,
             CASE WHEN doc_id % 7 = 0
               THEN CAST(len(text || ' v2-edit') AS BIGINT) ELSE n_chars END AS n_chars
           FROM documents WHERE doc_id % 11 <> 0
           UNION ALL
           SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR),
             'xx', 'new-src',
             CAST(len('new doc ' || CAST(doc_id AS VARCHAR)) AS BIGINT)
           FROM documents WHERE doc_id % 13 = 0),
         p1 AS (
           SELECT 'text' AS col_id, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS nd1,
             CAST(MIN(text) AS VARCHAR) AS mn1, CAST(MAX(text) AS VARCHAR) AS mx1
           FROM documents
           UNION ALL SELECT 'lang', COUNT(*),
             SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
           FROM documents
           UNION ALL SELECT 'source', COUNT(*),
             SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
           FROM documents
           UNION ALL SELECT 'n_chars', COUNT(*),
             SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
           FROM documents),
         p2 AS (
           SELECT 'text' AS col_id, CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS nd2,
             CAST(MIN(text) AS VARCHAR) AS mn2, CAST(MAX(text) AS VARCHAR) AS mx2
           FROM v2
           UNION ALL SELECT 'lang', COUNT(*),
             SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT lang), CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
           FROM v2
           UNION ALL SELECT 'source', COUNT(*),
             SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT source), CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
           FROM v2
           UNION ALL SELECT 'n_chars', COUNT(*),
             SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT n_chars), CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
           FROM v2)
         SELECT p1.col_id AS column, CAST(p1.n1 AS BIGINT) AS n_rows_v1,
           CAST(p2.n2 AS BIGINT) AS n_rows_v2,
           CAST(p2.n2 - p1.n1 AS BIGINT) AS rows_delta,
           CAST(p2.nn2 - p1.nn1 AS BIGINT) AS nulls_delta,
           CAST(p2.nd2 - p1.nd1 AS BIGINT) AS distinct_delta,
           p1.mn1 IS DISTINCT FROM p2.mn2 AS min_moved,
           p1.mx1 IS DISTINCT FROM p2.mx2 AS max_moved
         FROM p1 JOIN p2 USING (col_id) ORDER BY p1.col_id""",

    // q94's FNV/bucket/weight chain over BIGRAMS at dim 4096 scale 1000,
    // then norms + inverted-index dot + the sqrt-free threshold
    // (t = 0.3 -> t² = 90000 millionths).
    "q304_tfidf_cosine_pairs" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
         tok0 AS (
           SELECT doc_id, list_filter(
             string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS tk
           FROM docs),
         bi AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
             i -> tk[i] || '_' || tk[i+1])) AS term
           FROM tok0),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM bi GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
         hv AS (
           SELECT term,
             list_reduce(list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(term, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211)
                 % CAST('18446744073709551616' AS HUGEINT)) AS h
           FROM dfreq),
         bk AS (
           SELECT term, CAST(((((CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
                    THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END) % 4096)
                  + 4096) % 4096) AS BIGINT) AS bucket
           FROM hv),
         v AS (SELECT tf.doc_id AS id, bk.bucket,
             CAST(sum((tf.tf * (nd.n_docs + 1) * 1000) // (dfreq.doc_freq + 1))
               AS BIGINT) AS w
           FROM tf JOIN dfreq USING (term) JOIN bk USING (term) CROSS JOIN nd
           GROUP BY 1, 2),
         n2 AS (SELECT id, SUM(CAST(w AS HUGEINT) * w) AS n2 FROM v GROUP BY id),
         d AS (SELECT a.id AS id_a, b.id AS id_b,
             SUM(CAST(a.w AS HUGEINT) * b.w) AS dot
           FROM v a JOIN v b ON a.bucket = b.bucket AND a.id < b.id
           GROUP BY 1, 2),
         f AS (SELECT d.id_a, d.id_b, d.dot, na.n2 AS n2_a, nb.n2 AS n2_b
           FROM d JOIN n2 na ON d.id_a = na.id JOIN n2 nb ON d.id_b = nb.id
           WHERE d.dot > 0
             AND d.dot * d.dot * 1000000 >= na.n2 * nb.n2 * 90000)
         SELECT id_a, id_b,
           CAST((dot * dot * 1000000) // (n2_a * n2_b) AS BIGINT) AS cos2_ppm,
           CAST(dot AS BIGINT) AS dot, CAST(n2_a AS BIGINT) AS n2_a,
           CAST(n2_b AS BIGINT) AS n2_b
         FROM f ORDER BY id_a, id_b""",

    // open/close via ROW_NUMBER ends of the (ts, event_id) order — the
    // window runs over DuckDB's side only; the engine uses min_by/max_by.
    "q301_ohlc_bars" ->
      """WITH ev AS (SELECT event_type AS key,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             ts, event_id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         r AS (SELECT key, bucket, v,
             ROW_NUMBER() OVER (PARTITION BY key, bucket
               ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY key, bucket
               ORDER BY ts DESC, event_id DESC) AS rd
           FROM ev)
         SELECT key, epoch_us(bucket) AS bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS open,
           CAST(MAX(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS close,
           CAST(MAX(v) AS BIGINT) AS high, CAST(MIN(v) AS BIGINT) AS low,
           CAST(SUM(v) AS BIGINT) AS sum_v
         FROM r GROUP BY key, bucket ORDER BY key, bucket_us""",

    // the same 24-start fan-out; empty starts absent on both sides.
    "q302_sliding_dau" ->
      """WITH ev AS (SELECT user_id,
             epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h
           FROM events),
         x AS (SELECT user_id, h - k * 3600000000 AS win_start_us
           FROM ev, LATERAL (SELECT unnest(range(0, 24)) AS k) u)
         SELECT win_start_us, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM x GROUP BY win_start_us ORDER BY win_start_us""",

    // lifetime histogram + suffix-sum at-risk; censored = active within
    // 7 days of the corpus max day.
    "q303_churn_hazard" ->
      """WITH s AS (SELECT user_id,
             MIN(epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS fd,
             MAX(epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS ld
           FROM events GROUP BY user_id),
         m AS (SELECT MAX(ld) AS max_day FROM s),
         mk AS (SELECT (ld - fd) // 86400000000 AS lifetime,
             ld > m.max_day - 7 * 86400000000 AS censored
           FROM s, m),
         hist AS (SELECT lifetime, COUNT(*) AS n_ending,
             SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS churned,
             SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS censored_at
           FROM mk GROUP BY lifetime),
         a AS (SELECT lifetime,
             CAST(SUM(n_ending) OVER (ORDER BY lifetime DESC) AS BIGINT) AS at_risk,
             CAST(churned AS BIGINT) AS churned,
             CAST(censored_at AS BIGINT) AS censored_at
           FROM hist)
         SELECT lifetime, at_risk, churned, censored_at,
           CAST((churned * 1000000) // at_risk AS BIGINT) AS hazard_ppm
         FROM a ORDER BY lifetime""",

    // survivors = everything but the forgotten users; n_forgotten = 0 is
    // replayed, not assumed.
    "q297_forget_rewrite" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmic
           FROM events)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN user_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_forgotten,
           CAST(SUM(vmic) AS BIGINT) AS sum_vmic
         FROM ev WHERE user_id % 10 <> 0
         GROUP BY event_type ORDER BY event_type""",

    // the xor-mix hash and the pinned Poisson(1) CDF cuts, replayed per
    // (row, replicate); totals ride every row.
    "q298_bootstrap_ci" ->
      """WITH ev AS (SELECT event_id AS id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS total_sum FROM ev),
         r AS (SELECT id, v, rep
           FROM ev, LATERAL (SELECT unnest(range(0, 32)) AS rep) u),
         h AS (SELECT rep, v,
             ((((id * 1000003 + rep) % 2147483648) * 2654435761)
               % 4294967296) AS h1 FROM r),
         w AS (SELECT rep, v,
             CASE WHEN u < 24109 THEN 0 WHEN u < 48218 THEN 1
               WHEN u < 60273 THEN 2 ELSE 3 END AS w
           FROM (SELECT rep, v,
               (((xor(h1, h1 // 65536)) * 40503) % 4294967296) // 65536 AS u
             FROM h))
         SELECT CAST(rep AS BIGINT) AS rep, CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * v) AS BIGINT) AS boot_sum, t.n, t.total_sum
         FROM w, t GROUP BY rep, t.n, t.total_sum ORDER BY rep""",

    // text windows stand in for the engine's xxhash64 keys (the q57/q107
    // hash-equality == text-equality convention); LEFT JOIN keeps
    // zero-flag sources.
    "q299_span_dedup_by_source" ->
      """WITH docs AS (SELECT doc_id, source, text FROM documents
           WHERE len(text) >= 64),
         wins AS (SELECT doc_id, source, substr(text, k * 16 + 1, 64) AS w
           FROM docs, LATERAL (SELECT unnest(
             range(0, (len(text) - 64) // 16 + 1)) AS k) u),
         freq AS (SELECT w FROM wins GROUP BY w
           HAVING COUNT(DISTINCT doc_id) >= 2),
         fl AS (SELECT wins.doc_id, wins.source FROM wins JOIN freq USING (w)),
         flagged AS (SELECT source,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_flagged,
             CAST(COUNT(*) AS BIGINT) AS n_windows_flagged
           FROM fl GROUP BY source),
         tot AS (SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM documents GROUP BY source)
         SELECT t.source, t.n_docs,
           COALESCE(f.n_docs_flagged, 0) AS n_docs_flagged,
           COALESCE(f.n_windows_flagged, 0) AS n_windows_flagged,
           CAST((COALESCE(f.n_docs_flagged, 0) * 1000000) // t.n_docs
             AS BIGINT) AS flagged_share_ppm
         FROM tot t LEFT JOIN flagged f USING (source)
         ORDER BY t.source""",

    // round 1 sums become round 2's features — two joins, no framework.
    "q300_two_hop_features" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e AS (SELECT DISTINCT x.l_partkey AS id_a, y.l_partkey AS id_b
               FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey),
         dir AS (SELECT id_a AS a, id_b AS b FROM e
                 UNION ALL SELECT id_b, id_a FROM e),
         f AS (SELECT p_partkey AS b,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS f
           FROM part),
         r1 AS (SELECT dir.a AS b, CAST(SUM(f.f) AS BIGINT) AS f
           FROM dir JOIN f USING (b) GROUP BY dir.a),
         agg2 AS (SELECT dir.a AS id, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
             CAST(SUM(r1.f) AS BIGINT) AS f_sum,
             CAST(MIN(r1.f) AS BIGINT) AS f_min,
             CAST(MAX(r1.f) AS BIGINT) AS f_max
           FROM dir JOIN r1 USING (b) GROUP BY dir.a)
         SELECT id, n_nbrs, f_sum, f_min, f_max,
           CAST(CASE WHEN f_sum >= 0 THEN (f_sum * 1000) // n_nbrs
             ELSE -((-f_sum * 1000) // n_nbrs) END AS BIGINT) AS f_mean_ppk
         FROM agg2 ORDER BY id""",

    // q231's edge CTE; neighbor features via the symmetric orientation
    // list; mean as sign-split floor ppk (prices are positive here, but
    // the contract is general).
    "q295_neighbor_agg" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e AS (SELECT DISTINCT x.l_partkey AS id_a, y.l_partkey AS id_b
               FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey),
         dir AS (SELECT id_a AS a, id_b AS b FROM e
                 UNION ALL SELECT id_b, id_a FROM e),
         f AS (SELECT p_partkey AS b,
             CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS f
           FROM part),
         agg AS (SELECT dir.a AS id, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
             CAST(SUM(f.f) AS BIGINT) AS f_sum,
             CAST(MIN(f.f) AS BIGINT) AS f_min,
             CAST(MAX(f.f) AS BIGINT) AS f_max
           FROM dir JOIN f USING (b) GROUP BY dir.a)
         SELECT id, n_nbrs, f_sum, f_min, f_max,
           CAST(CASE WHEN f_sum >= 0 THEN (f_sum * 1000) // n_nbrs
             ELSE -((-f_sum * 1000) // n_nbrs) END AS BIGINT) AS f_mean_ppk
         FROM agg ORDER BY id""",

    // train argmax transitions (ties to the smaller label), test pairs
    // via the same (ts, event_id) lead; unseen from-states predict NULL.
    "q296_markov_backtest" ->
      """WITH tr AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE user_id % 2 = 0),
         te AS (SELECT user_id, ts, event_id, event_type FROM events
           WHERE user_id % 2 = 1),
         tp AS (SELECT event_type AS f, LEAD(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS t FROM tr),
         mat AS (SELECT f, t, COUNT(*) AS n FROM tp
           WHERE t IS NOT NULL GROUP BY f, t),
         pred AS (SELECT f, t AS predicted FROM (
             SELECT f, t, ROW_NUMBER() OVER (PARTITION BY f
               ORDER BY n DESC, t) AS rk FROM mat) WHERE rk = 1),
         sp AS (SELECT event_type AS f, LEAD(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM te),
         spp AS (SELECT f, nxt FROM sp WHERE nxt IS NOT NULL)
         SELECT spp.f AS from_state, pred.predicted,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN spp.nxt = pred.predicted THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           CAST((SUM(CASE WHEN spp.nxt = pred.predicted THEN 1 ELSE 0 END)
             * 1000000) // COUNT(*) AS BIGINT) AS acc_ppm
         FROM spp LEFT JOIN pred ON spp.f = pred.f
         GROUP BY spp.f, pred.predicted
         ORDER BY from_state""",

    // q235's pair SQL feeding q100's unrolled rounds, string node ids,
    // both edge directions (TextRank's graph is undirected).
    "q294_textrank_keywords" ->
      """WITH tok0 AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0) AS tk
           FROM documents),
         t AS (SELECT doc_id, i - 1 AS pos, tk[i] AS tok
               FROM tok0, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) u),
         p AS (SELECT least(a.tok, b.tok) AS w_a, greatest(a.tok, b.tok) AS w_b
               FROM t a JOIN t b ON a.doc_id = b.doc_id
                 AND b.pos > a.pos AND b.pos <= a.pos + 3),
         co AS (SELECT w_a, w_b FROM p GROUP BY w_a, w_b HAVING COUNT(*) >= 5),
         e AS (SELECT w_a AS src, w_b AS dst FROM co
               UNION ALL SELECT w_b, w_a FROM co),
         n AS (SELECT DISTINCT id FROM
           (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM n),
         c1 AS (SELECT e.dst AS id, sum(r0.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r0 ON r0.id = e.src GROUP BY e.dst),
         r1 AS (SELECT n.id, 150000 + (85 * COALESCE(c1.contrib, 0)) // 100 AS rank
                FROM n LEFT JOIN c1 USING (id)),
         c2 AS (SELECT e.dst AS id, sum(r1.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r1 ON r1.id = e.src GROUP BY e.dst),
         r2 AS (SELECT n.id, 150000 + (85 * COALESCE(c2.contrib, 0)) // 100 AS rank
                FROM n LEFT JOIN c2 USING (id)),
         c3 AS (SELECT e.dst AS id, sum(r2.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r2 ON r2.id = e.src GROUP BY e.dst),
         r3 AS (SELECT n.id, 150000 + (85 * COALESCE(c3.contrib, 0)) // 100 AS rank
                FROM n LEFT JOIN c3 USING (id))
         SELECT id AS word, CAST(rank AS BIGINT) AS rank FROM r3
         ORDER BY rank DESC, word""",

    // frame sums replayed from the synth formula (the q149 witness),
    // inverted-index pair join on (frame_idx, sum), integer Jaccard at 0.6.
    "q293_video_frameset_neardup" ->
      """WITH docs AS (SELECT doc_id, doc_id // 3 AS seed, 6 + doc_id % 4 AS nf
           FROM documents),
         fs AS (SELECT s.seed, f.f,
             CAST(SUM((s.seed * 31 + f.f * 17 + x.x * 7 + y.y * 13) % 256)
               AS BIGINT) AS fsum
           FROM (SELECT DISTINCT seed FROM docs) s,
             LATERAL (SELECT unnest(range(0, 9)) AS f) f,
             LATERAL (SELECT unnest(range(0, 16)) AS x) x,
             LATERAL (SELECT unnest(range(0, 12)) AS y) y
           GROUP BY s.seed, f.f),
         fr AS (SELECT DISTINCT d.doc_id AS id, fs.f AS fidx, fs.fsum
           FROM docs d JOIN fs ON fs.seed = d.seed AND fs.f < d.nf),
         sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM fr GROUP BY id),
         p AS (SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared
           FROM fr a JOIN fr b
             ON a.fidx = b.fidx AND a.fsum = b.fsum AND a.id < b.id
           GROUP BY 1, 2)
         SELECT p.id_a, p.id_b, p.shared, sa.sz AS sz_a, sb.sz AS sz_b,
           CAST((p.shared * 1000000) // (sa.sz + sb.sz - p.shared) AS BIGINT)
             AS jaccard_ppm
         FROM p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
         WHERE (p.shared * 1000000) // (sa.sz + sb.sz - p.shared) >= 600000
         ORDER BY id_a, id_b""",

    // per-seed window |s| sums from the synth formula, delta-sign bits,
    // lo/hi 32-bit halves (the q190 sign-bit dodge), brute-force pairs.
    "q292_audio_fingerprint_neardup" ->
      """WITH docs AS (SELECT doc_id, doc_id // 3 AS seed FROM documents),
         seeds AS (SELECT DISTINCT seed FROM docs),
         s1 AS (SELECT seed, i,
             ((seed * 1000003 + i) * 2654435761) % 4294967296 AS h1
           FROM seeds, LATERAL (SELECT unnest(range(0, 2080)) AS i) u),
         smp AS (SELECT seed, i // 32 AS w,
             SUM(ABS((((xor(h1, h1 // 65536)) * 40503) % 4294967296)
               // 65536 - 32768)) AS a
           FROM s1 GROUP BY 1, 2),
         bits AS (SELECT cur.seed, cur.w,
             CASE WHEN nxt.a > cur.a THEN 1 ELSE 0 END AS b
           FROM smp cur JOIN smp nxt
             ON cur.seed = nxt.seed AND nxt.w = cur.w + 1
           WHERE cur.w < 64),
         sig AS (SELECT seed,
             CAST(SUM(CASE WHEN w < 32
               THEN b * (CAST(1 AS BIGINT) << w) ELSE 0 END) AS BIGINT) AS lo,
             CAST(SUM(CASE WHEN w >= 32
               THEN b * (CAST(1 AS BIGINT) << (w - 32)) ELSE 0 END) AS BIGINT) AS hi
           FROM bits GROUP BY seed),
         ds AS (SELECT d.doc_id, s.lo, s.hi FROM docs d JOIN sig s USING (seed))
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
             AS BIGINT) AS hamming
         FROM ds a JOIN ds b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
         ORDER BY id_a, id_b""",

    // ROW_NUMBER neighbor pairing, IS DISTINCT FROM boundaries (a null
    // run is a run), distincts + null group; runs_sorted = n_distinct.
    "q291_encoding_advisor" ->
      """WITH r AS (SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS rn,
             event_type, user_id, value FROM events),
         p AS (SELECT
             CAST(SUM(CASE WHEN a.event_type IS DISTINCT FROM b.event_type
               THEN 1 ELSE 0 END) AS BIGINT) AS b_et,
             CAST(SUM(CASE WHEN a.user_id IS DISTINCT FROM b.user_id
               THEN 1 ELSE 0 END) AS BIGINT) AS b_u,
             CAST(SUM(CASE WHEN a.value IS DISTINCT FROM b.value
               THEN 1 ELSE 0 END) AS BIGINT) AS b_v
           FROM r a JOIN r b ON b.rn = a.rn + 1),
         d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type)
               + MAX(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_et,
             CAST(COUNT(DISTINCT user_id)
               + MAX(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_u,
             CAST(COUNT(DISTINCT value)
               + MAX(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_v
           FROM events),
         u AS (
           SELECT 'event_type' AS col_name, d.n, d.d_et AS n_distinct, p.b_et AS nb FROM d, p
           UNION ALL SELECT 'user_id', d.n, d.d_u, p.b_u FROM d, p
           UNION ALL SELECT 'value', d.n, d.d_v, p.b_v FROM d, p)
         SELECT col_name, n, n_distinct,
           nb + CASE WHEN n > 0 THEN 1 ELSE 0 END AS runs_arrival,
           n_distinct AS runs_sorted,
           CAST((n * 1000) // (nb + 1) AS BIGINT) AS arrival_mean_run_ppk,
           CAST((n * 1000) // n_distinct AS BIGINT) AS sorted_mean_run_ppk,
           CAST(((nb + 1 - n_distinct) * 1000000) // (nb + 1) AS BIGINT) AS rle_gain_ppm
         FROM u ORDER BY col_name""",

    // one contingency scan per source; gaps vs global rates in ppm; TPR
    // NULL-guarded for label-free groups.
    "q289_fairness_report" ->
      """WITH cells AS (
           SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_label_pos,
             CAST(SUM(CASE WHEN n_chars >= 500 AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pos
           FROM documents GROUP BY source),
         g AS (SELECT CAST(SUM(n) AS BIGINT) AS g_n,
             CAST(SUM(n_pred_pos) AS BIGINT) AS g_pred_pos,
             CAST(SUM(n_label_pos) AS BIGINT) AS g_label_pos,
             CAST(SUM(n_true_pos) AS BIGINT) AS g_true_pos FROM cells),
         r AS (SELECT c.grp, c.n, c.n_pred_pos, c.n_label_pos, c.n_true_pos,
             CAST((c.n_pred_pos * 1000000) // c.n AS BIGINT) AS sel_ppm,
             CAST((g.g_pred_pos * 1000000) // g.g_n AS BIGINT) AS global_sel_ppm,
             CAST(CASE WHEN c.n_label_pos = 0 THEN NULL
               ELSE (c.n_true_pos * 1000000) // c.n_label_pos END AS BIGINT) AS tpr_ppm,
             CAST(CASE WHEN g.g_label_pos = 0 THEN NULL
               ELSE (g.g_true_pos * 1000000) // g.g_label_pos END AS BIGINT) AS global_tpr_ppm
           FROM cells c, g)
         SELECT grp, n, n_pred_pos, n_label_pos, n_true_pos,
           sel_ppm, global_sel_ppm,
           sel_ppm - global_sel_ppm AS dp_gap_ppm,
           tpr_ppm, global_tpr_ppm,
           tpr_ppm - global_tpr_ppm AS eo_gap_ppm
         FROM r ORDER BY grp""",

    // (group, value) weight collapse first, cumulative over distinct
    // values, lower weighted quantile at cum·1e6 >= total·p.
    "q290_weighted_median" ->
      """WITH pv AS (
           SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vw
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT g, v, vw,
             CAST(SUM(vw) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
           FROM pv),
         t AS (SELECT g, MAX(cum) AS total_w FROM c GROUP BY g),
         f AS (SELECT c.g, c.v, c.cum, t.total_w,
             ROW_NUMBER() OVER (PARTITION BY c.g ORDER BY c.v) AS rk
           FROM c JOIN t USING (g)
           WHERE c.cum * 1000000 >= t.total_w * 500000)
         SELECT g AS l_returnflag, total_w, v AS p_value, cum AS cum_w
         FROM f WHERE rk = 1 ORDER BY l_returnflag""",

    // division-free CUSUM: dev_r = cum·T − r·N over hourly counts; the
    // peak |dev| row (tie to earliest rank) is the changepoint estimate.
    "q286_cusum_changepoints" ->
      """WITH h AS (
           SELECT event_type AS key,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         c AS (SELECT key, bucket, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY bucket) AS BIGINT) AS r,
             CAST(SUM(n) OVER (PARTITION BY key ORDER BY bucket) AS BIGINT) AS cum
           FROM h),
         t AS (SELECT key, MAX(r) AS t_buckets, CAST(SUM(n) AS BIGINT) AS n_total
           FROM c GROUP BY key),
         d AS (SELECT c.key, c.bucket, c.n, c.r, c.cum, t.t_buckets, t.n_total,
             c.cum * t.t_buckets - c.r * t.n_total AS dev
           FROM c JOIN t USING (key)),
         p AS (SELECT key, r AS peak_r FROM (
             SELECT key, r, ROW_NUMBER() OVER (PARTITION BY key
               ORDER BY ABS(dev) DESC, r) AS rk FROM d) WHERE rk = 1)
         SELECT d.key, epoch_us(d.bucket) AS bucket_us, d.n, d.r, d.cum,
           d.t_buckets, d.n_total, CAST(d.dev AS BIGINT) AS dev,
           d.r = p.peak_r AS is_peak
         FROM d JOIN p USING (key)
         ORDER BY key, r""",

    // Spark dayofweek is 1 = Sunday; DuckDB's is 0 = Sunday, hence +1.
    "q287_dow_profile" ->
      """WITH cells AS (
           SELECT event_type AS key,
             CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         t AS (SELECT key, CAST(SUM(n) AS BIGINT) AS key_total
           FROM cells GROUP BY key),
         p AS (SELECT key, dow AS peak_dow FROM (
             SELECT key, dow, ROW_NUMBER() OVER (PARTITION BY key
               ORDER BY n DESC, dow) AS rk FROM cells) WHERE rk = 1)
         SELECT c.key, c.dow, c.n, t.key_total,
           CAST((c.n * 1000000) // t.key_total AS BIGINT) AS share_ppm,
           CAST((c.n * 1000000) // t.key_total - 142857 AS BIGINT)
             AS dev_vs_uniform_ppm,
           c.dow = p.peak_dow AS is_peak_dow
         FROM cells c JOIN t USING (key) JOIN p USING (key)
         ORDER BY key, dow""",

    // prediction = same key's daily total 7 days earlier (integer-us day
    // keys); MAE/bias as floor divisions, bias sign-split.
    "q288_seasonal_naive_backtest" ->
      """WITH daily AS (
           SELECT event_type AS key,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day_us,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
               AS BIGINT) AS vmic
           FROM events GROUP BY 1, 2),
         scored AS (
           SELECT cur.key, cur.vmic - prev.vmic AS err
           FROM daily cur JOIN daily prev
             ON cur.key = prev.key
             AND cur.day_us = prev.day_us + CAST(7 AS BIGINT) * 86400 * 1000000)
         SELECT key, CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(ABS(err)) AS BIGINT) AS abs_err_sum,
           CAST(SUM(err) AS BIGINT) AS err_sum,
           CAST(SUM(ABS(err)) // COUNT(*) AS BIGINT) AS mae_mic,
           CAST(CASE WHEN SUM(err) >= 0 THEN SUM(err) // COUNT(*)
             ELSE -((-SUM(err)) // COUNT(*)) END AS BIGINT) AS bias_mic
         FROM scored GROUP BY key ORDER BY key""",

    // q231's edge CTE, then histogram + totals; each undirected edge
    // contributes 2 to the degree sum, so n_edges = deg_sum DIV 2.
    "q284_degree_stats" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e AS (SELECT DISTINCT x.l_partkey AS id_a, y.l_partkey AS id_b
               FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey),
         deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM
                 (SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e)
                 GROUP BY id),
         hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
                  FROM deg GROUP BY degree),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes_total,
                   CAST(SUM(degree) AS BIGINT) AS deg_sum,
                   CAST(MAX(degree) AS BIGINT) AS max_degree FROM deg)
         SELECT h.degree, h.n_nodes,
           CAST((h.n_nodes * 1000000) // t.n_nodes_total AS BIGINT) AS node_share_ppm,
           t.n_nodes_total, CAST(t.deg_sum // 2 AS BIGINT) AS n_edges,
           t.max_degree
         FROM hist h, tot t ORDER BY h.degree""",

    // the directed orientation list (each edge both ways) makes Σx = Σy
    // and Σx² = Σy², so r = (m·Σxy − Σx²)/(m·Σx² − (Σx)²) — no sqrt,
    // HUGEINT products, sign-split floor division to ppm.
    "q285_assortativity" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e AS (SELECT DISTINCT x.l_partkey AS id_a, y.l_partkey AS id_b
               FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey),
         dir AS (SELECT id_a AS a, id_b AS b FROM e
                 UNION ALL SELECT id_b, id_a FROM e),
         deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS deg
                 FROM dir GROUP BY a),
         p AS (SELECT dx.deg AS dx, dy.deg AS dy FROM dir
               JOIN deg dx ON dir.a = dx.id
               JOIN deg dy ON dir.b = dy.id),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(dx) AS BIGINT) AS sx,
                 SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
                 SUM(CAST(dx AS HUGEINT) * dx) AS sxx FROM p),
         nd AS (SELECT m, sx, sxy, sxx,
                  CAST(m AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx AS num,
                  CAST(m AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
                FROM s)
         SELECT m, sx, CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
           CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
           CAST(CASE WHEN den = 0 THEN NULL
                WHEN num >= 0 THEN (num * 1000000) // den
                ELSE -((-num * 1000000) // den) END AS BIGINT) AS r_ppm
         FROM nd""",

    // Dedup makes the duplicated stream equal the plain table; emitted
    // windows are those whose end closed under the final batch's
    // watermark (max ts before the last split − 1 h, strict <).
    "q283_chained_stateful" ->
      """WITH e AS (SELECT
               CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start_us,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmic,
               CAST(epoch_us(ts) AS BIGINT) AS tus
             FROM events),
         wm AS (SELECT MAX(tus) - 3600000000 AS w FROM e
                WHERE tus < CAST(epoch_us(TIMESTAMP '2024-01-21 00:00:00') AS BIGINT))
         SELECT day_start_us, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(vmic) AS BIGINT) AS value_micros
         FROM e, wm WHERE day_start_us + 86400000000 < wm.w
         GROUP BY day_start_us ORDER BY day_start_us""",

    // The skew split changes partitioning, not the answer.
    "q282_skew_rebalance" ->
      """WITH ev AS (SELECT *,
                 CASE WHEN event_id % 3 <> 0 THEN 0 ELSE event_id END AS k
               FROM events)
         SELECT k % 7 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM ev GROUP BY k % 7 ORDER BY bucket""",

    // DuckDB's LATERAL replays the correlated top-2.
    "q281_lateral_join" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
         FROM nation n,
         LATERAL (
           SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
           FROM customer
           WHERE c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_custkey LIMIT 2
         ) t
         ORDER BY n.n_name, t.c_custkey""",

    // Name-aligned union with null fill, replayed as two padded halves.
    "q280_union_by_name" ->
      """WITH olds AS (SELECT event_id, event_type, value,
                  CAST(NULL AS BIGINT) AS k
                FROM events WHERE event_id % 2 = 0),
         news AS (SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events WHERE event_id % 2 = 1),
         u AS (SELECT * FROM olds UNION ALL SELECT * FROM news)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(value) AS BIGINT) AS n_with_value,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(k) AS BIGINT) AS sum_k
         FROM u GROUP BY event_type ORDER BY event_type""",

    // Matches ∪ window-closed unmatched views ∪ watermark-passed
    // unmatched purchases — q269's formula plus the right-side rule.
    "q279_stream_full_outer_join" ->
      """WITH e AS (SELECT event_id, user_id,
                 CAST(epoch_us(ts) AS BIGINT) AS tus, event_type
               FROM events),
         l AS (SELECT * FROM e WHERE event_type = 'view'),
         r AS (SELECT * FROM e WHERE event_type = 'purchase'),
         wm AS (SELECT LEAST(
                  (SELECT MAX(tus) FROM l
                   WHERE tus < CAST(epoch_us(TIMESTAMP '2024-01-21 00:00:00') AS BIGINT)),
                  (SELECT MAX(tus) FROM r
                   WHERE tus < CAST(epoch_us(TIMESTAMP '2024-01-21 00:00:00') AS BIGINT)))
                  - 3600000000 AS w),
         m AS (SELECT l.event_id AS l_event_id, l.user_id AS l_user_id,
                 l.tus AS l_ts_us, r.event_id AS r_event_id,
                 r.user_id AS r_user_id, r.tus AS r_ts_us
               FROM l JOIN r ON l.user_id = r.user_id
                 AND r.tus >= l.tus AND r.tus <= l.tus + 7200000000),
         uol AS (SELECT l.event_id, l.user_id, l.tus FROM l, wm
                 WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id
                   AND r.tus >= l.tus AND r.tus <= l.tus + 7200000000)
                   AND l.tus + 7200000000 < wm.w),
         uor AS (SELECT r.event_id, r.user_id, r.tus FROM r, wm
                 WHERE NOT EXISTS (SELECT 1 FROM l WHERE l.user_id = r.user_id
                   AND r.tus >= l.tus AND r.tus <= l.tus + 7200000000)
                   AND r.tus < wm.w)
         SELECT l_event_id, l_user_id, l_ts_us, r_event_id, r_user_id, r_ts_us
         FROM (
           SELECT * FROM m
           UNION ALL
           SELECT event_id, user_id, tus,
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           FROM uol
           UNION ALL
           SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             event_id, user_id, tus
           FROM uor)
         ORDER BY l_event_id, r_event_id""",

    // The loop exit == first power-of-2 cap with under-100 count (the
    // count is monotone non-increasing in the cap).
    "q278_sql_scripting" ->
      """WITH ks AS (SELECT unnest(range(0, 40)) AS k),
         c AS (SELECT 1024 * (CAST(1 AS BIGINT) << k) AS cap FROM ks),
         q AS (SELECT cap,
                 (SELECT COUNT(*) FROM orders WHERE o_totalprice > cap) AS n
               FROM c),
         f AS (SELECT cap, n FROM q WHERE n < 100 ORDER BY cap LIMIT 1)
         SELECT CAST(cap AS BIGINT) AS cap, CAST(n AS BIGINT) AS n_above FROM f""",

    // The SQL functions are macros over the same relational algebra: the
    // oracle inlines them.
    "q277_sql_udf" ->
      """WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
         t AS (SELECT COUNT(*) AS tot FROM p)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST((COUNT(*) * 1000000) // tot AS BIGINT) AS share_ppm
         FROM p, t GROUP BY user_id, tot ORDER BY user_id""",

    // The two-phase timer state machine: a user fires in batch i iff it
    // has no rows there and last_event + gap < that batch's watermark
    // (ms-floored, strict <); fired state clears, a b2 re-opening never
    // emits. e1 = fires during b1, e2 = fires during b2.
    "q276_tws_timers" ->
      """WITH p AS (SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS tus
                    FROM events WHERE event_type = 'purchase'),
         t1 AS (SELECT CAST(epoch_us(TIMESTAMP '2024-01-11 00:00:00') AS BIGINT) AS v),
         t2 AS (SELECT CAST(epoch_us(TIMESTAMP '2024-01-21 00:00:00') AS BIGINT) AS v),
         b0 AS (SELECT u, MIN(tus) st, MAX(tus) en, COUNT(*) n
                FROM p, t1 WHERE tus < t1.v GROUP BY u),
         b01 AS (SELECT u, MIN(tus) st, MAX(tus) en, COUNT(*) n
                 FROM p, t2 WHERE tus < t2.v GROUP BY u),
         p1u AS (SELECT DISTINCT u FROM p, t1, t2 WHERE tus >= t1.v AND tus < t2.v),
         p2u AS (SELECT DISTINCT u FROM p, t2 WHERE tus >= t2.v),
         wm1 AS (SELECT (MAX(tus) // 1000) - 3600000 AS w FROM p, t1 WHERE tus < t1.v),
         wm2 AS (SELECT (MAX(tus) // 1000) - 3600000 AS w FROM p, t2 WHERE tus < t2.v),
         e1 AS (SELECT b0.u, b0.st, b0.en, b0.n FROM b0, wm1
                WHERE b0.u NOT IN (SELECT u FROM p1u)
                  AND (b0.en // 1000) + 21600000 < wm1.w),
         e2 AS (SELECT b01.u, b01.st, b01.en, b01.n FROM b01, wm2
                WHERE b01.u NOT IN (SELECT u FROM e1)
                  AND b01.u NOT IN (SELECT u FROM p2u)
                  AND (b01.en // 1000) + 21600000 < wm2.w)
         SELECT u AS user_id, st AS start_us, en AS end_us,
           CAST(n AS BIGINT) AS n_events
         FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
         ORDER BY user_id""",

    // The imperative mapGroups walk must equal the declarative LAG form.
    "q275_map_groups" ->
      """WITH o AS (SELECT o_custkey AS key,
                 date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
               FROM orders),
         g AS (SELECT key, d,
                 d - lag(d) OVER (PARTITION BY key ORDER BY d) AS gap
               FROM o)
         SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days,
           CAST(MAX(d) - MIN(d) AS BIGINT) AS span_days
         FROM g GROUP BY key ORDER BY key""",

    // Restart changes delivery, not the answer: the oracle is the
    // all-events batch aggregate.
    "q274_restart_ingest" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    // Pipe syntax plans to the identical tree: the oracle is the classic
    // form.
    "q273_pipe_syntax" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem WHERE l_quantity >= 30
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    // DuckDB's ordered string_agg is LISTAGG's equivalent.
    "q272_listagg" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS ids
         FROM events WHERE event_id % 500 = 0
         GROUP BY event_type ORDER BY event_type""",

    // Stream == batch: the final per-key state equals the plain groupBy;
    // batches_seen replays as distinct event_id % 3 per user.
    "q271_transform_with_state" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT) AS value_micros,
           CAST(COUNT(DISTINCT event_id % 3) AS BIGINT) AS batches_seen
         FROM events GROUP BY user_id ORDER BY user_id""",

    // DuckDB's recursion replays Spark's: same seed, same step, UNION ALL
    // multiplicity identical (single-parent chain → unique paths).
    "q270_recursive_cte" ->
      """WITH RECURSIVE anc(node, anc, depth) AS (
           SELECT p_partkey AS node, p_partkey // 2 AS anc, CAST(1 AS BIGINT) AS depth
           FROM part WHERE p_partkey BETWEEN 2 AND 2000
           UNION ALL
           SELECT node, anc // 2, depth + 1 FROM anc WHERE anc >= 2
         )
         SELECT node, anc, depth FROM anc ORDER BY node, depth""",

    // The emission contract: inner matches, plus unmatched left rows whose
    // join-window end closed under the final batch's watermark. The type
    // filters sit BELOW each watermark node (Catalyst pushdown — pinned by
    // the StreamingSpec hand case), so the global watermark is
    // min(max view ts, max purchase ts before the last split) − 1 h,
    // strict < on the eviction boundary.
    "q269_stream_left_outer_join" ->
      """WITH e AS (SELECT event_id, user_id,
                 CAST(epoch_us(ts) AS BIGINT) AS tus, event_type
               FROM events),
         l AS (SELECT * FROM e WHERE event_type = 'view'),
         r AS (SELECT * FROM e WHERE event_type = 'purchase'),
         wm AS (SELECT LEAST(
                  (SELECT MAX(tus) FROM l
                   WHERE tus < CAST(epoch_us(TIMESTAMP '2024-01-21 00:00:00') AS BIGINT)),
                  (SELECT MAX(tus) FROM r
                   WHERE tus < CAST(epoch_us(TIMESTAMP '2024-01-21 00:00:00') AS BIGINT)))
                  - 3600000000 AS w),
         m AS (SELECT l.event_id AS l_event_id, l.user_id AS l_user_id,
                 l.tus AS l_ts_us, r.event_id AS r_event_id, r.tus AS r_ts_us
               FROM l JOIN r ON l.user_id = r.user_id
                 AND r.tus >= l.tus AND r.tus <= l.tus + 7200000000),
         um AS (SELECT l.event_id, l.user_id, l.tus FROM l
                WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id
                  AND r.tus >= l.tus AND r.tus <= l.tus + 7200000000)),
         uo AS (SELECT um.event_id AS l_event_id, um.user_id AS l_user_id,
                  um.tus AS l_ts_us, CAST(NULL AS BIGINT) AS r_event_id,
                  CAST(NULL AS BIGINT) AS r_ts_us
                FROM um, wm WHERE um.tus + 7200000000 < wm.w)
         SELECT * FROM m UNION ALL SELECT * FROM uo
         ORDER BY l_event_id, r_event_id""",

    // Collation-insensitive distinct == distinct of lower(); the
    // case-sensitive count is the control.
    "q268_collation" ->
      """WITH m AS (SELECT CASE WHEN doc_id % 2 = 1 THEN upper(source)
                          ELSE source END AS src_mixed
               FROM documents)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT src_mixed) AS BIGINT) AS n_distinct_cs,
           CAST(COUNT(DISTINCT lower(src_mixed)) AS BIGINT) AS n_distinct_ci
         FROM m""",

    // IS NOT DISTINCT FROM is SQL's null-safe equality.
    "q267_nullsafe_join" ->
      """WITH e AS (SELECT event_id,
                 CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS uid_n
               FROM events),
         c AS (SELECT uid_n, CAST(COUNT(*) AS BIGINT) AS n_for_uid
               FROM e GROUP BY uid_n)
         SELECT e.event_id, e.uid_n, c.n_for_uid
         FROM e JOIN c ON e.uid_n IS NOT DISTINCT FROM c.uid_n
         ORDER BY e.event_id""",

    // Roundtrip: the XML layout must carry exactly the source rows.
    "q266_xml_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars
         FROM documents ORDER BY doc_id""",

    // The variant encoding changes storage, not values: the oracle is the
    // plain JSON string path.
    "q265_variant_json" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
         FROM events GROUP BY event_type ORDER BY event_type""",

    // The UNPIVOT replayed as a union of the three measures.
    "q264_unpivot" ->
      """WITH u AS (
           SELECT 'quantity' AS metric, CAST(l_quantity AS DOUBLE) AS val FROM lineitem
           UNION ALL
           SELECT 'extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
           UNION ALL
           SELECT 'discount', CAST(l_discount AS DOUBLE) FROM lineitem)
         SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM u GROUP BY metric ORDER BY metric""",

    // Bitmaps are an exact-distinct mechanism, not an estimate: the
    // oracle is the plain COUNT(DISTINCT).
    "q263_bitmap_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",

    // Statistics change the plan, not the answer.
    "q262_cbo_join_reorder" ->
      """SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_totalprice > 150000.0
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    // Majority-RHS repair size per rule over the (lhs, rhs) contingency
    // table.
    "q261_fd_audit" ->
      """WITH c1 AS (SELECT source AS l, lang AS r, CAST(COUNT(*) AS BIGINT) AS n
                     FROM documents GROUP BY 1, 2),
         p1 AS (SELECT l, SUM(n) AS nl, MAX(n) AS maxn, COUNT(*) AS ndist
                FROM c1 GROUP BY l),
         r1 AS (SELECT 'docs_source_determines_lang' AS rule,
                  CAST(COUNT(*) AS BIGINT) AS n_groups,
                  CAST(SUM(CASE WHEN ndist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_groups,
                  CAST(SUM(nl) AS BIGINT) AS n_rows,
                  CAST(SUM(nl - maxn) AS BIGINT) AS n_violation_rows
                FROM p1),
         c2 AS (SELECT o_custkey AS l, o_orderpriority AS r,
                  CAST(COUNT(*) AS BIGINT) AS n
                FROM orders GROUP BY 1, 2),
         p2 AS (SELECT l, SUM(n) AS nl, MAX(n) AS maxn, COUNT(*) AS ndist
                FROM c2 GROUP BY l),
         r2 AS (SELECT 'orders_custkey_determines_priority' AS rule,
                  CAST(COUNT(*) AS BIGINT) AS n_groups,
                  CAST(SUM(CASE WHEN ndist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_groups,
                  CAST(SUM(nl) AS BIGINT) AS n_rows,
                  CAST(SUM(nl - maxn) AS BIGINT) AS n_violation_rows
                FROM p2),
         u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
         SELECT rule, n_groups, n_clean_groups, n_rows, n_violation_rows,
           CASE WHEN n_rows = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((n_violation_rows * 1000000) // n_rows AS BIGINT)
           END AS violation_ppm
         FROM u ORDER BY rule""",

    // The bloom filter changes the plan, not the answer.
    "q260_bloom_join" ->
      """SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_size = 1
         GROUP BY p.p_brand ORDER BY p.p_brand""",

    // Pair counting over the lang×source contingency table; HUGEINT for
    // the ~N2² products, sign-split ppm.
    "q259_rand_index" ->
      """WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
                        FROM documents GROUP BY 1, 2),
         s AS (SELECT CAST(SUM(n*(n-1)//2) AS BIGINT) AS s_pairs,
                 CAST(SUM(n) AS BIGINT) AS n_rows FROM cells),
         ra AS (SELECT CAST(SUM(na*(na-1)//2) AS BIGINT) AS a2
                FROM (SELECT SUM(n) AS na FROM cells GROUP BY lang)),
         rb AS (SELECT CAST(SUM(nb*(nb-1)//2) AS BIGINT) AS b2
                FROM (SELECT SUM(n) AS nb FROM cells GROUP BY source)),
         x AS (SELECT s_pairs, a2, b2,
                 CAST(n_rows*(n_rows-1)//2 AS BIGINT) AS n2 FROM s, ra, rb),
         y AS (SELECT s_pairs, a2, b2, n2,
                 CAST(2 AS HUGEINT)*(CAST(s_pairs AS HUGEINT)*n2
                   - CAST(a2 AS HUGEINT)*b2) AS num2,
                 CAST(a2+b2 AS HUGEINT)*n2
                   - CAST(2 AS HUGEINT)*CAST(a2 AS HUGEINT)*b2 AS den2
               FROM x)
         SELECT s_pairs, a2, b2, n2,
           CAST(CASE WHEN den2 = 0 THEN 1000000
                WHEN num2 >= 0 THEN (num2 * 1000000) // den2
                ELSE -(((-num2) * 1000000) // den2) END AS BIGINT) AS ari_ppm
         FROM y""",

    // The contribution join replays the fan-out: weight 2^(7−gap) for
    // gap = a.d − b.d ∈ [0,7]; decimal widths pinned (28,2)×(10,0) so
    // neither engine spills past DECIMAL(38,2).
    "q258_ewma_revenue" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS v
           FROM orders GROUP BY 1)
         SELECT a.d, CAST(a.v AS DOUBLE) AS v,
           CAST(SUM(CAST(b.v AS DECIMAL(28,2))
             * CAST(1 << (7 - date_diff('day', b.d, a.d)) AS DECIMAL(10,0)))
             AS DOUBLE) AS smoothed_x256,
           CAST(COUNT(*) AS BIGINT) AS n_terms
         FROM daily a JOIN daily b
           ON b.d <= a.d AND b.d >= a.d - 7
         GROUP BY a.d, a.v ORDER BY a.d""",

    // Full frames only (n // 8 · 8 samples); the ±1 matrix entry is
    // (−1)^bit_count(k AND j) — HUGEINT-free, every sum fits a BIGINT.
    "q257_wht_bands" ->
      """WITH d AS (SELECT doc_id, 64 + (doc_id % 41) AS n FROM documents),
         s AS (SELECT doc_id, i, ((doc_id * 31 + i * 7) % 65536) - 32768 AS smp
               FROM d, LATERAL (SELECT unnest(range(0, (n // 8) * 8)) AS i) u),
         c AS (SELECT doc_id, i // 8 AS f, k.k AS k,
                 SUM(CASE WHEN bit_count(CAST(k.k AS BIGINT) & CAST(i % 8 AS BIGINT)) % 2 = 0
                          THEN smp ELSE -smp END) AS ck
               FROM s, LATERAL (SELECT unnest(range(0, 8)) AS k) k
               GROUP BY doc_id, i // 8, k.k)
         SELECT doc_id AS id, CAST(k AS BIGINT) AS band,
           CAST(SUM(ABS(ck)) AS BIGINT) AS c_abs_sum
         FROM c GROUP BY doc_id, k ORDER BY id, band""",

    // Transitions replay from the synth formula: frame f's pixel minus
    // frame f−1's — the +17 mod 256 shift wraps at 239, both branches in
    // the ABS.
    "q256_video_motion" ->
      """WITH d AS (
           SELECT doc_id, 6 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
                  3 + doc_id % 4 AS nf
           FROM documents),
         fr AS (SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM d),
         px AS (
           SELECT doc_id, w, h, f,
             CAST(list_sum(flatten(list_transform(range(0, h), y ->
               list_transform(range(0, w), x ->
                 ABS((doc_id*31 + f*17 + x*7 + y*13) % 256
                     - (doc_id*31 + (f-1)*17 + x*7 + y*13) % 256))))) AS BIGINT) AS sad
           FROM fr)
         SELECT doc_id AS id, CAST(f AS BIGINT) AS to_frame, sad,
           sad * 100 >= 30 * w * h AS cut
         FROM px ORDER BY id, to_frame""",

    "q255_drift_stream" ->
      """WITH r AS (SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS n_ref
                    FROM events WHERE user_id % 2 = 0 GROUP BY 1),
         c AS (SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS n_cur
               FROM events WHERE user_id % 2 = 1 GROUP BY 1),
         j AS (SELECT COALESCE(r.category, c.category) AS category,
                 COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
               FROM r FULL OUTER JOIN c ON r.category = c.category),
         t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                 CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM j),
         sh AS (SELECT category, n_ref, n_cur,
                  CASE WHEN t_ref = 0 THEN 0 ELSE (n_ref * 1000000) // t_ref END AS share_ref_ppm,
                  CASE WHEN t_cur = 0 THEN 0 ELSE (n_cur * 1000000) // t_cur END AS share_cur_ppm
                FROM j, t),
         tv AS (SELECT CAST(SUM(ABS(share_cur_ppm - share_ref_ppm)) // 2 AS BIGINT) AS tvd_ppm
                FROM sh)
         SELECT sh.category, sh.n_ref, sh.n_cur, sh.share_ref_ppm,
           sh.share_cur_ppm,
           CAST(ABS(sh.share_cur_ppm - sh.share_ref_ppm) AS BIGINT) AS diff_ppm,
           tv.tvd_ppm
         FROM sh, tv ORDER BY sh.category""",

    // Two unrolled rounds: IEEE dot folds against the integer iterate,
    // floor()-quantized terms, HUGEINT sums, sign-split normalization.
    "q254_power_iteration" ->
      """WITH e AS (SELECT vec_id AS id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         d1 AS (SELECT e.id, e.v,
                  list_sum(list_transform(range(1, 65),
                    i -> e.v[i] * CAST(1000000 AS DOUBLE))) AS dot
                FROM e),
         t1 AS (SELECT t.i - 1 AS dim,
                  CAST(FLOOR(d.v[t.i] * d.dot * 1000000.0) AS BIGINT) AS q
                FROM d1 d, LATERAL (SELECT unnest(range(1, 65)) AS i) t),
         s1 AS (SELECT dim, SUM(CAST(q AS HUGEINT)) AS s FROM t1 GROUP BY dim),
         m1 AS (SELECT MAX(ABS(s)) AS m FROM s1),
         w1 AS (SELECT dim,
                  CASE WHEN s >= 0 THEN CAST((s * 1000000) // m AS BIGINT)
                       ELSE -CAST(((-s) * 1000000) // m AS BIGINT) END AS w
                FROM s1, m1),
         wl1 AS (SELECT list(CAST(w AS DOUBLE) ORDER BY dim) AS wl FROM w1),
         d2 AS (SELECT e.id, e.v,
                  list_sum(list_transform(range(1, 65),
                    i -> e.v[i] * wl.wl[i])) AS dot
                FROM e, wl1 wl),
         t2 AS (SELECT t.i - 1 AS dim,
                  CAST(FLOOR(d.v[t.i] * d.dot * 1000000.0) AS BIGINT) AS q
                FROM d2 d, LATERAL (SELECT unnest(range(1, 65)) AS i) t),
         s2 AS (SELECT dim, SUM(CAST(q AS HUGEINT)) AS s FROM t2 GROUP BY dim),
         m2 AS (SELECT MAX(ABS(s)) AS m FROM s2),
         w2 AS (SELECT dim,
                  CASE WHEN s >= 0 THEN CAST((s * 1000000) // m AS BIGINT)
                       ELSE -CAST(((-s) * 1000000) // m AS BIGINT) END AS w
                FROM s2, m2)
         SELECT CAST(dim AS BIGINT) AS dim, w AS v FROM w2 ORDER BY dim""",

    // Funnel min-ts pair per user, then the exact rank-rule deciles of
    // the lag with per-bin bounds.
    "q253_conversion_lag" ->
      """WITH b AS (SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS t,
                 event_type
               FROM events),
         ta AS (SELECT u, MIN(t) AS t_a FROM b WHERE event_type = 'signup'
                GROUP BY u),
         tb AS (SELECT b.u, MIN(b.t) AS t_b, MIN(ta.t_a) AS t_a
                FROM b JOIN ta ON b.u = ta.u
                WHERE b.event_type = 'purchase' AND b.t > ta.t_a
                GROUP BY b.u),
         lg AS (SELECT u, t_b - t_a AS lag FROM tb),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM lg),
         rk AS (SELECT lag,
                  ((CAST(ROW_NUMBER() OVER (ORDER BY lag, u) AS BIGINT) - 1) * 10)
                    // n.nn AS bin
                FROM lg, n)
         SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(lag) AS BIGINT) AS lo_us, CAST(MAX(lag) AS BIGINT) AS hi_us
         FROM rk GROUP BY bin ORDER BY bin""",

    // The same lead-chain trigrams under (ts, event_id) per user.
    "q252_event_paths" ->
      """WITH s AS (SELECT user_id, event_type AS s0,
                 LEAD(event_type, 1) OVER w AS s1,
                 LEAD(event_type, 2) OVER w AS s2
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT s0 || '>' || s1 || '>' || s2 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM s WHERE s2 IS NOT NULL
         GROUP BY 1 HAVING COUNT(*) >= 10 ORDER BY path""",

    // Same planted markup, tags -> single space, the same five literal
    // entity replaces with &amp; decoded last.
    "q251_html_strip" ->
      """WITH planted AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN
               '<p class="x">' || text
                 || '</p><br><a href="https://e.x/y?q=1">link &amp; more &lt;b&gt;</a>'
             ELSE text END AS t
           FROM documents),
         c AS (SELECT doc_id, t,
             replace(replace(replace(replace(replace(
               regexp_replace(t, '<[^>]*>', ' ', 'g'),
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', chr(39)), '&amp;', '&') AS clean_text
           FROM planted)
         SELECT doc_id, clean_text,
           CAST(len(t) - len(clean_text) AS BIGINT) AS removed_chars
         FROM c ORDER BY doc_id""",

    // Two exact rank passes and the ceiling rank map; the reference value
    // at a rank is tie-break-independent.
    "q250_quantile_normalize" ->
      """WITH rv AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
                     FROM events WHERE user_id % 2 = 0),
         cv AS (SELECT event_id AS id,
                  CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
                FROM events WHERE user_id % 2 = 1),
         rr AS (SELECT v AS mapped_v,
                  CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS rrank
                FROM rv),
         cr AS (SELECT id, v,
                  CAST(ROW_NUMBER() OVER (ORDER BY v, id) AS BIGINT) AS rank
                FROM cv),
         n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_r FROM rv),
         n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_c FROM cv)
         SELECT cr.id, cr.v, rr.mapped_v
         FROM cr CROSS JOIN n1 CROSS JOIN n2
         JOIN rr ON rr.rrank = (cr.rank * n1.n_r + n2.n_c - 1) // n2.n_c
         ORDER BY cr.id""",

    // Two unrolled max-normalized rounds: a from h, h from a, each half
    // pinned at 1e6 by its own maximum in HUGEINT floor division.
    "q249_hits" ->
      """WITH e AS (
           SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         h0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS score FROM e),
         a1r AS (SELECT e.dst AS id, CAST(SUM(h0.score) AS BIGINT) AS s
                 FROM e JOIN h0 ON h0.id = e.src GROUP BY e.dst),
         a1m AS (SELECT MAX(s) AS m FROM a1r),
         a1 AS (SELECT id, CAST((CAST(s AS HUGEINT) * 1000000) // m AS BIGINT) AS score
                FROM a1r, a1m),
         h1r AS (SELECT e.src AS id, CAST(SUM(a1.score) AS BIGINT) AS s
                 FROM e JOIN a1 ON a1.id = e.dst GROUP BY e.src),
         h1m AS (SELECT MAX(s) AS m FROM h1r),
         h1 AS (SELECT id, CAST((CAST(s AS HUGEINT) * 1000000) // m AS BIGINT) AS score
                FROM h1r, h1m),
         a2r AS (SELECT e.dst AS id, CAST(SUM(h1.score) AS BIGINT) AS s
                 FROM e JOIN h1 ON h1.id = e.src GROUP BY e.dst),
         a2m AS (SELECT MAX(s) AS m FROM a2r),
         a2 AS (SELECT id, CAST((CAST(s AS HUGEINT) * 1000000) // m AS BIGINT) AS score
                FROM a2r, a2m),
         h2r AS (SELECT e.src AS id, CAST(SUM(a2.score) AS BIGINT) AS s
                 FROM e JOIN a2 ON a2.id = e.dst GROUP BY e.src),
         h2m AS (SELECT MAX(s) AS m FROM h2r),
         h2 AS (SELECT id, CAST((CAST(s AS HUGEINT) * 1000000) // m AS BIGINT) AS score
                FROM h2r, h2m)
         SELECT id, 'hub' AS kind, score FROM h2
         UNION ALL SELECT id, 'auth' AS kind, score FROM a2
         ORDER BY kind, id""",

    // Per-conversion argmax via ROW_NUMBER (tt DESC, tid DESC) over the
    // windowed left join; NULL touch coalesces to '(none)'.
    "q248_attribution" ->
      """WITH b AS (SELECT user_id AS u, CAST(epoch_us(ts) AS BIGINT) AS t,
                 event_id AS eid, event_type = 'purchase' AS conv,
                 event_type AS ch
               FROM events),
         c AS (SELECT u, t AS ct, eid AS cid FROM b WHERE conv),
         tc AS (SELECT u, t AS tt, eid AS tid, ch FROM b WHERE NOT conv),
         j AS (SELECT c.cid, tc.tt, tc.tid, tc.ch
               FROM c LEFT JOIN tc ON c.u = tc.u AND tc.tt < c.ct
                 AND tc.tt >= c.ct - 86400000000),
         r AS (SELECT cid, ch, ROW_NUMBER() OVER (
                 PARTITION BY cid ORDER BY tt DESC NULLS LAST, tid DESC) AS rn
               FROM j),
         cr AS (SELECT COALESCE(ch, '(none)') AS channel FROM r WHERE rn = 1),
         ct2 AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credited
                 FROM cr GROUP BY channel),
         t2 AS (SELECT CAST(SUM(n_credited) AS BIGINT) AS t FROM ct2)
         SELECT channel, n_credited, (n_credited * 1000000) // t2.t AS share_ppm
         FROM ct2, t2 ORDER BY channel""",

    // Hourly counts paired at +lag per key, then q78's exact co-moments
    // and identical IEEE tail.
    "q247_autocorrelation" ->
      """WITH h AS (SELECT event_type AS k,
                 CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT) AS b,
                 CAST(COUNT(*) AS BIGINT) AS x
               FROM events GROUP BY 1, 2),
         p AS (SELECT l.k, l.x, r.x AS y, CAST(1 AS BIGINT) AS lag
               FROM h l JOIN h r ON l.k = r.k AND r.b = l.b + 1
               UNION ALL
               SELECT l.k, l.x, r.x, CAST(24 AS BIGINT)
               FROM h l JOIN h r ON l.k = r.k AND r.b = l.b + 24),
         m AS (SELECT k, lag, COUNT(*) AS n,
                 SUM(CAST(x AS DECIMAL(30,6))) AS sx,
                 SUM(CAST(y AS DECIMAL(30,6))) AS sy,
                 SUM(CAST(x * y AS DECIMAL(30,6))) AS sxy,
                 SUM(CAST(x * x AS DECIMAL(30,6))) AS sxx,
                 SUM(CAST(y * y AS DECIMAL(30,6))) AS syy
               FROM p GROUP BY k, lag),
         d AS (SELECT k, lag, n, CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
                 CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
                 CAST(syy AS DOUBLE) AS syy
               FROM m)
         SELECT k AS key, lag, n,
           round(CASE WHEN nd * sxx - sx * sx > 0 AND nd * syy - sy * sy > 0
             THEN (nd * sxy - sx * sy)
               / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
             END, 6) AS corr
         FROM d ORDER BY key, lag""",

    // Decile-edge candidates by the exact rank rule, prefix-summed class
    // counts, fraction-cleared Gini per side, (wg, threshold) argmin.
    "q246_decision_stump" ->
      """WITH base AS (SELECT n_chars AS v,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
               FROM documents),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
         rk AS (SELECT v,
                  ((CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) - 1) * 10)
                    // nn.nn AS bin
                FROM base, nn),
         ed0 AS (SELECT bin, MAX(v) AS e FROM rk WHERE bin < 9 GROUP BY bin),
         ed AS (SELECT e, ROW_NUMBER() OVER (ORDER BY e) - 1 AS i
                FROM (SELECT DISTINCT e FROM ed0)),
         bb AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ed
                        WHERE base.v > ed.e) AS bin, p
                FROM base),
         pb AS (SELECT bin, CAST(SUM(p) AS BIGINT) AS bp,
                  CAST(SUM(1 - p) AS BIGINT) AS bn
                FROM bb GROUP BY bin),
         tt AS (SELECT CAST(SUM(bp) AS BIGINT) AS tp,
                  CAST(SUM(bn) AS BIGINT) AS tn FROM pb),
         pre AS (SELECT bin,
                  CAST(SUM(bp) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lp,
                  CAST(SUM(bn) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ln
                FROM pb),
         cand AS (SELECT ed.e AS threshold, pre.lp, pre.ln
                  FROM pre JOIN ed ON ed.i = pre.bin),
         sc AS (SELECT threshold, lp, ln, tp - lp AS rp, tn - ln AS rn,
                  lp + ln AS nl, tp + tn - lp - ln AS nr
                FROM cand, tt),
         g AS (SELECT threshold, nl, nr,
                 CASE WHEN nl = 0 THEN 0 ELSE 1000000
                   - CAST(((CAST(lp AS HUGEINT) * lp + CAST(ln AS HUGEINT) * ln)
                       * 1000000) // (CAST(nl AS HUGEINT) * nl) AS BIGINT) END AS gl,
                 CASE WHEN nr = 0 THEN 0 ELSE 1000000
                   - CAST(((CAST(rp AS HUGEINT) * rp + CAST(rn AS HUGEINT) * rn)
                       * 1000000) // (CAST(nr AS HUGEINT) * nr) AS BIGINT) END AS gr,
                 GREATEST(lp, ln) + GREATEST(rp, rn) AS hits
               FROM sc),
         w AS (SELECT threshold, nl, nr,
                 CAST((CAST(nl AS HUGEINT) * gl + CAST(nr AS HUGEINT) * gr)
                   // (nl + nr) AS BIGINT) AS wg,
                 (hits * 1000000) // (nl + nr) AS acc
               FROM g),
         best AS (SELECT * FROM w ORDER BY wg, threshold LIMIT 1),
         bg AS (SELECT 1000000 - CAST(((CAST(tp AS HUGEINT) * tp
                    + CAST(tn AS HUGEINT) * tn) * 1000000)
                  // (CAST(tp + tn AS HUGEINT) * (tp + tn)) AS BIGINT)
                  AS base_gini_ppm
                FROM tt)
         SELECT best.threshold, best.nl AS n_left, best.nr AS n_right,
           bg.base_gini_ppm, best.wg AS weighted_gini_ppm,
           CAST(bg.base_gini_ppm - best.wg AS BIGINT) AS reduction_ppm,
           best.acc AS acc_ppm
         FROM best, bg""",

    // Fraction-cleared Gini per feature value in HUGEINT, nv-weighted
    // child impurity, base minus weighted.
    "q245_gini_importance" ->
      """WITH base AS (SELECT lang AS y,
                 CAST(n_chars // 100 AS VARCHAR) AS f_lenbucket,
                 source AS f_source
               FROM documents),
         cc AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY y),
         br AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                  SUM(CAST(c AS HUGEINT) * c) AS ss FROM cc),
         b2 AS (SELECT n, 1000000 - CAST((ss * 1000000)
                  // (CAST(n AS HUGEINT) * n) AS BIGINT) AS bg FROM br),
         f1 AS (SELECT f_lenbucket AS v, y, CAST(COUNT(*) AS BIGINT) AS c
                FROM base GROUP BY 1, 2),
         g1 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS nv,
                  SUM(CAST(c AS HUGEINT) * c) AS ss FROM f1 GROUP BY v),
         h1 AS (SELECT nv, 1000000 - CAST((ss * 1000000)
                  // (CAST(nv AS HUGEINT) * nv) AS BIGINT) AS gv FROM g1),
         r1 AS (SELECT 'lenbucket' AS feature, CAST(COUNT(*) AS BIGINT) AS n_values,
                  CAST(SUM(CAST(nv AS HUGEINT) * gv) // SUM(nv) AS BIGINT) AS wg
                FROM h1),
         f2 AS (SELECT f_source AS v, y, CAST(COUNT(*) AS BIGINT) AS c
                FROM base GROUP BY 1, 2),
         g2 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS nv,
                  SUM(CAST(c AS HUGEINT) * c) AS ss FROM f2 GROUP BY v),
         h2 AS (SELECT nv, 1000000 - CAST((ss * 1000000)
                  // (CAST(nv AS HUGEINT) * nv) AS BIGINT) AS gv FROM g2),
         r2 AS (SELECT 'source' AS feature, CAST(COUNT(*) AS BIGINT) AS n_values,
                  CAST(SUM(CAST(nv AS HUGEINT) * gv) // SUM(nv) AS BIGINT) AS wg
                FROM h2),
         u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
         SELECT u.feature, u.n_values, b2.bg AS base_gini_ppm,
           u.wg AS weighted_gini_ppm,
           CAST(b2.bg - u.wg AS BIGINT) AS reduction_ppm
         FROM u, b2 ORDER BY u.feature""",

    // Every window replayed straight from the synth formula — the decoder
    // is the only thing between the formula and these integers, and PCM
    // is lossless.
    "q244_audio_energy" ->
      """WITH d AS (SELECT doc_id, 64 + (doc_id % 41) AS n FROM documents),
         s AS (SELECT doc_id, i, ((doc_id * 31 + i * 7) % 65536) - 32768 AS smp
               FROM d, LATERAL (SELECT unnest(range(0, n)) AS i) u)
         SELECT doc_id AS id, CAST(i // 32 AS BIGINT) AS win,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ABS(smp)) AS BIGINT) AS abs_sum,
           CAST(SUM(smp * smp) AS BIGINT) AS energy,
           SUM(ABS(smp)) < 16384 * COUNT(*) AS silence
         FROM s GROUP BY doc_id, i // 32 ORDER BY id, win""",

    // q234's report, reached through the streaming aggregation — the
    // oracle is the batch SQL verbatim (stream == batch is the claim).
    "q243_benford_stream" ->
      """WITH v AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
                    FROM events),
         d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
               FROM v WHERE v > 0),
         cnt AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
         digits(digit, expected_ppm) AS (VALUES
           (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
           (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
         j AS (SELECT CAST(digits.digit AS BIGINT) AS digit,
                 COALESCE(cnt.n, 0) AS n,
                 CAST(digits.expected_ppm AS BIGINT) AS expected_ppm
               FROM digits LEFT JOIN cnt ON digits.digit = cnt.digit),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM j),
         sh AS (SELECT digit, n,
                  CASE WHEN t.t = 0 THEN 0 ELSE (n * 1000000) // t.t END AS share_ppm,
                  expected_ppm
                FROM j, t),
         tv AS (SELECT CAST(SUM(ABS(share_ppm - expected_ppm)) // 2 AS BIGINT) AS tvd_ppm
                FROM sh)
         SELECT sh.digit, sh.n, sh.share_ppm, sh.expected_ppm,
           CAST(ABS(sh.share_ppm - sh.expected_ppm) AS BIGINT) AS diff_ppm,
           tv.tvd_ppm
         FROM sh, tv ORDER BY sh.digit""",

    // q100's unroll with the teleport gated on the seed flag; rank starts
    // at scale on seeds, 0 elsewhere.
    "q242_personalized_pagerank" ->
      """WITH e AS (
           SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         n AS (SELECT DISTINCT id FROM
           (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         sd AS (SELECT n.id,
                  CASE WHEN n.id IN (SELECT DISTINCT src FROM e WHERE src % 10 = 0)
                       THEN 1 ELSE 0 END AS is_seed
                FROM n),
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         r0 AS (SELECT id, CAST(is_seed * 1000000 AS BIGINT) AS rank FROM sd),
         c1 AS (SELECT e.dst AS id, sum(r0.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r0 ON r0.id = e.src GROUP BY e.dst),
         r1 AS (SELECT sd.id, sd.is_seed * 150000
                  + (85 * COALESCE(c1.contrib, 0)) // 100 AS rank
                FROM sd LEFT JOIN c1 USING (id)),
         c2 AS (SELECT e.dst AS id, sum(r1.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r1 ON r1.id = e.src GROUP BY e.dst),
         r2 AS (SELECT sd.id, sd.is_seed * 150000
                  + (85 * COALESCE(c2.contrib, 0)) // 100 AS rank
                FROM sd LEFT JOIN c2 USING (id)),
         c3 AS (SELECT e.dst AS id, sum(r2.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r2 ON r2.id = e.src GROUP BY e.dst),
         r3 AS (SELECT sd.id, sd.is_seed * 150000
                  + (85 * COALESCE(c3.contrib, 0)) // 100 AS rank
                FROM sd LEFT JOIN c3 USING (id))
         SELECT id, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY id""",

    // q79's assignment CTE (same IEEE distance sums, same lower-cid tie),
    // then majority label per cluster and the global purity ppm.
    "q241_cluster_purity" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             label
           FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         s AS (SELECT e.vec_id AS id, e.label, c.cid,
                 list_sum(list_transform(range(1, len(e.v) + 1),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
               FROM e CROSS JOIN c),
         a AS (SELECT id, label, cid FROM (
                 SELECT id, label, cid,
                   row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
                 FROM s) WHERE rn = 1),
         cell AS (SELECT cid, CAST(label AS BIGINT) AS label,
                    CAST(COUNT(*) AS BIGINT) AS n
                  FROM a GROUP BY 1, 2),
         tops AS (SELECT cid, label AS top_label, n AS top_n,
                    row_number() OVER (PARTITION BY cid ORDER BY n DESC, label) AS rn
                  FROM cell),
         tots AS (SELECT cid, CAST(SUM(n) AS BIGINT) AS n FROM cell GROUP BY cid),
         t1 AS (SELECT t.cid, tots.n, t.top_label, t.top_n
                FROM tops t JOIN tots USING (cid) WHERE t.rn = 1),
         g AS (SELECT (SUM(top_n) * 1000000) // SUM(n) AS purity_ppm FROM t1)
         SELECT t1.cid, t1.n, t1.top_label, t1.top_n,
           CAST(g.purity_ppm AS BIGINT) AS purity_ppm
         FROM t1, g ORDER BY t1.cid""",

    // Per-user conversion units, then the fraction-cleared z² in HUGEINT
    // with identical degenerate-case NULLs.
    "q240_ab_test" ->
      """WITH u AS (SELECT user_id,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
               FROM events GROUP BY user_id),
         agg AS (SELECT
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c ELSE 0 END) AS BIGINT) AS x_a,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE c END) AS BIGINT) AS x_b
           FROM u),
         z AS (SELECT n_a, n_b, x_a, x_b,
             CASE WHEN n_a = 0 THEN NULL ELSE (x_a * 1000000) // n_a END AS p_a_ppm,
             CASE WHEN n_b = 0 THEN NULL ELSE (x_b * 1000000) // n_b END AS p_b_ppm,
             CASE WHEN n_a = 0 OR n_b = 0 OR x_a + x_b = 0
                    OR x_a + x_b = n_a + n_b THEN NULL
                  ELSE CAST(((CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a)
                         * (CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a)
                         * (n_a + n_b) * 1000000)
                    // (CAST(n_a AS HUGEINT) * n_b * (x_a + x_b)
                         * (CAST(n_a AS HUGEINT) + n_b - x_a - x_b)) AS BIGINT)
             END AS z2_ppm
           FROM agg)
         SELECT n_a, n_b, x_a, x_b, p_a_ppm, p_b_ppm, z2_ppm,
           COALESCE(z2_ppm >= 3841459, FALSE) AS significant
         FROM z""",

    // Same stopword-hit ppm score, fixed decile bins, per-bin rate vs mean
    // score, ECE as the n-weighted gap mean — all floor division.
    "q239_calibration" ->
      """WITH t AS (
           SELECT lang, list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         sc AS (SELECT
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE (CAST(len(list_filter(toks, x -> list_contains(
                          ['the','and','of','to','is','that','it','was','with','for'],
                          x))) AS BIGINT) * 1000000) // len(toks)
             END AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
           FROM t),
         b AS (SELECT CAST(LEAST(GREATEST(s, 0) // 100000, 9) AS BIGINT) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS n_pos,
                 CAST(SUM(s) AS BIGINT) AS ss
               FROM sc GROUP BY 1),
         r AS (SELECT bin, n, n_pos, (n_pos * 1000000) // n AS rate_ppm,
                 ss // n AS mean_score_ppm
               FROM b),
         ec AS (SELECT CAST(SUM(n * ABS(rate_ppm - mean_score_ppm)) // SUM(n)
                  AS BIGINT) AS ece_ppm
                FROM r)
         SELECT r.bin, r.n, r.n_pos, r.rate_ppm, r.mean_score_ppm,
           CAST(ABS(r.rate_ppm - r.mean_score_ppm) AS BIGINT) AS gap_ppm,
           ec.ece_ppm
         FROM r, ec ORDER BY r.bin""",

    // Distinct (user, day, type) baskets, within-basket pair join, ppm
    // confidence/lift with HUGEINT-cleared numerators.
    "q238_association_rules" ->
      """WITH b AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d,
                 event_type AS it
               FROM events WHERE event_type IS NOT NULL),
         nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
                FROM (SELECT DISTINCT user_id, d FROM b)),
         supp AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY it),
         joint AS (SELECT x.it AS antecedent, y.it AS consequent,
                     CAST(COUNT(*) AS BIGINT) AS n_joint
                   FROM b x JOIN b y ON x.user_id = y.user_id AND x.d = y.d
                     AND x.it <> y.it
                   GROUP BY 1, 2 HAVING COUNT(*) >= 20)
         SELECT j.antecedent, j.consequent, j.n_joint,
           sa.s AS n_ante, sc.s AS n_cons, nb.n_baskets,
           (j.n_joint * 1000000) // sa.s AS conf_ppm,
           CAST((CAST(j.n_joint AS HUGEINT) * nb.n_baskets * 1000000)
             // (CAST(sa.s AS HUGEINT) * sc.s) AS BIGINT) AS lift_ppm
         FROM joint j
         JOIN supp sa ON j.antecedent = sa.it
         JOIN supp sc ON j.consequent = sc.it
         CROSS JOIN nb
         ORDER BY j.antecedent, j.consequent""",

    // The operator joins FNV-64 fingerprints; the oracle joins raw text —
    // identical counts up to 2^-64 collisions (the q57 convention).
    "q237_source_overlap" ->
      """WITH all_docs AS (
           SELECT source, text FROM documents
           UNION ALL
           SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 7 = 0),
         fp AS (SELECT DISTINCT source AS src, text AS t FROM all_docs),
         tot AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM fp GROUP BY src),
         sh AS (SELECT x.src AS src_a, y.src AS src_b,
                  CAST(COUNT(*) AS BIGINT) AS n_shared
                FROM fp x JOIN fp y ON x.t = y.t AND x.src < y.src
                GROUP BY 1, 2)
         SELECT sh.src_a, sh.src_b, sh.n_shared, ta.n AS n_a, tb.n AS n_b,
           (sh.n_shared * 1000000) // ta.n AS overlap_a_ppm,
           (sh.n_shared * 1000000) // tb.n AS overlap_b_ppm
         FROM sh JOIN tot ta ON sh.src_a = ta.src
         JOIN tot tb ON sh.src_b = tb.src
         ORDER BY sh.src_a, sh.src_b""",

    // Same planted construction, counts on the raw text, the identical
    // three-pattern sequential replace — the redacted STRING hash-matches.
    "q236_pii_redact" ->
      """WITH planted AS (
           SELECT doc_id AS id,
             CASE WHEN doc_id % 2 = 0 THEN
               text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex'
                 || CAST(doc_id % 7 AS VARCHAR) || '.org ip 10.'
                 || CAST(doc_id % 256 AS VARCHAR) || '.0.1 acct 90000000'
                 || CAST(doc_id AS VARCHAR)
             ELSE text END AS t
           FROM documents)
         SELECT id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '[0-9]{9,}')) AS BIGINT) AS n_longnum,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
             '[0-9]{9,}', '<NUM>', 'g') AS redacted
         FROM planted ORDER BY id""",

    // Position-stamped tokens, one (doc, pos) equi-join per offset via the
    // BETWEEN bound, canonical least/greatest pair, 1/d floor-ppm weights.
    "q235_skipgram_cooc" ->
      """WITH tok0 AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0) AS tk
           FROM documents),
         t AS (SELECT doc_id, i - 1 AS pos, tk[i] AS tok
               FROM tok0, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) u),
         p AS (SELECT least(a.tok, b.tok) AS w_a, greatest(a.tok, b.tok) AS w_b,
                 b.pos - a.pos AS d
               FROM t a JOIN t b ON a.doc_id = b.doc_id
                 AND b.pos > a.pos AND b.pos <= a.pos + 3)
         SELECT w_a, w_b, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(1000000 // d) AS BIGINT) AS weight_ppm
         FROM p GROUP BY w_a, w_b HAVING COUNT(*) >= 5
         ORDER BY w_a, w_b""",

    // Leading digit via BIGINT string rendering; expected table = the same
    // pinned floor(1e6*log10(1+1/d)) constants; TVD in ppm.
    "q234_benford" ->
      """WITH v AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
                    FROM events),
         d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
               FROM v WHERE v > 0),
         cnt AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
         digits(digit, expected_ppm) AS (VALUES
           (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
           (6, 66946), (7, 57991), (8, 51152), (9, 45757)),
         j AS (SELECT CAST(digits.digit AS BIGINT) AS digit,
                 COALESCE(cnt.n, 0) AS n,
                 CAST(digits.expected_ppm AS BIGINT) AS expected_ppm
               FROM digits LEFT JOIN cnt ON digits.digit = cnt.digit),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM j),
         sh AS (SELECT digit, n,
                  CASE WHEN t.t = 0 THEN 0 ELSE (n * 1000000) // t.t END AS share_ppm,
                  expected_ppm
                FROM j, t),
         tv AS (SELECT CAST(SUM(ABS(share_ppm - expected_ppm)) // 2 AS BIGINT) AS tvd_ppm
                FROM sh)
         SELECT sh.digit, sh.n, sh.share_ppm, sh.expected_ppm,
           CAST(ABS(sh.share_ppm - sh.expected_ppm) AS BIGINT) AS diff_ppm,
           tv.tvd_ppm
         FROM sh, tv ORDER BY sh.digit""",

    // Fraction-cleared kappa in HUGEINT with the same explicit sign split,
    // so floor-vs-truncate never diverges.
    "q233_cohens_kappa" ->
      """WITH l AS (SELECT
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\s+'),
                 x -> len(x) > 0)) >= 40 THEN 1 ELSE 0 END AS b
           FROM documents),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
                 FROM l),
         ca AS (SELECT a AS lbl, COUNT(*) AS c FROM l GROUP BY a),
         cb AS (SELECT b AS lbl, COUNT(*) AS c FROM l GROUP BY b),
         pe AS (SELECT COALESCE(SUM(CAST(ca.c AS HUGEINT) * cb.c),
                  CAST(0 AS HUGEINT)) AS pe_num
                FROM ca JOIN cb USING (lbl))
         SELECT n, n_agree,
           (n_agree * 1000000) // n AS po_ppm,
           CAST((pe_num * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm,
           CASE WHEN CAST(n AS HUGEINT) * n - pe_num = 0 THEN NULL
                WHEN CAST(n_agree AS HUGEINT) * n - pe_num >= 0 THEN
                  CAST(((CAST(n_agree AS HUGEINT) * n - pe_num) * 1000000)
                    // (CAST(n AS HUGEINT) * n - pe_num) AS BIGINT)
                ELSE -CAST(((pe_num - CAST(n_agree AS HUGEINT) * n) * 1000000)
                    // (CAST(n AS HUGEINT) * n - pe_num) AS BIGINT)
           END AS kappa_ppm
         FROM tot, pe""",

    // Reference deciles by the exact rank rule, both cohorts re-binned by
    // strict-greater edge counts, shares and TVD in floor-ppm.
    "q232_numeric_drift" ->
      """WITH rv AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
                     FROM events WHERE user_id % 2 = 0),
         cvv AS (SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
                 FROM events WHERE user_id % 2 = 1),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM rv),
         rk AS (SELECT v,
                  ((CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) - 1) * 10)
                    // n.nn AS bin
                FROM rv, n),
         ed AS (SELECT bin, MAX(v) AS e FROM rk WHERE bin < 9 GROUP BY bin),
         rb AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ed WHERE rv.v > ed.e) AS bin FROM rv),
         cb AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ed WHERE cvv.v > ed.e) AS bin FROM cvv),
         rg AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_ref FROM rb GROUP BY bin),
         cg AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_cur FROM cb GROUP BY bin),
         j AS (SELECT COALESCE(rg.bin, cg.bin) AS bin,
                 COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
               FROM rg FULL OUTER JOIN cg ON rg.bin = cg.bin),
         t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                 CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM j),
         sh AS (SELECT bin, n_ref, n_cur,
                  CASE WHEN t_ref = 0 THEN 0 ELSE (n_ref * 1000000) // t_ref END AS share_ref_ppm,
                  CASE WHEN t_cur = 0 THEN 0 ELSE (n_cur * 1000000) // t_cur END AS share_cur_ppm
                FROM j, t),
         tv AS (SELECT CAST(SUM(ABS(share_cur_ppm - share_ref_ppm)) // 2 AS BIGINT) AS tvd_ppm
                FROM sh)
         SELECT sh.bin,
           CASE WHEN sh.bin = 0 THEN NULL
                ELSE (SELECT e FROM ed WHERE ed.bin = sh.bin - 1) END AS edge_lo,
           sh.n_ref, sh.n_cur, sh.share_ref_ppm, sh.share_cur_ppm,
           CAST(ABS(sh.share_cur_ppm - sh.share_ref_ppm) AS BIGINT) AS diff_ppm,
           tv.tvd_ppm
         FROM sh, tv ORDER BY sh.bin""",

    // Wedges over the symmetric adjacency, known edges anti-joined out,
    // integer Jaccard over the degree union.
    "q231_link_prediction" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e AS (SELECT DISTINCT x.l_partkey AS id_a, y.l_partkey AS id_b
               FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                 AND x.l_partkey < y.l_partkey),
         adj AS (SELECT id_a AS u, id_b AS w FROM e
                 UNION ALL SELECT id_b, id_a FROM e),
         deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY u),
         pairs AS (SELECT x.u AS id_a, y.u AS id_b, CAST(COUNT(*) AS BIGINT) AS cn
                   FROM adj x JOIN adj y ON x.w = y.w AND x.u < y.u
                   GROUP BY 1, 2),
         cand AS (SELECT p.id_a, p.id_b, p.cn FROM pairs p
                  LEFT JOIN e ON p.id_a = e.id_a AND p.id_b = e.id_b
                  WHERE e.id_a IS NULL)
         SELECT c.id_a, c.id_b, c.cn, da.deg AS deg_a, db.deg AS deg_b,
           (c.cn * 1000000) // (da.deg + db.deg - c.cn) AS jaccard_ppm
         FROM cand c
         JOIN deg da ON c.id_a = da.u
         JOIN deg db ON c.id_b = db.u
         ORDER BY c.id_a, c.id_b""",

    "q230_kcenter" -> kcenterOracle(8),

    // Contingency margins from the cell table; fraction-cleared
    // (O·N − rT·cT)²/(N·rT·cT) in HUGEINT, one floor division to ppm.
    "q229_chi2_independence" ->
      """WITH cells AS (SELECT lang AS a, source AS b,
                 CAST(COUNT(*) AS BIGINT) AS o
               FROM documents GROUP BY 1, 2),
         r AS (SELECT a, CAST(SUM(o) AS BIGINT) AS row_total FROM cells GROUP BY a),
         c AS (SELECT b, CAST(SUM(o) AS BIGINT) AS col_total FROM cells GROUP BY b),
         n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
         SELECT cells.a, cells.b, cells.o, r.row_total, c.col_total, n.n,
           CAST((CAST(r.row_total AS HUGEINT) * c.col_total * 1000000)
             // n.n AS BIGINT) AS e_ppm,
           CAST(((CAST(cells.o AS HUGEINT) * n.n
                   - CAST(r.row_total AS HUGEINT) * c.col_total)
                 * (CAST(cells.o AS HUGEINT) * n.n
                   - CAST(r.row_total AS HUGEINT) * c.col_total) * 1000000)
             // (CAST(n.n AS HUGEINT) * r.row_total * c.col_total)
             AS BIGINT) AS contrib_ppm
         FROM cells JOIN r USING (a) JOIN c USING (b) CROSS JOIN n
         ORDER BY cells.a, cells.b""",

    // Rank-sum AUC over the score histogram: strictly-below negatives via
    // the running window, half-credit ties via the doubled numerator.
    "q228_roc_auc" ->
      """WITH base AS (SELECT n_chars AS s,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
               FROM documents),
         h AS (SELECT s, CAST(SUM(p) AS BIGINT) AS cp,
                 CAST(SUM(1 - p) AS BIGINT) AS cn
               FROM base GROUP BY s),
         rr AS (SELECT cp, cn,
                  COALESCE(SUM(cn) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
                FROM h)
         SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
           CAST(SUM(cn) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_scores,
           CAST((SUM(CAST(cp AS HUGEINT) * (2 * nb + cn)) * 1000000)
             // (2 * CAST(SUM(cp) AS HUGEINT) * SUM(cn)) AS BIGINT) AS auc_ppm
         FROM rr""",

    // LEAD over the same (ts, event_id) per-user order; the ppm floor
    // division replays the integer normalization exactly.
    "q227_markov_transitions" ->
      """WITH seq AS (
           SELECT user_id, event_type AS s,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events),
         m AS (
           SELECT s AS from_state, nxt AS to_state,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM seq WHERE nxt IS NOT NULL GROUP BY s, nxt)
         SELECT from_state, to_state, n,
           CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT) AS from_total,
           (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT)
             AS p_ppm
         FROM m ORDER BY from_state, to_state""",

    // The O(n^2) NOT EXISTS dominance definition — the semantics the
    // two-level running-max plan must reproduce exactly, duplicates and
    // equal-x ties included.
    "q226_skyline" ->
      """WITH base AS (
           SELECT p_partkey AS id,
             CAST(CAST(p_retailprice AS DECIMAL(18,6)) * 100 AS BIGINT) AS x,
             CAST(p_size AS BIGINT) AS y
           FROM part)
         SELECT id, x, y FROM base a
         WHERE NOT EXISTS (
           SELECT 1 FROM base b
           WHERE b.x <= a.x AND b.y >= a.y AND (b.x < a.x OR b.y > a.y))
         ORDER BY id""",

    "q225_concurrency" ->
      """WITH b AS (
           SELECT event_id AS id, CAST(epoch_us(ts) AS BIGINT) AS t,
             CAST(1 AS BIGINT) AS d
           FROM events
           UNION ALL
           SELECT event_id,
             CAST(epoch_us(ts) AS BIGINT)
               + CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT),
             CAST(-1 AS BIGINT)
           FROM events)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY t, d, id) AS BIGINT) AS seq,
           t, d, id,
           CAST(SUM(d) OVER (ORDER BY t, d, id ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS active
         FROM b ORDER BY seq""",

    // The full FNV-1a fold per canonicalized row in HUGEINT, summed
    // mod 2^64 and mapped to signed — both output rows replay from the
    // same table, which is the point (layout cannot move the checksum).
    "q224_table_fingerprint" ->
      """WITH r AS (SELECT CAST(l_orderkey AS VARCHAR) || chr(1)
               || CAST(l_linenumber AS VARCHAR) || chr(1)
               || l_returnflag || chr(1) || l_linestatus AS s
             FROM lineitem),
         h AS (SELECT list_reduce(
                 list_prepend(CAST('14695981039346656037' AS HUGEINT),
                   list_transform(string_split(s, ''),
                     ch -> CAST(unicode(ch) AS HUGEINT))),
                 (acc, c) -> (xor(acc, c) * 1099511628211)
                   % CAST('18446744073709551616' AS HUGEINT)) AS u
               FROM r),
         m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 SUM(u) % CAST('18446744073709551616' AS HUGEINT) AS mm
               FROM h),
         one AS (SELECT n_rows,
                 CAST(CASE WHEN mm >= CAST('9223372036854775808' AS HUGEINT)
                      THEN mm - CAST('18446744073709551616' AS HUGEINT)
                      ELSE mm END AS BIGINT) AS checksum
               FROM m)
         SELECT 'lineitem' AS tbl, n_rows, checksum FROM one
         UNION ALL
         SELECT 'lineitem_shuffled' AS tbl, n_rows, checksum FROM one
         ORDER BY tbl""",

    // Both layouts replayed with the q214 bin rule on their respective
    // orders; per-file zones and the band test in plain aggregates.
    "q223_zone_map_skip" ->
      """WITH base AS (SELECT event_id AS id,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
             FROM events),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
         arr AS (SELECT v,
                 ((CAST(ROW_NUMBER() OVER (ORDER BY id) AS BIGINT) - 1) * 32)
                   // n.nn AS f
               FROM base, n),
         srt AS (SELECT v,
                 ((CAST(ROW_NUMBER() OVER (ORDER BY v, id) AS BIGINT) - 1) * 32)
                   // n.nn AS f
               FROM base, n),
         fa AS (SELECT f, MIN(v) AS mn, MAX(v) AS mx,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(COUNT(*) FILTER (v BETWEEN 30000000 AND 40000000)
                   AS BIGINT) AS nm
               FROM arr GROUP BY f),
         fs AS (SELECT f, MIN(v) AS mn, MAX(v) AS mx,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(COUNT(*) FILTER (v BETWEEN 30000000 AND 40000000)
                   AS BIGINT) AS nm
               FROM srt GROUP BY f),
         ra AS (SELECT 'arrival' AS layout,
                 CAST(COUNT(*) AS BIGINT) AS n_files,
                 CAST(COUNT(*) FILTER (mx >= 30000000 AND mn <= 40000000)
                   AS BIGINT) AS files_hit,
                 CAST(COALESCE(SUM(cnt) FILTER (mx >= 30000000
                   AND mn <= 40000000), 0) AS BIGINT) AS rows_in_hit_files,
                 CAST(SUM(nm) AS BIGINT) AS rows_matching,
                 CAST(SUM(cnt) AS BIGINT) AS nr
               FROM fa),
         rs AS (SELECT 'value_sorted' AS layout,
                 CAST(COUNT(*) AS BIGINT) AS n_files,
                 CAST(COUNT(*) FILTER (mx >= 30000000 AND mn <= 40000000)
                   AS BIGINT) AS files_hit,
                 CAST(COALESCE(SUM(cnt) FILTER (mx >= 30000000
                   AND mn <= 40000000), 0) AS BIGINT) AS rows_in_hit_files,
                 CAST(SUM(nm) AS BIGINT) AS rows_matching,
                 CAST(SUM(cnt) AS BIGINT) AS nr
               FROM fs)
         SELECT layout, n_files, files_hit, rows_in_hit_files, rows_matching,
           ((n_files - files_hit) * 1000000) // n_files AS skip_ppm,
           (rows_in_hit_files * 1000000) // nr AS scan_ppm
         FROM (SELECT * FROM ra UNION ALL SELECT * FROM rs)
         ORDER BY layout""",

    // Brute-force quadratic ground truth (feasible at sf0.01) — the
    // prefix-filtered join must reproduce it EXACTLY, boundary included.
    "q222_ppjoin" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0)) AS tk
           FROM documents),
         s AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS sz
               FROM t WHERE len(tk) > 0),
         p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                 CAST(len(list_intersect(x.tk, y.tk)) AS BIGINT) AS inter,
                 x.sz AS sza, y.sz AS szb
               FROM s x JOIN s y ON x.doc_id < y.doc_id)
         SELECT id_a, id_b, inter,
           (inter * 1000000) // (sza + szb - inter) AS jac_ppm
         FROM p WHERE inter * 1000000 >= 900000 * (sza + szb - inter)
         ORDER BY id_a, id_b""",

    // Three unrolled min-relaxation rounds over the doubled edge list;
    // seed set = graph nodes divisible by 7 at distance 0.
    "q221_bfs_distance" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey),
         nb AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         d0 AS (SELECT DISTINCT a AS id, CAST(0 AS BIGINT) AS dist
                FROM nb WHERE a % 7 = 0),
         d1 AS (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM (
                  SELECT nb.b AS id, d.dist + 1 AS dist
                  FROM nb JOIN d0 d ON nb.a = d.id
                  UNION ALL SELECT id, dist FROM d0) GROUP BY id),
         d2 AS (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM (
                  SELECT nb.b AS id, d.dist + 1 AS dist
                  FROM nb JOIN d1 d ON nb.a = d.id
                  UNION ALL SELECT id, dist FROM d1) GROUP BY id),
         d3 AS (SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM (
                  SELECT nb.b AS id, d.dist + 1 AS dist
                  FROM nb JOIN d2 d ON nb.a = d.id
                  UNION ALL SELECT id, dist FROM d2) GROUP BY id)
         SELECT id, dist FROM d3 ORDER BY id""",

    // Three unrolled synchronous rounds; per-node argmax replayed as
    // ROW_NUMBER over (count DESC, label) — the same smallest-label tie.
    "q220_label_propagation" ->
      """WITH hi AS (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey),
         nb AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         l0 AS (SELECT DISTINCT a AS id, a AS label FROM nb),
         l1 AS (SELECT id, label FROM (
                  SELECT nb.a AS id, l.label AS label,
                    ROW_NUMBER() OVER (PARTITION BY nb.a
                      ORDER BY COUNT(*) DESC, l.label) AS rn
                  FROM nb JOIN l0 l ON nb.b = l.id
                  GROUP BY nb.a, l.label) WHERE rn = 1),
         l2 AS (SELECT id, label FROM (
                  SELECT nb.a AS id, l.label AS label,
                    ROW_NUMBER() OVER (PARTITION BY nb.a
                      ORDER BY COUNT(*) DESC, l.label) AS rn
                  FROM nb JOIN l1 l ON nb.b = l.id
                  GROUP BY nb.a, l.label) WHERE rn = 1),
         l3 AS (SELECT id, label FROM (
                  SELECT nb.a AS id, l.label AS label,
                    ROW_NUMBER() OVER (PARTITION BY nb.a
                      ORDER BY COUNT(*) DESC, l.label) AS rn
                  FROM nb JOIN l2 l ON nb.b = l.id
                  GROUP BY nb.a, l.label) WHERE rn = 1)
         SELECT id, label FROM l3 ORDER BY id""",

    // The merged read's answer is the two batches re-unioned with NULL
    // padding on the pre-evolution rows.
    "q219_schema_evolution" ->
      """SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars,
           CAST(1 AS BIGINT) AS batch
         FROM documents WHERE doc_id % 2 = 0
         UNION ALL
         SELECT doc_id, lang, n_chars, CAST(2 AS BIGINT) AS batch
         FROM documents WHERE doc_id % 2 = 1
         ORDER BY doc_id""",

    // Histogram arithmetic only — the estimated joins never run here
    // either; est = sum of per-key count products, argmax by
    // (product DESC, key).
    "q218_join_card_estimate" ->
      """WITH lo AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                     FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
         ll AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         j1 AS (SELECT lo.k, lo.c * ll.c AS nr FROM lo JOIN ll USING (k)),
         s1 AS (SELECT CAST(SUM(nr) AS BIGINT) AS est_rows,
                  CAST(COUNT(*) AS BIGINT) AS n_matched FROM j1),
         m1 AS (SELECT k AS max_key, nr AS max_key_rows FROM j1
                ORDER BY nr DESC, k LIMIT 1),
         r1 AS (SELECT 'orders_lineitem' AS pair, est_rows,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM lo) AS n_keys_left,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM ll) AS n_keys_right,
                  n_matched AS n_matched_keys, max_key, max_key_rows,
                  CAST(CASE WHEN est_rows = 0 THEN 0
                    ELSE (max_key_rows * 1000000) // est_rows END AS BIGINT)
                    AS max_share_ppm
                FROM s1, m1),
         lp AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         j2 AS (SELECT k, c * c AS nr FROM lp),
         s2 AS (SELECT CAST(SUM(nr) AS BIGINT) AS est_rows,
                  CAST(COUNT(*) AS BIGINT) AS n_matched FROM j2),
         m2 AS (SELECT k AS max_key, nr AS max_key_rows FROM j2
                ORDER BY nr DESC, k LIMIT 1),
         r2 AS (SELECT 'lineitem_self_partkey' AS pair, est_rows,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM lp) AS n_keys_left,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM lp) AS n_keys_right,
                  n_matched AS n_matched_keys, max_key, max_key_rows,
                  CAST(CASE WHEN est_rows = 0 THEN 0
                    ELSE (max_key_rows * 1000000) // est_rows END AS BIGINT)
                    AS max_share_ppm
                FROM s2, m2)
         SELECT * FROM r1 UNION ALL SELECT * FROM r2 ORDER BY pair""",

    // Per-class TVD with absent values charged through the constant
    // global ppm mass; every share a floor division.
    "q217_t_closeness" ->
      """WITH pair AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
                       FROM documents GROUP BY 1, 2),
         gl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS g
                  FROM documents GROUP BY 1),
         tot AS (SELECT CAST(SUM(g) AS BIGINT) AS t FROM gl),
         gs AS (SELECT lang, (g * 1000000) // t AS q FROM gl, tot),
         gm AS (SELECT CAST(SUM(q) AS BIGINT) AS qtot FROM gs),
         cls AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
                 FROM pair GROUP BY 1),
         pc AS (SELECT p.source, MAX(cls.n) AS n,
                  (CAST(SUM(ABS((p.c * 1000000) // cls.n - gs.q) - gs.q)
                     AS BIGINT) + MAX(gm.qtot)) // 2 AS tvd
                FROM pair p JOIN cls USING (source)
                  JOIN gs USING (lang), gm
                GROUP BY p.source)
         SELECT 'docs_lang_by_source_t10' AS rule,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(tvd) AS BIGINT) AS max_tvd_ppm,
           CAST(SUM(CASE WHEN tvd > 100000 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_above_t,
           (CAST(SUM(CASE WHEN tvd > 100000 THEN n ELSE 0 END) AS BIGINT)
             * 1000000) // CAST(SUM(n) AS BIGINT) AS risk_ppm,
           CAST(CASE WHEN MAX(tvd) <= 100000 THEN 1 ELSE 0 END AS BIGINT)
             AS close
         FROM pc""",

    // One CTE per bit level; pure integer recurrence.
    "q216_hilbert" -> hilbertOracle(8),

    // Rank + judgment joins replayed; aggregates over an empty hit join
    // still return their one row (global aggregate semantics both engines).
    "q215_retrieval_eval" ->
      """WITH t AS (
           SELECT doc_id, list_distinct(list_filter(
             regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0)) AS tk
           FROM documents),
         m AS (
           SELECT doc_id,
             len(list_intersect(tk, ['spark', 'join'])) AS m2,
             len(list_intersect(tk, ['spark', 'join', 'window'])) AS m3
           FROM t),
         ranked AS (
           SELECT doc_id, ROW_NUMBER() OVER (ORDER BY m2 DESC, doc_id) AS rank
           FROM m ORDER BY m2 DESC, doc_id LIMIT 50),
         rel AS (SELECT doc_id FROM m WHERE m3 = 3),
         hits AS (
           SELECT MIN(rank) AS frr,
             COUNT(*) FILTER (rank <= 10) AS hk, COUNT(*) AS ht
           FROM ranked JOIN rel USING (doc_id)),
         nr AS (SELECT COUNT(*) AS n_rel FROM rel)
         SELECT CAST(1 AS BIGINT) AS qid, CAST(n_rel AS BIGINT) AS n_rel,
           CAST(COALESCE(frr, 0) AS BIGINT) AS first_rel_rank,
           CAST(COALESCE(hk, 0) AS BIGINT) AS hits_at_k,
           CAST(COALESCE(ht, 0) AS BIGINT) AS hits_total,
           CAST(CASE WHEN COALESCE(frr, 0) = 0 THEN 0
                     ELSE 1000000 // frr END AS BIGINT) AS rr_ppm,
           CAST(COALESCE(hk, 0) * 1000000 // 10 AS BIGINT) AS precision_at_k_ppm,
           CAST(CASE WHEN n_rel = 0 THEN 0
                     ELSE COALESCE(hk, 0) * 1000000 // n_rel END AS BIGINT) AS recall_at_k_ppm
         FROM hits, nr""",

    // One-line replay: the bin is a pure function of the exact rank.
    "q214_quantile_bins" ->
      """WITH b AS (
           SELECT event_id AS id,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
           FROM events),
         r AS (
           SELECT id, v, ROW_NUMBER() OVER (ORDER BY v, id) AS rank,
             COUNT(*) OVER () AS n
           FROM b)
         SELECT id, v, CAST(rank AS BIGINT) AS rank,
           CAST(((rank - 1) * 10) // n AS BIGINT) AS bin
         FROM r ORDER BY id""",

    // Blocking replayed exactly: prefix fingerprint (q29's fold over the
    // first 3 tokens), ROW_NUMBER rank, w-window candidates, integer-ppm
    // trigram-Jaccard verification, then the q111 component/representative
    // tail.
    "q213_entity_resolution" ->
      """WITH RECURSIVE t AS MATERIALIZED (
           SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                      x -> len(x) > 0) AS toks
           FROM documents),
         hs AS (
           SELECT doc_id, list_transform(toks[1:3], tok ->
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))) AS hlist
           FROM t),
         fp AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT), hlist),
               (acc, h) -> xor((acc * 32) % CAST('18446744073709551616' AS HUGEINT)
                               + acc // CAST('576460752303423488' AS HUGEINT), h)) AS u
           FROM hs),
         key AS (
           SELECT doc_id,
             CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS k
           FROM fp),
         r AS MATERIALIZED (
           SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM key),
         cand AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7),
         sh AS MATERIALIZED (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         pairs AS (
           SELECT id_a, id_b FROM cand
           JOIN sh sa ON sa.doc_id = id_a
           JOIN sh sb ON sb.doc_id = id_b
           WHERE len(list_intersect(sa.s, sb.s)) * 1000000
             // (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 800000),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
         sc AS (SELECT doc_id AS id, CAST(len(text) AS BIGINT) AS score FROM documents),
         rep AS (
           SELECT component_id, id AS rep_id FROM (
             SELECT c.component_id, c.id,
               row_number() OVER (PARTITION BY c.component_id
                 ORDER BY sc.score DESC, c.id) AS rn
             FROM comp c JOIN sc ON c.id = sc.id)
           WHERE rn = 1)
         SELECT c.id, c.component_id, r.rep_id, c.id = r.rep_id AS kept
         FROM comp c JOIN rep r USING (component_id)
         ORDER BY c.id""",

    // 8 greedy selection rounds unrolled mechanically (the bpeCtes
    // pattern); every score is integer ppm so the argmax chain is exact.
    "q212_mmr_rerank" -> mmrOracle(8),

    // Integer replay of the sqrt-milli pipeline: FLOOR(SQRT(n*1e6)) is
    // exact below 2^53, the rest is BIGINT floor division.
    "q211_temperature_weights" ->
      """WITH c AS (
           SELECT source AS "group", CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
         s AS (
           SELECT "group", n,
             CAST(FLOOR(SQRT(CAST(n AS DOUBLE) * 1000000.0)) AS BIGINT) AS sqrt_milli
           FROM c),
         t AS (SELECT CAST(SUM(sqrt_milli) AS BIGINT) AS tot FROM s)
         SELECT "group", n, sqrt_milli,
           CASE WHEN t.tot = 0 THEN CAST(0 AS BIGINT)
                ELSE (sqrt_milli * 1000000) // t.tot END AS weight_ppm
         FROM s, t ORDER BY "group" """,

    // Class variety per quasi-identifier class; counts cast to BIGINT
    // before the ppm division (DuckDB SUM widens to HUGEINT).
    "q210_l_diversity" ->
      """WITH cls AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS d
           FROM documents GROUP BY source)
         SELECT 'docs_lang_by_source_l3' AS rule,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(d) AS BIGINT) AS min_distinct_sensitive,
           CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT) AS n_rows_below_l,
           (CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT) * 1000000)
             // CAST(SUM(n) AS BIGINT) AS risk_ppm,
           CAST(CASE WHEN MIN(d) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS diverse
         FROM cls""",

    // Per-column stats UNION'd row-per-column; every count cast to BIGINT
    // (DuckDB SUM would widen to HUGEINT and hash differently).
    "q209_profile" ->
      """WITH p AS (
           SELECT 'doc_id' AS "column", COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
             CAST(MIN(doc_id) AS VARCHAR) AS min_str,
             CAST(MAX(doc_id) AS VARCHAR) AS max_str
           FROM documents
           UNION ALL
           SELECT 'lang', COUNT(*),
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT lang) AS BIGINT),
             CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
           FROM documents
           UNION ALL
           SELECT 'source', COUNT(*),
             CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT source) AS BIGINT),
             CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
           FROM documents
           UNION ALL
           SELECT 'n_chars', COUNT(*),
             CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT n_chars) AS BIGINT),
             CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
           FROM documents)
         SELECT "column", n_rows, n_nulls, n_distinct, min_str, max_str
         FROM p ORDER BY "column" """,

    // q29's portable-fingerprint CTEs as the sort key, ROW_NUMBER over
    // (key, id) as the global rank, pairs = rank distance in [1, w-1].
    "q208_sorted_neighborhood" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                      x -> len(x) > 0) AS ts
           FROM documents),
         hs AS (
           SELECT doc_id, list_transform(ts, tok ->
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))) AS hlist
           FROM toks),
         fp AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT), hlist),
               (acc, h) -> xor((acc * 32) % CAST('18446744073709551616' AS HUGEINT)
                               + acc // CAST('576460752303423488' AS HUGEINT), h)) AS u
           FROM hs),
         k AS (
           SELECT doc_id,
             CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS k
           FROM fp),
         r AS (SELECT doc_id, k, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM k)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.k AS key_a, b.k AS key_b,
           CAST(b.rn - a.rn AS BIGINT) AS d
         FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7
         ORDER BY id_a, id_b""",

    // The cascade per (user, day window), emitted one row per reached
    // stage, restricted to days the final watermark closed: the watermark
    // after the drain is floor(max_us/1000) ms - 1 hour, and an event-time
    // timeout fires strictly below it (StreamingSpec pins the boundary).
    "q207_stream_funnel" ->
      """WITH e AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
           FROM events),
         wm AS (SELECT (MAX(us) // 1000) - 3600000 AS wm_ms FROM e),
         t AS (SELECT user_id, us // 86400000000 AS win, event_type, us FROM e),
         closed AS (
           SELECT DISTINCT user_id, win FROM t, wm
           WHERE ((win + 1) * 86400000000) // 1000 < wm_ms),
         s1 AS (SELECT user_id, win, MIN(us) AS t1 FROM t
                WHERE event_type = 'view' GROUP BY 1, 2),
         s2 AS (SELECT t.user_id, t.win, MIN(t.us) AS t2
                FROM t JOIN s1 USING (user_id, win)
                WHERE t.event_type = 'click' AND t.us > s1.t1 GROUP BY 1, 2),
         s3 AS (SELECT t.user_id, t.win, MIN(t.us) AS t3
                FROM t JOIN s2 USING (user_id, win)
                WHERE t.event_type = 'purchase' AND t.us > s2.t2 GROUP BY 1, 2),
         hits AS (
           SELECT user_id, win, 1 AS stage, t1 AS t_us FROM s1
           UNION ALL SELECT user_id, win, 2, t2 FROM s2
           UNION ALL SELECT user_id, win, 3, t3 FROM s3)
         SELECT h.user_id, h.win * 86400000000 AS win_us,
           CAST(h.stage AS BIGINT) AS stage, h.t_us
         FROM hits h JOIN closed c USING (user_id, win)
         ORDER BY user_id, win_us, stage""",

    // The maintained snapshot must equal a from-scratch rollup of the
    // post-changelog survivors (insert-sum minus delete-sum in exact
    // decimal = sum over survivors).
    "q206_streaming_ivm" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM events WHERE event_id % 7 != 0
         GROUP BY event_type ORDER BY event_type""",

    // Same band predicates; microsecond epochs compare exactly.
    "q205_temporal_split" ->
      """WITH s AS (
           SELECT CASE
             WHEN ts < TIMESTAMP '2024-01-24 00:00:00' - INTERVAL 3 DAY
               THEN 'train'
             WHEN ts < TIMESTAMP '2024-01-24 00:00:00' THEN 'embargo'
             ELSE 'test' END AS split, ts
           FROM events)
         SELECT split, CAST(count(*) AS BIGINT) AS n,
           CAST(epoch_us(min(ts)) AS BIGINT) AS min_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS max_us
         FROM s GROUP BY split ORDER BY split""",

    // Per-hour register chains from the batch table; the streamed grouped
    // registers must match window for window.
    "q204_hll_windowed_stream" ->
      """WITH v AS (
           SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_epoch,
             CAST(event_id AS VARCHAR) AS s
           FROM events),
         hs AS (
           SELECT win_epoch, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(s, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM v),
         rr AS (SELECT win_epoch, CAST(u % 64 AS BIGINT) AS bucket,
                  CASE WHEN CAST(u // 64 AS BIGINT) = 0 THEN 59
                       ELSE bit_count((CAST(u // 64 AS BIGINT) & -CAST(u // 64 AS BIGINT)) - 1) + 1 END AS rho
                FROM hs),
         regs AS (SELECT win_epoch, bucket, max(rho) AS register
                  FROM rr GROUP BY 1, 2),
         wins AS (SELECT DISTINCT win_epoch FROM v),
         spine AS (SELECT win_epoch, unnest(range(0, 64)) AS bucket FROM wins),
         filled AS (
           SELECT sp.win_epoch, sp.bucket, COALESCE(r.register, 0) AS register
           FROM spine sp LEFT JOIN regs r USING (win_epoch, bucket)),
         ne AS (SELECT win_epoch, CAST(count(DISTINCT s) AS BIGINT) AS n_exact
                FROM v GROUP BY 1)
         SELECT f.win_epoch, f.bucket, CAST(f.register AS BIGINT) AS register,
           ne.n_exact
         FROM filled f JOIN ne USING (win_epoch)
         ORDER BY win_epoch, bucket""",

    // Three register chains (en, de, union-all) with the same FNV fold and
    // harmonic sums; the estimates and their inclusion-exclusion share the
    // Spark side's exact IEEE op sequence.
    "q203_hll_overlap" ->
      """WITH va AS (
           SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS v
           FROM documents WHERE lang = 'en'),
         vb AS (
           SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS v
           FROM documents WHERE lang = 'de'),
         vu AS (SELECT v FROM va UNION ALL SELECT v FROM vb),
         ha AS (SELECT list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(v, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM va),
         hb AS (SELECT list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(v, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM vb),
         hu AS (SELECT list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(v, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM vu),
         ra AS (SELECT CAST(u % 64 AS BIGINT) AS bucket,
                  CASE WHEN CAST(u // 64 AS BIGINT) = 0 THEN 59
                       ELSE bit_count((CAST(u // 64 AS BIGINT) & -CAST(u // 64 AS BIGINT)) - 1) + 1 END AS rho
                FROM ha),
         rb AS (SELECT CAST(u % 64 AS BIGINT) AS bucket,
                  CASE WHEN CAST(u // 64 AS BIGINT) = 0 THEN 59
                       ELSE bit_count((CAST(u // 64 AS BIGINT) & -CAST(u // 64 AS BIGINT)) - 1) + 1 END AS rho
                FROM hb),
         ru AS (SELECT CAST(u % 64 AS BIGINT) AS bucket,
                  CASE WHEN CAST(u // 64 AS BIGINT) = 0 THEN 59
                       ELSE bit_count((CAST(u // 64 AS BIGINT) & -CAST(u // 64 AS BIGINT)) - 1) + 1 END AS rho
                FROM hu),
         spine AS (SELECT unnest(range(0, 64)) AS bucket),
         sa AS (SELECT CAST(sum(CASE WHEN COALESCE(r.reg, 0) <= 56 THEN CAST(1 AS BIGINT) << (56 - COALESCE(r.reg, 0)) ELSE 0 END) AS BIGINT) AS s
                FROM spine sp LEFT JOIN
                  (SELECT bucket, max(rho) AS reg FROM ra GROUP BY bucket) r
                  USING (bucket)),
         sb AS (SELECT CAST(sum(CASE WHEN COALESCE(r.reg, 0) <= 56 THEN CAST(1 AS BIGINT) << (56 - COALESCE(r.reg, 0)) ELSE 0 END) AS BIGINT) AS s
                FROM spine sp LEFT JOIN
                  (SELECT bucket, max(rho) AS reg FROM rb GROUP BY bucket) r
                  USING (bucket)),
         su AS (SELECT CAST(sum(CASE WHEN COALESCE(r.reg, 0) <= 56 THEN CAST(1 AS BIGINT) << (56 - COALESCE(r.reg, 0)) ELSE 0 END) AS BIGINT) AS s
                FROM spine sp LEFT JOIN
                  (SELECT bucket, max(rho) AS reg FROM ru GROUP BY bucket) r
                  USING (bucket)),
         ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_inter FROM
                  (SELECT DISTINCT v FROM va) a JOIN
                  (SELECT DISTINCT v FROM vb) b USING (v)),
         na AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_exact_a FROM va),
         nb AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_exact_b FROM vb)
         SELECT na.n_exact_a, nb.n_exact_b, ex.n_exact_inter,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
             / CAST(sa.s AS DOUBLE), 6) AS est_a,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
             / CAST(sb.s AS DOUBLE), 6) AS est_b,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
             / CAST(su.s AS DOUBLE), 6) AS est_union,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
               / CAST(sa.s AS DOUBLE)
             + (((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
               / CAST(sb.s AS DOUBLE)
             - (((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
               / CAST(su.s AS DOUBLE), 6) AS est_inter
         FROM sa CROSS JOIN sb CROSS JOIN su
           CROSS JOIN ex CROSS JOIN na CROSS JOIN nb""",

    // Same class-size aggregation and integer risk arithmetic.
    "q202_k_anonymity" ->
      """WITH g AS (
           SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
         a AS (
           SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(min(c) AS BIGINT) AS min_group_size,
             CAST(sum(CASE WHEN c < 3 THEN c ELSE 0 END) AS BIGINT)
               AS n_rows_below_k
           FROM g)
         SELECT 'docs_lang_source_k3' AS rule, n_rows, n_groups,
           min_group_size, n_rows_below_k,
           CAST(CASE WHEN n_rows = 0 THEN 0
                ELSE (n_rows_below_k * 1000000) // n_rows END AS BIGINT)
             AS risk_ppm,
           CAST(CASE WHEN min_group_size >= 3 THEN 1 ELSE 0 END AS BIGINT)
             AS anonymous
         FROM a""",

    // The streamed registers must equal the batch sketch: same FNV fold,
    // same rho, same spine/harmonic-sum/estimate decoration (q191 over
    // events.event_id).
    "q201_hll_stream" ->
      """WITH v AS (SELECT CAST(event_id AS VARCHAR) AS s FROM events),
         hs AS (
           SELECT s, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(s, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM v),
         hb AS (SELECT CAST(u % 64 AS BIGINT) AS bucket,
                  CAST(u // 64 AS BIGINT) AS w FROM hs),
         rr AS (SELECT bucket,
                  CASE WHEN w = 0 THEN 59
                       ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM hb),
         regs AS (SELECT bucket, max(rho) AS register FROM rr GROUP BY bucket),
         spine AS (SELECT unnest(range(0, 64)) AS bucket),
         filled AS (
           SELECT sp.bucket, COALESCE(r.register, 0) AS register
           FROM spine sp LEFT JOIN regs r USING (bucket)),
         summ AS (SELECT CAST(sum(CASE WHEN register <= 56 THEN CAST(1 AS BIGINT) << (56 - register) ELSE 0 END) AS BIGINT)
                    AS s_scaled FROM filled),
         ne AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_exact FROM v)
         SELECT CAST(f.bucket AS BIGINT) AS bucket,
           CAST(f.register AS BIGINT) AS register,
           summ.s_scaled, ne.n_exact,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
             / CAST(summ.s_scaled AS DOUBLE), 6) AS hll_estimate
         FROM filled f CROSS JOIN summ CROSS JOIN ne ORDER BY bucket""",

    // Every stage recomputed from the synthesis formula: dHash bits,
    // brute-forced hamming<=3 pairs, recursive-CTE components, area-scored
    // representatives (q50/q111's conventions on the q190 graph).
    "q200_image_dedup_pipeline" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, doc_id % 47 AS g, doc_id // 47 AS off,
             8 + (doc_id % 47) % 9 AS w, 8 + (doc_id % 47) % 7 AS h
           FROM documents),
         b AS (
           SELECT doc_id,
             flatten(list_transform(range(0, 8), y ->
               list_transform(range(0, 8), x ->
                 CASE WHEN
                   (g*37 + (((x+1)*w)//9)*(((x+1)*w)//9)*7 + ((y*h)//8)*((y*h)//8)*13
                     + (((x+1)*w)//9)*((y*h)//8)*(3+g) + off) % 256
                   > (g*37 + ((x*w)//9)*((x*w)//9)*7 + ((y*h)//8)*((y*h)//8)*13
                     + ((x*w)//9)*((y*h)//8)*(3+g) + off) % 256
                 THEN 1 ELSE 0 END))) AS bits
           FROM d),
         ih AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 32), i ->
               bits[i+1] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(0, 32), i ->
               bits[i+33] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS hi
           FROM b),
         pairs AS (
           SELECT a.doc_id AS id_a, c.doc_id AS id_b
           FROM ih a JOIN ih c ON a.doc_id < c.doc_id
           WHERE bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi)) <= 3),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
         sc AS (SELECT doc_id AS id, CAST(w * h AS BIGINT) AS score FROM d),
         rep AS (
           SELECT component_id, id AS rep_id FROM (
             SELECT c.component_id, c.id,
               row_number() OVER (PARTITION BY c.component_id
                 ORDER BY sc.score DESC, c.id) AS rn
             FROM comp c JOIN sc ON c.id = sc.id)
           WHERE rn = 1)
         SELECT c.id, c.component_id, r.rep_id, c.id = r.rep_id AS kept
         FROM comp c JOIN rep r USING (component_id)
         ORDER BY c.id""",

    // Four mechanically unrolled peel rounds (the q100 pattern): degree,
    // alive filter, both-endpoint edge survival, repeated.
    "q199_kcore" ->
      """WITH hi AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem
                     WHERE l_quantity >= 45),
         e0 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                FROM hi x JOIN hi y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey),
         d1 AS MATERIALIZED (SELECT id, count(*) AS deg FROM
                 (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0) GROUP BY id),
         a1 AS MATERIALIZED (SELECT id FROM d1 WHERE deg >= 3),
         e1 AS MATERIALIZED (SELECT e0.a, e0.b FROM e0
                JOIN a1 x ON e0.a = x.id JOIN a1 y ON e0.b = y.id),
         d2 AS MATERIALIZED (SELECT id, count(*) AS deg FROM
                 (SELECT a AS id FROM e1 UNION ALL SELECT b FROM e1) GROUP BY id),
         a2 AS MATERIALIZED (SELECT id FROM d2 WHERE deg >= 3),
         e2 AS MATERIALIZED (SELECT e1.a, e1.b FROM e1
                JOIN a2 x ON e1.a = x.id JOIN a2 y ON e1.b = y.id),
         d3 AS MATERIALIZED (SELECT id, count(*) AS deg FROM
                 (SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2) GROUP BY id),
         a3 AS MATERIALIZED (SELECT id FROM d3 WHERE deg >= 3),
         e3 AS MATERIALIZED (SELECT e2.a, e2.b FROM e2
                JOIN a3 x ON e2.a = x.id JOIN a3 y ON e2.b = y.id),
         d4 AS MATERIALIZED (SELECT id, count(*) AS deg FROM
                 (SELECT a AS id FROM e3 UNION ALL SELECT b FROM e3) GROUP BY id),
         a4 AS MATERIALIZED (SELECT id FROM d4 WHERE deg >= 3),
         e4 AS MATERIALIZED (SELECT e3.a, e3.b FROM e3
                JOIN a4 x ON e3.a = x.id JOIN a4 y ON e3.b = y.id)
         SELECT id, CAST(count(*) AS BIGINT) AS degree FROM
           (SELECT a AS id FROM e4 UNION ALL SELECT b FROM e4)
         GROUP BY id ORDER BY id""",

    // Same Knuth uniform, floor-division priority, and tie-break.
    "q198_weighted_sample" ->
      """WITH p AS (
           SELECT doc_id, n_chars,
             (doc_id * 2654435761) % 4294967296 AS u
           FROM documents WHERE n_chars > 0),
         pr AS (SELECT doc_id, n_chars, u,
                  (u * 1000000) // n_chars AS priority FROM p),
         r AS (SELECT *, row_number() OVER (ORDER BY priority, doc_id) AS rnk
               FROM pr)
         SELECT doc_id, n_chars, CAST(u AS BIGINT) AS u,
           CAST(priority AS BIGINT) AS priority, CAST(rnk AS BIGINT) AS sample_rank
         FROM r WHERE rnk <= 50 ORDER BY sample_rank""",

    // The oracle computes the GLOBAL registers directly (no grouping) —
    // equality proves the element-wise-max merge of per-source shards.
    "q197_hll_merge" ->
      """WITH v AS (SELECT CAST(doc_id AS VARCHAR) AS s FROM documents),
         hs AS (
           SELECT s, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(s, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM v),
         hb AS (SELECT CAST(u % 64 AS BIGINT) AS bucket,
                  CAST(u // 64 AS BIGINT) AS w FROM hs),
         rr AS (SELECT bucket,
                  CASE WHEN w = 0 THEN 59
                       ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM hb),
         regs AS (SELECT bucket, max(rho) AS register FROM rr GROUP BY bucket),
         spine AS (SELECT unnest(range(0, 64)) AS bucket),
         filled AS (
           SELECT sp.bucket, COALESCE(r.register, 0) AS register
           FROM spine sp LEFT JOIN regs r USING (bucket)),
         summ AS (SELECT CAST(sum(CASE WHEN register <= 56 THEN CAST(1 AS BIGINT) << (56 - register) ELSE 0 END) AS BIGINT)
                    AS s_scaled FROM filled),
         ne AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_exact FROM v)
         SELECT CAST(f.bucket AS BIGINT) AS bucket,
           CAST(f.register AS BIGINT) AS register,
           summ.s_scaled, ne.n_exact,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
             / CAST(summ.s_scaled AS DOUBLE), 6) AS hll_estimate
         FROM filled f CROSS JOIN summ CROSS JOIN ne ORDER BY bucket""",

    // The streaming gate's final state must equal plain conditional
    // aggregation over the full table.
    "q196_stream_validation_gate" ->
      """WITH r AS (
           SELECT 'type_domain' AS rule, count(*) AS n_rows,
             sum(CASE WHEN event_type NOT IN
               ('click','error','purchase','signup','view')
               THEN 1 ELSE 0 END) AS n_violations
           FROM events
           UNION ALL
           SELECT 'user_complete', count(*),
             sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) FROM events
           UNION ALL
           SELECT 'value_cap_400', count(*),
             sum(CASE WHEN value > 400 THEN 1 ELSE 0 END) FROM events
           UNION ALL
           SELECT 'value_positive', count(*),
             sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) FROM events)
         SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(CASE WHEN n_rows = 0 THEN 0
                ELSE (CAST(n_violations AS BIGINT) * 1000000)
                     // CAST(n_rows AS BIGINT) END AS BIGINT) AS violation_ppm,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
         FROM r ORDER BY rule""",

    // Same integer ppm shares, floor divisions, and TVD halving.
    "q195_categorical_drift" ->
      """WITH d AS (
           SELECT doc_id, lang || ':' || source AS cat FROM documents),
         r AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_ref
               FROM d WHERE doc_id % 2 = 0 GROUP BY cat),
         c AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_cur
               FROM d WHERE doc_id % 2 = 1 GROUP BY cat),
         j AS (
           SELECT COALESCE(r.cat, c.cat) AS category,
             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
           FROM r FULL OUTER JOIN c ON r.cat = c.cat),
         t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
                 CAST(sum(n_cur) AS BIGINT) AS t_cur FROM j),
         sh AS (
           SELECT category, n_ref, n_cur,
             CASE WHEN t_ref = 0 THEN 0 ELSE (n_ref * 1000000) // t_ref END AS share_ref_ppm,
             CASE WHEN t_cur = 0 THEN 0 ELSE (n_cur * 1000000) // t_cur END AS share_cur_ppm
           FROM j CROSS JOIN t),
         df_ AS (
           SELECT *, abs(share_cur_ppm - share_ref_ppm) AS diff_ppm FROM sh),
         tv AS (SELECT CAST(sum(diff_ppm) // 2 AS BIGINT) AS tvd_ppm FROM df_)
         SELECT category, n_ref, n_cur,
           CAST(share_ref_ppm AS BIGINT) AS share_ref_ppm,
           CAST(share_cur_ppm AS BIGINT) AS share_cur_ppm,
           CAST(diff_ppm AS BIGINT) AS diff_ppm, tv.tvd_ppm
         FROM df_ CROSS JOIN tv ORDER BY category""",

    // q76's quantization replay feeding an integer dot product — every
    // score and rank is exact, no recall slack anywhere.
    "q194_ann_sq8" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         p AS (
           SELECT vec_id, v, list_min(v) AS mn,
             (list_max(v) - list_min(v)) / 255.0 AS scale
           FROM e),
         qz AS (
           SELECT vec_id,
             list_transform(v, x -> CASE WHEN scale = 0 THEN 0
               ELSE CAST(least(greatest(floor((x - mn) / scale + 0.5), 0), 255) AS INT)
               END) AS qs
           FROM p),
         qq AS (SELECT vec_id AS q_id, qs AS qv FROM qz WHERE vec_id < 10),
         cc AS (SELECT vec_id AS c_id, qs AS cv FROM qz),
         s AS (
           SELECT q_id, c_id,
             CAST(list_sum(list_transform(range(1, len(qv) + 1),
               i -> qv[i] * cv[i])) AS BIGINT) AS score_int
           FROM qq JOIN cc ON c_id <> q_id),
         r AS (
           SELECT q_id, c_id, score_int,
             row_number() OVER (PARTITION BY q_id ORDER BY score_int DESC, c_id) AS rnk
           FROM s)
         SELECT q_id AS query_id, c_id AS neighbor_id, score_int,
           CAST(rnk AS BIGINT) AS rank
         FROM r WHERE rnk <= 5 ORDER BY query_id, rank""",

    // The oracle recomputes the rollup from the FINAL state directly —
    // equality proves the delta merge maintained the view exactly.
    "q192_incremental_agg" ->
      """WITH fs AS (
           SELECT * FROM orders
           WHERE (o_orderdate < TIMESTAMP '2000-01-01' AND o_orderkey % 13 != 0)
              OR o_orderdate >= TIMESTAMP '2000-01-01')
         SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM fs GROUP BY 1, 2 ORDER BY 1, 2""",

    // The full sketch replays: FNV via the HUGEINT mod-2^64 fold (q173's
    // pattern), trailing-zero rho via bit_count((w & -w) - 1), registers
    // as a spine left join, the harmonic sum as exact Σ 2^(59-register),
    // and the estimate as the identical IEEE op sequence.
    "q191_hll_distinct" ->
      """WITH v AS (SELECT CAST(l_orderkey AS VARCHAR) AS s FROM lineitem),
         hs AS (
           SELECT s, list_reduce(
             list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(s, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
             (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM v),
         hb AS (SELECT CAST(u % 64 AS BIGINT) AS bucket,
                  CAST(u // 64 AS BIGINT) AS w FROM hs),
         rr AS (SELECT bucket,
                  CASE WHEN w = 0 THEN 59
                       ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM hb),
         regs AS (SELECT bucket, max(rho) AS register FROM rr GROUP BY bucket),
         spine AS (SELECT unnest(range(0, 64)) AS bucket),
         filled AS (
           SELECT sp.bucket, COALESCE(r.register, 0) AS register
           FROM spine sp LEFT JOIN regs r USING (bucket)),
         summ AS (SELECT CAST(sum(CASE WHEN register <= 56 THEN CAST(1 AS BIGINT) << (56 - register) ELSE 0 END) AS BIGINT)
                    AS s_scaled FROM filled),
         ne AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_exact FROM v)
         SELECT CAST(f.bucket AS BIGINT) AS bucket,
           CAST(f.register AS BIGINT) AS register,
           summ.s_scaled, ne.n_exact,
           round((((CAST(0.709 AS DOUBLE) * 64) * 64) * 72057594037927936)
             / CAST(summ.s_scaled AS DOUBLE), 6) AS hll_estimate
         FROM filled f CROSS JOIN summ CROSS JOIN ne ORDER BY bucket""",

    // The dHash bits replay as pure integer arithmetic from the synthesis
    // formula (PNG lossless, NN resample + neighbor compare are integer);
    // the hash is carried as two unsigned 32-bit halves so BIGINT never
    // overflows, and the 500-doc pair set is brute-forced — the pigeonhole
    // join is exact for hamming <= 3, so the sets coincide.
    "q190_image_dhash_neardup" ->
      """WITH d AS (
           SELECT doc_id, doc_id % 47 AS g, doc_id // 47 AS off,
             8 + (doc_id % 47) % 9 AS w, 8 + (doc_id % 47) % 7 AS h
           FROM documents),
         b AS (
           SELECT doc_id,
             flatten(list_transform(range(0, 8), y ->
               list_transform(range(0, 8), x ->
                 CASE WHEN
                   (g*37 + (((x+1)*w)//9)*(((x+1)*w)//9)*7 + ((y*h)//8)*((y*h)//8)*13
                     + (((x+1)*w)//9)*((y*h)//8)*(3+g) + off) % 256
                   > (g*37 + ((x*w)//9)*((x*w)//9)*7 + ((y*h)//8)*((y*h)//8)*13
                     + ((x*w)//9)*((y*h)//8)*(3+g) + off) % 256
                 THEN 1 ELSE 0 END))) AS bits
           FROM d),
         ih AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 32), i ->
               bits[i+1] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(0, 32), i ->
               bits[i+33] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS hi
           FROM b)
         SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi))
                AS BIGINT) AS hamming
         FROM ih a JOIN ih c ON a.doc_id < c.doc_id
         WHERE bit_count(xor(a.lo, c.lo)) + bit_count(xor(a.hi, c.hi)) <= 3
         ORDER BY id_a, id_b""",

    // Each check replayed with plain conditional aggregation; ppm is the
    // same integer floor division; pass is 0/1 BIGINT on both sides.
    "q189_validation_report" ->
      """WITH r AS (
           SELECT 'orders_custkey_complete' AS rule, count(*) AS n_rows,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'orders_status_domain', count(*),
             sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
           FROM orders
           UNION ALL
           SELECT 'orders_totalprice_cap_400k', count(*),
             sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) FROM orders
           UNION ALL
           SELECT 'orders_totalprice_positive', count(*),
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM orders
           UNION ALL
           SELECT 'docs_min_100_chars', count(*),
             sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) FROM documents
           UNION ALL
           SELECT 'docs_nchars_consistent', count(*),
             sum(CASE WHEN length(text) != n_chars THEN 1 ELSE 0 END)
           FROM documents
           UNION ALL
           SELECT 'orders_pk_unique', sum(c), sum(c - 1)
           FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
           UNION ALL
           SELECT 'lineitem_line_unique', sum(c), sum(c - 1)
           FROM (SELECT count(*) AS c FROM lineitem
                 GROUP BY l_orderkey, l_linenumber)
           UNION ALL
           SELECT 'lineitem_orderkey_fk', count(*),
             sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
           FROM lineitem l
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
           WHERE l.l_orderkey IS NOT NULL
           UNION ALL
           SELECT 'orders_custkey_fk', count(*),
             sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
           FROM orders o2
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o2.o_custkey = c.c_custkey
           WHERE o2.o_custkey IS NOT NULL)
         SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(CASE WHEN n_rows = 0 THEN 0
                ELSE (CAST(n_violations AS BIGINT) * 1000000)
                     // CAST(n_rows AS BIGINT) END AS BIGINT) AS violation_ppm,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
         FROM r ORDER BY rule""",

    // Same bucket/window arithmetic, all integer.
    "q184_length_batching" ->
      """WITH t AS (
           SELECT doc_id AS id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> len(x) > 0)) AS BIGINT) AS n
           FROM documents),
         b AS (SELECT id, n, n // 16 AS bucket FROM t WHERE n > 0),
         r AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY n DESC, id) AS rn
               FROM b),
         g AS (SELECT bucket, (rn - 1) // 8 AS batch_idx,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(max(n) AS BIGINT) AS max_tokens,
                 CAST(sum(n) AS BIGINT) AS sum_tokens
               FROM r GROUP BY 1, 2)
         SELECT bucket, batch_idx, n_docs, max_tokens, sum_tokens,
           max_tokens * n_docs AS padded_tokens,
           max_tokens * n_docs - sum_tokens AS waste_tokens,
           CAST((max_tokens * n_docs - sum_tokens) * 1000000
             // (max_tokens * n_docs) AS BIGINT) AS waste_ppm
         FROM g ORDER BY bucket, batch_idx""",

    // Decimal-exact per-dim means; the norm folds the pooled vector in
    // dim order (array_agg ORDER BY dim + list_sum = Spark's fold).
    "q185_embedding_pool" ->
      """WITH e AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 256),
         x AS (
           SELECT vec_id // 4 AS gid, u.i - 1 AS dim, v[u.i] AS x
           FROM e, LATERAL (SELECT unnest(range(1, 65)) AS i) u),
         m AS (
           SELECT gid, dim,
             CAST(sum(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / count(*) AS pooled
           FROM x GROUP BY 1, 2),
         arr AS (SELECT gid, array_agg(pooled ORDER BY dim) AS vp FROM m GROUP BY 1),
         nrm AS (SELECT gid, sqrt(list_sum(list_transform(vp, y -> y * y))) AS l2
                 FROM arr)
         SELECT m.gid, CAST(m.dim AS BIGINT) AS dim,
           round(m.pooled, 6) AS pooled,
           round(m.pooled / nrm.l2, 6) AS normalized
         FROM m JOIN nrm USING (gid)
         ORDER BY m.gid, m.dim""",

    // q113's flag CTEs + q166's ratio CTEs + integer gate arithmetic.
    "q183_quality_ensemble" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         base AS (
           SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE)
                  ELSE 0.0 END AS mwl,
             len(list_intersect(toks,
               ['the','and','of','to','a','in','is','that'])) AS stop_hits
           FROM t),
         rep AS (
           SELECT doc_id, MAX(c) AS max_cnt FROM (
             SELECT doc_id, term, COUNT(*) AS c FROM (
               SELECT doc_id, unnest(toks) AS term FROM t)
             GROUP BY doc_id, term)
           GROUP BY doc_id),
         flags AS (
           SELECT b.doc_id, b.n_words,
             b.n_words >= 20 AND b.n_words <= 80 AS wc_ok,
             b.mwl >= 4.0 AND b.mwl <= 10.0 AS mwl_ok,
             b.stop_hits >= 2 AS stop_ok,
             (CASE WHEN b.n_words > 0
                   THEN coalesce(CAST(rep.max_cnt AS DOUBLE), 0.0)
                        / CAST(b.n_words AS DOUBLE)
                   ELSE 0.0 END) <= 0.2 AS rep_ok
           FROM base b LEFT JOIN rep ON b.doc_id = rep.doc_id),
         dtoks AS (
           SELECT doc_id, lang = 'en' AS tgt, unnest(list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS w
           FROM documents),
         wc AS (
           SELECT w, CAST(count(*) AS BIGINT) AS r,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t
           FROM dtoks GROUP BY w),
         tot AS (SELECT sum(r) AS tr, sum(t) AS tt, count(*) AS v FROM wc),
         featw AS (
           SELECT w,
             greatest((t + 1) * 1000000000 // (tt + v), 1) * 1000000
               // greatest((r + 1) * 1000000000 // (tr + v), 1) AS ratio_micro
           FROM wc CROSS JOIN tot),
         dsir AS (
           SELECT dtoks.doc_id,
             CAST(sum(f.ratio_micro) // count(*) AS BIGINT) AS mean_ratio_micro
           FROM dtoks JOIN featw f USING (w)
           GROUP BY dtoks.doc_id),
         gate AS (
           SELECT fl.doc_id, fl.n_words,
             (CASE WHEN fl.wc_ok THEN 0 ELSE 1 END
              + CASE WHEN fl.mwl_ok THEN 0 ELSE 2 END
              + CASE WHEN fl.stop_ok THEN 0 ELSE 4 END
              + CASE WHEN fl.rep_ok THEN 0 ELSE 8 END) AS reason_mask,
             (CASE WHEN fl.wc_ok THEN 250000 ELSE 0 END
              + CASE WHEN fl.mwl_ok THEN 250000 ELSE 0 END
              + CASE WHEN fl.stop_ok THEN 250000 ELSE 0 END
              + CASE WHEN fl.rep_ok THEN 250000 ELSE 0 END
              + greatest(least(d.mean_ratio_micro - 1000000, 250000), -250000))
               AS gate_score_micros,
             d.mean_ratio_micro
           FROM flags fl JOIN dsir d USING (doc_id))
         SELECT doc_id, n_words,
           CAST(reason_mask AS BIGINT) AS reason_mask,
           CAST(gate_score_micros AS BIGINT) AS gate_score_micros,
           mean_ratio_micro,
           reason_mask = 0 AND gate_score_micros >= 1000000 AS keep
         FROM gate ORDER BY doc_id""",

    // Pure scan probe; both aggregates decimal-exact.
    "q175_tpch_q6" ->
      """SELECT round(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",

    // Conditional counts fused in one aggregate pass.
    "q176_tpch_q12" ->
      """SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
           AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
         GROUP BY 1 ORDER BY l.l_linestatus""",

    // COUNT(o_orderkey) keeps zero-order customers in the distribution.
    "q177_tpch_q13" ->
      """WITH co AS (
           SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
           FROM customer c LEFT JOIN orders o
             ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
           GROUP BY 1)
         SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
         FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",

    // The correlated avg comparison stays division-free:
    // qty * n * 5 < sum, all DECIMAL x integer.
    "q178_tpch_q17" ->
      """WITH pq AS (
           SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1)
         SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly,
                CAST(COUNT(*) AS BIGINT) AS n_small
         FROM lineitem l JOIN pq ON l.l_partkey = pq.l_partkey
         WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * pq.n * 5 < pq.sq""",

    // Nested aggregates; >50%% dominance in integer-decimal arithmetic.
    "q179_tpch_q20" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
           FROM lineitem
           WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
             AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
           GROUP BY 1, 2),
         pt AS (SELECT l_partkey, SUM(sq) AS tq FROM ps GROUP BY 1)
         SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
         FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
         JOIN supplier s ON ps.l_suppkey = s.s_suppkey
         WHERE ps.sq * 2 > pt.tq
         GROUP BY 1, 2
         ORDER BY n_dominant_parts DESC, s.s_suppkey
         LIMIT 25""",

    // Share = one double division of two decimal-exact sums.
    "q180_tpch_q8" ->
      """WITH base AS (
           SELECT CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
             CAST(SUM(CASE WHEN sn.n_name = 'NATION_2'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation2_rev,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation cn ON c.c_nationkey = cn.n_nationkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation sn ON s.s_nationkey = sn.n_nationkey
           WHERE cn.n_name = 'NATION_1'
           GROUP BY 1)
         SELECT o_year, round(nation2_rev / total_rev, 6) AS mkt_share,
                round(total_rev, 4) AS total_rev
         FROM base ORDER BY o_year""",

    // LIKE-pruned part dim feeding the fact join.
    "q181_tpch_q9" ->
      """SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS profit
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE p.p_name LIKE '%widget%'
         GROUP BY 1, 2
         ORDER BY supp_nation, o_year DESC""",

    // Correlated MIN as per-part argmin; one IEEE division per row.
    "q182_tpch_q2" ->
      """WITH up AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
           FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
         best AS (
           SELECT l_partkey, l_suppkey, unit_price,
             row_number() OVER (PARTITION BY l_partkey ORDER BY unit_price, l_suppkey) AS rn
           FROM up)
         SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
                round(b.unit_price, 6) AS unit_price
         FROM best b
         JOIN part p ON b.l_partkey = p.p_partkey
         JOIN supplier s ON b.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE b.rn = 1 AND p.p_size <= 5
         ORDER BY p.p_partkey
         LIMIT 30""",

    // Full IVFADC replay: cell argmin, residuals, residual codebooks,
    // per-(query, probed-cell) LUT, decimal ADC, rank by (adist, id).
    "q174_ivfpq_adc" ->
      """WITH e AS (
           SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
         ad AS (
           SELECT e.id, cent.cid,
             list_sum(list_transform(range(1, 65),
               i -> (e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i]))) AS d
           FROM e CROSS JOIN cent),
         asg AS (
           SELECT id, cid FROM (
             SELECT *, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM ad) WHERE rn = 1),
         resid AS (
           SELECT e.id, asg.cid,
             list_transform(range(1, 65), i -> e.v[i] - cent.cv[i]) AS rv
           FROM e JOIN asg USING (id) JOIN cent ON asg.cid = cent.cid),
         cb AS (
           SELECT s.sub, r.id AS cid, r.rv[s.sub*8+1 : s.sub*8+8] AS cv
           FROM resid r, LATERAL (SELECT unnest(range(8)) AS sub) s
           WHERE r.id < 16),
         sv AS (
           SELECT r.id, r.cid AS cell, s.sub, r.rv[s.sub*8+1 : s.sub*8+8] AS sv
           FROM resid r, LATERAL (SELECT unnest(range(8)) AS sub) s),
         dall AS (
           SELECT sv.id, sv.cell, sv.sub, cb.cid,
             list_sum(list_transform(range(1, 9),
               i -> (sv.sv[i] - cb.cv[i]) * (sv.sv[i] - cb.cv[i]))) AS d
           FROM sv JOIN cb ON sv.sub = cb.sub),
         codes AS (
           SELECT id, cell, sub, cid AS code FROM (
             SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d, cid) AS rn
             FROM dall) WHERE rn = 1),
         qp AS (
           SELECT e.id AS q_id, cent.cid,
             list_sum(list_transform(range(1, 65),
               i -> (e.v[i] - cent.cv[i]) * (e.v[i] - cent.cv[i]))) AS cd,
             list_transform(range(1, 65), i -> e.v[i] - cent.cv[i]) AS qres
           FROM e CROSS JOIN cent WHERE e.id < 4),
         probed AS (
           SELECT q_id, cid, qres FROM (
             SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cd, cid) AS rn
             FROM qp) WHERE rn <= 2),
         qs AS (
           SELECT q_id, cid AS cell, s.sub, qres[s.sub*8+1 : s.sub*8+8] AS qv
           FROM probed, LATERAL (SELECT unnest(range(8)) AS sub) s),
         lut AS (
           SELECT q_id, qs.cell, qs.sub, cb.cid AS code,
             list_sum(list_transform(range(1, 9),
               i -> (qs.qv[i] - cb.cv[i]) * (qs.qv[i] - cb.cv[i]))) AS d
           FROM qs JOIN cb ON qs.sub = cb.sub),
         sc AS (
           SELECT q_id, codes.id AS c_id,
             CAST(sum(CAST(d AS DECIMAL(30,12))) AS DOUBLE) AS adist
           FROM codes JOIN lut ON codes.cell = lut.cell
             AND codes.sub = lut.sub AND codes.code = lut.code
           GROUP BY 1, 2)
         SELECT q_id AS query_id, c_id AS neighbor_id,
           round(adist, 6) AS adist, CAST(rn AS BIGINT) AS rank
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rn
               FROM sc)
         WHERE rn <= 5 ORDER BY query_id, rank""",

    // Full sketch replay: per-token FNV (q29's fold), 31-bit reduction,
    // odd-multiplier row buckets, counter matrix, min-of-rows estimate.
    "q173_cms_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS tok
           FROM documents),
         hs AS (
           SELECT tok,
             list_reduce(
               list_prepend(CAST('14695981039346656037' AS HUGEINT),
                 list_transform(string_split(tok, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT)) AS u
           FROM toks),
         sh AS (
           SELECT tok,
             CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS h
           FROM hs),
         r0 AS (SELECT tok, ((h % 2147483648) + 2147483648) % 2147483648 AS r FROM sh),
         cells AS (
           SELECT u2.row, (r * (2 * u2.row + 1) + u2.row * 7919) % 512 AS bucket
           FROM r0, LATERAL (SELECT unnest(range(0, 4)) AS row) u2),
         counters AS (
           SELECT row, bucket, CAST(count(*) AS BIGINT) AS c
           FROM cells GROUP BY 1, 2),
         top AS (
           SELECT tok, r, CAST(count(*) AS BIGINT) AS exact_n
           FROM r0 GROUP BY tok, r
           ORDER BY exact_n DESC, tok LIMIT 20),
         probes AS (
           SELECT tok, exact_n, u3.row,
             (r * (2 * u3.row + 1) + u3.row * 7919) % 512 AS bucket
           FROM top, LATERAL (SELECT unnest(range(0, 4)) AS row) u3),
         est AS (
           SELECT tok, exact_n, min(c) AS cms_n
           FROM probes JOIN counters USING (row, bucket) GROUP BY 1, 2)
         SELECT tok AS token, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
           CAST(cms_n - exact_n AS BIGINT) AS overestimate
         FROM est ORDER BY exact_n DESC, token""",

    // The streamed windowed counts must equal batch tumbling counts;
    // rank ties break lexicographically.
    "q172_streaming_trending" ->
      """WITH w AS (
           SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win, event_type,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         r AS (SELECT win, event_type, n,
                 row_number() OVER (PARTITION BY win ORDER BY n DESC, event_type) AS rank
               FROM w)
         SELECT epoch_us(win) AS win_us, event_type, n, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 3 ORDER BY win_us, rank""",

    // Compaction only reorganizes files; the content aggregate is the
    // plain source aggregate.
    "q170_compaction" ->
      """SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(event_id AS DECIMAL(18,0))) AS BIGINT) AS sum_ids,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY event_type""",

    // observe() must not change the query result.
    "q171_observed_metrics" ->
      """SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS spend
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY user_id""",

    // The streamed store must equal the batch latest-per-user reduction
    // (max (ts, event_id) per user — total order, tie-proof).
    "q169_streaming_upsert" ->
      """WITH ev AS (
           SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                  event_type, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, ts_us, event_id, event_type, value
         FROM ev WHERE rn = 1
         ORDER BY user_id""",

    // ROWS frame ordered totally (event_id tie-break); RANGE frame on the
    // raw micros includes peers, so tie order cannot matter.
    "q168_window_frames" ->
      """WITH ev AS (
           SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
           FROM events WHERE user_id < 2000)
         SELECT event_id, user_id, ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rows3_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range1h_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS range1h_n
         FROM ev
         ORDER BY user_id, ts_us, event_id""",

    // Same two-stage floor arithmetic: per-token ppb under target/raw,
    // micro-scaled ratio, per-doc floor mean. All BIGINT.
    "q166_dsir_weights" ->
      """WITH toks AS (
           SELECT doc_id, lang = 'en' AS tgt, unnest(list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> len(x) > 0)) AS w
           FROM documents),
         wc AS (
           SELECT w, CAST(count(*) AS BIGINT) AS r,
             CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t
           FROM toks GROUP BY w),
         tot AS (SELECT sum(r) AS tr, sum(t) AS tt, count(*) AS v FROM wc),
         featw AS (
           SELECT w,
             greatest((t + 1) * 1000000000 // (tt + v), 1) * 1000000
               // greatest((r + 1) * 1000000000 // (tr + v), 1) AS ratio_micro
           FROM wc CROSS JOIN tot)
         SELECT toks.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(f.ratio_micro) AS BIGINT) AS score_sum,
           CAST(sum(f.ratio_micro) // count(*) AS BIGINT) AS mean_ratio_micro,
           (sum(f.ratio_micro) // count(*)) >= 1000000 AS selected
         FROM toks JOIN featw f USING (w)
         GROUP BY toks.doc_id
         ORDER BY toks.doc_id""",

    // Gaps-and-islands over corpus-duplicated 8-token windows; every count
    // is integer-exact. Matches TextFns.tokens: lower/trim/split on \s+.
    "q163_dup_substr_stats" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         n0 AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
         pos AS (
           SELECT doc_id, i, list_aggregate(toks[i:i+7], 'string_agg', ' ') AS sh
           FROM n0, LATERAL (SELECT unnest(range(1, n_tokens - 8 + 2)) AS i) u
           WHERE n_tokens >= 8),
         dupsh AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
         dp AS (SELECT p.doc_id, p.i FROM pos p JOIN dupsh USING (sh)),
         isl AS (SELECT doc_id, i,
                  CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > 8
                       THEN 1 ELSE 0 END AS brk
                 FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         isl2 AS (SELECT doc_id, i,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
                  FROM isl),
         spans AS (SELECT doc_id, island, min(i) AS s, max(i) + 8 AS e
                   FROM isl2 GROUP BY 1, 2),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                  CAST(sum(e - s) AS BIGINT) AS dup_tokens,
                  CAST(max(e - s) AS BIGINT) AS longest_span
                 FROM spans GROUP BY 1)
         SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens,
           COALESCE(a.n_spans, CAST(0 AS BIGINT)) AS n_spans,
           COALESCE(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
           COALESCE(a.longest_span, CAST(0 AS BIGINT)) AS longest_span,
           CAST(COALESCE(a.dup_tokens, 0) * 1000000 // d.n_tokens AS BIGINT) AS dup_ppm
         FROM (SELECT doc_id, n_tokens FROM n0 WHERE n_tokens > 0) d
         LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",

    // Span rows carry only positions, so the exact-text oracle also proves
    // the xxhash64-keyed scale configuration (no 64-bit collision at this
    // corpus size — and none expected below ~2^32 distinct shingles).
    "q164_dup_substr_spans_hashed" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         n0 AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
         pos AS (
           SELECT doc_id, i, list_aggregate(toks[i:i+7], 'string_agg', ' ') AS sh
           FROM n0, LATERAL (SELECT unnest(range(1, n_tokens - 8 + 2)) AS i) u
           WHERE n_tokens >= 8),
         dupsh AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) > 1),
         dp AS (SELECT p.doc_id, p.i FROM pos p JOIN dupsh USING (sh)),
         isl AS (SELECT doc_id, i,
                  CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > 8
                       THEN 1 ELSE 0 END AS brk
                 FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         isl2 AS (SELECT doc_id, i,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
                  FROM isl),
         spans AS (SELECT doc_id, island, CAST(min(i) AS BIGINT) AS span_start,
                   CAST(max(i) + 8 AS BIGINT) AS span_end
                   FROM isl2 GROUP BY 1, 2)
         SELECT doc_id, span_start, span_end,
           span_end - span_start AS span_tokens
         FROM spans
         ORDER BY doc_id, span_start""",

    "q36_ann_brute" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         s AS (SELECT q_id, c_id, list_cosine_similarity(qv, cv) AS score
               FROM q JOIN c ON c_id <> q_id),
         r AS (SELECT q_id, c_id, score,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
               FROM s)
         SELECT q_id AS query_id, c_id AS neighbor_id,
                round(score, 6) AS cosine, rnk AS rank
         FROM r WHERE rnk <= 5 ORDER BY query_id, rank""",

    // Recall fully re-derived (r10, replacing the r9 pin): BOTH sides —
    // the pruned IVF top-5 over the fixture quantizer (q38's replay) and
    // the exact brute-force top-5 (q36's replay) — computed by DuckDB,
    // then recall@5 per query from their overlap.
    "q46_ann_ivf_recall" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         cent AS (SELECT id AS cell, v AS cv FROM e WHERE id < 16),
         ca AS (SELECT id, cell FROM (
             SELECT e.id, cent.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent) WHERE rn = 1),
         qp AS (SELECT id AS q_id, cell FROM (
             SELECT e.id, cent.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent WHERE e.id < 10) WHERE rn <= 4),
         s AS (SELECT qp.q_id, ca.id AS c_id,
                 list_cosine_similarity(qv.v, cv.v) AS score
               FROM qp JOIN ca USING (cell)
               JOIN e qv ON qv.id = qp.q_id
               JOIN e cv ON cv.id = ca.id
               WHERE ca.id <> qp.q_id),
         a AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
             FROM s) WHERE rnk <= 5),
         bs AS (SELECT qv.id AS q_id, cv.id AS c_id,
                  list_cosine_similarity(qv.v, cv.v) AS score
                FROM e qv JOIN e cv ON cv.id <> qv.id WHERE qv.id < 10),
         br AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
             FROM bs) WHERE rnk <= 5)
         SELECT br.q_id AS query_id,
           round(CAST(COUNT(a.c_id) AS DOUBLE) / COUNT(*), 6) AS recall
         FROM br LEFT JOIN a ON br.q_id = a.q_id AND br.c_id = a.c_id
         GROUP BY 1 ORDER BY query_id""",

    // Exact-config IVF (nprobe = nlist) equals brute force by construction —
    // same oracle as q36.
    "q45_ann_ivf_exact" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         s AS (SELECT q_id, c_id, list_cosine_similarity(qv, cv) AS score
               FROM q JOIN c ON c_id <> q_id),
         r AS (SELECT q_id, c_id, score,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
               FROM s)
         SELECT q_id AS query_id, c_id AS neighbor_id,
                round(score, 6) AS cosine, rnk AS rank
         FROM r WHERE rnk <= 5 ORDER BY query_id, rank""",

    "q37_emb_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) >= 0.4
         ORDER BY id_a, id_b""",

    // Byte-level features recomputed from first principles: bytes recovered
    // via hex() (DuckDB has no blob indexing to int), entropy from the byte
    // histogram, head_hash as the wrapping mod-2^64 fold over signed bytes
    // (HUGEINT emulates Long overflow), fv_j as the byte-bucket fractions
    // narrowed through FLOAT exactly like the Spark side. Entropy/fv rounded
    // to 6 on both sides (summation order differs between engines).
    "q39_multimodal" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS h,
                  octet_length(encode(text)) AS n
           FROM documents),
         by AS (
           SELECT doc_id, n, list_transform(range(0, n), i ->
             (strpos('0123456789ABCDEF', h[2*i+1])-1)*16 +
             (strpos('0123456789ABCDEF', h[2*i+2])-1)) AS bytes
           FROM b),
         hh AS (
           SELECT doc_id,
             CAST(list_reduce(
               list_prepend(CAST(1125899906842597 AS HUGEINT),
                 list_transform(bytes[1:16], x ->
                   CAST(CASE WHEN x >= 128 THEN x - 256 ELSE x END AS HUGEINT))),
               (acc, x) -> (((acc * 31 + x) % 18446744073709551616)
                            + 18446744073709551616) % 18446744073709551616) AS HUGEINT) AS m
           FROM by),
         u AS (SELECT doc_id, n, unnest(bytes) AS v FROM by),
         hist AS (SELECT doc_id, n, v, COUNT(*) AS c FROM u GROUP BY 1, 2, 3),
         ent AS (
           SELECT doc_id,
             -SUM((CAST(c AS DOUBLE)/n) * log2(CAST(c AS DOUBLE)/n)) AS e
           FROM hist GROUP BY doc_id),
         fv AS (
           SELECT doc_id,
             list_transform(range(0, 8), j -> CAST(CAST(
               CAST(len(list_filter(bytes, x -> x // 32 = j)) AS DOUBLE) / n
               AS FLOAT) AS DOUBLE)) AS f
           FROM by WHERE n > 0)
         SELECT b.doc_id AS id, CAST(b.n AS BIGINT) AS byte_len,
           round(coalesce(e.e, 0.0), 6) AS byte_entropy,
           CAST(CASE WHEN hh.m >= 9223372036854775808
                THEN hh.m - 18446744073709551616 ELSE hh.m END AS BIGINT) AS head_hash,
           round(coalesce(f.f[1], 0.0), 6) AS fv0, round(coalesce(f.f[2], 0.0), 6) AS fv1,
           round(coalesce(f.f[3], 0.0), 6) AS fv2, round(coalesce(f.f[4], 0.0), 6) AS fv3,
           round(coalesce(f.f[5], 0.0), 6) AS fv4, round(coalesce(f.f[6], 0.0), 6) AS fv5,
           round(coalesce(f.f[7], 0.0), 6) AS fv6, round(coalesce(f.f[8], 0.0), 6) AS fv7
         FROM b
         JOIN hh ON b.doc_id = hh.doc_id
         LEFT JOIN ent e ON b.doc_id = e.doc_id
         LEFT JOIN fv f ON b.doc_id = f.doc_id
         ORDER BY id""",

    "q40_events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_epoch,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY win_epoch, event_type""",

    "q41_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events),
         y AS (SELECT user_id,
                 CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
                      THEN 1 ELSE 0 END AS ns
               FROM x)
         SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions
         FROM y GROUP BY user_id ORDER BY user_id""",

    "q49_dedup_stream" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",

    "q42_sessionize_stream" ->
      """WITH x AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
         y AS (
           SELECT user_id, us,
             lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
           FROM x),
         z AS (
           SELECT user_id, us,
             SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS seq
           FROM y),
         s AS (
           SELECT user_id, seq, MIN(us) AS start_us, MAX(us) AS end_us, COUNT(*) AS n_events
           FROM z GROUP BY user_id, seq),
         m AS (SELECT user_id, MAX(seq) AS last_seq FROM s GROUP BY user_id)
         SELECT s.user_id, CAST(s.seq AS BIGINT) AS session_seq,
           CAST(s.start_us AS BIGINT) AS start_us, CAST(s.end_us AS BIGINT) AS end_us,
           CAST(s.n_events AS BIGINT) AS n_events
         FROM s JOIN m ON s.user_id = m.user_id
         WHERE s.seq < m.last_seq
         ORDER BY s.user_id, session_seq""",

    // Segment dedup replayed on the segment TEXT itself (the operator keys
    // by xxhash64 — identical answers modulo a 2^-64 collision, the
    // documented trade). Chunking, first-occurrence rule and reassembly are
    // reproduced exactly.
    "q57_segment_dedup" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         c AS (
           SELECT doc_id,
             CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                  ELSE list_transform(range(0, CAST(ceil(len(toks) / 10.0) AS INT)),
                         i -> array_to_string(toks[i*10+1 : i*10+10], ' ')) END AS segs
           FROM t),
         e AS (
           SELECT doc_id, generate_subscripts(segs, 1) - 1 AS pos, unnest(segs) AS seg
           FROM c),
         kept AS (
           SELECT doc_id, pos, seg FROM (
             SELECT doc_id, pos, seg,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
             FROM e) WHERE rn = 1),
         rebuilt AS (
           SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
           FROM kept GROUP BY doc_id)
         SELECT c.doc_id AS id,
           COALESCE(clean_text, '') AS clean_text,
           CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(segs) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed
         FROM c LEFT JOIN rebuilt ON c.doc_id = rebuilt.doc_id
         ORDER BY id""",

    "q58_heavy_hitters" ->
      """SELECT term, COUNT(*) AS n FROM (
           SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> len(x) > 0)) AS term
           FROM documents)
         GROUP BY term ORDER BY n DESC, term LIMIT 50""",

    // Contamination replayed on shingle STRINGS (operator uses xxhash64 of
    // the same space-joined token 8-grams; <n-token docs collapse to one
    // whole-doc shingle on both sides).
    "q59_contamination" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 7, 1) + 1),
               i -> array_to_string(toks[i : i+7], ' '))) AS s
           FROM t),
         bench AS (
           SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
         train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
         hits AS (
           SELECT doc_id, COUNT(*) AS n_hit
           FROM (SELECT doc_id, unnest(s) AS g FROM train) tr
           JOIN bench USING (g)
           GROUP BY doc_id)
         SELECT train.doc_id AS id,
           CAST(len(s) AS BIGINT) AS n_shingles,
           CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / len(s) AS contam_ratio
         FROM train LEFT JOIN hits ON train.doc_id = hits.doc_id
         ORDER BY id""",

    // The operator's bucketed distributed prefix-sum must equal the naive
    // single-window running sum.
    "q60_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM t)
         SELECT doc_id AS id, n_tokens,
           CAST(cum_before // 512 AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS seq_offset
         FROM c ORDER BY id""",

    // Spark `percentile` and DuckDB `quantile_cont` are both exact R-7.
    "q61_group_percentiles" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens
           FROM documents)
         SELECT lang,
           round(quantile_cont(n_tokens, 0.5), 6) AS p50,
           round(quantile_cont(n_tokens, 0.9), 6) AS p90,
           COUNT(*) AS n
         FROM t GROUP BY lang ORDER BY lang""",

    "q62_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k, MAX(k) AS max_k
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type ORDER BY event_type""",

    // The bucketed range join must assign every event to the session whose
    // [min ts, max ts] interval contains it — i.e. exactly the session the
    // gap rule derives directly (same second-truncated gap as q41).
    "q63_range_join" ->
      """WITH x AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         y AS (
           SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM x),
         z AS (
           SELECT event_id, user_id,
             SUM(CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS seq
           FROM y)
         SELECT event_id, user_id, CAST(seq AS BIGINT) AS session_seq
         FROM z ORDER BY event_id""",

    "q64_gap_fill" ->
      """WITH b AS (
           SELECT user_id AS k,
             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS bucket,
             value, event_type
           FROM events),
         p AS (
           SELECT k, bucket, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             MAX(event_type) AS et
           FROM b GROUP BY 1, 2),
         g AS (
           SELECT k, unnest(range(MIN(bucket), MAX(bucket) + 1)) AS bucket
           FROM b GROUP BY k),
         j AS (
           SELECT g.k, g.bucket, p.n, p.sv, p.et
           FROM g LEFT JOIN p ON g.k = p.k AND g.bucket = p.bucket)
         SELECT k AS user_id, bucket,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           COALESCE(sv, 0.0) AS sum_value,
           last_value(et IGNORE NULLS) OVER (PARTITION BY k ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type
         FROM j ORDER BY user_id, bucket""",

    // Linear idf (N+1)/(df+1): the score is two IEEE double ops on both
    // engines, so ranking and the rounded output match bit-exactly (ln
    // would not be guaranteed correctly-rounded cross-engine — that's the
    // non-oracle logIdf=true config).
    "q66_tfidf_top_terms" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         tf AS (
           SELECT doc_id AS id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM t)
           GROUP BY 1, 2),
         dfq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
         nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         s AS (
           SELECT id, term, tf, doc_freq,
             tf * (CAST(n_docs + 1 AS DOUBLE) / (doc_freq + 1)) AS score
           FROM tf JOIN dfq USING (term) CROSS JOIN nd),
         r AS (
           SELECT id, term, tf, doc_freq, score,
             row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS rank
           FROM s)
         SELECT id, term, tf, doc_freq, round(score, 6) AS score,
           CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5 ORDER BY id, rank""",

    "q67_quota_sample" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
         WHERE rn <= CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 5 ELSE 3 END
         ORDER BY doc_id""",

    // The bucketed keyless interval join must equal the naive inequality
    // overlap join over the gap-rule sessions (same second-truncated gap
    // as q41/q63).
    "q68_interval_join" ->
      """WITH x AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         y AS (
           SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
           FROM x),
         z AS (
           SELECT user_id, ts,
             SUM(CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS seq
           FROM y),
         s AS (
           SELECT user_id, seq, MIN(ts) AS s_start, MAX(ts) AS s_end
           FROM z GROUP BY user_id, seq)
         SELECT CAST(a.seq AS BIGINT) AS a_seq, b.user_id AS b_user,
           CAST(b.seq AS BIGINT) AS b_seq
         FROM (SELECT * FROM s WHERE user_id = 0) a
         JOIN (SELECT * FROM s WHERE user_id <> 0) b
           ON a.s_start <= b.s_end AND b.s_start <= a.s_end
         ORDER BY a_seq, b_user, b_seq""",

    "q69_topk_per_group" ->
      """SELECT source AS "group", doc_id AS id,
           CAST(n_chars AS DOUBLE) AS score, CAST(rn AS BIGINT) AS rank
         FROM (
           SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
           FROM documents)
         WHERE rn <= 20 ORDER BY "group", rank""",

    // PINNED oracle (r9; tagged "pinned" in oracleProvenance):
    // approx_percentile's Greenwald-Khanna sketch is deterministic for
    // this gate's fixed data/partitioning (measured stable across
    // repeated Verify runs) but its internals are not portable SQL; the
    // <=accuracy error bound vs exact stays spec-pinned in CorpusSpec.
    // Regenerate with tools/pin_oracle.py if the testdata ever changes.
    "q70_approx_percentiles" ->
      """SELECT * FROM (VALUES
           ('de', CAST(53.0 AS DOUBLE), CAST(78.0 AS DOUBLE), CAST(70 AS BIGINT)),
           ('en', CAST(55.0 AS DOUBLE), CAST(88.0 AS DOUBLE), CAST(218 AS BIGINT)),
           ('es', CAST(57.0 AS DOUBLE), CAST(89.0 AS DOUBLE), CAST(73 AS BIGINT)),
           ('fr', CAST(60.0 AS DOUBLE), CAST(93.0 AS DOUBLE), CAST(64 AS BIGINT)),
           ('zh', CAST(54.0 AS DOUBLE), CAST(88.0 AS DOUBLE), CAST(75 AS BIGINT))
         ) AS t(lang, p50a, p90a, n)""",

    // PINNED oracle (r9; tagged "pinned" in oracleProvenance): HLL++
    // registers are a pure hash fold — order-independent by construction,
    // so the sketch output is a constant of the data, but the register
    // hash is not portable SQL. The <=5% relative-error bound vs exact
    // stays spec-pinned (CorpusSpec). Regenerate with tools/pin_oracle.py
    // on data change.
    "q77_approx_distinct" ->
      """SELECT * FROM (VALUES
           ('de', CAST(31 AS BIGINT), CAST(31 AS BIGINT)),
           ('en', CAST(31 AS BIGINT), CAST(31 AS BIGINT)),
           ('es', CAST(31 AS BIGINT), CAST(31 AS BIGINT)),
           ('fr', CAST(31 AS BIGINT), CAST(31 AS BIGINT)),
           ('zh', CAST(31 AS BIGINT), CAST(31 AS BIGINT))
         ) AS t(lang, approx_toks, exact_toks)""",

    // The streaming inner join's finite drain equals the batch join: every
    // click paired with every same-user purchase in [ts, ts + 30 min].
    "q71_stream_stream_join" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
           epoch_us(CAST(a.ts AS TIMESTAMP)) AS click_us,
           epoch_us(CAST(b.ts AS TIMESTAMP)) AS purchase_us
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND a.event_type = 'click' AND b.event_type = 'purchase'
          AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
          AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
         ORDER BY a.user_id, click_id, purchase_id""",

    // GROUPING() bit order (leftmost column = most significant bit) matches
    // Spark's grouping_id() — both follow the Postgres convention.
    "q72_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""",

    "q73_pivot" ->
      """SELECT source,
           COUNT(*) FILTER (lang = 'de') AS de_n,
           CAST(COALESCE(SUM(n_chars) FILTER (lang = 'de'), 0) AS BIGINT) AS de_sum,
           COUNT(*) FILTER (lang = 'en') AS en_n,
           CAST(COALESCE(SUM(n_chars) FILTER (lang = 'en'), 0) AS BIGINT) AS en_sum,
           COUNT(*) FILTER (lang = 'es') AS es_n,
           CAST(COALESCE(SUM(n_chars) FILTER (lang = 'es'), 0) AS BIGINT) AS es_sum,
           COUNT(*) FILTER (lang = 'fr') AS fr_n,
           CAST(COALESCE(SUM(n_chars) FILTER (lang = 'fr'), 0) AS BIGINT) AS fr_sum,
           COUNT(*) FILTER (lang = 'zh') AS zh_n,
           CAST(COALESCE(SUM(n_chars) FILTER (lang = 'zh'), 0) AS BIGINT) AS zh_sum
         FROM documents GROUP BY source ORDER BY source""",

    // chr(769) = U+0301 combining acute; nfc_normalize composes e+mark to
    // U+00E9 exactly as java.text.Normalizer NFC does. length() counts code
    // points on both engines.
    "q74_unicode_nfc" ->
      """SELECT doc_id,
           nfc_normalize(text || ' cafe' || chr(769)) AS nfc_text,
           CAST(length(text || ' cafe' || chr(769)) AS BIGINT) AS n_raw,
           CAST(length(nfc_normalize(text || ' cafe' || chr(769))) AS BIGINT) AS n_nfc
         FROM documents ORDER BY doc_id""",

    // Port and fragment are stripped by the host class, lower() folds the
    // mixed-case host; apex = last two dot-labels.
    "q75_url_domains" ->
      """WITH u AS (
           SELECT doc_id,
             lower(regexp_extract(
               'https://docs.' || source || '.Example.COM:8443/' || lang || '/' || doc_id || '?ref=x#top',
               'https?://([^/ :?#\t\n\x0B\f\r]+)', 1)) AS host
           FROM documents)
         SELECT host, regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS apex,
           COUNT(*) AS n
         FROM u GROUP BY 1, 2 ORDER BY host""",

    // The codec replay: float lanes widen to DOUBLE exactly, then the same
    // IEEE sequence (sub, div, +0.5, floor, clamp) on both engines; the
    // index lambda (qq, i) re-reads v[i] for the roundtrip error.
    "q76_quantize_embeddings" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         p AS (
           SELECT vec_id, v, list_min(v) AS mn,
             (list_max(v) - list_min(v)) / 255.0 AS scale
           FROM e),
         q AS (
           SELECT vec_id, v, mn, scale,
             list_transform(v, x -> CASE WHEN scale = 0 THEN 0
               ELSE CAST(least(greatest(floor((x - mn) / scale + 0.5), 0), 255) AS INT)
               END) AS qs
           FROM p)
         SELECT vec_id, mn, scale,
           CAST(list_aggregate(qs, 'sum') AS BIGINT) AS qsum,
           CAST(qs[1] AS BIGINT) AS q0, CAST(qs[17] AS BIGINT) AS q16,
           round(list_max(list_transform(qs, (qq, i) -> abs(v[i] - (mn + qq * scale)))), 6) AS max_err
         FROM q ORDER BY vec_id""",

    // Same co-moment formula spelled with the same IEEE op sequence; the
    // decimal sums are exact on both engines, doubles only at the end.
    "q78_corr_stats" ->
      """WITH m AS (
           SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(30,6))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS sy,
             SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,6))) AS sxy,
             SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS sxx,
             SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,6))) AS syy
           FROM lineitem GROUP BY l_returnflag),
         d AS (
           SELECT l_returnflag, n,
             CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
             CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
             CAST(syy AS DOUBLE) AS syy
           FROM m)
         SELECT l_returnflag, n,
           round(CASE WHEN nd * sxx - sx * sx > 0 AND nd * syy - sy * sy > 0
             THEN (nd * sxy - sx * sy)
               / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
             END, 6) AS corr,
           round((nd * sxy - sx * sy) / (nd * (nd - 1.0)), 4) AS covar_samp,
           round(sqrt((nd * sxx - sx * sx) / (nd * (nd - 1.0))), 6) AS std_x,
           round(sqrt((nd * syy - sy * sy) / (nd * (nd - 1.0))), 4) AS std_y
         FROM d ORDER BY l_returnflag""",

    // Float parquet values widen exactly to DOUBLE on both engines; the
    // per-element (a-b)^2 accumulation is the same left-to-right fold, and
    // dist_sq is rounded to 6 on both sides.
    // Ranking happens on the UNROUNDED score (bit-identical doubles) in
    // both engines; only the emitted lift is rounded.
    "q80_bigram_lift" ->
      """WITH t AS (
           SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         u AS (SELECT unnest(toks) AS term FROM t),
         uc AS (SELECT term, COUNT(*) AS n FROM u GROUP BY term),
         bi AS (
           SELECT toks[i] AS ta, toks[i + 1] AS tb FROM (
             SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
             FROM t WHERE len(toks) > 1)),
         bc AS (
           SELECT ta, tb, COUNT(*) AS nab FROM bi GROUP BY 1, 2
           HAVING COUNT(*) >= 5),
         tot AS (
           SELECT (SELECT COUNT(*) FROM u) AS nu, (SELECT COUNT(*) FROM bi) AS nbig),
         s AS (
           SELECT ta, tb, nab,
             (CAST(nab AS DOUBLE) * nu * nu) / (CAST(ua.n AS DOUBLE) * ub.n * nbig) AS score0
           FROM bc JOIN uc ua ON bc.ta = ua.term
                   JOIN uc ub ON bc.tb = ub.term
                   CROSS JOIN tot)
         SELECT ta, tb, nab, round(score0, 6) AS lift,
           CAST(row_number() OVER (ORDER BY score0 DESC, ta, tb) AS BIGINT) AS rank
         FROM s QUALIFY rank <= 50 ORDER BY rank""",

    // session_window splits when the inter-event gap >= 30 min (strict
    // overlap merge), and window.end = last event + gap.
    "q81_session_window" ->
      """WITH x AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         y AS (
           SELECT user_id, us,
             lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
           FROM x),
         z AS (
           SELECT user_id, us,
             SUM(CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS seq
           FROM y)
         SELECT user_id, MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us,
           COUNT(*) AS n_events
         FROM z GROUP BY user_id, seq
         ORDER BY user_id, start_us""",

    // Same assignment CTE as q65, then per-dimension DECIMAL means over
    // generate_series(1, 64) (the embedding width).
    "q79_kmeans_lloyd" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         s AS (
           SELECT e.vec_id AS id, e.v, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
           FROM e CROSS JOIN c),
         a AS (
           SELECT id, v, cid FROM (
             SELECT id, v, cid, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM s) WHERE rn = 1),
         x AS (
           SELECT cid, t.i AS dim, CAST(v[t.i] AS DECIMAL(30,12)) AS xd
           FROM a CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) t)
         SELECT cid, CAST(dim AS BIGINT) AS dim,
           round(CAST(SUM(xd) AS DOUBLE) / COUNT(*), 6) AS c,
           COUNT(*) AS n_members
         FROM x GROUP BY cid, dim
         ORDER BY cid, dim""",

    // Same running-sum crossing rule: keep a row iff its weight interval
    // (cum-w, cum] crosses a multiple of the step. Integer cums are exact
    // in doubles, so floor() agrees bit-for-bit across engines.
    "q82_systematic_sample" ->
      """SELECT doc_id, source, n_chars FROM (
           SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM documents)
         WHERE floor(cum / 1000.0) > floor((cum - n_chars) / 1000.0)
         ORDER BY doc_id""",

    // Same doc construction, then the full boilerplate pass replayed on
    // line TEXT (the operator keys lines by xxhash64 of the same trimmed
    // text — identical up to 2^-64 collisions, as with q57).
    "q83_strip_boilerplate" ->
      """WITH d AS (
           SELECT doc_id, text || chr(10) ||
             CASE WHEN doc_id % 2 = 0 THEN 'subscribe to ' || source || ' weekly'
                  ELSE 'contact ' || CAST(doc_id AS VARCHAR) END
             || chr(10) || 'all rights reserved' AS t
           FROM documents),
         l0 AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
         lines AS (
           SELECT doc_id, i - 1 AS pos, ls[i] AS line
           FROM l0, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) u),
         bp AS (
           SELECT trim(line) AS k FROM lines WHERE trim(line) <> ''
           GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10),
         kept AS (
           SELECT l.doc_id, l.pos, l.line FROM lines l
           LEFT JOIN bp ON trim(l.line) = bp.k WHERE bp.k IS NULL),
         reb AS (
           SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                  count(*) AS n_kept
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id AS id, coalesce(reb.clean_text, '') AS clean_text,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.t, chr(10))) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
         FROM d LEFT JOIN reb USING (doc_id)
         ORDER BY id""",

    // Integer floor division throughout; the single final mean division is
    // one correctly-rounded IEEE op on exact integers => bit-identical.
    "q84_rarity_score" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS term
           FROM documents),
         counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
         tot AS (SELECT sum(c) AS n_total FROM counts)
         SELECT doc_id AS id, count(*) AS n_toks,
           CAST(sum((tot.n_total * 1000000) // c) AS BIGINT) AS rarity_sum,
           round(CAST(sum((tot.n_total * 1000000) // c) AS DOUBLE) / count(*), 6) AS mean_rarity
         FROM toks JOIN counts USING (term) CROSS JOIN tot
         GROUP BY doc_id ORDER BY id""",

    // Bloom prefilter + exact verify == plain contamination: q59's oracle.
    "q85_contamination_bloom" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 7, 1) + 1),
               i -> array_to_string(toks[i : i+7], ' '))) AS s
           FROM t),
         bench AS (
           SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
         train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
         hits AS (
           SELECT doc_id, COUNT(*) AS n_hit
           FROM (SELECT doc_id, unnest(s) AS g FROM train) tr
           JOIN bench USING (g)
           GROUP BY doc_id)
         SELECT train.doc_id AS id,
           CAST(len(s) AS BIGINT) AS n_shingles,
           CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / len(s) AS contam_ratio
         FROM train LEFT JOIN hits ON train.doc_id = hits.doc_id
         ORDER BY id""",

    // The blocked equi-join must equal the naive all-pairs theta join —
    // the length bound is a true lower bound on levenshtein.
    "q86_edit_distance_pairs" ->
      """WITH s AS (SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL)
         SELECT a.s AS sa, b.s AS sb, CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
         FROM s a, s b
         WHERE (length(a.s) < length(b.s)
                OR (length(a.s) = length(b.s) AND a.s < b.s))
           AND levenshtein(a.s, b.s) <= 3
         ORDER BY sa, sb""",

    "q87_frequency_spectrum" ->
      """WITH toks AS (
           SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS term FROM documents),
         c AS (SELECT term, count(*) AS occurrences FROM toks GROUP BY term)
         SELECT occurrences, count(*) AS n_terms
         FROM c GROUP BY occurrences ORDER BY occurrences""",

    // Anti join against first-half key history, then keep-first by event_id.
    // Split point = count/2, matching the query's sf-agnostic midpoint.
    "q88_incremental_dedup" ->
      """WITH mid AS (SELECT count(*) // 2 AS m FROM events),
         e AS (
           SELECT event_id, user_id, event_type, value,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
           FROM events),
         seen AS (
           SELECT DISTINCT user_id, event_type, day FROM e
           WHERE event_id < (SELECT m FROM mid)),
         fresh AS (
           SELECT b.* FROM e b
           ANTI JOIN seen s ON b.user_id = s.user_id
             AND b.event_type = s.event_type AND b.day = s.day
           WHERE b.event_id >= (SELECT m FROM mid))
         SELECT event_id, user_id, event_type, day, value FROM (
           SELECT *, row_number() OVER (
             PARTITION BY user_id, event_type, day ORDER BY event_id) AS rn
           FROM fresh) WHERE rn = 1
         ORDER BY event_id""",

    // quantile_cont == Spark percentile (q61); clipping is pure selection.
    "q89_winsorize" ->
      """WITH b AS (
           SELECT l_returnflag AS g,
             quantile_cont(l_extendedprice, 0.01) AS p_lo,
             quantile_cont(l_extendedprice, 0.99) AS p_hi
           FROM lineitem GROUP BY 1)
         SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice AS x,
           round(p_lo, 6) AS p_lo, round(p_hi, 6) AS p_hi,
           round(CASE WHEN l_extendedprice < p_lo THEN p_lo
                      WHEN l_extendedprice > p_hi THEN p_hi
                      ELSE l_extendedprice END, 6) AS clipped
         FROM lineitem JOIN b ON l_returnflag = b.g
         ORDER BY l_orderkey, l_linenumber""",

    // Bit-for-bit Morton interleave: disjoint bit positions, so the
    // list_sum of shifted bits equals the OR-fold.
    "q90_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(list_sum(list_transform(range(0, 11), i ->
             (((l_partkey >> i) & 1) << (2*i)) +
             (((l_suppkey >> i) & 1) << (2*i + 1)))) AS BIGINT) AS z
         FROM lineitem
         ORDER BY z, l_orderkey, l_linenumber""",

    // Same injected URL/email construction; URL-then-email count order.
    "q91_pii_counts" ->
      """WITH d AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 3 = 0
               THEN ' visit https://docs.' || source || '.example.com/x now' ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org' ELSE '' END AS t
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t, 'https?://[^ \t\n\x0B\f\r]+')) AS BIGINT) AS n_urls,
           CAST(len(regexp_extract_all(
             regexp_replace(t, 'https?://[^ \t\n\x0B\f\r]+', ' ', 'g'),
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
         FROM d ORDER BY doc_id""",

    "q92_truncate_tokens" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
               x -> len(x) > 0) AS toks
           FROM documents)
         SELECT doc_id AS id,
           array_to_string(toks[1:24], ' ') AS text_trunc,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN len(toks) > 24 THEN 1 ELSE 0 END AS BIGINT) AS was_truncated
         FROM t ORDER BY id""",

    // Same multiplicative hash as q54; row_number within shard by (h, id).
    "q93_deterministic_shuffle" ->
      """WITH h AS (
           SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS hv FROM documents)
         SELECT doc_id, CAST(hv % 16 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) AS BIGINT) AS pos
         FROM h ORDER BY shard, pos""",

    // FNV per distinct term (HUGEINT fold), signed pmod bucket, integer
    // floor-division weights — collision sums are exact Long adds.
    "q94_hashed_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0)) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
         nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         hv AS (
           SELECT term,
             list_reduce(list_prepend(CAST('14695981039346656037' AS HUGEINT),
               list_transform(string_split(term, ''), ch -> CAST(unicode(ch) AS HUGEINT))),
               (acc, c) -> (xor(acc, c) * 1099511628211)
                 % CAST('18446744073709551616' AS HUGEINT)) AS h
           FROM dfreq),
         bk AS (
           SELECT term, CAST(((((CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
                    THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END) % 64)
                  + 64) % 64) AS BIGINT) AS bucket
           FROM hv)
         SELECT tf.doc_id AS id, bk.bucket,
           CAST(sum((tf.tf * (nd.n_docs + 1) * 1000000) // (dfreq.doc_freq + 1)) AS BIGINT) AS weight
         FROM tf JOIN dfreq USING (term) JOIN bk USING (term) CROSS JOIN nd
         GROUP BY 1, 2 ORDER BY id, bucket""",

    // min/max are selections; (x-min)/(max-min) is three IEEE ops on exact
    // inputs — compared raw, no rounding.
    "q95_normalize_minmax" ->
      """WITH b AS (
           SELECT l_returnflag AS g, min(l_extendedprice) AS v_min,
             max(l_extendedprice) AS v_max
           FROM lineitem GROUP BY 1)
         SELECT l_orderkey, l_linenumber, l_returnflag, v_min, v_max,
           CASE WHEN v_max = v_min THEN 0.0
                ELSE (l_extendedprice - v_min) / (v_max - v_min) END AS normalized
         FROM lineitem JOIN b ON l_returnflag = b.g
         ORDER BY l_orderkey, l_linenumber""",

    // Three unrolled integer-exact damped rounds: teleport 150000
    // (= (100-85)*1e6 DIV 100), per-edge contribution rank // outdeg,
    // damping (85 * contrib) // 100. Floor division replays bit-for-bit.
    "q100_pagerank" ->
      """WITH e AS (
           SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         n AS (SELECT DISTINCT id FROM
           (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM n),
         c1 AS (SELECT e.dst AS id, sum(r0.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r0 ON r0.id = e.src GROUP BY e.dst),
         r1 AS (SELECT n.id, 150000 + (85 * COALESCE(c1.contrib, 0)) // 100 AS rank
                FROM n LEFT JOIN c1 USING (id)),
         c2 AS (SELECT e.dst AS id, sum(r1.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r1 ON r1.id = e.src GROUP BY e.dst),
         r2 AS (SELECT n.id, 150000 + (85 * COALESCE(c2.contrib, 0)) // 100 AS rank
                FROM n LEFT JOIN c2 USING (id)),
         c3 AS (SELECT e.dst AS id, sum(r2.rank // od.outdeg) AS contrib
                FROM e JOIN od USING (src) JOIN r2 ON r2.id = e.src GROUP BY e.dst),
         r3 AS (SELECT n.id, 150000 + (85 * COALESCE(c3.contrib, 0)) // 100 AS rank
                FROM n LEFT JOIN c3 USING (id))
         SELECT id, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY id""",

    // Same bigram zip as q80's oracle; smoothing uses the bigram vocab B:
    // surprise = ((c(a)+B)*scale) // (c(ab)+1), all integer floor division.
    "q99_bigram_surprise" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\s+'),
             x -> len(x) > 0) AS toks
           FROM documents),
         bi AS (
           SELECT doc_id, toks[i] AS ta, toks[i+1] AS tb
           FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
           WHERE len(toks) > 1),
         uni AS (
           SELECT term, count(*) AS ca FROM (
             SELECT unnest(toks) AS term FROM t) GROUP BY term),
         bc AS (SELECT ta, tb, count(*) AS cab FROM bi GROUP BY ta, tb),
         bv AS (SELECT count(*) AS bvocab FROM bc)
         SELECT bi.doc_id AS id, count(*) AS n_bigrams,
           CAST(sum(((uni.ca + bv.bvocab) * 1000000) // (bc.cab + 1)) AS BIGINT) AS surprise_sum,
           CAST(sum(((uni.ca + bv.bvocab) * 1000000) // (bc.cab + 1))
             // count(*) AS BIGINT) AS mean_surprise
         FROM bi JOIN bc USING (ta, tb) JOIN uni ON uni.term = bi.ta CROSS JOIN bv
         GROUP BY bi.doc_id ORDER BY id""",

    // q93's multiplicative hash decides the fractional remainder copy;
    // all stats are integer floor division (DuckDB // == Spark div).
    "q101_mixture_resample" ->
      """WITH c AS (SELECT lang AS domain, count(*) AS cnt FROM documents GROUP BY 1),
         n AS (SELECT count(*) AS n_total FROM documents),
         w(domain, w) AS (VALUES ('en', 600), ('de', 150), ('fr', 100),
                                 ('es', 100), ('zh', 50)),
         s AS (
           SELECT c.domain, cnt, (w * n_total) // 1000 AS tgt
           FROM c JOIN w USING (domain) CROSS JOIN n),
         st AS (
           SELECT domain, tgt // cnt AS reps, tgt % cnt AS rem,
             ((tgt % cnt) * 4294967296) // cnt AS thr
           FROM s),
         d AS (
           SELECT doc_id, lang AS domain,
             (doc_id * 2654435761) % 4294967296 AS hv
           FROM documents),
         k AS (
           SELECT doc_id, d.domain,
             reps + CASE WHEN hv < thr THEN 1 ELSE 0 END AS ncop
           FROM d JOIN st USING (domain))
         SELECT doc_id AS id, domain, CAST(e AS BIGINT) AS epoch
         FROM k, LATERAL (SELECT unnest(range(ncop)) AS e) u
         ORDER BY id, epoch""",

    // PQ encode replay: double-cast before slicing (same as q65), list_sum
    // left-assoc == L2DistSq's loop, argmin via (d, cid) row_number.
    "q102_pq_encode" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cb AS (
           SELECT s.sub, vec_id AS cid, v[s.sub*8+1 : s.sub*8+8] AS cv
           FROM e, LATERAL (SELECT unnest(range(8)) AS sub) s
           WHERE vec_id < 16),
         sv AS (
           SELECT vec_id AS id, s.sub, v[s.sub*8+1 : s.sub*8+8] AS sv
           FROM e, LATERAL (SELECT unnest(range(8)) AS sub) s),
         d AS (
           SELECT id, sv.sub, cid,
             list_sum(list_transform(range(1, 9),
               i -> (sv.sv[i] - cb.cv[i]) * (sv.sv[i] - cb.cv[i]))) AS d
           FROM sv JOIN cb ON sv.sub = cb.sub)
         SELECT id, CAST(sub AS BIGINT) AS sub, cid AS code, round(d, 6) AS dist_sq
         FROM (SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d, cid) AS rn
               FROM d)
         WHERE rn = 1 ORDER BY id, sub""",

    // q102's codes + a per-query LUT; subspace distances summed as
    // DECIMAL(30,12) (order-independent), ranked on the DOUBLE cast.
    "q103_pq_adc_topk" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cb AS (
           SELECT s.sub, vec_id AS cid, v[s.sub*8+1 : s.sub*8+8] AS cv
           FROM e, LATERAL (SELECT unnest(range(8)) AS sub) s
           WHERE vec_id < 16),
         sv AS (
           SELECT vec_id AS id, s.sub, v[s.sub*8+1 : s.sub*8+8] AS sv
           FROM e, LATERAL (SELECT unnest(range(8)) AS sub) s),
         dall AS (
           SELECT id, sv.sub, cid,
             list_sum(list_transform(range(1, 9),
               i -> (sv.sv[i] - cb.cv[i]) * (sv.sv[i] - cb.cv[i]))) AS d
           FROM sv JOIN cb ON sv.sub = cb.sub),
         codes AS (
           SELECT id, sub, cid AS code
           FROM (SELECT *, row_number() OVER (PARTITION BY id, sub ORDER BY d, cid) AS rn
                 FROM dall)
           WHERE rn = 1),
         qs AS (
           SELECT vec_id AS q_id, s.sub, v[s.sub*8+1 : s.sub*8+8] AS qv
           FROM e, LATERAL (SELECT unnest(range(8)) AS sub) s
           WHERE vec_id < 4),
         lut AS (
           SELECT q_id, qs.sub, cid,
             list_sum(list_transform(range(1, 9),
               i -> (qs.qv[i] - cb.cv[i]) * (qs.qv[i] - cb.cv[i]))) AS d
           FROM qs JOIN cb ON qs.sub = cb.sub),
         sc AS (
           SELECT q_id, codes.id AS c_id,
             CAST(sum(CAST(d AS DECIMAL(30,12))) AS DOUBLE) AS adist
           FROM codes JOIN lut ON codes.sub = lut.sub AND codes.code = lut.cid
           GROUP BY 1, 2)
         SELECT q_id AS query_id, c_id AS neighbor_id, round(adist, 6) AS adist,
           CAST(rn AS BIGINT) AS rank
         FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rn
               FROM sc)
         WHERE rn <= 5 ORDER BY query_id, rank""",

    // BM25 with rational (ln-free) idf — the q80 lift trick — so every
    // step is an exact-cross-engine IEEE op sequence: integer tf/df/dl/N
    // widened to double, one avgdl division, per-term scores combined
    // left-associated in query-term order.
    "q104_bm25" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         f AS (
           SELECT doc_id,
             CAST(len(list_filter(toks, x -> x = 'spark'))  AS DOUBLE) AS tf0,
             CAST(len(list_filter(toks, x -> x = 'join'))   AS DOUBLE) AS tf1,
             CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf2,
             CAST(len(list_filter(toks, x -> x = 'hash'))   AS DOUBLE) AS tf3,
             CAST(len(toks) AS DOUBLE) AS dl
           FROM t),
         st AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_dl,
             SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
             SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2,
             SUM(CASE WHEN tf3 > 0 THEN 1.0 ELSE 0.0 END) AS df3
           FROM f),
         sc AS (
           SELECT doc_id, dl,
             (((
               (((n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0)))
                 / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs))))
             + (((n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0)))
                 / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs)))))
             + (((n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0)))
                 / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs)))))
             + (((n_docs - df3 + 0.5) / (df3 + 0.5)) * (tf3 * (1.2 + 1.0)))
                 / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs))))) AS score
           FROM f CROSS JOIN st)
         SELECT CAST(rn AS BIGINT) AS rank, doc_id AS id, round(score, 6) AS score
         FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
               FROM sc WHERE score > 0)
         WHERE rn <= 50 ORDER BY rank""",

    // q104's lexical top-100 fused with the exact-cosine semantic top-100
    // for doc 0: rrf = 1/(60+rank) summed in fixed (lexical, semantic)
    // order; absent list contributes 0.0.
    "q105_rrf_hybrid" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         f AS (
           SELECT doc_id,
             CAST(len(list_filter(toks, x -> x = 'spark'))  AS DOUBLE) AS tf0,
             CAST(len(list_filter(toks, x -> x = 'join'))   AS DOUBLE) AS tf1,
             CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf2,
             CAST(len(list_filter(toks, x -> x = 'hash'))   AS DOUBLE) AS tf3,
             CAST(len(toks) AS DOUBLE) AS dl
           FROM t),
         st AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_dl,
             SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
             SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2,
             SUM(CASE WHEN tf3 > 0 THEN 1.0 ELSE 0.0 END) AS df3
           FROM f),
         sc AS (
           SELECT doc_id, dl,
             (((
               (((n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0)))
                 / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs))))
             + (((n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0)))
                 / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs)))))
             + (((n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0)))
                 / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs)))))
             + (((n_docs - df3 + 0.5) / (df3 + 0.5)) * (tf3 * (1.2 + 1.0)))
                 / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs))))) AS score
           FROM f CROSS JOIN st),
         lex AS (
           SELECT id, rank_a FROM (
             SELECT doc_id AS id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank_a
             FROM sc WHERE score > 0)
           WHERE rank_a <= 100),
         sem AS (
           SELECT id, rank_b FROM (
             SELECT c.vec_id AS id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(q.qv, CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id) AS rank_b
             FROM embeddings c,
               (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
             WHERE c.vec_id <> 0)
           WHERE rank_b <= 100),
         fused AS (
           SELECT coalesce(lex.id, sem.id) AS id, lex.rank_a, sem.rank_b,
             (CASE WHEN lex.rank_a IS NOT NULL
                   THEN 1.0 / (CAST(60 AS DOUBLE) + CAST(lex.rank_a AS DOUBLE))
                   ELSE 0.0 END)
             + (CASE WHEN sem.rank_b IS NOT NULL
                     THEN 1.0 / (CAST(60 AS DOUBLE) + CAST(sem.rank_b AS DOUBLE))
                     ELSE 0.0 END) AS rrf
           FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
         SELECT CAST(rn AS BIGINT) AS rank, id,
           coalesce(rank_a, -1) AS rank_a, coalesce(rank_b, -1) AS rank_b,
           round(rrf, 6) AS rrf
         FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, id) AS rn FROM fused)
         WHERE rn <= 25 ORDER BY rank""",

    // q79's nearest-centroid assignment (l2, ties to lower cid) over the
    // first-8 seeding, then within-cell domination: dropped iff some
    // lower-id vector in the same cell has cosine >= 0.35.
    "q106_semdedup" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         s AS (
           SELECT e.vec_id AS id, e.v, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
           FROM e CROSS JOIN c),
         a AS (
           SELECT id, v, cid FROM (
             SELECT id, v, cid, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
             FROM s) WHERE rn = 1),
         dom AS (
           SELECT hi.id AS id, MIN(lo.id) AS dup_of
           FROM a lo JOIN a hi ON lo.cid = hi.cid AND lo.id < hi.id
             AND list_cosine_similarity(lo.v, hi.v) >= 0.35
           GROUP BY hi.id)
         SELECT a.id, a.cid, dom.dup_of IS NULL AS kept,
           coalesce(dom.dup_of, -1) AS dup_of
         FROM a LEFT JOIN dom ON a.id = dom.id
         ORDER BY a.id""",

    // q93's hash replay aggregated per shard with token totals.
    "q140_shard_manifest" ->
      """WITH h AS (
           SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS hv FROM documents),
         tk AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens
           FROM documents)
         SELECT CAST(h.hv % 16 AS BIGINT) AS shard, COUNT(*) AS n_docs,
           CAST(SUM(tk.n_tokens) AS BIGINT) AS n_tokens,
           MIN(h.doc_id) AS min_id, MAX(h.doc_id) AS max_id
         FROM h JOIN tk USING (doc_id)
         GROUP BY 1 ORDER BY shard""",

    // q60's cumulative layout summarized; n_seqs = ceil(total/512).
    "q141_pack_report" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> len(x) > 0)) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM t),
         s AS (
           SELECT COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN cum_before % 512 + n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_spanning
           FROM c)
         SELECT n_docs, total_tokens, n_spanning,
           CAST((total_tokens - 1) // 512 + 1 AS BIGINT) AS n_seqs,
           round(CAST(total_tokens AS DOUBLE)
                 / CAST(((total_tokens - 1) // 512 + 1) * 512 AS DOUBLE), 9) AS fill_rate
         FROM s""",

    // Exhaustive IVF (nprobe = nlist) scores every pair exactly once, so the
    // cell-partitioned mutual-kNN equals brute force — q117's oracle verbatim.
    "q142_mutual_knn_ivf" ->
      """WITH c AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         s AS (
           SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             list_cosine_similarity(a.v, b.v) AS score
           FROM c a JOIN c b ON a.vec_id <> b.vec_id),
         r AS (
           SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
           FROM s),
         k AS (SELECT q_id, c_id, rnk FROM r WHERE rnk <= 10)
         SELECT f.q_id AS id_a, f.c_id AS id_b,
           CAST(f.rnk AS BIGINT) AS rank_ab, CAST(g.rnk AS BIGINT) AS rank_ba
         FROM k f JOIN k g ON f.q_id = g.c_id AND f.c_id = g.q_id
         WHERE f.q_id < f.c_id
         ORDER BY id_a, id_b""",

    // Pair-level recall fully re-derived (r10, replacing the r9 pin): the
    // pruned all-pairs kNN over the fixture quantizer, the mutual filter
    // on both graphs, and the exact all-pairs kNN-10 are each replayed by
    // DuckDB; the recall falls out of their pair-set overlap.
    "q143_mutual_knn_ivf_recall" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         cent AS (SELECT id AS cell, v AS cv FROM e WHERE id < 16),
         ca AS (SELECT id, cell FROM (
             SELECT e.id, cent.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent) WHERE rn = 1),
         qp AS (SELECT id AS q_id, cell FROM (
             SELECT e.id, cent.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent) WHERE rn <= 4),
         s AS (SELECT qp.q_id, ca.id AS c_id,
                 list_cosine_similarity(qv.v, cv.v) AS score
               FROM qp JOIN ca USING (cell)
               JOIN e qv ON qv.id = qp.q_id
               JOIN e cv ON cv.id = ca.id
               WHERE ca.id <> qp.q_id),
         ak AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
             FROM s) WHERE rnk <= 10),
         ap AS (SELECT f.q_id AS id_a, f.c_id AS id_b
                FROM ak f JOIN ak g ON f.q_id = g.c_id AND f.c_id = g.q_id
                WHERE f.q_id < f.c_id),
         bs AS (SELECT qv.id AS q_id, cv.id AS c_id,
                  list_cosine_similarity(qv.v, cv.v) AS score
                FROM e qv JOIN e cv ON cv.id <> qv.id),
         ek AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
             FROM bs) WHERE rnk <= 10),
         ex AS (SELECT f.q_id AS id_a, f.c_id AS id_b
                FROM ek f JOIN ek g ON f.q_id = g.c_id AND f.c_id = g.q_id
                WHERE f.q_id < f.c_id),
         hit AS (SELECT COUNT(*) AS n_hit FROM ex
                 WHERE EXISTS (SELECT 1 FROM ap
                               WHERE ap.id_a = ex.id_a AND ap.id_b = ex.id_b))
         SELECT (SELECT COUNT(*) FROM ex) AS n_exact,
                (SELECT COUNT(*) FROM ap) AS n_approx,
                n_hit,
                round(CAST(n_hit AS DOUBLE) / (SELECT COUNT(*) FROM ex), 6)
                  AS pair_recall
         FROM hit""",

    // Disjunctive predicate evaluated identically; decimal-exact revenue.
    "q137_tpch_q19" ->
      """SELECT
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
           COUNT(*) AS n_lines
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 1 AND 12)
            OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
                AND l.l_quantity BETWEEN 8 AND 24)
            OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
                AND l.l_quantity BETWEEN 16 AND 36)""",

    // Decimal-exact global average; anti join excludes order holders.
    "q138_tpch_q22" ->
      """WITH a AS (
           SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
           FROM customer WHERE c_acctbal > 0.0)
         SELECT c.c_nationkey, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer c, a
         WHERE c.c_acctbal > a.avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                           AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
         GROUP BY c.c_nationkey ORDER BY c.c_nationkey""",

    // The same SQL text shape DuckDB runs.
    "q139_sql_surface" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_returnflag = 'R'
         GROUP BY o.o_orderpriority
         ORDER BY o.o_orderpriority""",

    // q112's chunk construction feeding q104's scoring, over chunk ids
    // doc*1000+chunk.
    "q136_passage_retrieval" ->
      """WITH t0 AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         n0 AS (SELECT doc_id, toks, len(toks) AS n FROM t0 WHERE len(toks) > 0),
         s0 AS (
           SELECT doc_id, toks, n,
             CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 15) // 16 + 1 END AS ns
           FROM n0),
         ch AS (
           SELECT doc_id * 1000 + k AS id,
             toks[k*16+1 : k*16+32] AS ctoks
           FROM s0, LATERAL (SELECT unnest(range(0, ns)) AS k) u),
         f AS (
           SELECT id,
             CAST(len(list_filter(ctoks, x -> x = 'spark'))  AS DOUBLE) AS tf0,
             CAST(len(list_filter(ctoks, x -> x = 'join'))   AS DOUBLE) AS tf1,
             CAST(len(list_filter(ctoks, x -> x = 'window')) AS DOUBLE) AS tf2,
             CAST(len(list_filter(ctoks, x -> x = 'hash'))   AS DOUBLE) AS tf3,
             CAST(len(ctoks) AS DOUBLE) AS dl
           FROM ch),
         st AS (
           SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS total_dl,
             SUM(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
             SUM(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
             SUM(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2,
             SUM(CASE WHEN tf3 > 0 THEN 1.0 ELSE 0.0 END) AS df3
           FROM f),
         sc AS (
           SELECT id,
             (((
               (((n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0)))
                 / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs))))
             + (((n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0)))
                 / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs)))))
             + (((n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0)))
                 / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs)))))
             + (((n_docs - df3 + 0.5) / (df3 + 0.5)) * (tf3 * (1.2 + 1.0)))
                 / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (total_dl / n_docs))))) AS score
           FROM f CROSS JOIN st)
         SELECT CAST(rn AS BIGINT) AS rank,
           CAST(id // 1000 AS BIGINT) AS doc_id,
           CAST(id % 1000 AS BIGINT) AS chunk_id,
           round(score, 6) AS score
         FROM (SELECT *, row_number() OVER (ORDER BY score DESC, id) AS rn
               FROM sc WHERE score > 0)
         WHERE rn <= 20 ORDER BY rank""",

    // Same window definitions; ntile/percent_rank/cume_dist share ANSI
    // semantics across engines.
    "q132_window_family" ->
      """WITH b AS (
           SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS price,
             l_orderkey, l_linenumber
           FROM lineitem WHERE l_quantity <= 2)
         SELECT l_returnflag, price, l_orderkey, l_linenumber,
           coalesce(lag(price) OVER w, -1.0) AS prev_price,
           coalesce(lead(price) OVER w, -1.0) AS next_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cdist
         FROM b
         WINDOW w AS (PARTITION BY l_returnflag
                      ORDER BY price, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, price, l_orderkey, l_linenumber, quartile""",

    // Multiset set-ops, aggregated to (value, multiplicity) rows so the
    // compare is order-proof.
    "q133_multiset_ops" ->
      """WITH a AS (
           SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag
           FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1997-06-01'),
         b AS (
           SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag
           FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1997-06-01'),
         u AS (
           SELECT 'intersect_all' AS op, qty, flag FROM (
             SELECT qty, flag FROM a INTERSECT ALL SELECT qty, flag FROM b)
           UNION ALL
           SELECT 'except_all', qty, flag FROM (
             SELECT qty, flag FROM a EXCEPT ALL SELECT qty, flag FROM b))
         SELECT op, qty, flag, COUNT(*) AS n
         FROM u GROUP BY 1, 2, 3 ORDER BY op, qty, flag""",

    // Conditional decimal aggregate over the part join; one division.
    "q134_tpch_q14" ->
      """WITH j AS (
           SELECT CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS disc,
             p.p_type
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
             AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'),
         s AS (
           SELECT
             CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN disc
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
             CAST(SUM(disc) AS DOUBLE) AS total_revenue
           FROM j)
         SELECT round(promo_revenue, 4) AS promo_revenue,
           round(total_revenue, 4) AS total_revenue,
           round(100.0 * promo_revenue / total_revenue, 9) AS promo_share
         FROM s""",

    // GROUPING SETS with the same set list; grouping id bit order matches
    // (left column = high bit on both engines).
    "q135_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus))
         ORDER BY gid, flag, status""",

    // q28's lang-id replay aggregated into the confusion matrix.
    "q131_lang_confusion" ->
      """WITH t AS (
           SELECT doc_id, lang, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n,
             len(text) - len(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
           FROM documents),
         h AS (
           SELECT lang,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','it','was','with','for'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['el','la','los','las','que','es','por','con','una','del'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['le','les','des','une','est','dans','pour','qui','sur','avec'], x))) AS h_fr,
             cjk, n
           FROM t),
         p AS (
           SELECT lang,
             CASE WHEN cjk * 4 > n THEN 'zh'
                  WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_es >= h_fr THEN 'es'
                  ELSE 'fr' END AS lang_pred
           FROM h),
         m AS (SELECT lang, lang_pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
         tr AS (SELECT lang, COUNT(*) AS n_truth FROM documents GROUP BY 1)
         SELECT m.lang, m.lang_pred, m.n, tr.n_truth,
           round(CAST(m.n AS DOUBLE) / CAST(tr.n_truth AS DOUBLE), 9) AS share
         FROM m JOIN tr USING (lang)
         ORDER BY m.lang, m.lang_pred""",

    // sup|F1-F2| with the division deferred: max of integer cross-scaled
    // cumulative differences.
    "q130_ks_drift" ->
      """WITH c AS (
           SELECT n_chars AS v,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c_a,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c_b
           FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
         cum AS (
           SELECT v,
             SUM(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
           FROM c),
         tot AS (SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM c)
         SELECT 'src0' AS label_a, 'src1' AS label_b,
           CAST(tot.n_a AS BIGINT) AS n_a, CAST(tot.n_b AS BIGINT) AS n_b,
           round(CAST(MAX(abs(cum.cum_a * tot.n_b - cum.cum_b * tot.n_a)) AS DOUBLE)
                 / CAST(tot.n_a * tot.n_b AS DOUBLE), 9) AS ks
         FROM cum, tot GROUP BY tot.n_a, tot.n_b""",

    // Pre-aggregate HAVING, then two joins; quantity sums decimal-exact.
    "q128_tpch_q18" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0)
         SELECT c.c_name, o.o_orderkey,
           epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS od_us,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, big.sum_qty
         FROM big
         JOIN orders o ON big.l_orderkey = o.o_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         ORDER BY o_totalprice DESC, od_us, o.o_orderkey
         LIMIT 50""",

    // Ascending-pair edges make each triangle visible exactly once as
    // (a,b),(b,c),(a,c); per-node counts via the corner explode.
    "q129_triangles" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         e AS (
           SELECT id_a AS a, id_b AS b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         tri AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e e1 JOIN e e2 ON e1.b = e2.a
           JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
         corners AS (
           SELECT x AS id FROM tri UNION ALL
           SELECT y FROM tri UNION ALL SELECT z FROM tri)
         SELECT id, COUNT(*) AS n_triangles
         FROM corners GROUP BY id ORDER BY id""",

    // q36's kNN with k=20 and a rank-band role label.
    "q126_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         s AS (SELECT q_id, c_id, list_cosine_similarity(qv, cv) AS score
               FROM q JOIN c ON c_id <> q_id),
         r AS (SELECT q_id, c_id, score,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
               FROM s)
         SELECT q_id AS query_id, c_id AS neighbor_id,
                round(score, 6) AS cosine, rnk AS rank,
                CASE WHEN rnk <= 5 THEN 'positive' ELSE 'hard_negative' END AS role
         FROM r WHERE rnk <= 20 ORDER BY query_id, rank""",

    // Integer co-moments exact in BIGINT, one division + sqrt each.
    "q127_rate_anomalies" ->
      """WITH h AS (
           SELECT event_type AS key,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT key, COUNT(*) AS cnt, SUM(n) AS sn, SUM(n * n) AS snn
           FROM h GROUP BY key)
         SELECT h.key, epoch_us(h.bucket) AS bucket_us, h.n,
           round(CAST(st.sn AS DOUBLE) / CAST(st.cnt AS DOUBLE), 6) AS mean,
           round(sqrt(CASE WHEN st.cnt > 1
             THEN CAST(st.cnt * st.snn - st.sn * st.sn AS DOUBLE)
                  / CAST(st.cnt * (st.cnt - 1) AS DOUBLE)
             ELSE 0.0 END), 6) AS std,
           round(CASE WHEN st.cnt <= 1 OR st.cnt * st.snn - st.sn * st.sn = 0 THEN 0.0
             ELSE (CAST(h.n AS DOUBLE) - CAST(st.sn AS DOUBLE) / CAST(st.cnt AS DOUBLE))
                  / sqrt(CAST(st.cnt * st.snn - st.sn * st.sn AS DOUBLE)
                         / CAST(st.cnt * (st.cnt - 1) AS DOUBLE))
             END, 6) AS zscore,
           CASE WHEN st.cnt <= 1 OR st.cnt * st.snn - st.sn * st.sn = 0 THEN FALSE
             ELSE abs((CAST(h.n AS DOUBLE) - CAST(st.sn AS DOUBLE) / CAST(st.cnt AS DOUBLE))
                      / sqrt(CAST(st.cnt * st.snn - st.sn * st.sn AS DOUBLE)
                             / CAST(st.cnt * (st.cnt - 1) AS DOUBLE))) > 3.0
             END AS is_anomaly
         FROM h JOIN st USING (key)
         ORDER BY key, bucket_us""",

    // Decimal-exact revenue; desc rank with (od_us, l_orderkey) ties.
    "q124_tpch_q3" ->
      """SELECT l.l_orderkey,
           epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS od_us,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND CAST(o.o_orderdate AS DATE) < DATE '1996-06-30'
           AND CAST(l.l_shipdate AS DATE) > DATE '1996-06-30'
         GROUP BY l.l_orderkey, o.o_orderdate
         ORDER BY revenue DESC, od_us, l.l_orderkey
         LIMIT 10""",

    "q125_tpch_q5" ->
      """SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
           AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
           AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
         GROUP BY n.n_name
         ORDER BY revenue DESC, n.n_name""",

    // Batch = doc_id // ceil(n/10); novelty = first-occurrence share of
    // the batch's distinct shingles.
    "q123_novelty_curve" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         bs AS (SELECT (COUNT(*) + 9) // 10 AS b FROM documents),
         u AS (
           SELECT DISTINCT batch, g FROM (
             SELECT CAST(doc_id // bs.b AS BIGINT) AS batch, unnest(s) AS g
             FROM sh, bs)),
         f AS (SELECT g, MIN(batch) AS fb FROM u GROUP BY g)
         SELECT u.batch, COUNT(*) AS n_units,
           CAST(SUM(CASE WHEN f.fb = u.batch THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           round(CAST(SUM(CASE WHEN f.fb = u.batch THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 9) AS novelty
         FROM u JOIN f USING (g) GROUP BY u.batch ORDER BY u.batch""",

    // Monday-start week truncation on both engines; offsets are integer
    // microsecond arithmetic.
    "q121_cohort_retention" ->
      """WITH e AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
         f AS (
           SELECT user_id, epoch_us(date_trunc('day', MIN(t))) AS cohort_us
           FROM e GROUP BY 1),
         h AS (
           SELECT e.user_id, f.cohort_us,
             CAST(floor(CAST(e.us - f.cohort_us AS DOUBLE) / 86400000000) AS BIGINT)
               AS period_offset
           FROM e JOIN f USING (user_id)),
         a AS (
           SELECT cohort_us, period_offset, COUNT(DISTINCT user_id) AS n_active
           FROM h GROUP BY 1, 2),
         s AS (SELECT cohort_us, COUNT(DISTINCT user_id) AS cohort_size FROM f GROUP BY 1)
         SELECT a.cohort_us, a.period_offset, a.n_active, s.cohort_size,
           round(CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 9) AS retention
         FROM a JOIN s USING (cohort_us)
         ORDER BY cohort_us, period_offset""",

    // lag for run starts, lead for interval ends; (ts, event_id) ordering
    // replayed exactly.
    "q122_state_intervals" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
         m AS (
           SELECT user_id, event_id, event_type, us,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
           FROM e),
         r AS (
           SELECT user_id, event_type, us,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_us
           FROM m WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type AS state, us AS from_us,
           coalesce(to_us, -1) AS to_us
         FROM r ORDER BY user_id, from_us, state""",

    // q28's exact quality replay, aggregated per source; the mean goes
    // through DECIMAL(18,9) so partial-merge order can't flip a bit.
    "q119_source_health" ->
      """WITH t AS (
           SELECT source, lang, text,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks,
             len(text) AS n
           FROM documents),
         h AS (
           SELECT source, lang, text, len(toks) AS ntok,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END AS mtl,
             CASE WHEN n = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / n END AS pr
           FROM t),
         q AS (
           SELECT source, lang, text, ntok,
             ((CASE WHEN ntok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
              (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) +
              (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
           FROM h)
         SELECT source, COUNT(*) AS n_docs,
           round(CAST(SUM(CAST(quality AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS mean_quality,
           round(CAST(SUM(ntok) AS DOUBLE) / COUNT(*), 6) AS mean_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups
         FROM q GROUP BY source ORDER BY source""",

    // One scalar subquery chain per stage: min ts strictly after the
    // user's previous stage time.
    "q120_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         s2 AS (
           SELECT e.user_id, MIN(e.us) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY 1),
         s3 AS (
           SELECT e.user_id, MIN(e.us) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY 1)
         SELECT u.user_id, s1.t1 AS t_view_us, s2.t2 AS t_click_us,
           s3.t3 AS t_purchase_us,
           CAST((CASE WHEN s1.t1 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END)
              + (CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS stages_completed
         FROM u
         LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
         LEFT JOIN s3 USING (user_id)
         ORDER BY u.user_id""",

    // q50's components + the q93 multiplicative hash on the component
    // label; integer compare avoids any division.
    "q118_component_split" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
         lab AS (
           SELECT d.doc_id AS id, coalesce(comp.component_id, d.doc_id) AS component_id
           FROM documents d LEFT JOIN comp ON d.doc_id = comp.id)
         SELECT id, component_id,
           CASE WHEN ((component_id * 2654435761) % 4294967296) * 1000
                     < 800 * 4294967296 THEN 'train' ELSE 'eval' END AS split
         FROM lab ORDER BY id""",

    // Vocab = top-25 by (count desc, term asc); OOV counts multiplicity.
    "q116_oov_rate" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
         vocab AS (
           SELECT term FROM (
             SELECT term, COUNT(*) AS cnt,
               row_number() OVER (ORDER BY COUNT(*) DESC, term) AS rn
             FROM tok GROUP BY term)
           WHERE rn <= 25),
         oov AS (
           SELECT tok.doc_id, COUNT(*) AS n_oov
           FROM tok LEFT JOIN vocab ON tok.term = vocab.term
           WHERE vocab.term IS NULL GROUP BY tok.doc_id)
         SELECT t.doc_id AS id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
           coalesce(oov.n_oov, 0) AS n_oov,
           round(CASE WHEN len(t.toks) > 0
                 THEN coalesce(CAST(oov.n_oov AS DOUBLE), 0.0)
                      / CAST(len(t.toks) AS DOUBLE)
                 ELSE 0.0 END, 9) AS oov_rate
         FROM t LEFT JOIN oov ON t.doc_id = oov.doc_id
         ORDER BY id""",

    // q36's exact kNN both directions: pair kept iff it appears with
    // rnk <= 10 in each orientation.
    "q117_mutual_knn" ->
      """WITH c AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         s AS (
           SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             list_cosine_similarity(a.v, b.v) AS score
           FROM c a JOIN c b ON a.vec_id <> b.vec_id),
         r AS (
           SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rnk
           FROM s),
         k AS (SELECT q_id, c_id, rnk FROM r WHERE rnk <= 10)
         SELECT f.q_id AS id_a, f.c_id AS id_b,
           CAST(f.rnk AS BIGINT) AS rank_ab, CAST(g.rnk AS BIGINT) AS rank_ba
         FROM k f JOIN k g ON f.q_id = g.c_id AND f.c_id = g.q_id
         WHERE f.q_id < f.c_id
         ORDER BY id_a, id_b""",

    // quantile_cont == Spark exact percentile (q61); the scaled value is
    // one subtraction + one division on replayed medians.
    "q115_robust_scale" ->
      """WITH m AS (
           SELECT l_returnflag, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS v_med
           FROM lineitem GROUP BY 1),
         mad AS (
           SELECT l.l_returnflag,
             quantile_cont(abs(CAST(l.l_extendedprice AS DOUBLE) - m.v_med), 0.5) AS v_mad
           FROM lineitem l JOIN m USING (l_returnflag) GROUP BY 1)
         SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           CAST(l.l_extendedprice AS DOUBLE) AS x,
           round(m.v_med, 6) AS v_med, round(mad.v_mad, 6) AS v_mad,
           round(CASE WHEN mad.v_mad = 0.0 THEN 0.0
                      ELSE (CAST(l.l_extendedprice AS DOUBLE) - m.v_med) / mad.v_mad
                 END, 6) AS scaled
         FROM lineitem l
         JOIN m USING (l_returnflag) JOIN mad USING (l_returnflag)
         ORDER BY l.l_orderkey, l.l_linenumber, l.l_returnflag,
           CAST(l.l_extendedprice AS DOUBLE)""",

    // Batch-cut independence makes the oracle the one-shot global
    // keep-first rule: dropped iff a smaller-id near-dup exists anywhere
    // (q34's exact-Jaccard pairs + min-id domination).
    "q114_stream_lsh_ingest" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         dom AS (SELECT id_b AS id, MIN(id_a) AS dup_of FROM pairs GROUP BY id_b)
         SELECT d.doc_id AS id, dom.dup_of IS NULL AS kept,
           coalesce(dom.dup_of, -1) AS dup_of
         FROM documents d LEFT JOIN dom ON d.doc_id = dom.id
         ORDER BY id""",

    // Same start rule: 1 chunk when n <= 32, else ceil((n-32)/16)+1
    // starts; slice clamps at the array end on both engines.
    "q112_sliding_chunks" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
         s AS (
           SELECT doc_id, toks, n,
             CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 15) // 16 + 1 END AS ns
           FROM n)
         SELECT doc_id AS id, CAST(k AS BIGINT) AS chunk_id,
           CAST(k * 16 AS BIGINT) AS start_tok,
           CAST(least(32, n - k * 16) AS BIGINT) AS n_tok,
           array_to_string(toks[k*16+1 : k*16+32], ' ') AS chunk_text
         FROM s, LATERAL (SELECT unnest(range(0, ns)) AS k) u
         ORDER BY id, chunk_id""",

    // Integer counts + one IEEE division per rule; list_intersect is
    // distinct-valued on both engines.
    "q113_gopher_rules" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         base AS (
           SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE)
                  ELSE 0.0 END AS mwl,
             len(list_intersect(toks,
               ['the','and','of','to','a','in','is','that'])) AS stop_hits
           FROM t),
         rep AS (
           SELECT doc_id, MAX(c) AS max_cnt FROM (
             SELECT doc_id, term, COUNT(*) AS c FROM (
               SELECT doc_id, unnest(toks) AS term FROM t)
             GROUP BY doc_id, term)
           GROUP BY doc_id),
         flags AS (
           SELECT b.doc_id AS id, b.n_words,
             b.n_words >= 20 AND b.n_words <= 80 AS wc_ok,
             b.mwl >= 4.0 AND b.mwl <= 10.0 AS mwl_ok,
             b.stop_hits >= 2 AS stop_ok,
             (CASE WHEN b.n_words > 0
                   THEN coalesce(CAST(rep.max_cnt AS DOUBLE), 0.0)
                        / CAST(b.n_words AS DOUBLE)
                   ELSE 0.0 END) <= 0.2 AS rep_ok
           FROM base b LEFT JOIN rep ON b.doc_id = rep.doc_id)
         SELECT id, n_words, wc_ok, mwl_ok, stop_ok, rep_ok,
           wc_ok AND mwl_ok AND stop_ok AND rep_ok AS pass
         FROM flags ORDER BY id""",

    // q50's component construction, then per-component argmax on
    // len(text) with ties to the smaller id.
    "q111_component_best" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
         sc AS (SELECT doc_id AS id, CAST(len(text) AS BIGINT) AS score FROM documents),
         rep AS (
           SELECT component_id, id AS rep_id FROM (
             SELECT c.component_id, c.id,
               row_number() OVER (PARTITION BY c.component_id
                 ORDER BY sc.score DESC, c.id) AS rn
             FROM comp c JOIN sc ON c.id = sc.id)
           WHERE rn = 1)
         SELECT c.id, c.component_id, r.rep_id, c.id = r.rep_id AS kept
         FROM comp c JOIN rep r USING (component_id)
         ORDER BY c.id""",

    // quantile_cont == Spark's exact percentile interpolation (pinned by
    // q61); bin = count of thresholds strictly below x.
    "q109_difficulty_bins" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                  x -> len(x) > 0)) AS DOUBLE) AS x
           FROM documents),
         thr AS (SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS q FROM t)
         SELECT doc_id AS id, x,
           CAST((CASE WHEN x > q[1] THEN 1 ELSE 0 END)
              + (CASE WHEN x > q[2] THEN 1 ELSE 0 END)
              + (CASE WHEN x > q[3] THEN 1 ELSE 0 END) AS BIGINT) AS bin
         FROM t, thr ORDER BY id""",

    // share and skew are two-op IEEE sequences on exact integer counts.
    "q110_key_skew" ->
      """WITH c AS (
           SELECT l_orderkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
         tot AS (
           SELECT COUNT(*) AS n_keys, SUM(cnt) AS n_rows FROM c)
         SELECT CAST(rn AS BIGINT) AS rank, key, cnt,
           CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
           round(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 9) AS share,
           round((CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE))
                 / CAST(n_rows AS DOUBLE), 6) AS skew
         FROM (SELECT *, row_number() OVER (ORDER BY cnt DESC, key) AS rn
               FROM c, tot)
         WHERE rn <= 20 ORDER BY rank""",

    // Exact-Jaccard replay of the LSH-candidate pipeline (the q33
    // argument: P[candidate miss at j >= 0.8] ~ 5e-9, then exact verify):
    // batch doc dropped iff >= 0.8 Jaccard with any history doc or any
    // smaller-id batch doc.
    "q108_incremental_lsh" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM documents),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         mid AS (SELECT COUNT(*) // 2 AS m FROM documents),
         hist AS (SELECT doc_id, s FROM sh, mid WHERE doc_id < m),
         batch AS (SELECT doc_id, s FROM sh, mid WHERE doc_id >= m),
         inv_h AS (SELECT doc_id, unnest(s) AS g FROM hist),
         inv_b AS (SELECT doc_id, unnest(s) AS g FROM batch),
         hbi AS (
           SELECT b.doc_id AS bid, h.doc_id AS hid, COUNT(*) AS c
           FROM inv_b b JOIN inv_h h ON b.g = h.g GROUP BY 1, 2),
         hb AS (
           SELECT bid, hid FROM hbi
           JOIN (SELECT doc_id, len(s) AS n FROM batch) nb ON nb.doc_id = bid
           JOIN (SELECT doc_id, len(s) AS n FROM hist)  nh ON nh.doc_id = hid
           WHERE CAST(c AS DOUBLE) / (nb.n + nh.n - c) >= 0.8),
         bbi AS (
           SELECT a.doc_id AS aid, b.doc_id AS bid, COUNT(*) AS c
           FROM inv_b a JOIN inv_b b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         bb AS (
           SELECT aid, bid FROM bbi
           JOIN (SELECT doc_id, len(s) AS n FROM batch) na ON na.doc_id = aid
           JOIN (SELECT doc_id, len(s) AS n FROM batch) nb2 ON nb2.doc_id = bid
           WHERE CAST(c AS DOUBLE) / (na.n + nb2.n - c) >= 0.8),
         dom AS (
           SELECT id, MIN(a) AS dup_of FROM
             (SELECT bid AS id, hid AS a FROM hb
              UNION ALL SELECT bid, aid FROM bb)
           GROUP BY id)
         SELECT b.doc_id AS id, dom.dup_of IS NULL AS kept,
           coalesce(dom.dup_of, -1) AS dup_of
         FROM batch b LEFT JOIN dom ON b.doc_id = dom.id
         ORDER BY id""",

    // Window-text grouping replays the operator's xxhash64 grouping
    // exactly (collisions aside, 2^-64 per pair as with q57).
    "q107_repeated_spans" ->
      """WITH d AS (
           SELECT doc_id, text FROM documents WHERE len(text) >= 64),
         w AS (
           SELECT doc_id, (k * 16) AS pos, substr(text, k * 16 + 1, 64) AS win
           FROM d, LATERAL (SELECT unnest(range(0, (len(text) - 64) // 16 + 1)) AS k) u),
         f AS (
           SELECT win, count(DISTINCT doc_id) AS n_docs
           FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2)
         SELECT w.doc_id AS id, CAST(w.pos AS BIGINT) AS pos,
           CAST(f.n_docs AS BIGINT) AS n_docs
         FROM w JOIN f ON w.win = f.win
         ORDER BY id, pos""",

    // Stateless append streaming == the batch left join.
    "q98_stream_static_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, c.c_nationkey
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",

    // q34's shingle replay over the base+digest corpus; containment
    // denominator = the SMALLER set, pair oriented (contained, container).
    "q97_containment_pairs" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
         dig AS (
           SELECT b.doc_id + 10000 AS doc_id, b.text || ' ' || n.text AS text
           FROM base b JOIN base n ON n.doc_id = b.doc_id + 1
           WHERE b.doc_id % 10 = 0),
         corpus AS (SELECT * FROM base UNION ALL SELECT * FROM dig),
         t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS toks
           FROM corpus),
         sh AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS s
           FROM t),
         inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
         inter AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, len(s) AS n FROM sh)
         SELECT
           CASE WHEN sa.n <= sb.n THEN id_a ELSE id_b END AS id_in,
           CASE WHEN sa.n <= sb.n THEN id_b ELSE id_a END AS id_out,
           round(CAST(c AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(c AS DOUBLE) / least(sa.n, sb.n) >= 0.9
         ORDER BY id_in, id_out""",

    // q83's boilerplate replay -> q51's scoring/gate/dedup CTEs on the
    // CLEANED text -> q92's truncation counts -> q60's naive running-sum
    // packing. One long but mechanical composition.
    "q96_training_pipeline" ->
      """WITH d AS (
           SELECT doc_id, text || chr(10) ||
             CASE WHEN doc_id % 2 = 0 THEN 'subscribe to ' || source || ' weekly'
                  ELSE 'contact ' || CAST(doc_id AS VARCHAR) END
             || chr(10) || 'all rights reserved' AS t
           FROM documents),
         l0 AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
         lines AS (
           SELECT doc_id, i - 1 AS pos, ls[i] AS line
           FROM l0, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) u),
         bp AS (
           SELECT trim(line) AS k FROM lines WHERE trim(line) <> ''
           GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10),
         kept AS (
           SELECT l.doc_id, l.pos, l.line FROM lines l
           LEFT JOIN bp ON trim(l.line) = bp.k WHERE bp.k IS NULL),
         cl AS (
           SELECT d.doc_id AS id,
             coalesce((SELECT string_agg(k.line, chr(10) ORDER BY k.pos)
                       FROM kept k WHERE k.doc_id = d.doc_id), '') AS ct
           FROM d),
         tt AS (
           SELECT id, ct,
             list_filter(regexp_split_to_array(lower(trim(ct)), '\s+'), x -> len(x) > 0) AS toks,
             len(ct) AS n,
             len(ct) - len(regexp_replace(ct, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
           FROM cl),
         h AS (
           SELECT id, ct, toks, n, cjk,
             len(list_filter(toks, x -> list_contains(['the','and','of','to','is','that','it','was','with','for'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','für'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['el','la','los','las','que','es','por','con','una','del'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['le','les','des','une','est','dans','pour','qui','sur','avec'], x))) AS h_fr,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END AS mtl,
             CASE WHEN n = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(ct, '[\p{L}\p{N}\s]', '', 'g')) AS DOUBLE) / n END AS pr
           FROM tt),
         scored AS (
           SELECT id, ct, toks,
             CASE WHEN cjk * 4 > n THEN 'zh'
                  WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
                  WHEN h_es >= h_fr THEN 'es'
                  ELSE 'fr' END AS lang_pred,
             round(((CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
                    (CASE WHEN mtl >= 2.5 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END) +
                    (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality
           FROM h),
         gated AS (SELECT * FROM scored WHERE quality >= 0.66 AND lang_pred <> 'und'),
         ex AS (SELECT ct, MIN(id) AS id FROM gated GROUP BY ct),
         ded AS (SELECT g.id, g.toks, g.lang_pred, g.quality
                 FROM gated g JOIN ex ON g.id = ex.id),
         tr AS (
           SELECT id, lang_pred, quality,
             CAST(len(toks) AS BIGINT) AS n_raw_tokens,
             CAST(CASE WHEN len(toks) > 24 THEN 1 ELSE 0 END AS BIGINT) AS was_truncated,
             CAST(least(len(toks), 24) AS BIGINT) AS n_tokens
           FROM ded),
         c AS (
           SELECT *, COALESCE(SUM(n_tokens) OVER (ORDER BY id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM tr)
         SELECT id, lang_pred, quality, n_raw_tokens, was_truncated, n_tokens,
           CAST(cum_before // 256 AS BIGINT) AS seq_id,
           CAST(cum_before % 256 AS BIGINT) AS seq_offset
         FROM c ORDER BY id""",

    "q65_centroid_assign" ->
      """WITH e AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         s AS (
           SELECT e.vec_id AS id, c.cid,
             list_sum(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
           FROM e CROSS JOIN c)
         SELECT id, cid, round(d, 6) AS dist_sq FROM (
           SELECT id, cid, d, row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
           FROM s) WHERE rn = 1
         ORDER BY id"""
  )

  /** Oracle provenance, dumped by Verify as `oracle_provenance.json` so the
    * correctness artifact's readers can tell the two verification tiers
    * apart without reading SQL:
    *
    *   - "pinned": the oracle is a `VALUES` constant regenerated from this
    *     implementation's own output (tools/pin_oracle.py) — a determinism
    *     / regression pin, NOT independent verification. Kept only where a
    *     portable-SQL re-derivation is genuinely impossible; each carries a
    *     ScalaTest spec bounding its semantics independently.
    *   - "no_oracle": no SQL at all (declared in the oracleSql scaladoc).
    *
    * Every query absent from this map has an INDEPENDENT oracle: DuckDB
    * re-derives the expected rows from the raw parquet tables.
    */
  def oracleProvenance: Map[String, String] = Map(
    "q70_approx_percentiles" -> "pinned", // GK sketch internals
    "q77_approx_distinct" -> "pinned", // HLL++ registers
    "q26_explain" -> "no_oracle", // plan text has no SQL equivalent
    "q147_winsorize_approx" -> "no_oracle", // 60k-row sketch output
    "q148_robust_scale_approx" -> "no_oracle" // 60k-row sketch output
  )
}
