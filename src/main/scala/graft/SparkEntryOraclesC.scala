package graft

import graft.SparkEntry.{hilbertOracle, kcenterOracle, mmrOracle, bpeCtes, bpeOracle, bpeVocabOracle, nswGraphCtes, nswSearchCtes}

/** [[SparkEntry.oracleSql]] base part: 134 entries, q204_hll_windowed_stream .. q65_centroid_assign. Mechanical
  * split of the single oracle map (round 12) — entry order, SQL text, and
  * keys are unchanged; SparkEntry composes the parts and asserts key
  * disjointness.
  */
private[graft] object SparkEntryOraclesC {
  def m: Map[String, String] = Map(

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

    // Banded-deviation contract: the flags/counters are the CONSTANTS the
    // sketch guarantee implies — the oracle replays the exact quantiles
    // (quantile_cont == Spark percentile, q61) and the constants; a
    // sketch-bound violation flips an integer on the Spark side only and
    // hash-fails. n_rows/bounds come from the exact distribution.
    "q147_winsorize_approx" ->
      """SELECT l_returnflag, count(*) AS n_rows,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.01), 6) AS p_lo,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 6) AS p_hi,
           CAST(1 AS BIGINT) AS lo_in_band,
           CAST(1 AS BIGINT) AS hi_in_band,
           CAST(0 AS BIGINT) AS n_decision_diff_outside
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",

    // Same contract for median/MAD: exact v_med/v_mad replay as in q115;
    // med/mad band flags and the per-row scaled round-trip counter are
    // the sketch-guarantee constants.
    "q148_robust_scale_approx" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n_rows,
             quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS v_med
           FROM lineitem GROUP BY 1),
         mad AS (
           SELECT l.l_returnflag,
             quantile_cont(abs(CAST(l.l_extendedprice AS DOUBLE) - m.v_med), 0.5) AS v_mad
           FROM lineitem l JOIN m USING (l_returnflag) GROUP BY 1)
         SELECT m.l_returnflag, m.n_rows,
           round(m.v_med, 6) AS v_med, round(mad.v_mad, 6) AS v_mad,
           CAST(1 AS BIGINT) AS med_in_band,
           CAST(1 AS BIGINT) AS mad_in_band,
           CAST(0 AS BIGINT) AS n_scaled_mismatch
         FROM m JOIN mad USING (l_returnflag)
         ORDER BY m.l_returnflag""",

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
         ORDER BY id""",

    // The kNN edge list replayed whole: q38's oracle structure with the
    // corpus on both sides (one cell per node, 2 probed cells, exact
    // cosine, top-8 by raw score DESC / id).
    "q410_nsw_graph" ->
      s"""WITH ${nswGraphCtes(2, 8)}
         SELECT src, dst, round(score, 6) AS score, rnk AS rank
         FROM ek ORDER BY src, rank""",

    // The greedy walk replayed hop by hop (unrolled CTEs — the q216
    // pattern): symmetrized edges, entry = min node id, 5 hops of
    // expand/score/top-ef(16), final top-10 with self excluded. Raw-score
    // ordering is engine-equal (q38 precedent), so every beam is
    // identical on both sides.
    "q411_nsw_search" ->
      s"""WITH ${nswGraphCtes(2, 8)},
         ${nswSearchCtes(5, 16, 10)},
         fs AS (SELECT c.q_id, c.n_id,
                 list_cosine_similarity(q.v, nv.v) AS score
               FROM b5 c JOIN e q ON q.id = c.q_id
               JOIN e nv ON nv.id = c.n_id
               WHERE c.n_id <> c.q_id),
         fr AS (SELECT q_id, n_id, score,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY score DESC, n_id) AS rnk
               FROM fs)
         SELECT q_id AS query_id, n_id AS neighbor_id,
           round(score, 6) AS cosine, rnk AS rank
         FROM fr WHERE rnk <= 10 ORDER BY query_id, rank""",

    // recall@10 with BOTH sides independently replayed: exact = the q36
    // brute-force ranking, approx = the q38 pruned-IVF ranking at
    // nprobe=2; hits = set intersection, all integers.
    "q413_ann_ivf_recall" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         xs AS (SELECT q.id AS q_id, c.id AS c_id,
                 list_cosine_similarity(q.v, c.v) AS score
               FROM e q JOIN e c ON c.id <> q.id WHERE q.id < 10),
         xr AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
                 ORDER BY score DESC, c_id) AS rn FROM xs) WHERE rn <= 10),
         cent AS (SELECT id AS cell, v AS cv FROM e WHERE id < 16),
         ca AS (SELECT id, cell FROM (
             SELECT e.id, cent.cell, row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent) WHERE rn = 1),
         qp AS (SELECT id AS q_id, cell FROM (
             SELECT e.id, cent.cell, row_number() OVER (PARTITION BY e.id
                 ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cell) AS rn
             FROM e CROSS JOIN cent WHERE e.id < 10) WHERE rn <= 2),
         s AS (SELECT qp.q_id, ca.id AS c_id,
                 list_cosine_similarity(qv.v, cv.v) AS score
               FROM qp JOIN ca USING (cell)
               JOIN e qv ON qv.id = qp.q_id JOIN e cv ON cv.id = ca.id
               WHERE ca.id <> qp.q_id),
         ar AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
                 ORDER BY score DESC, c_id) AS rnk FROM s) WHERE rnk <= 10),
         h AS (SELECT q_id, count(*) AS n_hit FROM (
             SELECT q_id, c_id FROM xr INTERSECT SELECT q_id, c_id FROM ar)
             GROUP BY 1)
         SELECT q.id AS query_id, CAST(10 AS BIGINT) AS k,
           COALESCE(h.n_hit, 0) AS n_hit,
           COALESCE(h.n_hit, 0) * 100000 AS recall_ppm
         FROM e q LEFT JOIN h ON h.q_id = q.id
         WHERE q.id < 10 ORDER BY query_id""",

    // recall@10 of the greedy walk vs the same exact ground truth — the
    // graph-connectivity loss, measured as hash-checked integers.
    "q414_nsw_recall" ->
      s"""WITH ${nswGraphCtes(2, 8)},
         ${nswSearchCtes(5, 16, 10)},
         fs AS (SELECT c.q_id, c.n_id,
                 list_cosine_similarity(q.v, nv.v) AS score
               FROM b5 c JOIN e q ON q.id = c.q_id
               JOIN e nv ON nv.id = c.n_id
               WHERE c.n_id <> c.q_id),
         ar AS (SELECT q_id, n_id AS c_id FROM (
             SELECT q_id, n_id, score, row_number() OVER (PARTITION BY q_id
                 ORDER BY score DESC, n_id) AS rnk
               FROM fs) WHERE rnk <= 10),
         xs AS (SELECT q.id AS q_id, c.id AS c_id,
                 list_cosine_similarity(q.v, c.v) AS score
               FROM e q JOIN e c ON c.id <> q.id WHERE q.id < 10),
         xr AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
                 ORDER BY score DESC, c_id) AS rn FROM xs) WHERE rn <= 10),
         h AS (SELECT q_id, count(*) AS n_hit FROM (
             SELECT q_id, c_id FROM xr INTERSECT SELECT q_id, c_id FROM ar)
             GROUP BY 1)
         SELECT q.id AS query_id, CAST(10 AS BIGINT) AS k,
           COALESCE(h.n_hit, 0) AS n_hit,
           COALESCE(h.n_hit, 0) * 100000 AS recall_ppm
         FROM e q LEFT JOIN h ON h.q_id = q.id
         WHERE q.id < 10 ORDER BY query_id"""
  )
}
