package graft

import graft.SparkEntry.{hilbertOracle, kcenterOracle, mmrOracle, bpeCtes, bpeOracle, bpeVocabOracle}

/** [[SparkEntry.oracleSql]] base part: 128 entries, q387_holt_winters .. q205_temporal_split. Mechanical
  * split of the single oracle map (round 12) — entry order, SQL text, and
  * keys are unchanged; SparkEntry composes the parts and asserts key
  * disjointness.
  */
private[graft] object SparkEntryOraclesB {
  def m: Map[String, String] = Map(

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
         FROM s GROUP BY split ORDER BY split"""
  )
}
