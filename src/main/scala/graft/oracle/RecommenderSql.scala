package graft.oracle

import graft.sources.Tables.ratingsSql

/**
 * DuckDB oracle SQL for [[graft.operators.Recommender]] — the same
 * kNN pipelines in ANSI SQL. Rounding discipline mirrors the Spark
 * side exactly: similarities to 6 dp BEFORE ranking (with id
 * tie-breaks), scores to 4 dp on emit.
 */
object RecommenderSql {

  // q17's pipeline in full — shared: the q17 oracle entry runs it
  // directly, and q17b's contract row recomputes its facts (cohort
  // user count, rec count) from the same exact result
  private val q17Sql =
    s"""WITH $ratingsSql,
       |inorm AS (
       |  SELECT item_id, sqrt(sum(rating*rating)) AS inorm
       |  FROM ratings GROUP BY 1),
       |dots AS (
       |  SELECT a.item_id AS i, b.item_id AS j, sum(a.rating*b.rating) AS dot
       |  FROM ratings a JOIN ratings b ON a.user_id = b.user_id
       |  WHERE a.item_id <> b.item_id GROUP BY 1, 2),
       |sims AS (
       |  SELECT i, j, floor(dot / (ni.inorm * nj.inorm) * 1000000.0 + 0.5) / 1000000.0 AS sim
       |  FROM dots
       |  JOIN inorm ni ON ni.item_id = i
       |  JOIN inorm nj ON nj.item_id = j),
       |tgt AS (
       |  SELECT user_id AS u, item_id AS j, rating AS r_uj
       |  FROM ratings WHERE user_id % 20 = 0),
       |cand AS (
       |  SELECT t.u, s.i, s.j, s.sim, t.r_uj
       |  FROM tgt t JOIN sims s ON s.j = t.j
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM ratings r
       |    WHERE r.user_id = t.u AND r.item_id = s.i)),
       |scored AS (
       |  SELECT u, i,
       |         floor(sum(sim * r_uj) / sum(abs(sim)) * 10000.0 + 0.5) / 10000.0 AS score
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY u, i ORDER BY sim DESC, j ASC) AS nrk
       |    FROM cand)
       |  WHERE nrk <= 8
       |  GROUP BY 1, 2)
       |SELECT u AS user_id, i AS item_id, score, CAST(rk AS INTEGER) AS rk FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY u ORDER BY score DESC, i ASC) AS rk
       |  FROM scored)
       |WHERE rk <= 5""".stripMargin

  val oracle: Map[String, String] = Map(
    "q16_user_knn_topk" ->
      s"""WITH $ratingsSql,
         |stats AS (
         |  SELECT user_id, avg(rating) AS umean,
         |         sqrt(sum(rating*rating)) AS unorm
         |  FROM ratings GROUP BY 1),
         |dots AS (
         |  SELECT a.user_id AS u, b.user_id AS v, sum(a.rating*b.rating) AS dot
         |  FROM ratings a JOIN ratings b ON a.item_id = b.item_id
         |  WHERE a.user_id <> b.user_id GROUP BY 1, 2),
         |sims AS (
         |  SELECT u, v, floor(dot / (su.unorm * sv.unorm) * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM dots
         |  JOIN stats su ON su.user_id = u
         |  JOIN stats sv ON sv.user_id = v),
         |neighbors AS (
         |  SELECT u, v, sim FROM (
         |    SELECT u, v, sim, row_number() OVER (
         |      PARTITION BY u ORDER BY sim DESC, v ASC) AS nrk
         |    FROM sims)
         |  WHERE nrk <= 25),
         |scores AS (
         |  SELECT nb.u, r.item_id,
         |         sum(nb.sim * (r.rating - sv.umean)) AS num,
         |         sum(nb.sim) AS den
         |  FROM neighbors nb
         |  JOIN ratings r ON r.user_id = nb.v
         |  JOIN stats sv ON sv.user_id = nb.v
         |  GROUP BY 1, 2),
         |preds AS (
         |  SELECT s.u AS user_id, s.item_id,
         |         floor((su.umean + s.num / s.den) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM scores s
         |  JOIN stats su ON su.user_id = s.u
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = s.u AND r.item_id = s.item_id))
         |SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
         |  FROM preds)
         |WHERE rk <= 5""".stripMargin,

    "q17_item_knn_topk" -> q17Sql,

    // q17b: the deterministic DIMSUM twin replayed END TO END — the
    // hash-sampled draws (28-bit md5 of user:item:dimsum vs
    // floor(min(1, sg/‖c‖)·2²⁸ + 0.5)), the unbiased scaled estimator
    // dot/(min(sg,‖cᵢ‖)·min(sg,‖cⱼ‖)), and the q17 scoring pipeline.
    // Norms come from exact integer ten-thousandths sums; sg is
    // 6-dp-quantized so both engines share the literal. No tolerance
    // verdict: rows, schema and hashes must match.
    "q17b_item_knn_dimsum" ->
      s"""WITH $ratingsSql,
         |sg AS (
         |  SELECT floor(sqrt(10.0 * ln(CAST(count(DISTINCT item_id) AS DOUBLE)) / 0.3)
         |               * 1000000.0 + 0.5) / 1000000.0 AS sg
         |  FROM ratings),
         |norms AS (
         |  SELECT item_id,
         |         sqrt(CAST(CAST(sum(n4 * n4) AS BIGINT) AS DOUBLE) / 100000000.0) AS cnorm
         |  FROM (SELECT item_id,
         |               CAST(floor(rating * 10000.0 + 0.5) AS BIGINT) AS n4
         |        FROM ratings)
         |  GROUP BY 1),
         |kept AS (
         |  SELECT r.user_id, r.item_id, r.rating
         |  FROM ratings r
         |  JOIN norms nm ON nm.item_id = r.item_id
         |  CROSS JOIN sg
         |  WHERE CAST(('0x' || substr(md5(concat_ws(':', r.user_id, r.item_id, 'dimsum')), 1, 7)) AS BIGINT)
         |        < CAST(floor(least(1.0, sg.sg / nm.cnorm) * 268435456.0 + 0.5) AS BIGINT)),
         |dots AS (
         |  SELECT a.item_id AS i, b.item_id AS j, sum(a.rating * b.rating) AS dot
         |  FROM kept a JOIN kept b ON a.user_id = b.user_id
         |  WHERE a.item_id < b.item_id GROUP BY 1, 2),
         |half AS (
         |  SELECT i, j,
         |         floor(dot / (least(sg.sg, ni.cnorm) * least(sg.sg, nj.cnorm))
         |               * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM dots
         |  CROSS JOIN sg
         |  JOIN norms ni ON ni.item_id = i
         |  JOIN norms nj ON nj.item_id = j),
         |sims AS (
         |  SELECT i, j, sim FROM half
         |  UNION ALL
         |  SELECT j AS i, i AS j, sim FROM half),
         |tgt AS (
         |  SELECT user_id AS u, item_id AS j, rating AS r_uj
         |  FROM ratings WHERE user_id % 20 = 0),
         |cand AS (
         |  SELECT t.u, s.i, s.j, s.sim, t.r_uj
         |  FROM tgt t JOIN sims s ON s.j = t.j
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = t.u AND r.item_id = s.i)),
         |scored AS (
         |  SELECT u, i,
         |         floor(sum(sim * r_uj) / sum(abs(sim)) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY u, i ORDER BY sim DESC, j ASC) AS nrk
         |    FROM cand)
         |  WHERE nrk <= 8
         |  GROUP BY 1, 2)
         |SELECT u AS user_id, i AS item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY u ORDER BY score DESC, i ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 5""".stripMargin,

    // q16b: the TRANSPOSED deterministic DIMSUM twin replayed END TO
    // END — per-USER norms decide the keeps, the hash key is the
    // transposed argument order (item:user:dimsum), sg scales with
    // ln(count users), pairs meet on item_id, and the q16 all-users
    // scoring pipeline runs over the mirrored 6-dp estimates. No
    // tolerance verdict: rows, schema and hashes must match.
    "q16b_user_knn_dimsum" ->
      s"""WITH $ratingsSql,
         |sg AS (
         |  SELECT floor(sqrt(10.0 * ln(CAST(count(DISTINCT user_id) AS DOUBLE)) / 0.3)
         |               * 1000000.0 + 0.5) / 1000000.0 AS sg
         |  FROM ratings),
         |norms AS (
         |  SELECT user_id,
         |         sqrt(CAST(CAST(sum(n4 * n4) AS BIGINT) AS DOUBLE) / 100000000.0) AS unorm
         |  FROM (SELECT user_id,
         |               CAST(floor(rating * 10000.0 + 0.5) AS BIGINT) AS n4
         |        FROM ratings)
         |  GROUP BY 1),
         |kept AS (
         |  SELECT r.user_id, r.item_id, r.rating
         |  FROM ratings r
         |  JOIN norms nm ON nm.user_id = r.user_id
         |  CROSS JOIN sg
         |  WHERE CAST(('0x' || substr(md5(concat_ws(':', r.item_id, r.user_id, 'dimsum')), 1, 7)) AS BIGINT)
         |        < CAST(floor(least(1.0, sg.sg / nm.unorm) * 268435456.0 + 0.5) AS BIGINT)),
         |dots AS (
         |  SELECT a.user_id AS u, b.user_id AS v, sum(a.rating * b.rating) AS dot
         |  FROM kept a JOIN kept b ON a.item_id = b.item_id
         |  WHERE a.user_id < b.user_id GROUP BY 1, 2),
         |half AS (
         |  SELECT u, v,
         |         floor(dot / (least(sg.sg, nu.unorm) * least(sg.sg, nv.unorm))
         |               * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM dots
         |  CROSS JOIN sg
         |  JOIN norms nu ON nu.user_id = u
         |  JOIN norms nv ON nv.user_id = v),
         |sims AS (
         |  SELECT u, v, sim FROM half
         |  UNION ALL
         |  SELECT v AS u, u AS v, sim FROM half),
         |stats AS (
         |  SELECT user_id, avg(rating) AS umean FROM ratings GROUP BY 1),
         |neighbors AS (
         |  SELECT u, v, sim FROM (
         |    SELECT u, v, sim, row_number() OVER (
         |      PARTITION BY u ORDER BY sim DESC, v ASC) AS nrk
         |    FROM sims)
         |  WHERE nrk <= 25),
         |scores AS (
         |  SELECT nb.u, r.item_id,
         |         sum(nb.sim * (r.rating - sv.umean)) AS num,
         |         sum(nb.sim) AS den
         |  FROM neighbors nb
         |  JOIN ratings r ON r.user_id = nb.v
         |  JOIN stats sv ON sv.user_id = nb.v
         |  GROUP BY 1, 2),
         |preds AS (
         |  SELECT s.u AS user_id, s.item_id,
         |         floor((su.umean + s.num / s.den) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM scores s
         |  JOIN stats su ON su.user_id = s.u
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = s.u AND r.item_id = s.item_id))
         |SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
         |  FROM preds)
         |WHERE rk <= 5""".stripMargin,

    // q16's pipeline under the K2 kernel: Pearson with whole-profile
    // ZERO-INCLUSIVE moments — mean = Σr/N over all N catalog
    // positions (absent ratings contribute 0 to Σr and Σr²), matching
    // the Spark side's closed form term-for-term so both engines walk
    // identical IEEE sequences before the 6-dp rank rounding. DENSE
    // pair grid (the reference's dense-vector semantics): the co-rated
    // dots LEFT-join onto cohort × all-users, no-overlap pairs carry
    // dot = 0 — mirrors userSims(dense = true).
    "q59_user_knn_pearson" ->
      s"""WITH $ratingsSql,
         |stats AS (
         |  SELECT user_id, avg(rating) AS umean FROM ratings GROUP BY 1),
         |mom AS MATERIALIZED (
         |  SELECT user_id, sum(rating) AS s, sum(rating*rating) AS q
         |  FROM ratings GROUP BY 1),
         |bign AS (
         |  SELECT CAST(count(DISTINCT item_id) AS DOUBLE) AS n FROM ratings),
         |dots AS MATERIALIZED (
         |  SELECT a.user_id AS u, b.user_id AS v, sum(a.rating*b.rating) AS dot
         |  FROM ratings a JOIN ratings b ON a.item_id = b.item_id
         |  WHERE a.user_id % 20 = 0 AND a.user_id <> b.user_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT t.user_id AS u, o.user_id AS v, COALESCE(d.dot, 0.0) AS dot
         |  FROM mom t
         |  CROSS JOIN mom o
         |  LEFT JOIN dots d ON d.u = t.user_id AND d.v = o.user_id
         |  WHERE t.user_id % 20 = 0 AND t.user_id <> o.user_id),
         |sims AS (
         |  SELECT d.u, d.v,
         |         floor((d.dot - n * (ma.s / n) * (mb.s / n))
         |               / (sqrt(ma.q - n * (ma.s / n) * (ma.s / n))
         |                  * sqrt(mb.q - n * (mb.s / n) * (mb.s / n)))
         |               * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM pairs d
         |  CROSS JOIN bign
         |  JOIN mom ma ON ma.user_id = d.u
         |  JOIN mom mb ON mb.user_id = d.v),
         |neighbors AS (
         |  SELECT u, v, sim FROM (
         |    SELECT u, v, sim, row_number() OVER (
         |      PARTITION BY u ORDER BY sim DESC, v ASC) AS nrk
         |    FROM sims)
         |  WHERE nrk <= 25),
         |scores AS (
         |  SELECT nb.u, r.item_id,
         |         sum(nb.sim * (r.rating - sv.umean)) AS num,
         |         sum(nb.sim) AS den
         |  FROM neighbors nb
         |  JOIN ratings r ON r.user_id = nb.v
         |  JOIN stats sv ON sv.user_id = nb.v
         |  GROUP BY 1, 2),
         |preds AS (
         |  SELECT s.u AS user_id, s.item_id,
         |         floor((su.umean + s.num / s.den) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM scores s
         |  JOIN stats su ON su.user_id = s.u
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = s.u AND r.item_id = s.item_id))
         |SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
         |  FROM preds)
         |WHERE rk <= 5""".stripMargin,

    // The K4 inverse-Euclidean user-kNN, DENSE — the kernel where the
    // no-overlap floor 1/(1+√(qa+qb)) is positive and genuinely
    // competes for neighborhoods, so the dense grid is semantic, not
    // cosmetic. Σ(a−b)² over whole profiles = qa + qb − 2·dot (zero
    // cells contribute their squares through the moments).
    "q63_user_knn_euclidean" ->
      s"""WITH $ratingsSql,
         |stats AS (
         |  SELECT user_id, avg(rating) AS umean FROM ratings GROUP BY 1),
         |mom AS MATERIALIZED (
         |  SELECT user_id, sum(rating*rating) AS q FROM ratings GROUP BY 1),
         |dots AS MATERIALIZED (
         |  SELECT a.user_id AS u, b.user_id AS v, sum(a.rating*b.rating) AS dot
         |  FROM ratings a JOIN ratings b ON a.item_id = b.item_id
         |  WHERE a.user_id % 20 = 7 AND a.user_id <> b.user_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT t.user_id AS u, o.user_id AS v, COALESCE(d.dot, 0.0) AS dot
         |  FROM mom t
         |  CROSS JOIN mom o
         |  LEFT JOIN dots d ON d.u = t.user_id AND d.v = o.user_id
         |  WHERE t.user_id % 20 = 7 AND t.user_id <> o.user_id),
         |sims AS (
         |  SELECT p.u, p.v,
         |         floor(1.0 / (1.0 + sqrt(ma.q + mb.q - 2.0 * p.dot))
         |               * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM pairs p
         |  JOIN mom ma ON ma.user_id = p.u
         |  JOIN mom mb ON mb.user_id = p.v),
         |neighbors AS (
         |  SELECT u, v, sim FROM (
         |    SELECT u, v, sim, row_number() OVER (
         |      PARTITION BY u ORDER BY sim DESC, v ASC) AS nrk
         |    FROM sims)
         |  WHERE nrk <= 25),
         |scores AS (
         |  SELECT nb.u, r.item_id,
         |         sum(nb.sim * (r.rating - sv.umean)) AS num,
         |         sum(nb.sim) AS den
         |  FROM neighbors nb
         |  JOIN ratings r ON r.user_id = nb.v
         |  JOIN stats sv ON sv.user_id = nb.v
         |  GROUP BY 1, 2),
         |preds AS (
         |  SELECT s.u AS user_id, s.item_id,
         |         floor((su.umean + s.num / s.den) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM scores s
         |  JOIN stats su ON su.user_id = s.u
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = s.u AND r.item_id = s.item_id))
         |SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
         |  FROM preds)
         |WHERE rk <= 5""".stripMargin,

    "q30_user_rating_predict" ->
      s"""WITH $ratingsSql,
         |stats AS (
         |  SELECT user_id, avg(rating) AS umean,
         |         sqrt(sum(rating*rating)) AS unorm
         |  FROM ratings GROUP BY 1),
         |cohort AS (
         |  SELECT user_id AS u, item_id, rating AS actual
         |  FROM ratings WHERE user_id % 17 = 3),
         |dots AS (
         |  SELECT a.user_id AS u, b.user_id AS v, sum(a.rating*b.rating) AS dot
         |  FROM ratings a JOIN ratings b ON a.item_id = b.item_id
         |  WHERE a.user_id % 17 = 3 AND a.user_id <> b.user_id
         |  GROUP BY 1, 2),
         |sims AS (
         |  SELECT u, v, floor(dot / (su.unorm * sv.unorm) * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM dots
         |  JOIN stats su ON su.user_id = u
         |  JOIN stats sv ON sv.user_id = v),
         |cand AS (
         |  SELECT c.u, c.item_id, c.actual, s.sim, r.rating AS r_vi, sv.umean AS vmean,
         |         row_number() OVER (
         |           PARTITION BY c.u, c.item_id ORDER BY s.sim DESC, r.user_id ASC) AS nrk
         |  FROM cohort c
         |  JOIN ratings r ON r.item_id = c.item_id AND r.user_id <> c.u
         |  JOIN sims s ON s.u = c.u AND s.v = r.user_id
         |  JOIN stats sv ON sv.user_id = r.user_id),
         |agg AS (
         |  SELECT u, item_id, actual,
         |         sum(sim * (r_vi - vmean)) AS num, sum(sim) AS den
         |  FROM cand WHERE nrk <= 25 GROUP BY 1, 2, 3)
         |SELECT a.u AS user_id, a.item_id,
         |       floor(a.actual * 10000.0 + 0.5) / 10000.0 AS actual,
         |       floor((su.umean + a.num / a.den) * 10000.0 + 0.5) / 10000.0 AS predicted,
         |       floor(abs(a.actual - (su.umean + a.num / a.den)) * 10000.0 + 0.5) / 10000.0 AS abs_err
         |FROM agg a JOIN stats su ON su.user_id = a.u
         |WHERE a.den <> 0""".stripMargin,

    "q45_user_profiles" ->
      s"""WITH $ratingsSql
         |SELECT user_id, count(*) AS n_items,
         |       floor(sqrt(sum(rating * rating)) * 10000.0 + 0.5) / 10000.0 AS norm,
         |       string_agg(CAST(item_id AS VARCHAR) || ':' ||
         |                  CAST(CAST(floor(rating * 10000.0 + 0.5) AS BIGINT) AS VARCHAR),
         |                  ',' ORDER BY item_id) AS profile_csv
         |FROM ratings GROUP BY 1""".stripMargin,

    "q31_item_rating_predict" ->
      s"""WITH $ratingsSql,
         |inorm AS (
         |  SELECT item_id, sqrt(sum(rating*rating)) AS inorm
         |  FROM ratings GROUP BY 1),
         |cohort AS (
         |  SELECT user_id AS u, item_id AS i, rating AS actual
         |  FROM ratings WHERE user_id % 23 = 5),
         |dots AS (
         |  SELECT a.item_id AS i, b.item_id AS j, sum(a.rating*b.rating) AS dot
         |  FROM ratings a JOIN ratings b ON a.user_id = b.user_id
         |  WHERE a.item_id IN (SELECT DISTINCT i FROM cohort)
         |    AND a.item_id <> b.item_id
         |  GROUP BY 1, 2),
         |sims AS (
         |  SELECT i, j, floor(dot / (ni.inorm * nj.inorm) * 1000000.0 + 0.5) / 1000000.0 AS sim
         |  FROM dots
         |  JOIN inorm ni ON ni.item_id = i
         |  JOIN inorm nj ON nj.item_id = j),
         |cand AS (
         |  SELECT c.u, c.i, c.actual, s.sim, r.rating AS r_uj,
         |         row_number() OVER (
         |           PARTITION BY c.u, c.i ORDER BY s.sim DESC, r.item_id ASC) AS nrk
         |  FROM cohort c
         |  JOIN ratings r ON r.user_id = c.u AND r.item_id <> c.i
         |  JOIN sims s ON s.i = c.i AND s.j = r.item_id),
         |agg AS (
         |  SELECT u, i, actual,
         |         sum(sim * r_uj) AS num, sum(abs(sim)) AS den
         |  FROM cand WHERE nrk <= 8 GROUP BY 1, 2, 3)
         |SELECT u AS user_id, i AS item_id,
         |       floor(actual * 10000.0 + 0.5) / 10000.0 AS actual,
         |       floor(num / den * 10000.0 + 0.5) / 10000.0 AS predicted,
         |       floor(abs(actual - num / den) * 10000.0 + 0.5) / 10000.0 AS abs_err
         |FROM agg
         |WHERE den <> 0""".stripMargin
  )
}
