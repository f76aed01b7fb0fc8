package graft.oracle

import graft.sources.Tables.ratingsSql

/** DuckDB oracle SQL for [[graft.operators.Evaluation]] and
  * [[graft.operators.Sequential]]. */
object EvalSeqSql {

  /** One Lloyd assignment stage as a CTE body: nearest centroid from
    * `cents` for every vector in `emb`, squared-L2 rounded to 6 dp
    * with cluster-id tie-break — mirrors Sequential.kmeansAssign. */
  private def assignCte(name: String, cents: String): String =
    s"""$name AS (
       |  SELECT vec_id, v, cluster, d2 FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) AS rk
       |    FROM (
       |      SELECT e.vec_id, e.v, c.cluster,
       |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
       |                     z -> (z[1]-z[2])*(z[1]-z[2])))
       |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
       |      FROM emb e CROSS JOIN $cents c))
       |  WHERE rk = 1)""".stripMargin

  /** One centroid-update stage: per-cluster per-position mean (6 dp),
    * re-assembled into an ordered list. */
  private def recenterCte(name: String, assigned: String): String =
    s"""$name AS (
       |  SELECT cluster, list(x ORDER BY pos) AS cv FROM (
       |    SELECT a.cluster, t.pos,
       |           floor(avg(a.v[t.pos]) * 1000000.0 + 0.5) / 1000000.0 AS x
       |    FROM $assigned a, range(1, 65) t(pos)
       |    GROUP BY a.cluster, t.pos)
       |  GROUP BY cluster)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q34_kmeans_assign" ->
      s"""WITH emb AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cluster, v AS cv FROM emb
         |  WHERE vec_id IN (3, 67, 131, 195, 259, 323, 387, 451)),
         |${assignCte("a1", "c0")},
         |${recenterCte("c1", "a1")},
         |${assignCte("a2", "c1")},
         |${recenterCte("c2", "a2")},
         |${assignCte("a3", "c2")}
         |SELECT vec_id, cluster,
         |       floor(d2 * 10000.0 + 0.5) / 10000.0 AS dist2
         |FROM a3""".stripMargin,

    "q35_freq_itemsets" ->
      s"""WITH $ratingsSql,
         |rr AS (SELECT user_id, item_id FROM ratings),
         |nb AS (SELECT count(DISTINCT user_id) AS n FROM rr),
         |th AS (SELECT CAST(ceil(greatest(0.005, 4.0 / n) * n) AS BIGINT) AS minc FROM nb),
         |singles AS (
         |  SELECT CAST(item_id AS VARCHAR) AS itemset,
         |         CAST(1 AS INTEGER) AS set_size,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM rr GROUP BY item_id
         |  HAVING count(*) >= (SELECT minc FROM th)),
         |pairs AS (
         |  SELECT CAST(a.item_id AS VARCHAR) || ',' || CAST(b.item_id AS VARCHAR) AS itemset,
         |         CAST(2 AS INTEGER) AS set_size,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM rr a JOIN rr b ON a.user_id = b.user_id AND a.item_id < b.item_id
         |  GROUP BY a.item_id, b.item_id
         |  HAVING count(*) >= (SELECT minc FROM th))
         |SELECT * FROM singles UNION ALL SELECT * FROM pairs""".stripMargin,

    "q44_cv_metrics" ->
      s"""WITH $ratingsSql,
         |f AS (
         |  SELECT user_id, item_id, rating,
         |         CAST((user_id * 31 + item_id) % 5 AS INTEGER) AS fold
         |  FROM ratings),
         |tot AS (
         |  SELECT user_id, sum(rating) AS sum_all, count(*) AS cnt_all
         |  FROM f GROUP BY 1),
         |pf AS (
         |  SELECT user_id, fold, sum(rating) AS sum_f, count(*) AS cnt_f
         |  FROM f GROUP BY 1, 2),
         |tm AS (
         |  SELECT p.user_id, p.fold,
         |         (t.sum_all - p.sum_f) / (t.cnt_all - p.cnt_f) AS train_mean
         |  FROM pf p JOIN tot t USING (user_id)
         |  WHERE t.cnt_all > p.cnt_f),
         |errs AS (
         |  SELECT r.fold, r.rating - tm.train_mean AS err
         |  FROM f r JOIN tm ON tm.user_id = r.user_id AND tm.fold = r.fold)
         |SELECT fold, count(*) AS n_test,
         |       floor(sqrt(avg(err * err)) * 10000.0 + 0.5) / 10000.0 AS rmse,
         |       floor(avg(abs(err)) * 10000.0 + 0.5) / 10000.0 AS mae
         |FROM errs GROUP BY fold""".stripMargin,

    "q46_period_join" ->
      """WITH w AS (
        |  SELECT min(o_orderdate) AS dmin, max(o_orderdate) AS dmax,
        |         CAST(ceil((date_diff('day', min(o_orderdate), max(o_orderdate)) + 1) / 8.0)
        |              AS BIGINT) AS width
        |  FROM orders),
        |p AS (
        |  SELECT u.i AS period_id,
        |         w.dmin + u.i * w.width * INTERVAL '1 day' AS p_start,
        |         CASE WHEN u.i = 7 THEN w.dmax + INTERVAL '1 day'
        |              ELSE w.dmin + (u.i + 1) * w.width * INTERVAL '1 day' END AS p_end
        |  FROM w, UNNEST(generate_series(0, 7)) AS u(i))
        |SELECT p.period_id, count(*) AS n_orders,
        |       count(DISTINCT o.o_custkey) AS n_custs
        |FROM orders o JOIN p
        |  ON o.o_orderdate >= p.p_start AND o.o_orderdate < p.p_end
        |GROUP BY 1""".stripMargin,

    "q36_seq_transform" ->
      s"""WITH $ratingsSql,
         |rules AS (SELECT * FROM (
         |${oracleQ29}
         |)),
         |users AS (SELECT DISTINCT user_id FROM ratings),
         |fired AS (
         |  SELECT u.user_id, r.antecedent, r.consequent,
         |         floor(r.support * r.confidence * 1000000.0 + 0.5) / 1000000.0 AS score
         |  FROM users u JOIN rules r
         |    ON EXISTS (SELECT 1 FROM ratings x
         |               WHERE x.user_id = u.user_id AND x.item_id = r.antecedent)
         |   AND NOT EXISTS (SELECT 1 FROM ratings x
         |               WHERE x.user_id = u.user_id AND x.item_id = r.consequent))
         |SELECT user_id, antecedent, consequent AS recommended, score FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id
         |    ORDER BY score DESC, antecedent ASC, consequent ASC) AS rk
         |  FROM fired)
         |WHERE rk = 1""".stripMargin,
    "q27_eval_metrics" ->
      s"""WITH $ratingsSql,
         |umean AS (SELECT user_id, avg(rating) AS umean FROM ratings GROUP BY 1),
         |pop AS (
         |  SELECT item_id, rn FROM (
         |    SELECT item_id, row_number() OVER (
         |      ORDER BY count(*) DESC, item_id ASC) AS rn
         |    FROM ratings GROUP BY item_id)
         |  WHERE rn <= 10),
         |rel AS (SELECT user_id, item_id FROM ratings WHERE rating >= 30),
         |nrel AS (SELECT user_id, count(*) AS n_rel FROM rel GROUP BY 1),
         |grid AS (
         |  SELECT u.user_id, p.item_id, p.rn
         |  FROM (SELECT DISTINCT user_id FROM ratings) u CROSS JOIN pop p),
         |hits AS (
         |  SELECT g.user_id, g.rn,
         |         CASE WHEN r.item_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM grid g
         |  LEFT JOIN rel r ON r.user_id = g.user_id AND r.item_id = g.item_id),
         |cum AS (
         |  SELECT user_id, rn, hit,
         |         sum(hit) OVER (PARTITION BY user_id ORDER BY rn) AS cum
         |  FROM hits),
         |per_user AS (
         |  SELECT user_id,
         |         sum(hit) / 10.0 AS prec10,
         |         sum(CAST(cum AS DOUBLE) / rn) / 10.0 AS ap10,
         |         sum(hit) AS nhits
         |  FROM cum GROUP BY 1),
         |per_user2 AS (
         |  SELECT p.*, COALESCE(n.n_rel, 0) AS n_rel
         |  FROM per_user p LEFT JOIN nrel n USING (user_id)),
         |rankm AS (
         |  SELECT floor(avg(prec10) * 10000.0 + 0.5) / 10000.0 AS avg_precision_at_10,
         |         floor(avg(CASE WHEN n_rel > 0
         |                   THEN CAST(nhits AS DOUBLE) / n_rel
         |                   ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS avg_recall_at_10,
         |         floor(avg(ap10) * 10000.0 + 0.5) / 10000.0 AS map_at_10
         |  FROM per_user2),
         |predm AS (
         |  SELECT floor(sqrt(avg(err * err)) * 10000.0 + 0.5) / 10000.0 AS rmse,
         |         floor(avg(abs(err)) * 10000.0 + 0.5) / 10000.0 AS mae
         |  FROM (SELECT r.rating - u.umean AS err
         |        FROM ratings r JOIN umean u USING (user_id)))
         |SELECT * FROM rankm CROSS JOIN predm""".stripMargin,

    // NDCG@10: per-rank discount terms r6-quantized to DECIMAL before
    // the per-user sums (order-free), ln-based log2 in ONE IEEE shape
    "q96_ndcg" -> {
      import graft.functions.Rounding.{sql4, sql6}
      val dcgTerm = sql6("CAST(CASE WHEN r.item_id IS NULL THEN 0 ELSE 1 END AS DOUBLE)" +
        " / (ln(CAST(g.rn + 1 AS DOUBLE)) / ln(2.0))")
      val idcgTerm = sql6("1.0 / (ln(CAST(i + 1 AS DOUBLE)) / ln(2.0))")
      val ndTerm = sql6("CASE WHEN i.idcg IS NOT NULL" +
        " THEN CAST(d.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE) ELSE 0.0 END")
      s"""WITH $ratingsSql,
         |pop AS (
         |  SELECT item_id, rn FROM (
         |    SELECT item_id, row_number() OVER (
         |      ORDER BY count(*) DESC, item_id ASC) AS rn
         |    FROM ratings GROUP BY item_id)
         |  WHERE rn <= 10),
         |rel AS (SELECT user_id, item_id FROM ratings WHERE rating >= 30),
         |nrel AS (SELECT user_id, count(*) AS n_rel FROM rel GROUP BY 1),
         |users AS (SELECT DISTINCT user_id FROM ratings),
         |dcg AS (
         |  SELECT g.user_id,
         |         sum(CAST($dcgTerm AS DECIMAL(20,6))) AS dcg
         |  FROM (SELECT u.user_id, p.item_id, p.rn
         |        FROM users u CROSS JOIN pop p) g
         |  LEFT JOIN rel r ON r.user_id = g.user_id AND r.item_id = g.item_id
         |  GROUP BY 1),
         |idcg AS (
         |  SELECT user_id,
         |         sum(CAST($idcgTerm AS DECIMAL(20,6))) AS idcg
         |  FROM (SELECT user_id, unnest(generate_series(1, least(n_rel, 10))) AS i
         |        FROM nrel)
         |  GROUP BY 1),
         |nd AS (
         |  SELECT CAST($ndTerm AS DECIMAL(20,6)) AS nd
         |  FROM users u
         |  JOIN dcg d USING (user_id)
         |  LEFT JOIN idcg i USING (user_id))
         |SELECT ${sql4("CAST(sum(nd) AS DOUBLE) / count(*)")} AS avg_ndcg_at_10,
         |       count(*) AS n_users
         |FROM nd""".stripMargin
    },

    "q28_periods_w2" ->
      s"""WITH bounds AS (
         |  SELECT min(o_orderdate) AS dmin, max(o_orderdate) AS dmax FROM orders),
         |w AS (
         |  SELECT dmin,
         |         CAST(date_diff('day', dmin, dmax) + 1 AS BIGINT) AS span,
         |         CAST(ceil((date_diff('day', dmin, dmax) + 1) / 8.0) AS BIGINT) AS width
         |  FROM bounds),
         |assigned AS (
         |  SELECT least(CAST(date_diff('day', w.dmin, o.o_orderdate) AS BIGINT) // w.width,
         |               7) AS period_id,
         |         o.o_custkey, w.width, w.span
         |  FROM orders o CROSS JOIN w)
         |SELECT period_id,
         |       CAST(period_id * width AS BIGINT) AS start_off,
         |       CAST(least((period_id + 1) * width, span) AS BIGINT) AS end_off,
         |       count(*) AS n_orders,
         |       count(DISTINCT o_custkey) AS n_custs
         |FROM assigned
         |GROUP BY 1, 2, 3""".stripMargin,

    "q29_rule_support" -> oracleQ29,

    // q104 ALS contract row (q99 posture): cohort size, k and row
    // count are exact facts the oracle recomputes from the ratings
    // view; complete_ok / digest_ok are in-Spark verdicts pinned to 1
    // — a cold-start drop, rank-gap or factorization drift hash-fails
    // the row instead of hiding behind no_oracle. Constants
    // interpolate from graft.operators.Evaluation so engine and
    // oracle cannot desync.
    "q104_als_topk" -> {
      import graft.operators.Evaluation.{ALS_COHORT_MOD, ALS_K}
      s"""WITH $ratingsSql,
         |cohort AS (
         |  SELECT DISTINCT user_id FROM ratings
         |  WHERE user_id % $ALS_COHORT_MOD = 0)
         |SELECT count(*) AS n_users, $ALS_K AS k,
         |       count(*) * $ALS_K AS n_rows,
         |       1 AS complete_ok, 1 AS digest_ok
         |FROM cohort""".stripMargin
    }
  )

  /** q29's full oracle — also embedded as a subquery by q36. */
  private lazy val oracleQ29: String =
    s"""WITH $ratingsSql,
       |rr AS (SELECT user_id, item_id FROM ratings),
       |baskets AS (SELECT user_id, list(item_id) AS items FROM rr GROUP BY 1),
       |nb AS (SELECT count(*) AS n_baskets FROM baskets),
       |icnt AS (SELECT item_id, count(*) AS cnt_i FROM rr GROUP BY 1),
       |pairs AS (
       |  SELECT a.item_id AS i, b.item_id AS j, count(*) AS cnt
       |  FROM rr a JOIN rr b ON a.user_id = b.user_id AND a.item_id < b.item_id
       |  GROUP BY 1, 2),
       |rules AS (
       |  SELECT i, j FROM pairs CROSS JOIN nb
       |  WHERE cnt >= greatest(4, CAST(ceil(n_baskets * 0.004) AS BIGINT))),
       |recount AS (
       |  SELECT r.i, r.j, count(*) AS cnt2
       |  FROM rules r JOIN baskets b
       |    ON list_contains(b.items, r.i) AND list_contains(b.items, r.j)
       |  GROUP BY 1, 2)
       |SELECT rc.i AS antecedent, rc.j AS consequent,
       |       floor(CAST(cnt2 AS DOUBLE) / n_baskets * 1000000.0 + 0.5) / 1000000.0 AS support,
       |       floor(CAST(cnt2 AS DOUBLE) / cnt_i * 1000000.0 + 0.5) / 1000000.0 AS confidence
       |FROM recount rc
       |CROSS JOIN nb
       |JOIN icnt ON icnt.item_id = rc.i""".stripMargin
}
