package graft.oracle

import graft.sources.Tables.ratingsSql

/** DuckDB oracle SQL for [[graft.operators.Evaluation]] and
  * [[graft.operators.Sequential]]. */
object EvalSeqSql {

  val oracle: Map[String, String] = Map(
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

    "q29_rule_support" ->
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
  )
}
