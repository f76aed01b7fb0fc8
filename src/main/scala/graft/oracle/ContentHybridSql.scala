package graft.oracle

import graft.sources.Tables.ratingsSql

/**
 * DuckDB oracle SQL for [[graft.operators.Content]] (R6/R7) and
 * [[graft.operators.Hybrid]] (R10). The hybrid oracle embeds the
 * q16/q17 oracle strings verbatim as subqueries (DuckDB supports WITH
 * inside a parenthesized subquery), so the children can never drift
 * from their own correctness gates.
 */
object ContentHybridSql {

  val oracle: Map[String, String] = Map(
    "q32_content_topk" ->
      s"""WITH $ratingsSql,
         |feats AS (
         |  SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS fv
         |  FROM embeddings),
         |rated AS (
         |  SELECT r.user_id AS u, r.item_id AS j, r.rating AS r_uj, f.fv AS vj
         |  FROM ratings r JOIN feats f ON f.item_id = r.item_id
         |  WHERE r.user_id % 50 = 0),
         |users AS (SELECT DISTINCT u FROM rated),
         |cand AS (
         |  SELECT us.u, f.item_id AS i, f.fv AS vi
         |  FROM users us CROSS JOIN feats f
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = us.u AND r.item_id = f.item_id)),
         |raw AS (
         |  SELECT c.u, c.i, rd.j, rd.r_uj,
         |         floor(list_sum(list_transform(list_zip(c.vi, rd.vj), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(c.vi, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(rd.vj, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos6,
         |         floor(1.0 / (sqrt(list_sum(list_transform(list_zip(c.vi, rd.vj),
         |                       z -> (z[1]-z[2])*(z[1]-z[2])))) + 1.0)
         |               * 1000000.0 + 0.5) / 1000000.0 AS inv6
         |  FROM cand c JOIN rated rd ON rd.u = c.u AND rd.j <> c.i),
         |pairs AS (
         |  SELECT u, i, j, r_uj,
         |         CASE WHEN cos6 = 0.0 THEN inv6 ELSE cos6 END AS sim
         |  FROM raw),
         |scored AS (
         |  SELECT u, i,
         |         floor(sum(sim * r_uj) / sum(abs(sim)) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY u, i ORDER BY sim DESC, j ASC) AS nrk
         |        FROM pairs)
         |  WHERE nrk <= 8
         |  GROUP BY 1, 2
         |  HAVING sum(abs(sim)) <> 0)
         |SELECT u AS user_id, i AS item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY u ORDER BY score DESC, i ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 5""".stripMargin,

    // q32 through the LSH candidate seam: identical scoring, but the
    // cand CTE replays the banded sign buckets — candidates are the
    // unrated items sharing a (band, bucket) with an item the user
    // rated. Bucket strings are built from the same strictly-positive
    // sign convention as Content.signBands.
    "q32b_content_topk_lsh" -> {
      import graft.operators.Content.{LSH_SIGN_BITS, LSH_SIGN_BANDS}
      val bandVals = (0 until LSH_SIGN_BANDS).map(b => s"($b)").mkString(", ")
      val bucketExpr = (1 to LSH_SIGN_BITS).map(i =>
        s"CASE WHEN f.fv[b.band_id*$LSH_SIGN_BITS + $i] > 0 THEN '1' ELSE '0' END")
        .mkString("concat(", ", ", ")")
      s"""WITH $ratingsSql,
         |feats AS (
         |  SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS fv
         |  FROM embeddings),
         |rated AS (
         |  SELECT r.user_id AS u, r.item_id AS j, r.rating AS r_uj, f.fv AS vj
         |  FROM ratings r JOIN feats f ON f.item_id = r.item_id
         |  WHERE r.user_id % 50 = 0),
         |sigs AS (
         |  SELECT f.item_id, b.band_id, $bucketExpr AS bucket
         |  FROM feats f CROSS JOIN (VALUES $bandVals) b(band_id)),
         |ubkt AS (
         |  SELECT DISTINCT rd.u, s.band_id, s.bucket
         |  FROM rated rd JOIN sigs s ON s.item_id = rd.j),
         |candid AS (
         |  SELECT DISTINCT ub.u, s.item_id AS i
         |  FROM ubkt ub JOIN sigs s ON s.band_id = ub.band_id
         |                          AND s.bucket = ub.bucket),
         |cand AS (
         |  SELECT c.u, c.i, f.fv AS vi
         |  FROM candid c JOIN feats f ON f.item_id = c.i
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ratings r
         |    WHERE r.user_id = c.u AND r.item_id = c.i)),
         |raw AS (
         |  SELECT c.u, c.i, rd.j, rd.r_uj,
         |         floor(list_sum(list_transform(list_zip(c.vi, rd.vj), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(c.vi, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(rd.vj, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos6,
         |         floor(1.0 / (sqrt(list_sum(list_transform(list_zip(c.vi, rd.vj),
         |                       z -> (z[1]-z[2])*(z[1]-z[2])))) + 1.0)
         |               * 1000000.0 + 0.5) / 1000000.0 AS inv6
         |  FROM cand c JOIN rated rd ON rd.u = c.u AND rd.j <> c.i),
         |pairs AS (
         |  SELECT u, i, j, r_uj,
         |         CASE WHEN cos6 = 0.0 THEN inv6 ELSE cos6 END AS sim
         |  FROM raw),
         |scored AS (
         |  SELECT u, i,
         |         floor(sum(sim * r_uj) / sum(abs(sim)) * 10000.0 + 0.5) / 10000.0 AS score
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY u, i ORDER BY sim DESC, j ASC) AS nrk
         |        FROM pairs)
         |  WHERE nrk <= 8
         |  GROUP BY 1, 2
         |  HAVING sum(abs(sim)) <> 0)
         |SELECT u AS user_id, i AS item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY u ORDER BY score DESC, i ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 5""".stripMargin
    },

    "q52_content_rating_predict" ->
      s"""WITH $ratingsSql,
         |feats AS (
         |  SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS fv
         |  FROM embeddings),
         |rf AS (
         |  SELECT r.user_id, r.item_id, r.rating, f.fv
         |  FROM ratings r JOIN feats f USING (item_id)),
         |cohort AS (
         |  SELECT user_id AS u, item_id AS i, rating AS actual, fv AS vi
         |  FROM rf WHERE user_id % 40 = 7),
         |raw AS (
         |  SELECT c.u, c.i, c.actual, rd.item_id AS j, rd.rating AS r_uj,
         |         floor(list_sum(list_transform(list_zip(c.vi, rd.fv), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(c.vi, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(rd.fv, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos6,
         |         floor(1.0 / (sqrt(list_sum(list_transform(list_zip(c.vi, rd.fv),
         |                       z -> (z[1]-z[2])*(z[1]-z[2])))) + 1.0)
         |               * 1000000.0 + 0.5) / 1000000.0 AS inv6
         |  FROM cohort c
         |  JOIN rf rd ON rd.user_id = c.u AND rd.item_id <> c.i),
         |pairs AS (
         |  SELECT u, i, actual, j, r_uj,
         |         CASE WHEN cos6 = 0.0 THEN inv6 ELSE cos6 END AS sim
         |  FROM raw),
         |agg AS (
         |  SELECT u, i, actual,
         |         sum(sim * r_uj) AS num, sum(abs(sim)) AS den
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY u, i ORDER BY sim DESC, j ASC) AS nrk
         |        FROM pairs)
         |  WHERE nrk <= 8
         |  GROUP BY 1, 2, 3)
         |SELECT u AS user_id, i AS item_id,
         |       floor(actual * 10000.0 + 0.5) / 10000.0 AS actual,
         |       floor(num / den * 10000.0 + 0.5) / 10000.0 AS predicted,
         |       floor(abs(actual - num / den) * 10000.0 + 0.5) / 10000.0 AS abs_err
         |FROM agg
         |WHERE den <> 0""".stripMargin,

    "q33_hybrid_topk" ->
      s"""WITH ua AS (
         |  SELECT * FROM (
         |${RecommenderSql.oracle("q16_user_knn_topk")}
         |  ) WHERE user_id % 20 = 0),
         |ib AS (
         |  SELECT * FROM (
         |${RecommenderSql.oracle("q17_item_knn_topk")}
         |  )),
         |ha AS (SELECT user_id, score AS head_a FROM ua WHERE rk = 1),
         |hb AS (SELECT user_id, score AS head_b FROM ib WHERE rk = 1),
         |na AS (
         |  SELECT u.user_id, u.item_id, u.score / h.head_a * 0.6 AS sa
         |  FROM ua u JOIN ha h USING (user_id)),
         |nb AS (
         |  SELECT i.user_id, i.item_id, i.score / h.head_b * 0.4 AS sb
         |  FROM ib i JOIN hb h USING (user_id)),
         |fused AS (
         |  SELECT COALESCE(na.user_id, nb.user_id) AS user_id,
         |         COALESCE(na.item_id, nb.item_id) AS item_id,
         |         floor((COALESCE(sa, 0.0) + COALESCE(sb, 0.0)) * 10000.0 + 0.5)
         |           / 10000.0 AS score
         |  FROM na FULL OUTER JOIN nb
         |    ON na.user_id = nb.user_id AND na.item_id = nb.item_id)
         |SELECT user_id, item_id, score, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_id ORDER BY score DESC, item_id ASC) AS rk
         |  FROM fused)
         |WHERE rk <= 5""".stripMargin
  )
}
