package graft.oracle

/**
 * DuckDB oracle for [[graft.operators.SeqRecommender]] (q58) — the
 * full composed pipeline replayed in ANSI SQL: period assignment,
 * SPARSE Lloyd clustering of transaction baskets (centroids as
 * (cluster, item_id, w) rows, d² = n + ‖c‖² − 2·dot, 6-dp-rounded,
 * cluster-asc tie-breaks — the long-form twin of q34's dense replay),
 * token encoding, FPGrowth mirrored by exact itemset enumeration up
 * to size 3 (the MAX_ANTECEDENT=2 slice), the consequent-period-0
 * rule filter + antecedent strip + containment recount, best-rule
 * argmax and the last-period frequency recommendation.
 */
object SeqRecSql {

  /** One sparse Lloyd assignment: nearest centroid from `cents` for
    * every transaction, over the shared `titems`/`tn` CTEs. */
  private def sparseAssign(name: String, cents: String): String =
    s"""cd_$name AS MATERIALIZED (
       |  SELECT cluster, sum(w*w) AS sqn FROM $cents GROUP BY 1),
       |dot_$name AS MATERIALIZED (
       |  SELECT ti.t_id, c.cluster, sum(c.w) AS dot
       |  FROM titems ti JOIN $cents c ON c.item_id = ti.item_id
       |  GROUP BY 1, 2),
       |$name AS MATERIALIZED (
       |  SELECT t_id, cluster FROM (
       |    SELECT g.t_id, g.cluster, row_number() OVER (
       |      PARTITION BY g.t_id ORDER BY g.d2 ASC, g.cluster ASC) AS rk
       |    FROM (
       |      SELECT tn.t_id, cd.cluster,
       |             floor((CAST(tn.n AS DOUBLE) + cd.sqn
       |                    - 2.0 * coalesce(d.dot, 0.0)) * 1000000.0 + 0.5)
       |               / 1000000.0 AS d2
       |      FROM tn CROSS JOIN cd_$name cd
       |      LEFT JOIN dot_$name d
       |        ON d.t_id = tn.t_id AND d.cluster = cd.cluster) g)
       |  WHERE rk = 1)""".stripMargin

  /** One sparse centroid update: per-(cluster, position) mean of the
    * members' binary baskets — only nonzero positions materialize. */
  private def sparseRecenter(name: String, assigned: String): String =
    s"""nc_$name AS (
       |  SELECT cluster, count(*) AS nc FROM $assigned GROUP BY 1),
       |$name AS MATERIALIZED (
       |  SELECT x.cluster, x.item_id,
       |         floor(CAST(x.cnt AS DOUBLE) / n.nc * 1000000.0 + 0.5)
       |           / 1000000.0 AS w
       |  FROM (SELECT a.cluster, ti.item_id, count(*) AS cnt
       |        FROM $assigned a JOIN titems ti ON ti.t_id = a.t_id
       |        GROUP BY 1, 2) x
       |  JOIN nc_$name n ON n.cluster = x.cluster)""".stripMargin

  val oracle: Map[String, String] = Map(
    // PrefixSpan's item-count-≤2 slice by exact enumeration: <{a}> =
    // users with an a-day; <{a,b}> = users with a day holding both;
    // <{a},{b}> = users with an a-day strictly before a b-day (a = b
    // allowed). freq counts sequences (users); minCount mirrors
    // mllib's ceil(minSupport · n).
    "q60_prefixspan" ->
      s"""WITH de AS MATERIALIZED (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
         |  FROM events),
         |n AS (SELECT count(DISTINCT user_id) AS cnt FROM de),
         |minc AS (SELECT CAST(ceil(0.05 * cnt) AS BIGINT) AS mc FROM n),
         |p1 AS (
         |  SELECT event_type AS pattern, 1 AS n_items,
         |         count(DISTINCT user_id) AS freq
         |  FROM de GROUP BY 1),
         |p2same AS (
         |  SELECT x.event_type || ',' || y.event_type AS pattern, 2 AS n_items,
         |         count(DISTINCT x.user_id) AS freq
         |  FROM de x JOIN de y ON y.user_id = x.user_id AND y.day = x.day
         |    AND x.event_type < y.event_type
         |  GROUP BY 1),
         |p2ord AS (
         |  SELECT x.event_type || ';' || y.event_type AS pattern, 2 AS n_items,
         |         count(DISTINCT x.user_id) AS freq
         |  FROM de x JOIN de y ON y.user_id = x.user_id AND y.day > x.day
         |  GROUP BY 1)
         |SELECT pattern, CAST(n_items AS INTEGER) AS n_items, freq FROM (
         |  SELECT * FROM p1 UNION ALL
         |  SELECT * FROM p2same UNION ALL
         |  SELECT * FROM p2ord)
         |WHERE freq >= (SELECT mc FROM minc)""".stripMargin,

    "q58_seq_recommend" ->
      s"""WITH bounds AS (
         |  SELECT min(o_orderdate) AS dmin, max(o_orderdate) AS dmax FROM orders),
         |wd AS (
         |  SELECT dmin,
         |         CAST(ceil((date_diff('day', dmin, dmax) + 1) / 8.0) AS BIGINT) AS width
         |  FROM bounds),
         |trans AS MATERIALIZED (
         |  SELECT DISTINCT o.o_orderkey AS t_id, o.o_custkey AS user_id,
         |         least(CAST(date_diff('day', b.dmin, o.o_orderdate) AS BIGINT)
         |               // b.width, 7) AS period_id,
         |         l.l_partkey AS item_id
         |  FROM orders o CROSS JOIN wd b
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
         |titems AS MATERIALIZED (SELECT DISTINCT t_id, item_id FROM trans),
         |tn AS MATERIALIZED (SELECT t_id, count(*) AS n FROM titems GROUP BY 1),
         |seeds AS (SELECT DISTINCT t_id FROM titems ORDER BY t_id LIMIT 8),
         |c0 AS MATERIALIZED (
         |  SELECT s.t_id AS cluster, ti.item_id, 1.0 AS w
         |  FROM seeds s JOIN titems ti ON ti.t_id = s.t_id),
         |${sparseAssign("a1", "c0")},
         |${sparseRecenter("c1", "a1")},
         |${sparseAssign("a2", "c1")},
         |${sparseRecenter("c2", "a2")},
         |${sparseAssign("a3", "c2")},
         |tok AS MATERIALIZED (
         |  SELECT DISTINCT t.user_id,
         |         CAST(a.cluster AS VARCHAR) || '_'
         |           || CAST(t.period_id - 7 AS VARCHAR) AS token
         |  FROM (SELECT DISTINCT t_id, user_id, period_id FROM trans) t
         |  JOIN a3 a ON a.t_id = t.t_id),
         |nb AS (SELECT count(DISTINCT user_id) AS n FROM tok),
         |th AS (
         |  SELECT CAST(ceil(greatest(0.005, 4.0 / n) * n) AS BIGINT) AS minc
         |  FROM nb),
         |f1 AS (
         |  SELECT token AS t1, count(*) AS cnt FROM tok GROUP BY 1
         |  HAVING count(*) >= (SELECT minc FROM th)),
         |f2 AS (
         |  SELECT a.token AS t1, b.token AS t2, count(*) AS cnt
         |  FROM tok a JOIN tok b ON a.user_id = b.user_id AND a.token < b.token
         |  GROUP BY 1, 2 HAVING count(*) >= (SELECT minc FROM th)),
         |f3 AS (
         |  SELECT a.token AS t1, b.token AS t2, c.token AS t3, count(*) AS cnt
         |  FROM tok a
         |  JOIN tok b ON b.user_id = a.user_id AND a.token < b.token
         |  JOIN tok c ON c.user_id = a.user_id AND b.token < c.token
         |  GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT minc FROM th)),
         |rules0 AS (
         |  SELECT x1, x2, y FROM (
         |    SELECT f2.t1 AS x1, CAST(NULL AS VARCHAR) AS x2, f2.t2 AS y,
         |           f2.cnt AS cxy, f1.cnt AS cx
         |    FROM f2 JOIN f1 ON f1.t1 = f2.t1
         |    UNION ALL
         |    SELECT f2.t2, CAST(NULL AS VARCHAR), f2.t1, f2.cnt, f1.cnt
         |    FROM f2 JOIN f1 ON f1.t1 = f2.t2
         |    UNION ALL
         |    SELECT f3.t1, f3.t2, f3.t3, f3.cnt, f2.cnt
         |    FROM f3 JOIN f2 ON f2.t1 = f3.t1 AND f2.t2 = f3.t2
         |    UNION ALL
         |    SELECT f3.t1, f3.t3, f3.t2, f3.cnt, f2.cnt
         |    FROM f3 JOIN f2 ON f2.t1 = f3.t1 AND f2.t2 = f3.t3
         |    UNION ALL
         |    SELECT f3.t2, f3.t3, f3.t1, f3.cnt, f2.cnt
         |    FROM f3 JOIN f2 ON f2.t1 = f3.t2 AND f2.t2 = f3.t3)
         |  WHERE CAST(cxy AS DOUBLE) / cx >= 0.5 AND ends_with(y, '_0')),
         |ante AS (
         |  SELECT x1, x2, y, x1 AS e FROM rules0
         |  UNION ALL
         |  SELECT x1, x2, y, x2 FROM rules0 WHERE x2 IS NOT NULL),
         |rules1 AS (
         |  SELECT DISTINCT min(e) AS e1,
         |         CASE WHEN count(*) = 2 THEN max(e) END AS e2,
         |         y AS cons
         |  FROM ante WHERE NOT ends_with(e, '_0')
         |  GROUP BY x1, x2, y),
         |hold AS (
         |  SELECT r.e1, r.e2, r.cons, t1.user_id
         |  FROM rules1 r
         |  JOIN tok t1 ON t1.token = r.e1
         |  LEFT JOIN tok t2 ON r.e2 IS NOT NULL
         |    AND t2.user_id = t1.user_id AND t2.token = r.e2
         |  WHERE r.e2 IS NULL OR t2.user_id IS NOT NULL),
         |counts AS (
         |  SELECT h.e1, h.e2, h.cons,
         |         count(*) AS cnt_x,
         |         CAST(sum(CASE WHEN tc.user_id IS NOT NULL THEN 1 ELSE 0 END)
         |              AS BIGINT) AS cnt_xy
         |  FROM hold h
         |  LEFT JOIN tok tc ON tc.user_id = h.user_id AND tc.token = h.cons
         |  GROUP BY 1, 2, 3),
         |seqrules AS (
         |  SELECT e1, e2, cons, support, confidence FROM (
         |    SELECT c.e1, c.e2, c.cons,
         |           floor(CAST(c.cnt_xy AS DOUBLE) / nb.n * 1000000.0 + 0.5)
         |             / 1000000.0 AS support,
         |           floor(CAST(c.cnt_xy AS DOUBLE) / c.cnt_x * 1000000.0 + 0.5)
         |             / 1000000.0 AS confidence
         |    FROM counts c CROSS JOIN nb)
         |  WHERE support > 0.01 AND confidence > 0.1),
         |fired AS (
         |  SELECT u.user_id, r.cons, r.e1, r.e2, r.support, r.confidence,
         |         (CASE WHEN h1.user_id IS NOT NULL THEN 1 ELSE 0 END)
         |         + (CASE WHEN h2.user_id IS NOT NULL THEN 1 ELSE 0 END) AS sim
         |  FROM (SELECT DISTINCT user_id FROM tok) u
         |  CROSS JOIN seqrules r
         |  LEFT JOIN tok h1 ON h1.user_id = u.user_id AND h1.token = r.e1
         |  LEFT JOIN tok h2 ON r.e2 IS NOT NULL
         |    AND h2.user_id = u.user_id AND h2.token = r.e2
         |  WHERE h1.user_id IS NOT NULL OR h2.user_id IS NOT NULL),
         |scored AS (
         |  SELECT user_id, cons,
         |         CASE WHEN e2 IS NULL THEN e1 ELSE e1 || ',' || e2 END AS ant_str,
         |         floor(CAST(sim AS DOUBLE) * support * confidence
         |               * 1000000.0 + 0.5) / 1000000.0 AS score
         |  FROM fired),
         |best AS (
         |  SELECT user_id, CAST(split_part(cons, '_', 1) AS BIGINT) AS cluster
         |  FROM (
         |    SELECT user_id, cons, row_number() OVER (
         |      PARTITION BY user_id
         |      ORDER BY score DESC, cons ASC, ant_str ASC) AS rk
         |    FROM scored)
         |  WHERE rk = 1),
         |lastcnt AS (
         |  SELECT a.cluster, ti.item_id, count(*) AS cnt
         |  FROM (SELECT DISTINCT t_id, item_id FROM trans WHERE period_id = 7) ti
         |  JOIN a3 a ON a.t_id = ti.t_id
         |  GROUP BY 1, 2),
         |seen AS (SELECT DISTINCT user_id, item_id FROM trans)
         |SELECT user_id, cluster, item_id, cnt, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT b.user_id, b.cluster, lc.item_id, lc.cnt,
         |         row_number() OVER (PARTITION BY b.user_id
         |           ORDER BY lc.cnt DESC, lc.item_id ASC) AS rk
         |  FROM best b
         |  JOIN lastcnt lc ON lc.cluster = b.cluster
         |  WHERE NOT EXISTS (SELECT 1 FROM seen s
         |                    WHERE s.user_id = b.user_id
         |                      AND s.item_id = lc.item_id))
         |WHERE rk <= 5""".stripMargin
  )
}
