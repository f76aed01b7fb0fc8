package graft.oracle

import graft.functions.Rounding.sql4

/**
 * DuckDB oracles for [[graft.operators.Analytics]]. Float discipline
 * matches the Spark side: money/moment sums in DECIMAL (exact,
 * order-independent), derived doubles through the same single IEEE
 * expression sequence, emit-rounding via the engine-stable
 * floor(x·10⁴ + 0.5)/10⁴ form.
 */
object AnalyticsSql {

  val oracle: Map[String, String] = Map(

    // props is a JSON payload; ->> is DuckDB's json_extract_string
    "q78_json_extract" ->
      s"""SELECT event_type,
         |       count(*) AS n,
         |       min(CAST(props->>'$$.k' AS INTEGER)) AS min_k,
         |       max(CAST(props->>'$$.k' AS INTEGER)) AS max_k,
         |       ${sql4("avg(CAST(props->>'$.k' AS INTEGER))")} AS avg_k,
         |       count(DISTINCT CAST(props->>'$$.k' AS INTEGER)) AS n_distinct_k
         |FROM events GROUP BY 1""".stripMargin,

    // 2-day windows sliding 1 day, epoch-aligned like Spark's
    // window(ts, size, slide): every event belongs to the two windows
    // starting at (floor(epoch/86400) - i) days, i ∈ {0,1}
    "q79_hopping_window" ->
      """SELECT make_timestamp((CAST(floor(epoch(ts) / 86400) AS BIGINT) - i)
        |         * 86400 * 1000000) AS w_start,
        |       make_timestamp((CAST(floor(epoch(ts) / 86400) AS BIGINT) - i + 2)
        |         * 86400 * 1000000) AS w_end,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE)
        |         AS sum_value
        |FROM events, (SELECT unnest([0, 1]) AS i)
        |GROUP BY 1, 2""".stripMargin,

    "q80_cube" ->
      """SELECT COALESCE(l_returnflag, '<all>') AS flag,
        |       COALESCE(l_linestatus, '<all>') AS status,
        |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |                           AS DECIMAL(30,8))), 4) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q82_price_histogram" ->
      s"""SELECT CAST(floor(l_extendedprice / 500.0) AS BIGINT) AS bucket,
         |       count(*) AS n,
         |       ${sql4("min(l_extendedprice)")} AS min_price,
         |       ${sql4("max(l_extendedprice)")} AS max_price,
         |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 4)
         |            AS DOUBLE) AS sum_price
         |FROM lineitem GROUP BY 1""".stripMargin,

    // moments over DECIMAL(18,6)-quantized values (exact sums), then
    // mu/sigma/z through the identical double expression as Spark
    "q83_zscore_outliers" ->
      s"""WITH ev AS (
         |  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS vd
         |  FROM events),
         |stats AS (
         |  SELECT event_type,
         |         CAST(sum(vd) AS DOUBLE) / count(*) AS mu,
         |         sqrt(CAST(sum(vd * vd) AS DOUBLE) / count(*)
         |              - (CAST(sum(vd) AS DOUBLE) / count(*))
         |                * (CAST(sum(vd) AS DOUBLE) / count(*))) AS sigma
         |  FROM ev GROUP BY 1)
         |SELECT event_id, ev.event_type,
         |       ${sql4("CAST(vd AS DOUBLE)")} AS value,
         |       ${sql4("(CAST(vd AS DOUBLE) - mu) / sigma")} AS zscore
         |FROM ev JOIN stats USING (event_type)
         |WHERE abs((CAST(vd AS DOUBLE) - mu) / sigma) > 2.5""".stripMargin,

    // quantile_cont interpolates at (n-1)·p exactly like Spark's
    // percentile, so boundaries and comparisons are engine-identical
    "q86_quantile_buckets" ->
      s"""WITH bounds AS (
         |  SELECT event_type,
         |         quantile_cont(value, 0.25) AS b25,
         |         quantile_cont(value, 0.5)  AS b50,
         |         quantile_cont(value, 0.75) AS b75
         |  FROM events GROUP BY 1)
         |SELECT e.event_type,
         |       CAST(1 + CAST(e.value > b.b25 AS INTEGER)
         |              + CAST(e.value > b.b50 AS INTEGER)
         |              + CAST(e.value > b.b75 AS INTEGER) AS INTEGER) AS bucket,
         |       count(*) AS n,
         |       ${sql4("min(e.value)")} AS min_v,
         |       ${sql4("max(e.value)")} AS max_v
         |FROM events e JOIN bounds b USING (event_type)
         |GROUP BY 1, 2""".stripMargin,

    // expectation report over the q77 profile; // is DuckDB's integer
    // division (Spark DIV); rules match Analytics.QUALITY_RULES
    "q87_quality_checks" ->
      s"""WITH profile AS (${RelationalSql.lineitemProfileSql}),
         |rules AS (
         |  SELECT * FROM (VALUES
         |    ('l_returnflag', CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'A', 'R'),
         |    ('l_linestatus', CAST(1 AS BIGINT), CAST(3 AS BIGINT),
         |     CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
         |    ('l_linenumber', CAST(1 AS BIGINT), CAST(10 AS BIGINT),
         |     CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
         |    ('l_shipdate', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |     '1992-01-01 00:00:00', '2002-12-31 23:59:59'))
         |    r(col_name, lo, hi, dlo, dhi))
         |SELECT col_name, 'completeness' AS check_name,
         |       CAST(n_filled * 100 // n_rows >= 100 AS INTEGER) AS passed,
         |       CAST(n_filled * 100 // n_rows AS VARCHAR) AS observed
         |FROM profile
         |UNION ALL
         |SELECT p.col_name, 'distinct_bounds',
         |       CAST(p.n_distinct BETWEEN r.lo AND r.hi AS INTEGER),
         |       CAST(p.n_distinct AS VARCHAR)
         |FROM profile p JOIN rules r USING (col_name) WHERE r.lo IS NOT NULL
         |UNION ALL
         |SELECT p.col_name, 'domain_bounds',
         |       CAST(p.min_v >= r.dlo AND p.max_v <= r.dhi AS INTEGER),
         |       p.min_v || '..' || p.max_v
         |FROM profile p JOIN rules r USING (col_name) WHERE r.dlo IS NOT NULL""".stripMargin,

    // one decimal-exact moment row, then each coefficient through the
    // identical IEEE sequence as the Spark side (see Analytics.q88)
    "q88_corr_matrix" -> corrMatrixSql,

    // resample + forward fill via the portable group-carry form:
    // grp = running count of non-nulls, carry = max per (user, grp)
    "q89_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE)
        |           AS day_value
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
        |         CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
        |  FROM events),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM span),
        |scaffold AS (
        |  SELECT user_id, day
        |  FROM (SELECT DISTINCT user_id FROM events), days),
        |j AS (
        |  SELECT s.user_id, s.day, d.day_value
        |  FROM scaffold s LEFT JOIN daily d USING (user_id, day)),
        |g AS (
        |  SELECT *, count(day_value) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j)
        |SELECT user_id, day,
        |       COALESCE(max(day_value) OVER (PARTITION BY user_id, grp), 0.0)
        |         AS value,
        |       CAST(day_value IS NOT NULL AS INTEGER) AS observed
        |FROM g""".stripMargin,

    "q90_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
        |       CAST(row_number() OVER w AS INTEGER) AS version,
        |       o_orderdate AS valid_from,
        |       lead(o_orderdate, 1) OVER w AS valid_to,
        |       CAST(lead(o_orderdate, 1) OVER w IS NULL AS INTEGER)
        |         AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    // as-of carry of the SCD2 version onto ship-time probes: the q89
    // group-carry windows (engine-portable; null tiebreaks never mix
    // within one is_probe stratum)
    "q101_pit_join" ->
      """WITH scd AS (
        |  SELECT o_custkey AS cust, o_orderdate AS ts,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS version,
        |         o_orderstatus AS status
        |  FROM orders),
        |probes AS (
        |  SELECT o.o_custkey AS cust,
        |         l.l_orderkey * 10 + l.l_linenumber AS probe_id,
        |         l.l_shipdate AS ts
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |tagged AS (
        |  SELECT cust, ts, CAST(NULL AS BIGINT) AS probe_id,
        |         version, status, 0 AS is_probe
        |  FROM scd
        |  UNION ALL
        |  SELECT cust, ts, probe_id, CAST(NULL AS INTEGER),
        |         CAST(NULL AS VARCHAR), 1
        |  FROM probes),
        |g AS (
        |  SELECT *, count(version) OVER (
        |    PARTITION BY cust ORDER BY ts, is_probe, version, probe_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM tagged),
        |carried AS (
        |  SELECT cust, probe_id, ts, is_probe,
        |         max(version) OVER (PARTITION BY cust, grp) AS v,
        |         max(status) OVER (PARTITION BY cust, grp) AS st
        |  FROM g)
        |SELECT cust, probe_id, ts AS ship_ts,
        |       COALESCE(v, 0) AS version,
        |       COALESCE(st, '<none>') AS status
        |FROM carried WHERE is_probe = 1""".stripMargin,

    // deterministic-hash arm assignment; pooled two-proportion z from
    // exact counts through the identical IEEE sequence as Spark
    "q103_ab_test" -> {
      import graft.operators.Analytics.AB_Z_CRIT
      val hash = graft.oracle.SqlFragments.baseHashSql(
        "CAST(p.user_id AS VARCHAR) || '_ab'")
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val pp = s"((${dd("k0")} + ${dd("k1")}) / (${dd("n0")} + ${dd("n1")}))"
      val se2 = s"($pp * (1.0 - $pp)" +
        s" * (1.0 / ${dd("n0")} + 1.0 / ${dd("n1")}))"
      // arm guard nests OUTSIDE the se2 branch (mirrors the Spark
      // side): an empty arm never evaluates the 1/n divisions
      val z = s"(CASE WHEN n0 > 0 AND n1 > 0 THEN " +
        s"(CASE WHEN $se2 > 0 THEN (${dd("k1")} / ${dd("n1")}" +
        s" - ${dd("k0")} / ${dd("n0")}) / sqrt($se2) ELSE 0.0 END)" +
        s" ELSE 0.0 END)"
      s"""WITH pop AS (SELECT DISTINCT user_id FROM events),
         |conv AS (
         |  SELECT user_id FROM events WHERE event_type = 'purchase'
         |  GROUP BY 1
         |  HAVING count(*) >= ${graft.operators.Analytics.AB_CONV_MIN_PURCHASES}),
         |per AS (
         |  SELECT CAST($hash % 2 AS INTEGER) AS arm,
         |         CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS cv
         |  FROM pop p LEFT JOIN conv c ON c.user_id = p.user_id),
         |m AS (
         |  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |         CAST(sum(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT) AS k0,
         |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |         CAST(sum(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT) AS k1
         |  FROM per)
         |SELECT n0, k0, n1, k1,
         |       CASE WHEN n0 > 0 THEN ${graft.functions.Rounding.sql6(s"${dd("k0")} / ${dd("n0")}")} END AS rate0,
         |       CASE WHEN n1 > 0 THEN ${graft.functions.Rounding.sql6(s"${dd("k1")} / ${dd("n1")}")} END AS rate1,
         |       ${graft.functions.Rounding.sql6(z)} AS z,
         |       CAST(abs($z) > $AB_Z_CRIT AS INTEGER) AS significant
         |FROM m""".stripMargin
    },

    // observation-indexed EWMA: fixed lag columns summed in declared
    // j order (identical IEEE sequence both engines); missing lags
    // drop term AND weight
    "q118_ewma" -> {
      val ws = graft.operators.Analytics.EWMA_WEIGHTS
      val lagCols = ws.indices.map(j =>
        s"lag(day_value, $j) OVER (PARTITION BY user_id ORDER BY day) AS x_$j")
        .mkString(",\n        |         ")
      val num = ws.indices.map(j =>
        s"CASE WHEN x_$j IS NOT NULL THEN x_$j * ${ws(j)} ELSE 0.0 END")
        .mkString(" + ")
      val den = ws.indices.map(j =>
        s"CASE WHEN x_$j IS NOT NULL THEN ${ws(j)} ELSE 0.0 END")
        .mkString(" + ")
      s"""WITH daily AS (
         |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |         CAST(round(sum(CAST(value AS DECIMAL(30,8))), 4) AS DOUBLE)
         |           AS day_value
         |  FROM events GROUP BY 1, 2),
         |lagged AS (
         |  SELECT user_id, day, day_value,
         |         $lagCols
         |  FROM daily)
         |SELECT user_id, day, day_value,
         |       ${graft.functions.Rounding.sql4(s"($num) / ($den)")} AS ewma
         |FROM lagged""".stripMargin
    },

    // balanced shard planning: per-source md5-hash layout order,
    // integer running token mass, shard = prev_cum // target
    "q119_shard_plan" -> {
      val t = graft.operators.Analytics.SHARD_TOKENS
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |         CAST(len(${SqlFragments.tokensSql("lower(trim(text))")}) AS BIGINT) AS n_tok,
         |         ${SqlFragments.baseHashSql("doc_id::VARCHAR || '_shard'")} AS hkey
         |  FROM documents),
         |cums AS (
         |  SELECT doc_id, source, n_tok,
         |         CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY hkey, doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM toks)
         |SELECT source, CAST((cum - n_tok) // $t AS BIGINT) AS shard_id,
         |       count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM cums GROUP BY 1, 2""".stripMargin
    },

    // q138: exact per-source quota — flat per-source row_number in
    // salted-hash order; the Spark side's two-level bucketed rank is
    // provably the same ordering (order-preserving bucket key)
    "q138_source_quota" -> {
      val a = graft.operators.Analytics
      s"""WITH keyed AS (
         |  SELECT doc_id, source,
         |         ${SqlFragments.baseHashSql(
              s"'${a.QUOTA_SALT}' || CAST(doc_id AS VARCHAR)")} AS hkey
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, source,
         |         CAST(row_number() OVER (
         |           PARTITION BY source ORDER BY hkey, doc_id) AS BIGINT) AS qrank
         |  FROM keyed)
         |SELECT doc_id, source, qrank,
         |       CASE WHEN qrank <= ${a.SOURCE_QUOTA} THEN 1 ELSE 0 END AS kept
         |FROM ranked""".stripMargin
    }
  )

  /** q88's oracle, generated from the same column list as the Spark
    * side so the pair set and expression shapes cannot drift. */
  private def corrMatrixSql: String = {
    val cols = graft.operators.Analytics.CORR_COLS
    val short = Map("l_quantity" -> "q", "l_extendedprice" -> "e",
      "l_discount" -> "d", "l_tax" -> "t")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val moments =
      cols.map(c => s"sum(${short(c)}) AS s_${short(c)}") ++
        cols.map(c => s"sum(${short(c)} * ${short(c)}) AS ss_${short(c)}") ++
        pairs.map { case (x, y) =>
          s"sum(${short(x)} * ${short(y)}) AS c_${short(x)}${short(y)}" }
    // DECIMAL(19) forces DuckDB's int128 physical type — an 18-wide
    // decimal multiplies in int64 units and overflows on Σ-scale values
    val quantized = cols
      .map(c => s"CAST($c AS DECIMAL(19,6)) AS ${short(c)}").mkString(", ")
    val arms = pairs.map { case (x, y) =>
      val (a, b) = (short(x), short(y))
      val num = s"CAST(n AS DOUBLE) * CAST(c_$a$b AS DOUBLE) " +
        s"- CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)"
      val dx = s"sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE) " +
        s"- CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))"
      val dy = s"sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE) " +
        s"- CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))"
      s"SELECT '$x' AS col_x, '$y' AS col_y, " +
        s"${graft.functions.Rounding.sql6(s"($num) / ($dx * $dy)")} AS corr FROM m"
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |  SELECT count(*) AS n,
       |         ${moments.mkString(",\n         ")}
       |  FROM (SELECT $quantized FROM lineitem))
       |$arms""".stripMargin
  }
}
