package graft.oracle

/**
 * DuckDB oracle SQL for [[graft.operators.Similarity]]. The vector
 * folds are written as list_transform + list_sum over DOUBLE[] casts so
 * both engines walk the same IEEE sequence as Spark's `aggregate` HOFs.
 */
object SimilaritySql {

  private[oracle] val embCte =
    "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  // coarse-quantizer seed rows, interpolated from the Scala constants
  // so a geometry change cannot desync engine and oracle (ADVICE r8).
  // The codebook GROWS with the corpus: base seeds ∪ every vector
  // whose salted hash falls in 1/IVF_SEED_MOD of hash space (mirrors
  // Similarity.centsOf exactly).
  private[oracle] val ivfCentsCte = {
    val s = graft.operators.Similarity
    s"""cents AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv FROM emb
       |  WHERE vec_id IN (${s.IVF_SEEDS.mkString(", ")})
       |     OR ${SqlFragments.baseHashSql(
              s"'${s.IVF_SEED_SALT}' || CAST(vec_id AS VARCHAR)")}
       |        % ${s.IVF_SEED_MOD} = 0)""".stripMargin
  }

  private val q150Sql: String = {
      val s = graft.operators.Similarity
      val sm = graft.operators.Corpus.DELTA_SNAP_MOD
      val rm = graft.operators.Corpus.DELTA_REV_MOD
      s"""WITH $embCte,
         |news AS (
         |  SELECT vec_id,
         |         CASE WHEN vec_id % $rm = 0
         |              THEN list_transform(v, x -> -x) ELSE v END AS v
         |  FROM emb WHERE vec_id % $sm <> 4),
         |cents AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv FROM news
         |  WHERE vec_id IN (${s.IVF_SEEDS.mkString(", ")})
         |     OR ${SqlFragments.baseHashSql(
                s"'${s.IVF_SEED_SALT}' || CAST(vec_id AS VARCHAR)")}
         |        % ${s.IVF_SEED_MOD} = 0)
         |SELECT vec_id, cell, d2 FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |  FROM (
         |    SELECT e.vec_id, c.cell,
         |           floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                   z -> (z[1]-z[2])*(z[1]-z[2])))
         |                 * 1000000.0 + 0.5) / 1000000.0 AS d2
         |    FROM news e CROSS JOIN cents c))
         |WHERE rk = 1""".stripMargin
    }

  val oracle: Map[String, String] = Map(
    "q62_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (
        |  SELECT vec_id, v,
        |         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS amax
        |  FROM e),
        |q AS (
        |  SELECT vec_id, v, amax,
        |         list_transform(v, x -> greatest(-127, least(127,
        |           CAST(floor(x / amax * 127.0 + 0.5) AS INTEGER)))) AS qv
        |  FROM a WHERE amax > 0)
        |SELECT vec_id,
        |       floor(amax * 1000000.0 + 0.5) / 1000000.0 AS absmax,
        |       array_to_string(qv, ',') AS quant_csv,
        |       floor(list_sum(list_transform(list_zip(qv, v),
        |               z -> abs(CAST(z[1] AS DOUBLE) * amax / 127.0 - z[2])))
        |             / len(v) * 10000.0 + 0.5) / 10000.0 AS mae
        |FROM q""".stripMargin,

    "q22_ann_cosine" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id % 25 = 0),
         |pairs AS (
         |  SELECT q.q_id, e.vec_id AS n_id,
         |         floor(list_sum(list_transform(list_zip(q.qv, e.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(e.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM emb e JOIN q ON e.vec_id <> q.q_id)
         |SELECT q_id, n_id,
         |       floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine,
         |       CAST(rk AS INTEGER) AS rk
         |FROM (SELECT *, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
         |      FROM pairs)
         |WHERE rk <= 10""".stripMargin,

    // vote and accuracy are all-integer once ranks exist; ranks use
    // the q22 discipline (r6(cos) desc, n_id asc) — engine-exact
    "q129_knn_label_probe" -> {
      val s = graft.operators.Similarity
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |            FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, label AS true_label
         |      FROM emb WHERE vec_id % ${s.LPROBE_MOD} = 0
         |        AND vec_id < ${s.LPROBE_ID_CAP}),
         |pairs AS (
         |  SELECT q.q_id, q.true_label, e.vec_id AS n_id, e.label AS n_label,
         |         floor(list_sum(list_transform(list_zip(q.qv, e.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(e.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM emb e JOIN q ON e.vec_id <> q.q_id),
         |votes AS (
         |  SELECT q_id, true_label, n_label, count(*) AS nv
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
         |        FROM pairs)
         |  WHERE rk <= ${s.LPROBE_K}
         |  GROUP BY 1, 2, 3),
         |pred AS (
         |  SELECT q_id, true_label, n_label AS pred_label
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY q_id ORDER BY nv DESC, n_label ASC) AS vr
         |        FROM votes)
         |  WHERE vr = 1)
         |SELECT true_label, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct,
         |       floor(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS acc
         |FROM pred
         |GROUP BY 1""".stripMargin
    },

    // q129b: the probe with the IVF cell rule as the neighbor source —
    // cells/q/pairs are the q42 construction (probe-1 = the query's
    // own cell), the vote is the q129 SQL verbatim
    "q129b_label_probe_ivf" -> {
      val s = graft.operators.Similarity
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |            FROM embeddings),
         |$ivfCentsCte,
         |cells AS (
         |  SELECT vec_id, v, label, cell FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, e.label, c.cell,
         |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                     z -> (z[1]-z[2])*(z[1]-z[2])))
         |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
         |      FROM emb e CROSS JOIN cents c))
         |  WHERE rk = 1),
         |q AS (SELECT cell, vec_id AS q_id, v AS qv, label AS true_label
         |      FROM cells WHERE vec_id % ${s.LPROBE_MOD} = 0
         |        AND vec_id < ${s.LPROBE_ID_CAP}),
         |pairs AS (
         |  SELECT q.q_id, q.true_label, c.vec_id AS n_id, c.label AS n_label,
         |         floor(list_sum(list_transform(list_zip(q.qv, c.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(c.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM cells c JOIN q ON c.cell = q.cell AND c.vec_id <> q.q_id),
         |votes AS (
         |  SELECT q_id, true_label, n_label, count(*) AS nv
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
         |        FROM pairs)
         |  WHERE rk <= ${s.LPROBE_K}
         |  GROUP BY 1, 2, 3),
         |pred AS (
         |  SELECT q_id, true_label, n_label AS pred_label
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY q_id ORDER BY nv DESC, n_label ASC) AS vr
         |        FROM votes)
         |  WHERE vr = 1)
         |SELECT true_label, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct,
         |       floor(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS acc
         |FROM pred
         |GROUP BY 1""".stripMargin
    },

    // q132b: the miner over the IVF cell rule — same pos/neg/margin
    // SQL as q132, candidates bounded to the anchor's own cell
    "q132b_hard_negatives_ivf" -> {
      val s = graft.operators.Similarity
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |            FROM embeddings),
         |$ivfCentsCte,
         |cells AS (
         |  SELECT vec_id, v, label, cell FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, e.label, c.cell,
         |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                     z -> (z[1]-z[2])*(z[1]-z[2])))
         |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
         |      FROM emb e CROSS JOIN cents c))
         |  WHERE rk = 1),
         |a AS (SELECT cell, vec_id AS a_id, v AS av, label AS a_label
         |      FROM cells WHERE vec_id % ${s.LPROBE_MOD} = 0
         |        AND vec_id < ${s.LPROBE_ID_CAP}),
         |pairs AS (
         |  SELECT a.a_id, a.a_label, c.vec_id AS n_id, c.label AS n_label,
         |         floor(list_sum(list_transform(list_zip(a.av, c.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(a.av, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(c.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM cells c JOIN a ON c.cell = a.cell AND c.vec_id <> a.a_id),
         |pos AS (
         |  SELECT a_id, n_id AS pos_id, cos AS pos_cos
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY a_id ORDER BY cos DESC, n_id ASC) AS rk
         |        FROM pairs WHERE n_label = a_label)
         |  WHERE rk = 1),
         |neg AS (
         |  SELECT a_id, a_label, rk AS neg_rank, n_id AS neg_id, cos AS neg_cos
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY a_id ORDER BY cos DESC, n_id ASC) AS rk
         |        FROM pairs WHERE n_label <> a_label)
         |  WHERE rk <= ${s.HNEG_K})
         |SELECT n.a_id, n.a_label, p.pos_id,
         |       floor(p.pos_cos * 10000.0 + 0.5) / 10000.0 AS pos_cos,
         |       CAST(n.neg_rank AS INTEGER) AS neg_rank, n.neg_id,
         |       floor(n.neg_cos * 10000.0 + 0.5) / 10000.0 AS neg_cos,
         |       floor(p.pos_cos * 10000.0 + 0.5) / 10000.0
         |         - floor(n.neg_cos * 10000.0 + 0.5) / 10000.0 AS margin
         |FROM neg n JOIN pos p USING (a_id)""".stripMargin
    },

    // both rankings under the q22 discipline; margin = one IEEE
    // subtraction of two r4 values
    "q132_hard_negatives" -> {
      val s = graft.operators.Similarity
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |            FROM embeddings),
         |a AS (SELECT vec_id AS a_id, v AS av, label AS a_label
         |      FROM emb WHERE vec_id % ${s.LPROBE_MOD} = 0
         |        AND vec_id < ${s.LPROBE_ID_CAP}),
         |pairs AS (
         |  SELECT a.a_id, a.a_label, e.vec_id AS n_id, e.label AS n_label,
         |         floor(list_sum(list_transform(list_zip(a.av, e.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(a.av, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(e.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM emb e JOIN a ON e.vec_id <> a.a_id),
         |pos AS (
         |  SELECT a_id, n_id AS pos_id, cos AS pos_cos
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY a_id ORDER BY cos DESC, n_id ASC) AS rk
         |        FROM pairs WHERE n_label = a_label)
         |  WHERE rk = 1),
         |neg AS (
         |  SELECT a_id, a_label, rk AS neg_rank, n_id AS neg_id, cos AS neg_cos
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY a_id ORDER BY cos DESC, n_id ASC) AS rk
         |        FROM pairs WHERE n_label <> a_label)
         |  WHERE rk <= ${s.HNEG_K})
         |SELECT n.a_id, n.a_label, p.pos_id,
         |       floor(p.pos_cos * 10000.0 + 0.5) / 10000.0 AS pos_cos,
         |       CAST(n.neg_rank AS INTEGER) AS neg_rank, n.neg_id,
         |       floor(n.neg_cos * 10000.0 + 0.5) / 10000.0 AS neg_cos,
         |       floor(p.pos_cos * 10000.0 + 0.5) / 10000.0
         |         - floor(n.neg_cos * 10000.0 + 0.5) / 10000.0 AS margin
         |FROM neg n JOIN pos p USING (a_id)""".stripMargin
    },

    // centroid = DECIMAL sum of r6-quantized coordinates (order-free);
    // cosine is scale-invariant so the sum vector stands in for the
    // mean — no decimal division anywhere; intra mean = DECIMAL sum of
    // r6 cosines / count (the q106 pattern)
    // q143: embedding drift — per-label centroid cosine + mean-norm
    // ratio between the standing (vec_id % 4 <> 3) and incoming
    // slices; centroids as DECIMAL sums of r6 coordinates (q130 path)
    "q143_embedding_drift" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |            FROM embeddings),
         |sided AS (
         |  SELECT vec_id, v, label,
         |         CAST(vec_id % ${graft.operators.Similarity.SEM_INCR_MOD} =
         |              ${graft.operators.Similarity.SEM_INCR_MOD - 1} AS INTEGER) AS inc
         |  FROM emb),
         |dims AS (
         |  SELECT label, inc, i - 1 AS dim,
         |         CAST(floor(v[i] * 1000000.0 + 0.5) / 1000000.0
         |              AS DECIMAL(38,6)) AS xq
         |  FROM sided, UNNEST(generate_series(1, len(v))) AS t(i)),
         |cvec AS (
         |  SELECT label, inc, list(CAST(sx AS DOUBLE) ORDER BY dim) AS sv
         |  FROM (SELECT label, inc, dim, SUM(xq) AS sx FROM dims GROUP BY 1, 2, 3)
         |  GROUP BY 1, 2),
         |stats AS (
         |  SELECT label, inc, CAST(count(*) AS BIGINT) AS n,
         |         SUM(CAST(floor(sqrt(list_sum(list_transform(v, x -> x*x)))
         |                        * 1000000.0 + 0.5) / 1000000.0
         |                  AS DECIMAL(20,6))) AS snrm
         |  FROM sided GROUP BY 1, 2)
         |SELECT cs.label, ss.n AS n_standing, si.n AS n_incoming,
         |       floor(list_sum(list_transform(list_zip(cs.sv, ci.sv), z -> z[1]*z[2]))
         |             / (sqrt(list_sum(list_transform(cs.sv, x -> x*x)))
         |                * sqrt(list_sum(list_transform(ci.sv, x -> x*x))))
         |             * 10000.0 + 0.5) / 10000.0 AS centroid_cos,
         |       floor((CAST(si.snrm AS DOUBLE) / si.n)
         |             / (CAST(ss.snrm AS DOUBLE) / ss.n)
         |             * 10000.0 + 0.5) / 10000.0 AS norm_ratio
         |FROM cvec cs
         |JOIN cvec ci ON ci.label = cs.label AND cs.inc = 0 AND ci.inc = 1
         |JOIN stats ss ON ss.label = cs.label AND ss.inc = 0
         |JOIN stats si ON si.label = cs.label AND si.inc = 1""".stripMargin,

    "q130_label_separation" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |            FROM embeddings),
        |dims AS (
        |  SELECT label, i - 1 AS dim,
        |         CAST(floor(v[i] * 1000000.0 + 0.5) / 1000000.0
        |              AS DECIMAL(38,6)) AS xq
        |  FROM emb, UNNEST(generate_series(1, len(v))) AS t(i)),
        |cvec AS (
        |  SELECT label, list(CAST(sx AS DOUBLE) ORDER BY dim) AS sv
        |  FROM (SELECT label, dim, SUM(xq) AS sx FROM dims GROUP BY 1, 2)
        |  GROUP BY 1),
        |nvec AS (SELECT label, count(*) AS n_vecs FROM emb GROUP BY 1),
        |imean AS (
        |  SELECT label, SUM(CAST(icos AS DECIMAL(20,6))) AS s, count(*) AS n
        |  FROM (
        |    SELECT e.label,
        |           floor(list_sum(list_transform(list_zip(e.v, c.sv), z -> z[1]*z[2]))
        |                 / (sqrt(list_sum(list_transform(e.v, x -> x*x)))
        |                    * sqrt(list_sum(list_transform(c.sv, x -> x*x))))
        |                 * 1000000.0 + 0.5) / 1000000.0 AS icos
        |    FROM emb e JOIN cvec c USING (label))
        |  GROUP BY 1),
        |nn AS (
        |  SELECT label, nn_label, ccos
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY label ORDER BY ccos DESC, nn_label ASC) AS rk
        |        FROM (
        |          SELECT a.label, b.label AS nn_label,
        |                 floor(list_sum(list_transform(list_zip(a.sv, b.sv), z -> z[1]*z[2]))
        |                       / (sqrt(list_sum(list_transform(a.sv, x -> x*x)))
        |                          * sqrt(list_sum(list_transform(b.sv, x -> x*x))))
        |                       * 1000000.0 + 0.5) / 1000000.0 AS ccos
        |          FROM cvec a JOIN cvec b ON a.label <> b.label))
        |  WHERE rk = 1)
        |SELECT label, n_vecs, intra_cos, nn_label, nn_cos,
        |       intra_cos - nn_cos AS margin
        |FROM (
        |  SELECT i.label, nv.n_vecs,
        |         floor(CAST(i.s AS DOUBLE) / i.n * 10000.0 + 0.5) / 10000.0
        |           AS intra_cos,
        |         nn.nn_label,
        |         floor(nn.ccos * 10000.0 + 0.5) / 10000.0 AS nn_cos
        |  FROM imean i JOIN nvec nv USING (label) JOIN nn USING (label))""".stripMargin,

    "q23_kernel_matrix" ->
      s"""WITH $embCte,
         |a AS (SELECT vec_id AS a_id, v AS va FROM emb WHERE vec_id % 50 = 0),
         |b AS (SELECT vec_id AS b_id, v AS vb FROM emb WHERE vec_id % 37 = 0),
         |parts AS (
         |  SELECT a_id, b_id,
         |         CAST(len(va) AS DOUBLE) AS n,
         |         list_sum(list_transform(list_zip(va, vb), z -> z[1]*z[2])) AS dot,
         |         list_sum(va) AS sa, list_sum(vb) AS sb,
         |         list_sum(list_transform(va, x -> x*x)) AS qa,
         |         list_sum(list_transform(vb, x -> x*x)) AS qb,
         |         list_sum(list_transform(list_zip(va, vb),
         |                  z -> (z[1]-z[2])*(z[1]-z[2]))) AS sqd,
         |         len(list_filter(list_zip(va, vb), z -> z[1] > 0 AND z[2] > 0)) AS interb,
         |         len(list_filter(list_zip(va, vb), z -> z[1] > 0 OR z[2] > 0)) AS unionb
         |  FROM a, b),
         |k AS (
         |  SELECT a_id, b_id, n, dot, qa, qb, sqd, interb, unionb,
         |         sa / n AS ma, sb / n AS mb,
         |         dot / (sqrt(qa) * sqrt(qb)) AS cosv,
         |         1.0 / (sqrt(sqd) + 1.0) AS inveuc
         |  FROM parts)
         |SELECT a_id, b_id,
         |       floor(cosv * 10000.0 + 0.5) / 10000.0 AS cosine,
         |       floor((dot - n * ma * mb)
         |             / (sqrt(qa - n * ma * ma) * sqrt(qb - n * mb * mb))
         |             * 10000.0 + 0.5) / 10000.0 AS pearson,
         |       floor((CASE WHEN unionb = 0 THEN 0.0
         |              ELSE CAST(interb AS DOUBLE) / CAST(unionb AS DOUBLE) END)
         |             * 10000.0 + 0.5) / 10000.0 AS jaccard_bin,
         |       floor(inveuc * 10000.0 + 0.5) / 10000.0 AS inv_euclid,
         |       floor((CASE WHEN cosv = 0.0 THEN inveuc ELSE cosv END)
         |             * 10000.0 + 0.5) / 10000.0 AS sim_k5
         |FROM k""".stripMargin,

    "q41_emb_neardup" ->
      s"""WITH $embCte,
         |bkt AS (
         |  SELECT vec_id, v,
         |         (CASE WHEN v[1] > 0 THEN '1' ELSE '0' END) ||
         |         (CASE WHEN v[2] > 0 THEN '1' ELSE '0' END) ||
         |         (CASE WHEN v[3] > 0 THEN '1' ELSE '0' END) ||
         |         (CASE WHEN v[4] > 0 THEN '1' ELSE '0' END) AS bucket
         |  FROM emb),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket,
         |         floor(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(b.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM bkt a JOIN bkt b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, bucket,
         |       floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine
         |FROM pairs WHERE cos > 0.4""".stripMargin,

    "q49_neardup_banded" -> {
      val bandSelects = (0 until 4).map { b =>
        val bits = (1 to 4).map(i =>
          s"(CASE WHEN v[${b * 4 + i}] > 0 THEN '1' ELSE '0' END)").mkString(" || ")
        s"SELECT vec_id, v, $b AS band_id, $bits AS bucket FROM emb"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH $embCte,
         |bkt AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bkt a JOIN bkt b
         |    ON a.band_id = b.band_id AND a.bucket = b.bucket
         |   AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT c.id_a, c.id_b,
         |         floor(list_sum(list_transform(list_zip(ea.v, eb.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(ea.v, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(eb.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM cand c
         |  JOIN emb ea ON ea.vec_id = c.id_a
         |  JOIN emb eb ON eb.vec_id = c.id_b)
         |SELECT id_a, id_b,
         |       floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine
         |FROM pairs WHERE cos > 0.4""".stripMargin
    },

    "q42_ivf_ann" ->
      s"""WITH $embCte,
         |$ivfCentsCte,
         |cells AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, c.cell,
         |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                     z -> (z[1]-z[2])*(z[1]-z[2])))
         |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
         |      FROM emb e CROSS JOIN cents c))
         |  WHERE rk = 1),
         |q AS (SELECT cell, vec_id AS q_id, v AS qv FROM cells WHERE vec_id % 25 = 0),
         |pairs AS (
         |  SELECT q.q_id, q.cell, c.vec_id AS n_id,
         |         floor(list_sum(list_transform(list_zip(q.qv, c.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(c.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM cells c JOIN q ON c.cell = q.cell AND c.vec_id <> q.q_id)
         |SELECT q_id, cell, n_id,
         |       floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine,
         |       CAST(rk AS INTEGER) AS rk
         |FROM (SELECT *, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
         |      FROM pairs)
         |WHERE rk <= 5""".stripMargin,

    // q42b: the two-level coarse quantizer replayed end to end — the
    // √|cells| super pick, both argmin levels (r6(d2) asc, id asc),
    // and the q42 probe/top-k over the resulting assignment
    "q42b_ivf2_ann" -> {
      val s = graft.operators.Similarity
      def d2(a: String, b: String) =
        s"floor(list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2]))) * 1000000.0 + 0.5) / 1000000.0"
      s"""WITH $embCte,
         |$ivfCentsCte,
         |sm AS (SELECT greatest(1, CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) + 0.5)
         |                              AS BIGINT)) AS sm FROM cents),
         |supers AS (
         |  SELECT cell AS super, cv AS sv FROM cents, sm
         |  WHERE cell IN (${s.IVF_SEEDS.mkString(", ")})
         |     OR ${SqlFragments.baseHashSql(
                s"'${s.IVF_SUPER_SALT}' || CAST(cell AS VARCHAR)")} % sm.sm = 0),
         |cellsuper AS (
         |  SELECT cell, cv, super FROM (
         |    SELECT c.cell, c.cv, sp.super, row_number() OVER (
         |      PARTITION BY c.cell
         |      ORDER BY ${d2("c.cv", "sp.sv")} ASC, sp.super ASC) AS srk
         |    FROM cents c CROSS JOIN supers sp)
         |  WHERE srk = 1),
         |vsuper AS (
         |  SELECT vec_id, v, super FROM (
         |    SELECT e.vec_id, e.v, sp.super, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${d2("e.v", "sp.sv")} ASC, sp.super ASC) AS srk
         |    FROM emb e CROSS JOIN supers sp)
         |  WHERE srk = 1),
         |assigned AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT vs.vec_id, vs.v, cs.cell, row_number() OVER (
         |      PARTITION BY vs.vec_id
         |      ORDER BY ${d2("vs.v", "cs.cv")} ASC, cs.cell ASC) AS crk
         |    FROM vsuper vs JOIN cellsuper cs USING (super))
         |  WHERE crk = 1),
         |q AS (SELECT cell, vec_id AS q_id, v AS qv FROM assigned
         |      WHERE vec_id % 25 = 0),
         |pairs AS (
         |  SELECT q.q_id, q.cell, a.vec_id AS n_id,
         |         floor(list_sum(list_transform(list_zip(q.qv, a.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(q.qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(a.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM assigned a JOIN q ON a.cell = q.cell AND a.vec_id <> q.q_id)
         |SELECT q_id, cell, n_id,
         |       floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine,
         |       CAST(rk AS INTEGER) AS rk
         |FROM (SELECT *, row_number() OVER (
         |        PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
         |      FROM pairs)
         |WHERE rk <= ${s.IVF_TOP_K}""".stripMargin
    },

    "q113_cluster_balance" -> {
      val salt = graft.operators.Similarity.CBALANCE_SALT
      s"""WITH $embCte,
         |$ivfCentsCte,
         |cells AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, c.cell,
         |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                     z -> (z[1]-z[2])*(z[1]-z[2])))
         |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
         |      FROM emb e CROSS JOIN cents c))
         |  WHERE rk = 1),
         |tot AS (SELECT count(*) AS n_total FROM cells),
         |cn AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n
         |       FROM cells GROUP BY 1),
         |r AS (
         |  SELECT vec_id, cell, row_number() OVER (
         |           PARTITION BY cell ORDER BY draw ASC, vec_id ASC) AS rk
         |  FROM (SELECT vec_id, cell,
         |          ${SqlFragments.baseHashSql(s"'$salt' || CAST(vec_id AS VARCHAR)")} AS draw
         |        FROM cells)),
         |nc AS (SELECT count(*) AS n_cells FROM cents)
         |SELECT r.vec_id, r.cell, cn.cell_n,
         |       CAST(r.rk AS INTEGER) AS cell_rank,
         |       CAST(r.rk <= CAST(ceil(t.n_total / CAST(nc.n_cells AS DOUBLE))
         |                         AS BIGINT)
         |            AS INTEGER) AS kept
         |FROM r JOIN cn USING (cell), tot t, nc""".stripMargin
    },

    "q105_semantic_dedup" ->
      s"""WITH $embCte,
         |$ivfCentsCte,
         |cells AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, c.cell,
         |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                     z -> (z[1]-z[2])*(z[1]-z[2])))
         |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
         |      FROM emb e CROSS JOIN cents c))
         |  WHERE rk = 1),
         |dups AS (
         |  SELECT b.vec_id AS vec_id, count(*) AS n_better_dups
         |  FROM cells a JOIN cells b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE floor(list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2]))
         |              / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
         |                 * sqrt(list_sum(list_transform(b.v, x -> x*x))))
         |              * 1000000.0 + 0.5) / 1000000.0 >= ${graft.operators.Similarity.SEMDEDUP_TAU}
         |  GROUP BY b.vec_id)
         |SELECT c.vec_id, c.cell,
         |       CAST(coalesce(d.n_better_dups, 0) AS BIGINT) AS n_better_dups,
         |       CASE WHEN coalesce(d.n_better_dups, 0) = 0 THEN 1 ELSE 0 END AS kept
         |FROM cells c LEFT JOIN dups d ON c.vec_id = d.vec_id""".stripMargin,

    // q105b: incremental semantic dedup — codebook and cells from the
    // STANDING side only (vec_id % 4 <> 3); cross pairs new × existing
    "q105b_semdedup_incr" -> {
      val s = graft.operators.Similarity
      val m = s.SEM_INCR_MOD
      def argminCte(name: String, src: String) =
        s"""$name AS (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
           |    FROM (
           |      SELECT e.vec_id, e.v, c.cell,
           |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
           |                     z -> (z[1]-z[2])*(z[1]-z[2])))
           |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
           |      FROM $src e CROSS JOIN cents c))
           |  WHERE rk = 1)""".stripMargin
      val cosExpr =
        """floor(list_sum(list_transform(list_zip(n.v, s.v), z -> z[1]*z[2]))
          |            / (sqrt(list_sum(list_transform(n.v, x -> x*x)))
          |               * sqrt(list_sum(list_transform(s.v, x -> x*x))))
          |            * 1000000.0 + 0.5) / 1000000.0""".stripMargin
      s"""WITH $embCte,
         |sta AS (SELECT * FROM emb WHERE vec_id % $m <> ${m - 1}),
         |inc AS (SELECT * FROM emb WHERE vec_id % $m = ${m - 1}),
         |cents AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv FROM sta
         |  WHERE vec_id IN (${s.IVF_SEEDS.mkString(", ")})
         |     OR ${SqlFragments.baseHashSql(
                s"'${s.IVF_SEED_SALT}' || CAST(vec_id AS VARCHAR)")}
         |        % ${s.IVF_SEED_MOD} = 0),
         |${argminCte("scells", "sta")},
         |${argminCte("ncells", "inc")}
         |SELECT n.vec_id, s.vec_id AS existing_vec_id, n.cell,
         |       $cosExpr AS cos
         |FROM ncells n JOIN scells s USING (cell)
         |WHERE $cosExpr >= ${s.SEMDEDUP_TAU}""".stripMargin
    },

    // q105c: the incremental semdedup with BOTH sides assigned by the
    // q42b two-level rule — sm/supers/cell-attach derived from the
    // STANDING codebook, then the same cross-pair verify as q105b
    "q105c_semdedup_incr_ivf2" -> {
      val s = graft.operators.Similarity
      val m = s.SEM_INCR_MOD
      def d2(a: String, b: String) =
        s"floor(list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2]))) * 1000000.0 + 0.5) / 1000000.0"
      def assigned2(name: String, src: String) =
        s"""${name}_vs AS (
           |  SELECT vec_id, v, super FROM (
           |    SELECT e.vec_id, e.v, sp.super, row_number() OVER (
           |      PARTITION BY e.vec_id
           |      ORDER BY ${d2("e.v", "sp.sv")} ASC, sp.super ASC) AS srk
           |    FROM $src e CROSS JOIN supers sp)
           |  WHERE srk = 1),
           |$name AS (
           |  SELECT vec_id, v, cell FROM (
           |    SELECT vs.vec_id, vs.v, cs.cell, row_number() OVER (
           |      PARTITION BY vs.vec_id
           |      ORDER BY ${d2("vs.v", "cs.cv")} ASC, cs.cell ASC) AS crk
           |    FROM ${name}_vs vs JOIN cellsuper cs USING (super))
           |  WHERE crk = 1)""".stripMargin
      val cosExpr =
        """floor(list_sum(list_transform(list_zip(n.v, s.v), z -> z[1]*z[2]))
          |            / (sqrt(list_sum(list_transform(n.v, x -> x*x)))
          |               * sqrt(list_sum(list_transform(s.v, x -> x*x))))
          |            * 1000000.0 + 0.5) / 1000000.0""".stripMargin
      s"""WITH $embCte,
         |sta AS (SELECT * FROM emb WHERE vec_id % $m <> ${m - 1}),
         |inc AS (SELECT * FROM emb WHERE vec_id % $m = ${m - 1}),
         |cents AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell, v AS cv FROM sta
         |  WHERE vec_id IN (${s.IVF_SEEDS.mkString(", ")})
         |     OR ${SqlFragments.baseHashSql(
                s"'${s.IVF_SEED_SALT}' || CAST(vec_id AS VARCHAR)")}
         |        % ${s.IVF_SEED_MOD} = 0),
         |sm AS (SELECT greatest(1, CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) + 0.5)
         |                              AS BIGINT)) AS sm FROM cents),
         |supers AS (
         |  SELECT cell AS super, cv AS sv FROM cents, sm
         |  WHERE cell IN (${s.IVF_SEEDS.mkString(", ")})
         |     OR ${SqlFragments.baseHashSql(
                s"'${s.IVF_SUPER_SALT}' || CAST(cell AS VARCHAR)")} % sm.sm = 0),
         |cellsuper AS (
         |  SELECT cell, cv, super FROM (
         |    SELECT c.cell, c.cv, sp.super, row_number() OVER (
         |      PARTITION BY c.cell
         |      ORDER BY ${d2("c.cv", "sp.sv")} ASC, sp.super ASC) AS srk
         |    FROM cents c CROSS JOIN supers sp)
         |  WHERE srk = 1),
         |${assigned2("scells", "sta")},
         |${assigned2("ncells", "inc")}
         |SELECT n.vec_id, s.vec_id AS existing_vec_id, n.cell,
         |       $cosExpr AS cos
         |FROM ncells n JOIN scells s USING (cell)
         |WHERE $cosExpr >= ${s.SEMDEDUP_TAU}""".stripMargin
    },

    // q99 PQ contract row: cohort/corpus sizes and k are exact facts
    // the oracle recomputes; recall_ok certifies mean PQ recall@k ≥
    // the floor (the oracle pins it to 1 — a codebook/LUT regression
    // flips the Spark side and hash-fails the row)
    "q99_pq_ann" ->
      """SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 25 = 0) AS n_queries,
        |       (SELECT count(*) FROM embeddings) AS n_corpus,
        |       10 AS k, 1 AS recall_ok""".stripMargin,

    // q146 IVF×PQ contract row (q99 posture): cohort/corpus sizes, k
    // and the SIZED probe count (max(3, ceil(cells/8)) — recomputed
    // from the same corpus-growing codebook rule) are exact facts;
    // recall_ok pins to 1 so any regression in the composed layout —
    // cell assignment, probe sizing, codebooks, LUT join —
    // hash-fails the row
    // q151: residual IVFADC vs raw IVF×PQ on the clustered fixture —
    // cohort/corpus/probe facts are exact (the cents predicate is on
    // vec_id only, so amplification changes no count); residual_wins
    // pins to 1: on clustered data the residual chain must strictly
    // beat raw codes, so a regression in re-expression/LUT/ADC flips
    // the bit and hash-fails the row (the uniform-table inversion
    // stays spec-pinned in AnnRecallSpec as the honest negative)
    "q151_residual_ann" -> {
      val s = graft.operators.Similarity
      s"""WITH $embCte,
         |$ivfCentsCte
         |SELECT (SELECT count(*) FROM emb WHERE vec_id % 25 = 0) AS n_queries,
         |       (SELECT count(*) FROM emb) AS n_corpus,
         |       10 AS k,
         |       CAST(greatest(${s.IVFPQ_MIN_PROBES},
         |              CAST(ceil(CAST((SELECT count(*) FROM cents) AS DOUBLE)
         |                        / ${s.IVFPQ_PROBE_DEN}.0) AS BIGINT))
         |            AS INTEGER) AS probes,
         |       1 AS residual_wins""".stripMargin
    },

    // q150: the semdedup cell-index FOLD across the embedding-side
    // q144 fixture (adds ≡3, removes ≡4 mod DELTA_SNAP_MOD, negation
    // revisions ≡0 mod DELTA_REV_MOD). The oracle ignores the fold
    // entirely and derives the flat assignment from the NEW snapshot
    // — fold == derive is the maintenance invariant foldCellIndex
    // proves exactly (challenge vs added cells, orphan reassignment)
    "q150_cell_index_fold" -> q150Sql,

    // q150b: the SAME fold with the old index loaded from parquet —
    // the fold is exact wherever the old index came from, so the
    // identical SQL gates it; only the bench floor changes
    // (load-vs-derive)
    "q150b_cell_index_fold_ix" -> q150Sql,

    "q146_ivfpq_ann" -> {
      val s = graft.operators.Similarity
      s"""WITH $embCte,
         |$ivfCentsCte
         |SELECT (SELECT count(*) FROM emb WHERE vec_id % 25 = 0) AS n_queries,
         |       (SELECT count(*) FROM emb) AS n_corpus,
         |       10 AS k,
         |       CAST(greatest(${s.IVFPQ_MIN_PROBES},
         |              CAST(ceil(CAST((SELECT count(*) FROM cents) AS DOUBLE)
         |                        / ${s.IVFPQ_PROBE_DEN}.0) AS BIGINT))
         |            AS INTEGER) AS probes,
         |       1 AS recall_ok""".stripMargin
    }
  )
}
