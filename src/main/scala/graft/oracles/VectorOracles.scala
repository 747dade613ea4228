package graft.oracles

import graft.operators.{Analytics, Events, Expectations, Features, Gold, Graphs, PrefixJoin, Privacy, Relational, Scd2, TextOps, VectorOps}
import graft.util.Portable.Sql._
import graft.oracles.OracleDialect._

/** DuckDB oracle SQL — embeddings: dedup ladder, IVF/PQ index lifecycle, ANN serving. Entries moved verbatim from the
  * pre-split SparkEntry registry; keys and strings unchanged
  * (CORRECTNESS gates hash every one of them).
  */
object VectorOracles {

  val map: Map[String, String] = Map(
    "q35_knn_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${cosExpr("q", "c")} AS cos
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn FROM p)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5 ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    "q36_embedding_pairs" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id < 500),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb, ${cosExpr("a", "b")} AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT ida, idb, ${val6("cos")} AS cos_sim
         |FROM p WHERE cos >= 0.4 ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q50_ivf_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 10),
         |qc AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT q.query_id, q.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosCols("q.qv", "c.cv")} DESC NULLS LAST,
         |                 c.cid NULLS FIRST) AS rn
         |    FROM q CROSS JOIN c) WHERE rn <= 4),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |    ${cosCols("qc.qv", "a.embedding")} AS cos
         |  FROM qc JOIN assign a USING (cid)
         |  WHERE a.vec_id <> qc.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM cand)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q170: the kNN JOIN — q50's probe arithmetic with EVERY vector as
    // a query (no driver-side probe list; probes computed per row).,
    "q170_knn_join" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |qc AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT vec_id AS query_id, embedding AS qv, cid,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 2),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |    ${cosCols("qc.qv", "a.embedding")} AS cos
         |  FROM qc JOIN assign a USING (cid)
         |  WHERE a.vec_id <> qc.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM cand)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 3
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q171: MaxSim. Sub-vectors are 16-element slices; the per-sub max
    // is order-independent, and each max floor-scales to BIGINT
    // nano-units before the per-pair SUM, so the score is exact.,
    "q171_maxsim" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |subs AS (
         |  SELECT vec_id, i,
         |    embedding[(i * 16 + 1):((i + 1) * 16)] AS sv
         |  FROM e, UNNEST(range(0, 4)) AS u(i)),
         |p AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, q.i AS qi,
         |    MAX(list_reduce(list_transform(range(1, 17),
         |          t -> CAST(q.sv[t] AS DOUBLE) * CAST(d.sv[t] AS DOUBLE)),
         |          (x, y) -> x + y)
         |      / (sqrt(list_reduce(list_transform(q.sv,
         |           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
         |       * sqrt(list_reduce(list_transform(d.sv,
         |           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))))
         |      AS mx
         |  FROM subs q JOIN subs d
         |    ON q.vec_id < 8 AND q.vec_id <> d.vec_id
         |  GROUP BY 1, 2, 3),
         |m AS (SELECT query_id, neighbor_id,
         |    SUM(CAST(FLOOR(mx * 1000000000.0 + 0.5) AS BIGINT)) AS maxsim9
         |  FROM p GROUP BY 1, 2),
         |r AS (SELECT query_id, neighbor_id, maxsim9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY maxsim9 DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM m)
         |SELECT query_id, rn AS "rank", neighbor_id,
         |  CAST(maxsim9 AS DOUBLE) / 1000000000.0 AS maxsim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q172: token-budget mixture sampling — hash-ordered per-lang
    // prefix sum against a ⌊2/5⌋ budget; the boundary-crossing doc is
    // kept ("fill the budget").,
    "q175_pq_knn" -> pqSql,
    "q177_ivfadc" -> ivfadcSql,

    // q293: the ADC shortlist refined by exact cosine — stage 1 is
    // q177's candidate pipeline verbatim; stage 2 re-scores only the
    // top-20 shortlist rows with the raw vectors.,
    "q293_ivfadc_rerank" -> ivfadcRerankSql,

    // q294: Gonzalez greedy k-center — 7 unrolled max-min rounds over
    // micro-scaled integer cosine distances, then nearest-center
    // assignment; the oracle replays the selection round-for-round.,
    "q294_kcenter_select" -> kcenterSql,

    // q178: unigram-LM scoring. Per-token ln p floor-scales to BIGINT
    // nano-units before the per-doc sum; the smoothed model
    // probabilities are exact rationals, one IEEE division each.,
    "q179_label_outliers" ->
      s"""WITH le AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |    embedding FROM embeddings),
         |comp AS (SELECT label, generate_subscripts(embedding, 1) AS pos,
         |    unnest(embedding) AS x FROM le),
         |cm AS (SELECT label, pos,
         |    CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
         |      AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS m
         |  FROM comp GROUP BY 1, 2),
         |cl AS (SELECT label, list(m ORDER BY pos) AS c FROM cm GROUP BY 1),
         |d AS (SELECT e.vec_id, e.label,
         |    ${kmDistExpr(64)("e.embedding", "cl.c")} AS d2
         |  FROM le e JOIN cl USING (label)),
         |d3t AS (SELECT vec_id, label, d2,
         |    CAST(FLOOR(d2 * 1000.0 + 0.5) AS BIGINT) AS d3 FROM d),
         |s AS (SELECT label, COUNT(*) AS n,
         |    SUM(d3) AS s1, SUM(d3 * d3) AS s2 FROM d3t GROUP BY 1),
         |f AS (SELECT t.vec_id, t.label, t.d2, t.d3,
         |    CAST(s1 AS DOUBLE) / 1000.0 / n AS mean,
         |    CAST(s2 AS DOUBLE) / 1000000.0 / n
         |      - (CAST(s1 AS DOUBLE) / 1000.0 / n)
         |        * (CAST(s1 AS DOUBLE) / 1000.0 / n) AS var
         |  FROM d3t t JOIN s USING (label)),
         |zt AS (SELECT vec_id, label, d2,
         |    CASE WHEN var <= 0.0 THEN 0.0
         |         ELSE (CAST(d3 AS DOUBLE) / 1000.0 - mean) / sqrt(var)
         |    END AS z
         |  FROM f)
         |SELECT vec_id, label, ${val6("d2")} AS dist2, ${val6("z")} AS z,
         |  z > 2.0 AS is_outlier
         |FROM zt ORDER BY vec_id NULLS FIRST""".stripMargin,

    // q180: per-source data card. Entropy terms and per-doc TTRs
    // floor-scale to integers before their cross-row sums; the dup rate
    // rides the q33 pair CTEs at source grain.,
    "q197_retrieval_eval" -> {
      def caseD(rankCol: String) =
        "CASE " + rankCol + " " + VectorOps.NdcgDiscounts.zipWithIndex
          .map { case (d, i) => s"WHEN ${i + 1} THEN $d" }
          .mkString(" ") + " ELSE 0.0 END"
      s"""WITH $ivfServeCtes,
         |$bruteRankCtes,
         |tr AS (SELECT query_id, neighbor_id, CAST(rn AS INTEGER)
         |    AS trank FROM br WHERE rn <= 5),
         |sv AS (SELECT query_id, neighbor_id, CAST(rn AS INTEGER)
         |    AS srank FROM r WHERE rn <= 5),
         |g AS (SELECT sv.query_id, sv.srank,
         |    CASE WHEN tr.trank IS NULL THEN 0 ELSE 6 - tr.trank END
         |      AS gain
         |  FROM sv LEFT JOIN tr ON sv.query_id = tr.query_id
         |    AND sv.neighbor_id = tr.neighbor_id),
         |gc AS (SELECT query_id,
         |    CAST(SUM(CAST(FLOOR(CAST(gain AS DOUBLE)
         |      * (${caseD("srank")}) * 1000000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS dcg9,
         |    MIN(CASE WHEN gain > 0 THEN srank END) AS fr
         |  FROM g GROUP BY 1),
         |ic AS (SELECT query_id,
         |    CAST(SUM(CAST(FLOOR(CAST(6 - trank AS DOUBLE)
         |      * (${caseD("trank")}) * 1000000000.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS idcg9
         |  FROM tr GROUP BY 1)
         |SELECT gc.query_id,
         |  CASE WHEN fr IS NULL THEN 0.0
         |    ELSE CAST(CAST(FLOOR(1000000000.0 / fr + 0.5) AS BIGINT)
         |      AS DOUBLE) / 1000000000.0 END AS mrr,
         |  CAST(dcg9 AS DOUBLE) / 1000000000.0 AS dcg,
         |  CAST(dcg9 AS DOUBLE) / CAST(idcg9 AS DOUBLE) AS ndcg
         |FROM gc JOIN ic USING (query_id)
         |ORDER BY gc.query_id""".stripMargin
    },

    // q198: media corpus card — q156's decode CTEs aggregated at
    // format grain; integer sums make the means exact.,
    "q203_label_noise" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |    CAST(label AS BIGINT) AS label FROM embeddings),
         |p AS (SELECT q.vec_id AS query_id, q.label AS qlabel,
         |    c.vec_id AS neighbor_id, c.label AS nlabel,
         |    ${cosExpr("q", "c")} AS cos
         |  FROM e q JOIN e c ON q.vec_id % 4 = 0
         |    AND q.vec_id <> c.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST)
         |    AS rn FROM p),
         |t AS (SELECT * FROM r WHERE rn <= 10),
         |d AS (SELECT query_id, qlabel,
         |    CAST(SUM(CASE WHEN nlabel <> qlabel THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_disagree
         |  FROM t GROUP BY 1, 2),
         |m AS (SELECT query_id, nlabel AS majority_label FROM (
         |    SELECT query_id, nlabel, ROW_NUMBER() OVER (
         |      PARTITION BY query_id
         |      ORDER BY COUNT(*) DESC, nlabel NULLS FIRST) AS mr
         |    FROM t GROUP BY 1, 2) WHERE mr = 1)
         |SELECT d.query_id, d.qlabel AS label, d.n_disagree,
         |  m.majority_label, d.n_disagree * 2 > 10 AS suspect
         |FROM d JOIN m USING (query_id)
         |ORDER BY query_id NULLS FIRST""".stripMargin,

    // q204: triangle stats — the oracle counts triangles id-ordered
    // (e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c)); Spark's degree-oriented plan must
    // land on the identical triangle set. The ol CTE mirrors the Spark
    // side's MaxBasketWidth=32 cap (slice of the id-sorted part set per
    // order) so a fixture with a >32-part order diverges LOUDLY in
    // neither engine rather than silently in one.,
    "q195_embedding_drift" ->
      s"""WITH $pcaPowerCtes,
         |bkt AS (SELECT label,
         |    LEAST(GREATEST(CAST(FLOOR(proj * 2.0) AS BIGINT), -8), 7)
         |      AS bucket
         |  FROM p),
         |g AS (SELECT 'embedding' AS event_type, bucket,
         |    CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN label < 5 THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_b
         |  FROM bkt GROUP BY 2),
         |t AS (SELECT *,
         |    SUM(n_a) OVER (PARTITION BY event_type) AS tot_a,
         |    SUM(n_b) OVER (PARTITION BY event_type) AS tot_b FROM g),
         |c AS (SELECT event_type, bucket, n_a, n_b,
         |    CAST(FLOOR((CAST(n_a + 1 AS DOUBLE) / (tot_a + 10)
         |        - CAST(n_b + 1 AS DOUBLE) / (tot_b + 10))
         |      * ln((CAST(n_a + 1 AS DOUBLE) / (tot_a + 10))
         |          / (CAST(n_b + 1 AS DOUBLE) / (tot_b + 10)))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
         |  FROM t)
         |SELECT event_type, bucket, n_a, n_b,
         |  CAST(c9 AS DOUBLE) / 1000000000.0 AS contrib,
         |  CAST(SUM(c9) OVER (PARTITION BY event_type) AS DOUBLE)
         |    / 1000000000.0 AS psi
         |FROM c
         |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,

    // q193: behavioral sequences. Ordered list aggregation with the
    // (ts, event_id) tiebreak; the serialized prefix is the first 30
    // events per user.,
    "q190_cluster_data_card" ->
      s"""WITH ${kmTrainCtes(8, 64, "")},
         |${kmAssignCte(64)("embeddings", "c2", "a2")},
         |al AS (SELECT a2.vec_id, a2.cid, a2.d,
         |    CAST(e.label AS BIGINT) AS label
         |  FROM a2 JOIN embeddings e USING (vec_id)),
         |n AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(SUM(CAST(FLOOR(d * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS sd3
         |  FROM al GROUP BY 1),
         |lc AS (SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM al GROUP BY 1, 2),
         |dom AS (SELECT cid, label AS dominant_label, c AS n_dom FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
         |      ORDER BY c DESC, label) AS rn
         |    FROM lc) WHERE rn = 1),
         |ent AS (SELECT lc.cid,
         |    SUM(CAST(FLOOR(-((CAST(c AS DOUBLE) / n_vecs)
         |        * ln(CAST(c AS DOUBLE) / n_vecs))
         |      * 1000000000.0 + 0.5) AS BIGINT)) AS se9
         |  FROM lc JOIN n USING (cid) GROUP BY 1)
         |SELECT n.cid, n.n_vecs, dom.dominant_label,
         |  CAST(dom.n_dom AS DOUBLE) / n.n_vecs AS purity,
         |  CAST(se9 AS DOUBLE) / 1000000000.0 AS label_entropy,
         |  ${val6("CAST(sd3 AS DOUBLE) / 1000.0 / n.n_vecs")} AS mean_d2
         |FROM n JOIN dom USING (cid) JOIN ent ON ent.cid = n.cid
         |ORDER BY n.cid""".stripMargin,

    // q187: continuous top-k leaderboard. The drained streaming keyed
    // agg must equal this batch form bit-for-bit; revenue accumulates
    // as floor-scaled integer cents, ties break on user_id.,
    "q185_pca_power" -> pcaPowerSql,

    // q161 serves the IDENTICAL q50 contract from the persisted
    // single-probe index with literal bucket pruning; storage layout
    // must never change results, so the oracle is q50's verbatim.,
    "q161_ivf_knn_indexed" ->
      s"""WITH $ivfServeCtes
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q186: recall@5 audit of the served IVF path against the exact
    // brute-force ranking — composed verbatim from q161's serve CTEs
    // and q35's brute contract; the audit itself is pure id-set
    // arithmetic (no new float surface).,
    "q186_ann_recall_audit" ->
      s"""WITH $ivfServeCtes,
         |iv AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
         |$bruteRankCtes,
         |bt AS (SELECT query_id, neighbor_id FROM br WHERE rn <= 5),
         |j AS (SELECT bt.query_id,
         |    CAST(COUNT(iv.neighbor_id) AS BIGINT) AS hits
         |  FROM bt LEFT JOIN iv ON bt.query_id = iv.query_id
         |    AND bt.neighbor_id = iv.neighbor_id
         |  GROUP BY 1)
         |SELECT query_id, hits, CAST(hits AS DOUBLE) / 5.0 AS recall_at_5
         |FROM j ORDER BY query_id NULLS FIRST""".stripMargin,

    // q163 serves from the UNIFIED index: trained on the prev snapshot
    // (vec_id % 6 <> 0), persisted bucketed, delta APPENDED against the
    // frozen trained centroids, multi-probe served with bucket pruning.
    // Prev-assign ∪ delta-assign ≡ full assignment (per-row function of
    // the frozen centroids), so the oracle replays training on the prev
    // corpus + FULL single-probe assignment + top-4 probes + top-5 rank
    // — and never learns the index, the append, or the buckets exist.,
    "q163_ivf_unified" ->
      s"""WITH pe AS (SELECT vec_id, embedding FROM embeddings
         |      WHERE vec_id % 6 <> 0),
         |${kmTrainCtes(16, 64, "u", "pe")},
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, tc.cid,
         |    ${cosCols("e.embedding", "tc.c")} AS ccos
         |  FROM e CROSS JOIN uc2 tc),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
         |      WHERE vec_id < 10),
         |qc AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT q.query_id, q.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosCols("q.qv", "c.c")} DESC NULLS LAST,
         |                 c.cid NULLS FIRST) AS rn
         |    FROM q CROSS JOIN uc2 c) WHERE rn <= 4),
         |cand AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |    ${cosCols("qc.qv", "a.embedding")} AS cos
         |  FROM qc JOIN assign a USING (cid)
         |  WHERE a.vec_id <> qc.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM cand)
         |SELECT query_id, rn AS "rank", neighbor_id, ${val6("cos")} AS cos_sim
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q164: the Spark side folds the lexicon into one scan-local
    // aggregate lambda (no explode, no join); the oracle states the
    // equivalent token-unnest ⋈ VALUES broadcast-join form — the gate
    // proves the two formulations agree. Lexicon literals come from the
    // ONE Scala definition (TextOps.sentimentLex).,
    "q166_int8_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |s AS (SELECT vec_id, embedding,
         |    CASE WHEN m = 0 THEN 1.0 ELSE m END AS scale
         |  FROM (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding,
         |      x -> abs(CAST(x AS DOUBLE)))) AS m FROM e)),
         |c AS (SELECT vec_id, embedding,
         |    list_transform(embedding, x ->
         |      CAST(FLOOR(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)
         |        AS BIGINT)) AS codes
         |  FROM s),
         |n AS (SELECT vec_id, embedding, codes,
         |    list_reduce(list_transform(codes, v -> v * v),
         |      (x, y) -> x + y) AS n8
         |  FROM c),
         |p AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
         |    CAST(list_reduce(list_transform(range(1, len(q.codes) + 1),
         |        i -> q.codes[i] * t.codes[i]), (x, y) -> x + y) AS DOUBLE)
         |      / (sqrt(CAST(q.n8 AS DOUBLE)) * sqrt(CAST(t.n8 AS DOUBLE)))
         |      AS cosq,
         |    ${cosCols("q.embedding", "t.embedding")} AS cosf
         |  FROM n q JOIN n t ON q.vec_id < 10 AND q.vec_id <> t.vec_id),
         |r AS (SELECT query_id, neighbor_id, cosq, cosf,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosq DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
         |  FROM p)
         |SELECT query_id, rn AS "rank", neighbor_id,
         |  ${val6("cosq")} AS cos_q8, ${val6("cosf")} AS cos_f32
         |FROM r WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q167/q168: the DeltaLog history is a closed-form function of the
    // key (epoch e inserts o_orderkey%8=e, re-prices every third key of
    // e-1, deletes every fifth key of e-2), so the oracle states the
    // expected feed/snapshot directly from `orders` while the Spark
    // side reproduces it through the real log machinery (markers,
    // last-write-wins, delete masking, epoch bounds).,
    "q76_kmeans_vq" -> kmeansSql,

    "q219_coreset" -> coresetSql,

    // q229: cluster-balanced sampling — q184's √-weight exact-quota
    // arithmetic over the q76 trainer's assignment.,
    "q229_cluster_balanced" ->
      s"""WITH ${kmTrainCtes(8, 64, "")},
         |${kmAssignCte(64)("embeddings", "c2", "a2")},
         |asg AS (SELECT vec_id, cid FROM a2),
         |cc AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM asg GROUP BY 1),
         |w AS (SELECT cid, c,
         |    CAST(FLOOR(sqrt(CAST(c AS DOUBLE)) * 1000000000.0 + 0.5)
         |      AS BIGINT) AS w9
         |  FROM cc),
         |tot AS (SELECT CAST(SUM(w9) AS BIGINT) AS ww,
         |    (SELECT COUNT(*) // 2 FROM embeddings) AS b FROM w),
         |t AS (SELECT cid, c, (b * w9) // ww AS n_target
         |  FROM w CROSS JOIN tot),
         |r AS (SELECT vec_id, cid,
         |    CAST('0x' || substr(md5('cbal:' || vec_id), 1, 8) AS BIGINT)
         |      AS hk
         |  FROM asg),
         |rk AS (SELECT vec_id, cid, ROW_NUMBER() OVER (
         |    PARTITION BY cid ORDER BY hk, vec_id) AS rn
         |  FROM r)
         |SELECT rk.vec_id, rk.cid, t.c AS cluster_size, t.n_target,
         |  CAST(rn AS INT) AS "rank", rn <= t.n_target AS keep
         |FROM rk JOIN t USING (cid)
         |ORDER BY vec_id NULLS FIRST""".stripMargin,

    // q221: WOE/IV screening — one ln per bin on a ratio of exact
    // integer products, micro-floor-scaled; the IV numerator
    // accumulates as exact longs and divides out once.,
    "q231_embedding_dedup_deletes" ->
      s"""WITH RECURSIVE c AS (SELECT vec_id AS cid, embedding AS cv
         |  FROM embeddings WHERE vec_id < 16),
         |e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 7 <> 3),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // q233: one epoch, both CDC verbs — appends (vec_id % 6 = 0)
    // land while prev keys (% 6 <> 0 AND % 7 = 3) retract. Spark
    // composes the q158 append path with the q231 delete path over
    // the stored prev artifacts; the oracle recomputes the full chain
    // over the POST-EPOCH corpus with the frozen prev centroids
    // (first-16 of the prev snapshot — frozen even where deleted).,
    "q233_dedup_upsert_delete" -> ivfPostEpochOracle,

    // q235: the streaming maintainer drains the SAME epoch as a
    // two-batch replay (seed build + CDC batch) against DeltaLog
    // state tables and must land on the identical post-epoch state —
    // the gate proves streaming-incremental ≡ staged-incremental
    // (q233) ≡ the oracle's full rebuild.,
    "q153_embedding_dedup_indexed" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // q158: the Spark side answers INCREMENTALLY (staged prev index +
    // broadcast delta probe + affected-cluster-only closure); the
    // oracle recomputes the FULL chain over all vectors against the
    // index's FROZEN centroids (the prev corpus's first-K — vec_id < 16
    // AND vec_id % 6 <> 0). Hash match proves incremental ≡ full.,
    "q158_embedding_dedup_incremental" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e
         |  WHERE vec_id < 16 AND vec_id % 6 <> 0),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical,
         |  CASE WHEN v.vec_id % 6 = 0 THEN 'appended' ELSE 'indexed' END
         |    AS status
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // q155 swaps the centroid source: the kmeans trainer's two Lloyd
    // rounds at K=16 (the exact q76 loop, shared CTE builders) feed the
    // multi-probe assignment; candidates/closure/verdict are q141's.
    // The oracle replays training (integer-sum updates → bit-identical
    // centroids), then the same cosine probe and CC closure.,
    "q155_embedding_dedup_trained" ->
      s"""WITH RECURSIVE ${kmTrainCtes(16, 64, "t")},
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, tc.cid,
         |    ${cosCols("e.embedding", "tc.c")} AS ccos
         |  FROM e CROSS JOIN tc2 tc),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // Our native jaro_winkler expression is pinned bit-exact to
    // DuckDB's jaro_winkler_similarity; both sides cut on the
    // val6-rounded score so the threshold can't flip on a boundary.,
    "q113_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |  CAST(i.i - 1 AS BIGINT) AS pos, COUNT(*) AS n_vecs,
        |  CAST(CAST(SUM(CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS centroid
        |FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
        |GROUP BY label, i.i
        |ORDER BY label NULLS FIRST, pos NULLS FIRST""".stripMargin,

    // LATERAL with ORDER BY + LIMIT: DuckDB executes the lateral
    // directly; Spark decorrelates it to a per-key window limit.,
    "q138_embedding_dedup" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id < 500),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb, ${cosExpr("a", "b")} AS cos
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
         |pairs AS (SELECT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c ON v.vec_id = c.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // At-scale dedup (no id cap): q50's deterministic IVF assignment
    // generates the candidate pairs (same centroids, same argmax
    // tiebreak), then the q65/q138 recursive closure — the oracle
    // replays the bucketing's recall loss exactly.,
    "q141_embedding_dedup_ivf" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn <= 4),
         |p AS (
         |  SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    ${cosCols("a.embedding", "b.embedding")} AS cos
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |pairs AS (SELECT DISTINCT ida, idb FROM p WHERE cos >= 0.4),
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e2.d FROM reach w JOIN edges e2 ON w.r = e2.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id)
         |SELECT v.vec_id,
         |  COALESCE(c2.component, v.vec_id) AS component,
         |  COUNT(*) OVER (PARTITION BY COALESCE(c2.component, v.vec_id))
         |    AS cluster_size,
         |  v.vec_id = COALESCE(c2.component, v.vec_id) AS is_canonical
         |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
         |ORDER BY v.vec_id NULLS FIRST""".stripMargin,

    // eval membership (doc_id % 25 = 0) and the 4-gram construction are
    // both deterministic, so the oracle rebuilds the exact same
    // contamination set,

    // q287: per-prefix exact top-k vs the full-dim truth set; every
    // prefix cosine is the identical left-to-right fold (cosColsPrefix
    // mirrors VectorOps.cosPrefixes' accumulator snapshots), recall is
    // an exact integer ratio.,
    "q287_matryoshka_recall" -> {
      val prefixes = Seq(8, 16, 32, 64)
      val tops = prefixes.map { d =>
        s"""t$d AS (SELECT $d AS prefix_dim, query_id, neighbor_id
           |  FROM (SELECT query_id, neighbor_id,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY ${cosColsPrefix("qv", "cv", d)} DESC NULLS LAST,
           |      neighbor_id NULLS FIRST) AS rn
           |  FROM p) WHERE rn <= 5)""".stripMargin
      }.mkString(",\n")
      val union = prefixes
        .map(d => s"SELECT * FROM t$d").mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    q.embedding AS qv, c.embedding AS cv
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |$tops,
         |tops AS ($union),
         |truth AS (SELECT query_id, neighbor_id
         |  FROM t${prefixes.last})
         |SELECT t.prefix_dim,
         |  CAST(COUNT(tr.neighbor_id) AS BIGINT) AS hits,
         |  CAST(COUNT(DISTINCT t.query_id) AS BIGINT) AS n_queries,
         |  CAST(COUNT(tr.neighbor_id) AS DOUBLE)
         |    / CAST(COUNT(DISTINCT t.query_id) * 5 AS DOUBLE)
         |    AS recall_at_k
         |FROM tops t LEFT JOIN truth tr
         |  ON t.query_id = tr.query_id AND t.neighbor_id = tr.neighbor_id
         |GROUP BY t.prefix_dim
         |ORDER BY t.prefix_dim NULLS FIRST""".stripMargin
    },

    // q314: binary-quantization serve — sign bits packed 32/word as
    // power-of-two sums, Hamming = bit_count(xor) over the two words,
    // exact-cosine re-rank of the 32-deep shortlist.,
    "q314_bq_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id, embedding,
         |    list_reduce(list_transform(range(1, 33),
         |      i -> CASE WHEN embedding[i] >= 0
         |        THEN CAST(1 AS BIGINT) << (i - 1)
         |        ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y) AS w0,
         |    list_reduce(list_transform(range(33, 65),
         |      i -> CASE WHEN embedding[i] >= 0
         |        THEN CAST(1 AS BIGINT) << (i - 33)
         |        ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y) AS w1
         |  FROM e),
         |q AS (SELECT vec_id AS query_id, embedding AS qv,
         |    w0 AS q0, w1 AS q1 FROM c WHERE vec_id < 10),
         |h AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    bit_count(xor(q.q0, c.w0)) + bit_count(xor(q.q1, c.w1))
         |      AS hamming,
         |    q.qv, c.embedding AS nv
         |  FROM q JOIN c ON q.query_id <> c.vec_id),
         |sh AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY hamming NULLS FIRST, neighbor_id NULLS FIRST)
         |    AS hrn FROM h),
         |rr AS (SELECT query_id, neighbor_id, hamming,
         |    ${cosCols("qv", "nv")} AS cos
         |  FROM sh WHERE hrn <= 32),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST)
         |    AS rn FROM rr)
         |SELECT query_id, rn AS "rank", neighbor_id, hamming,
         |  ${val6("cos")} AS cos_sim
         |FROM rk WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q327: BQ-over-IVF — q50's coarse prune CTEs + q314's sign-code
    // packing inside the surviving buckets + exact-cosine re-rank of
    // the 32-deep shortlist.,
    "q327_bq_ivf_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cv FROM e
         |  WHERE vec_id < 16),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosCols("e.embedding", "c.cv")} AS ccos
         |  FROM e CROSS JOIN c),
         |assign AS (
         |  SELECT vec_id, embedding, cid,
         |    list_reduce(list_transform(range(1, 33),
         |      i -> CASE WHEN embedding[i] >= 0
         |        THEN CAST(1 AS BIGINT) << (i - 1)
         |        ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y) AS w0,
         |    list_reduce(list_transform(range(33, 65),
         |      i -> CASE WHEN embedding[i] >= 0
         |        THEN CAST(1 AS BIGINT) << (i - 33)
         |        ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y) AS w1
         |  FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
         |    FROM ac) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS qv,
         |    w0 AS q0, w1 AS q1 FROM assign WHERE vec_id < 10),
         |qc AS (
         |  SELECT query_id, cid FROM (
         |    SELECT q.query_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${cosCols("q.qv", "c.cv")} DESC NULLS LAST,
         |                 c.cid NULLS FIRST) AS rn
         |    FROM q CROSS JOIN c) WHERE rn <= 4),
         |h AS (
         |  SELECT qc.query_id, a.vec_id AS neighbor_id,
         |    bit_count(xor(q.q0, a.w0)) + bit_count(xor(q.q1, a.w1))
         |      AS hamming
         |  FROM qc JOIN assign a USING (cid)
         |  JOIN q ON q.query_id = qc.query_id
         |  WHERE a.vec_id <> qc.query_id),
         |sh AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY hamming NULLS FIRST, neighbor_id NULLS FIRST)
         |    AS hrn FROM h),
         |rr AS (SELECT sh.query_id, sh.neighbor_id, sh.hamming,
         |    ${cosCols("q.qv", "n.embedding")} AS cos
         |  FROM sh JOIN q ON q.query_id = sh.query_id
         |  JOIN e n ON n.vec_id = sh.neighbor_id
         |  WHERE sh.hrn <= 32),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST)
         |    AS rn FROM rr)
         |SELECT query_id, rn AS "rank", neighbor_id, hamming,
         |  ${val6("cos")} AS cos_sim
         |FROM rk WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q316: margin-based bitext mining — nano-floored cosines, 4-NN
    // neighborhood sums in each direction, the margin ONE fixed IEEE
    // tree over exact integers, micro-floored before ranking.,
    "q316_bitext_margin" ->
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
         |s AS (SELECT vec_id, embedding FROM e WHERE label < 5),
         |t AS (SELECT vec_id, embedding FROM e WHERE label >= 5),
         |fp AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    CAST(FLOOR((${cosExpr("q", "c")})
         |      * 1000000000.0 + 0.5) AS BIGINT) AS cos9
         |  FROM s q JOIN t c
         |  ON q.vec_id < 30 AND q.vec_id <> c.vec_id),
         |fr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cos9 DESC NULLS LAST, cid NULLS FIRST) AS rn
         |  FROM fp),
         |fwd AS (SELECT qid, cid, cos9 FROM fr WHERE rn <= 4),
         |sf AS (SELECT qid, CAST(SUM(cos9) AS BIGINT) AS sf9
         |  FROM fwd GROUP BY 1),
         |bp AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    CAST(FLOOR((${cosExpr("q", "c")})
         |      * 1000000000.0 + 0.5) AS BIGINT) AS cos9
         |  FROM t q JOIN s c
         |  ON q.vec_id IN (SELECT DISTINCT cid FROM fwd)
         |    AND q.vec_id <> c.vec_id),
         |br AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY cos9 DESC NULLS LAST, cid NULLS FIRST) AS rn
         |  FROM bp),
         |sb AS (SELECT qid AS cand_id, CAST(SUM(cos9) AS BIGINT) AS sb9
         |  FROM br WHERE rn <= 4 GROUP BY 1),
         |m AS (SELECT fwd.qid AS src_id, fwd.cid AS tgt_id, fwd.cos9,
         |    CAST(FLOOR((8.0 * CAST(fwd.cos9 AS DOUBLE))
         |      / CAST(sf.sf9 + sb.sb9 AS DOUBLE)
         |      * 1000000.0 + 0.5) AS BIGINT) AS margin6
         |  FROM fwd JOIN sf USING (qid)
         |  JOIN sb ON fwd.cid = sb.cand_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
         |    ORDER BY margin6 DESC NULLS LAST, tgt_id NULLS FIRST)
         |    AS mrn FROM m)
         |SELECT src_id, tgt_id,
         |  CAST(cos9 AS DOUBLE) / 1000000000.0 AS cos_sim,
         |  CAST(margin6 AS DOUBLE) / 1000000.0 AS margin,
         |  margin6 >= 1050000 AS accepted
         |FROM r WHERE mrn = 1 ORDER BY src_id NULLS FIRST""".stripMargin,
  )
}
