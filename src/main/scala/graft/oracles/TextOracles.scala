package graft.oracles

import graft.operators.{Analytics, Events, Expectations, Features, Gold, Graphs, PrefixJoin, Privacy, Relational, Scd2, TextOps, VectorOps}
import graft.util.Portable.Sql._
import graft.oracles.OracleDialect._

/** DuckDB oracle SQL — text/corpus curation, retrieval, tokenizers, privacy, multimodal. Entries moved verbatim from the
  * pre-split SparkEntry registry; keys and strings unchanged
  * (CORRECTNESS gates hash every one of them).
  */
object TextOracles {

  /** The q290 fusion CTE chain (BM25 + dense-chunk scoring + both
    * rank lists + the RRF-scored `fr`) — shared by q290, the q306
    * fused RAG context, and the q307 agreement mart. Ends with:
    * `lexr(query_id, doc_id, lr)` (full lexical ranks),
    * `dr(query_id, doc_id, dnr)` (full dense ranks),
    * `fr(query_id, doc_id, lex_rank, dense_rank, rrf9, rn)`. */
  private lazy val rrfCtes: String =
    s"""$bm25Ctes,
       |$denseChunkCtes,
       |lexr AS (SELECT query_id, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s9 DESC NULLS LAST, doc_id NULLS FIRST)
       |      AS BIGINT) AS lr
       |  FROM bs),
       |lexk AS (SELECT * FROM lexr WHERE lr <= 20),
       |dd AS (SELECT query_id, doc_id, MAX(score) AS ds
       |  FROM p GROUP BY 1, 2),
       |dr AS (SELECT query_id, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ds DESC NULLS LAST, doc_id NULLS FIRST)
       |      AS BIGINT) AS dnr
       |  FROM dd),
       |dk AS (SELECT * FROM dr WHERE dnr <= 20),
       |fused AS (SELECT COALESCE(l.query_id, d.query_id) AS query_id,
       |    COALESCE(l.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(l.lr, -1) AS lex_rank,
       |    COALESCE(d.dnr, -1) AS dense_rank
       |  FROM lexk l FULL OUTER JOIN dk d
       |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
       |scored AS (SELECT query_id, doc_id, lex_rank, dense_rank,
       |    CAST(CASE WHEN lex_rank > 0
       |        THEN 1000000000 // (60 + lex_rank) ELSE 0 END
       |      + CASE WHEN dense_rank > 0
       |        THEN 1000000000 // (60 + dense_rank) ELSE 0 END
       |      AS BIGINT) AS rrf9
       |  FROM fused),
       |fr AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rrf9 DESC NULLS LAST, doc_id NULLS FIRST)
       |      AS BIGINT) AS rn
       |  FROM scored)""".stripMargin

  val map: Map[String, String] = Map(
    "q27_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,

    "q28_quality_score" ->
      """SELECT doc_id, len(w) AS n_tokens,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to')))
        |    AS DOUBLE) / len(w) AS stopword_ratio,
        |  CAST(n_chars AS DOUBLE) / len(w) AS mean_token_len
        |FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS w
        |      FROM documents)
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q29_lang_id" ->
      """SELECT doc_id, lang, score_en, score_es, score_de,
        |  CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
        |       WHEN score_es >= score_de THEN 'es'
        |       ELSE 'de' END AS predicted
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(w, t -> t IN ('the','a','of','and','to'))) AS score_en,
        |    len(list_filter(w, t -> t IN ('el','la','los','de','y'))) AS score_es,
        |    len(list_filter(w, t -> t IN ('der','die','das','und','zu'))) AS score_de
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q30_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q31_simhash" -> simhashSql,

    "q32_minhash_signature" -> minhashSigSql,

    "q33_minhash_near_dups" -> minhashNearDupSql,

    "q34_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents WHERE doc_id < 200),
         |s AS (SELECT doc_id, list_distinct($shingleExpr) AS shs FROM d)
         |SELECT a.doc_id AS ida, b.doc_id AS idb,
         |  ${val6(jaccardExpr)} AS jaccard
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |WHERE $jaccardExpr >= 0.2
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q41_simhash_pairs" ->
      s"""WITH $simhashCore
         |SELECT a.doc_id AS ida, b.doc_id AS idb,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q172_token_budget_sample" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${h32("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |b AS (SELECT lang, (SUM(n_tokens) * 2) // 5 AS budget
         |  FROM d GROUP BY 1),
         |c AS (SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_tokens
         |  FROM d)
         |SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens
         |FROM c JOIN b USING (lang)
         |WHERE c.cum_tokens - c.n_tokens < b.budget
         |ORDER BY c.doc_id NULLS FIRST""".stripMargin,

    // q173: the q33 pair chain + a parity filter on the source id —
    // only pairs straddling the even/odd corpus fence survive.,
    "q173_cross_source_overlap" ->
      s"""WITH $minhashPairsCtes,
         |src AS (SELECT doc_id, source,
         |    CAST(substr(source, 4) AS INT) % 2 AS par FROM documents)
         |SELECT p.ida, p.idb, a.source AS source_a, b.source AS source_b,
         |  ${val6("p.jaccard")} AS jaccard
         |FROM pairs p
         |JOIN src a ON p.ida = a.doc_id
         |JOIN src b ON p.idb = b.doc_id
         |WHERE a.par <> b.par
         |ORDER BY p.ida NULLS FIRST, p.idb NULLS FIRST""".stripMargin,

    // q174: the RAG read path — q93's chunking + hash-trick INTEGER
    // embeddings (dim = h%16, sign = parity of h/16) + integer-cosine
    // top-k. The oracle states the sparse (dim, weight) formulation;
    // the Spark kernel's dense 16-long fold sums the same integers.,
    "q174_retrieval" ->
      s"""WITH $denseChunkCtes,
         |r AS (SELECT query_id, doc_id, chunk_idx, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC NULLS LAST, doc_id NULLS FIRST,
         |               chunk_idx NULLS FIRST) AS rn
         |  FROM p)
         |SELECT query_id, rn AS "rank", doc_id, chunk_idx,
         |  ${val6("score")} AS score
         |FROM r WHERE rn <= 3
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    "q178_unigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM tok) AS n,
         |               (SELECT COUNT(*) FROM vocab) AS v),
         |lp AS (SELECT tok.doc_id,
         |    CAST(FLOOR(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM tok JOIN vocab USING (t) CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9 FROM lp GROUP BY 1),
         |f AS (SELECT doc_id, n_tokens,
         |    -(CAST(slp9 AS DOUBLE) / 1000000000.0) / n_tokens AS nll
         |  FROM s)
         |SELECT doc_id, n_tokens, ${val6("nll")} AS nll_nats,
         |  nll <= 8.0 AS keep
         |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q179: per-label outlier z-scores. Centroids use q113's µ-integer
    // component sums; per-row d² milli-scales to BIGINT before the
    // moment sums, so mean/variance are exact in any order; the z
    // expression tree is identical on both engines.,
    "q180_source_data_card" ->
      s"""WITH $minhashPairsCtes,
         |dd AS (SELECT doc_id, source, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |      AS n_types
         |  FROM documents),
         |dt AS (SELECT *, CAST(FLOOR(CAST(n_types AS DOUBLE) / n_tokens
         |    * 1000000.0 + 0.5) AS BIGINT) AS ttr6 FROM dd),
         |nd AS (SELECT source, COUNT(*) AS nd FROM dd GROUP BY 1),
         |lc AS (SELECT source, lang, COUNT(*) AS c FROM dd GROUP BY 1, 2),
         |ent AS (SELECT lc.source,
         |    SUM(CAST(FLOOR(-((CAST(c AS DOUBLE) / nd)
         |        * ln(CAST(c AS DOUBLE) / nd))
         |      * 1000000000.0 + 0.5) AS BIGINT)) AS se9
         |  FROM lc JOIN nd USING (source) GROUP BY 1),
         |dup AS (SELECT DISTINCT doc_id FROM
         |  (SELECT ida AS doc_id FROM pairs UNION SELECT idb FROM pairs)),
         |dsrc AS (SELECT dd.source, COUNT(*) AS n_dup
         |  FROM dd JOIN dup USING (doc_id) GROUP BY 1),
         |agg AS (SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(SUM(ttr6) AS BIGINT) AS sttr6 FROM dt GROUP BY 1)
         |SELECT a.source, a.n_docs, a.n_tokens,
         |  CAST(se9 AS DOUBLE) / 1000000000.0 AS lang_entropy,
         |  CAST(sttr6 AS DOUBLE) / 1000000.0 / a.n_docs AS mean_ttr,
         |  CAST(COALESCE(n_dup, 0) AS DOUBLE) / a.n_docs AS dup_rate
         |FROM agg a JOIN ent ON a.source = ent.source
         |LEFT JOIN dsrc ON a.source = dsrc.source
         |ORDER BY a.source NULLS FIRST""".stripMargin,

    // q181: novelty audit — distinct-shingle document frequencies, the
    // unique fraction per doc.,
    "q181_ngram_novelty" ->
      s"""WITH dz AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents),
         |shl AS (SELECT doc_id, unnest(list_distinct($shingleExpr)) AS g
         |  FROM dz),
         |dfq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM shl GROUP BY 1),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |    CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_unique
         |  FROM shl JOIN dfq USING (g) GROUP BY 1)
         |SELECT doc_id, n_shingles, n_unique,
         |  ${val6("CAST(n_unique AS DOUBLE) / n_shingles")} AS novelty
         |FROM agg ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q182: Okapi BM25 (k1=1.2, b=0.75). Each term's contribution is
    // one ln + IEEE mul/divs stated verbatim on both engines,
    // floor-scaled to BIGINT nano-units before the per-(query,doc)
    // sum; rank ties break on doc_id.,
    "q182_bm25" ->
      s"""WITH $bm25Ctes,
         |r AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rank
         |  FROM bs)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS score
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q290: reciprocal-rank fusion of the q182 lexical and q174
    // dense rankings — each system's top-20 contributes
    // 10^9 div (60 + rank) nano-units (integer floor division, so
    // fused scores and ranks are exact on both engines); dense docs
    // rank by their best chunk (IEEE MAX is order-independent).,
    "q290_rrf_fusion" ->
      s"""WITH $rrfCtes
         |SELECT query_id, rn AS "rank", doc_id, lex_rank, dense_rank,
         |  rrf9, CAST(rrf9 AS DOUBLE) / 1000000000.0 AS rrf_score
         |FROM fr WHERE rn <= 5
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q306: the hybrid-RAG last mile — the q290 fused picks packed
    // into the q218 token budget (running sum over pick order, greedy
    // prefix-fits rule).,
    "q306_fused_rag_context" ->
      s"""WITH $rrfCtes,
         |tk AS (SELECT doc_id, CAST(len(string_split(text, ' '))
         |    AS BIGINT) AS n_tokens FROM documents),
         |picks AS (SELECT query_id, rn, doc_id FROM fr WHERE rn <= 5),
         |pw AS (SELECT p.query_id, p.rn, p.doc_id, tk.n_tokens,
         |    CAST(SUM(tk.n_tokens) OVER (PARTITION BY p.query_id
         |      ORDER BY p.rn ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM picks p JOIN tk ON p.doc_id = tk.doc_id)
         |SELECT query_id, rn AS "rank", doc_id, n_tokens, cum_tokens,
         |  cum_tokens <= 120 AS kept
         |FROM pw
         |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin,

    // q307: retrieval-system agreement diagnostics — per query, the
    // top-5 overlap between the lexical, dense, and fused rankings
    // plus the docs fusion surfaced that NEITHER component had in its
    // top-5 (the pool-depth rescue RRF exists to perform).,
    "q307_retrieval_agreement" ->
      s"""WITH $rrfCtes,
         |lex5 AS (SELECT query_id, doc_id FROM lexr WHERE lr <= 5),
         |dense5 AS (SELECT query_id, doc_id FROM dr WHERE dnr <= 5),
         |rrf5 AS (SELECT query_id, doc_id FROM fr WHERE rn <= 5),
         |base AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_fused
         |  FROM rrf5 GROUP BY 1),
         |ld AS (SELECT l.query_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lex5 l JOIN dense5 d USING (query_id, doc_id)
         |  GROUP BY 1),
         |rl AS (SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM rrf5 r JOIN lex5 l USING (query_id, doc_id) GROUP BY 1),
         |rd AS (SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM rrf5 r JOIN dense5 d USING (query_id, doc_id)
         |  GROUP BY 1),
         |fn AS (SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM rrf5 r
         |  LEFT JOIN lex5 l USING (query_id, doc_id)
         |  LEFT JOIN dense5 d USING (query_id, doc_id)
         |  WHERE l.doc_id IS NULL AND d.doc_id IS NULL GROUP BY 1)
         |SELECT base.query_id, base.n_fused,
         |  COALESCE(ld.c, 0) AS lex_dense,
         |  COALESCE(rl.c, 0) AS rrf_lex,
         |  COALESCE(rd.c, 0) AS rrf_dense,
         |  COALESCE(fn.c, 0) AS fused_new
         |FROM base
         |LEFT JOIN ld USING (query_id) LEFT JOIN rl USING (query_id)
         |LEFT JOIN rd USING (query_id) LEFT JOIN fn USING (query_id)
         |ORDER BY query_id NULLS FIRST""".stripMargin,

    // q188: hard negatives = the dense-most-distant members of the
    // BM25 top-20 pool. Composes the q182 CTEs with q174's
    // hash-embedding arithmetic at doc grain; zero-norm docs drop on
    // both sides; cosine is exact-integer dot/norms with one IEEE
    // division, ties on doc_id.,
    "q188_hard_negatives" ->
      s"""WITH $bm25Ctes,
         |bt AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rb
         |  FROM bs),
         |pool AS (SELECT query_id, doc_id, s9 FROM bt WHERE rb <= 20),
         |$docVecCtes,
         |dots AS (SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
         |    SUM(a.w * b.w) AS dot
         |  FROM dvec a JOIN dvec b ON a.dim = b.dim
         |  WHERE ${OracleDialect.queryCohort("a.doc_id")} GROUP BY 1, 2),
         |pc AS (SELECT p.query_id, p.doc_id, p.s9,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
         |      AS cos
         |  FROM pool p
         |  JOIN dnorm qn ON qn.doc_id = p.query_id
         |  JOIN dnorm cn ON cn.doc_id = p.doc_id
         |  LEFT JOIN dots d ON d.query_id = p.query_id
         |    AND d.doc_id = p.doc_id
         |  WHERE qn.n2 > 0 AND cn.n2 > 0),
         |rr AS (SELECT query_id, doc_id, s9, cos,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos ASC NULLS LAST, doc_id) AS rank
         |  FROM pc)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS bm25,
         |  ${val6("cos")} AS cos_sim
         |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q183: greedy longest-match subword apply. The oracle replays the
    // Spark segmenter's loop as 8 unrolled argmax-prefix steps over
    // the SAME vocabulary literal (TextOps.WpVocab — one source of
    // truth), at distinct-word grain; integer math end-to-end. At most
    // one piece of a given length matches a fixed position, so
    // "longest first" needs no tie-break beyond the stated one.,
    "q183_wordpiece" -> wordpieceSql,

    // q184: temperature mixture (alpha = 0.5). sqrt weights
    // floor-scale to nano BEFORE the cross-language sum; targets are
    // pure 64-bit integer multiply/div; selection ranks on the
    // portable hash with doc_id tie-break.,
    "q184_temperature_mixture" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |w AS (SELECT lang, c,
        |    CAST(FLOOR(sqrt(CAST(c AS DOUBLE)) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS w9
        |  FROM c),
        |tot AS (SELECT CAST(SUM(w9) AS BIGINT) AS ww,
        |    (SELECT COUNT(*) // 2 FROM documents) AS b FROM w),
        |t AS (SELECT lang, c, w9, (b * w9) // ww AS n_target
        |  FROM w CROSS JOIN tot),
        |r AS (SELECT doc_id, lang,
        |    CAST('0x' || substr(md5('tmix:' || doc_id), 1, 8) AS BIGINT)
        |      AS hk
        |  FROM documents),
        |rk AS (SELECT doc_id, lang, hk,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY hk, doc_id) AS rn
        |  FROM r)
        |SELECT rk.doc_id, rk.lang, t.c, t.n_target,
        |  CAST(rn AS INTEGER) AS rank, rn <= n_target AS keep
        |FROM rk JOIN t USING (lang) ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q189: DSIR selection. Per-term log-ratios between the smoothed
    // target (src0) and raw unigram LMs floor-scale to micro BIGINTs
    // before the per-doc sum; the global rank/cum-tokens here are the
    // plain window form — Spark's two-phase rank must land on the
    // identical ordering (score DESC, doc_id).,
    "q189_dsir" ->
      s"""WITH dtok AS (SELECT doc_id, source,
        |    unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |cr AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cr
        |  FROM dtok GROUP BY 1),
        |ct AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS ct
        |  FROM dtok WHERE source = 'src0' GROUP BY 1),
        |tot AS (SELECT (SELECT COUNT(*) FROM dtok) AS nr,
        |    (SELECT COUNT(*) FROM dtok WHERE source = 'src0') AS nt,
        |    (SELECT COUNT(*) FROM cr) AS v,
        |    (SELECT COUNT(*) // 10 FROM documents) AS b),
        |lr AS (SELECT cr.t,
        |    CAST(FLOOR(
        |      (ln(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
        |          / CAST(nt + v AS DOUBLE))
        |       - ln(CAST(cr.cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS lr6
        |  FROM cr LEFT JOIN ct USING (t) CROSS JOIN tot),
        |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(lr6) AS BIGINT) AS slw6
        |  FROM dtok JOIN lr USING (t) GROUP BY 1),
        |r AS (SELECT doc_id, n_tokens, slw6,
        |    ROW_NUMBER() OVER (ORDER BY slw6 DESC, doc_id) AS rank,
        |    SUM(n_tokens) OVER (ORDER BY slw6 DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_tokens
        |  FROM s)
        |SELECT doc_id, n_tokens,
        |  ${val6("CAST(slw6 AS DOUBLE) / 1000000.0")} AS logw,
        |  CAST(rank AS BIGINT) AS rank, CAST(cum_tokens AS BIGINT)
        |    AS cum_tokens,
        |  rank <= (SELECT b FROM tot) AS keep
        |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q191: MMR — 3 greedy diversity-aware picks from each query's
    // dense top-10 pool, unrolled as fixed argmax steps. rel/sim are
    // exact-integer cosines; 0.7/0.3 are shared decimal literals;
    // every argmax ties on doc_id.,
    "q191_mmr" -> mmrOracle,

    // q218: RAG context assembly — the q191 picks joined with token
    // counts, cumulative in pick order, kept while the running total
    // fits the context-window budget. The q191 oracle nests verbatim
    // as the base subquery, so the two contracts can never drift.,
    "q218_rag_context" ->
      s"""WITH base AS ($mmrOracle),
         |tk AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |x AS (SELECT base.query_id, base.pick_no, base.doc_id,
         |    tk.n_tokens,
         |    CAST(SUM(tk.n_tokens) OVER (PARTITION BY base.query_id
         |      ORDER BY base.pick_no) AS BIGINT) AS cum_tokens
         |  FROM base JOIN tk USING (doc_id))
         |SELECT query_id, pick_no, doc_id, n_tokens, cum_tokens,
         |  cum_tokens <= 120 AS kept
         |FROM x ORDER BY query_id NULLS FIRST, pick_no NULLS FIRST"""
        .stripMargin,

    // q192: redundancy profile — the q33 candidate pairs swept over
    // three Jaccard thresholds; zero-pair thresholds still emit a row.,
    "q192_dedup_profile" ->
      s"""WITH $minhashPairsCtes,
         |thr(threshold) AS (SELECT CAST(x AS DOUBLE)
         |  FROM (VALUES (0.5), (0.7), (0.9)) v(x)),
         |e AS (SELECT t.threshold, c.ida, c.idb
         |  FROM thr t JOIN cpairs c ON c.jacc >= t.threshold),
         |np AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM e GROUP BY 1),
         |ids AS (SELECT threshold, ida AS id FROM e
         |  UNION ALL SELECT threshold, idb FROM e),
         |ndup AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_dup_docs
         |  FROM (SELECT DISTINCT threshold, id FROM ids) GROUP BY 1),
         |nd AS (SELECT COUNT(*) AS n FROM documents)
         |SELECT t.threshold, COALESCE(n_pairs, 0) AS n_pairs,
         |  COALESCE(n_dup_docs, 0) AS n_dup_docs,
         |  CAST(COALESCE(n_dup_docs, 0) AS DOUBLE) / n AS dup_rate
         |FROM thr t LEFT JOIN np USING (threshold)
         |LEFT JOIN ndup USING (threshold) CROSS JOIN nd
         |ORDER BY threshold""".stripMargin,

    // q194: A-ES weighted sampling. u and ln(u)/w are identical
    // expression trees; keys nano-floor-scale before ranking
    // (score DESC, doc_id — Spark's two-phase rank must match).,
    "q194_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
         |  FROM documents),
         |tot AS (SELECT COUNT(*) // 5 AS b FROM documents),
         |k AS (SELECT doc_id, w,
         |    CAST(FLOOR(
         |      ln((CAST('0x' || substr(md5('ws:' || doc_id), 1, 8)
         |            AS BIGINT) + 1) / 4294967296.0)
         |      / CAST(w AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS s9
         |  FROM d),
         |r AS (SELECT doc_id, w, s9,
         |    ROW_NUMBER() OVER (ORDER BY s9 DESC, doc_id) AS rank,
         |    SUM(w) OVER (ORDER BY s9 DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum_tokens
         |  FROM k)
         |SELECT doc_id, w AS n_tokens,
         |  ${val6("CAST(s9 AS DOUBLE) / 1000000000.0")} AS key,
         |  CAST(rank AS BIGINT) AS rank,
         |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
         |  rank <= (SELECT b FROM tot) AS keep
         |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q196: incremental posting stats. Spark answers from the stored
    // prev-snapshot artifact + a delta-only aggregate; the oracle
    // recomputes the full corpus from scratch — hash equality proves
    // the additive merge exact.,
    "q196_posting_stats_incremental" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tf0 AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(c) AS BIGINT) AS tf
        |FROM tf0 GROUP BY t ORDER BY t""".stripMargin,

    // q197: MRR@5 / nDCG@5 of the served index vs the brute ground
    // truth (graded gains 5..1). Discounts are the SAME double
    // literals Spark closes over; per-position terms nano-floor-scale
    // before the per-query sums.,
    "q198_media_card" ->
      s"""WITH $mediaDimsCtes
         |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_items,
         |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_corrupt,
         |  CAST(SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS corrupt_rate,
         |  CAST(SUM(CASE WHEN width = -1 THEN 0
         |    ELSE CAST(width AS BIGINT) END) AS DOUBLE)
         |    / (COUNT(*) - SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END))
         |    AS mean_w,
         |  CAST(SUM(CASE WHEN width = -1 THEN 0
         |    ELSE CAST(height AS BIGINT) END) AS DOUBLE)
         |    / (COUNT(*) - SUM(CASE WHEN width = -1 THEN 1 ELSE 0 END))
         |    AS mean_h,
         |  MAX(width) AS max_w, MAX(height) AS max_h
         |FROM dims GROUP BY kind ORDER BY kind""".stripMargin,

    // q199: join-skew advisor — three per-key distribution reductions;
    // all-integer inputs, single stated divisions.,
    "q200_release_manifest" ->
      s"""WITH RECURSIVE $curationCtes,
         |rel0 AS (SELECT doc_id FROM v
         |  WHERE lang_ok AND quality_ok AND rep_ok AND decon_ok
         |    AND dedup_ok),
         |rel AS (SELECT doc_id FROM rel0 WHERE doc_id % 7 <> 3),
         |rm AS (SELECT doc_id FROM rel0 WHERE doc_id % 7 = 3),
         |vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
         |    CAST(SUM(CASE WHEN lang_ok AND quality_ok AND rep_ok
         |      AND decon_ok AND NOT dedup_ok THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_dup_dropped
         |  FROM v),
         |tk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_released,
         |    CAST(SUM(len(string_split(d.text, ' ')))
         |    AS BIGINT) AS n_tokens_released
         |  FROM documents d JOIN rel USING (doc_id)),
         |rms AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_removed,
         |    CAST(COALESCE(SUM(len(string_split(d.text, ' '))), 0)
         |    AS BIGINT) AS n_tokens_removed
         |  FROM documents d JOIN rm USING (doc_id)),
         |sp AS (SELECT r.doc_id,
         |    CAST(${h32("CAST(COALESCE(c.component, r.doc_id) AS VARCHAR)")}
         |      % 10 AS INT) AS bucket
         |  FROM rel r LEFT JOIN comp c ON r.doc_id = c.id),
         |spc AS (SELECT
         |    CAST(SUM(CASE WHEN bucket <= 7 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_train,
         |    CAST(SUM(CASE WHEN bucket = 8 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_val,
         |    CAST(SUM(CASE WHEN bucket = 9 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_test
         |  FROM sp),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ingested
         |  FROM documents)
         |SELECT n_ingested, n_scored, n_released,
         |  CAST(n_released AS DOUBLE) / n_scored AS release_rate,
         |  n_dup_dropped, n_removed, n_tokens_removed,
         |  n_tokens_released, n_train, n_val, n_test
         |FROM nn CROSS JOIN vs CROSS JOIN tk CROSS JOIN rms
         |  CROSS JOIN spc""".stripMargin,

    // q201: EXACT similarity self-join — the oracle is the relational
    // exact form (overlap counts via a shingle equi-join); the Spark
    // side reaches the identical pair set through AllPairs prefix
    // filtering, so a hash match proves the filter admits no false
    // negatives at this threshold.,
    "q201_similarity_join" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents),
         |s AS (SELECT doc_id, list_distinct($shingleExpr) AS shs FROM d),
         |tok AS (SELECT doc_id, UNNEST(shs) AS tok FROM s),
         |sz AS (SELECT doc_id, len(shs) AS m FROM s),
         |ov AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
         |    CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM tok a JOIN tok b ON a.tok = b.tok
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (SELECT ida, idb,
         |    c / (CAST(sa.m + sb.m AS DOUBLE) - c) AS jac
         |  FROM ov JOIN sz sa ON ov.ida = sa.doc_id
         |    JOIN sz sb ON ov.idb = sb.doc_id)
         |SELECT ida, idb, ${val6("jac")} AS jaccard FROM j
         |WHERE jac >= 0.5
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    // q202: out-of-fold target encoding — fold complements from exact
    // integer-cent sums; the smoothing arithmetic mirrors
    // Features.targetEncodeOof op-for-op.,
    "q206_bpe_train" -> bpeTrainSql,

    // q207: the apply pass — word occurrences join the final segmented
    // vocabulary (v8 of the same CTE chain); per-language integer
    // volume sums and the chars-per-piece ratio.,
    "q207_bpe_apply" ->
      s"""WITH $bpeCtes,
         |w AS (SELECT lang, UNNEST(string_split(text, ' ')) AS word
         |  FROM documents),
         |a AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(len(v.syms)) AS BIGINT) AS n_pieces
         |  FROM w JOIN v$bpeIters v ON w.word = v.word
         |  WHERE w.word <> ''
         |  GROUP BY 1)
         |SELECT lang, n_words, n_chars, n_pieces,
         |  ${val6("CAST(n_chars AS DOUBLE) / CAST(n_pieces AS DOUBLE)")}
         |    AS chars_per_piece
         |FROM a ORDER BY lang NULLS FIRST""".stripMargin,

    // q208: k-anonymity card — QI-group sizes from one aggregation,
    // policy stats re-aggregated from the group grain.,
    "q209_containment_join" -> containmentOracle,

    "q213_curriculum" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM tok) AS n,
         |               (SELECT COUNT(*) FROM vocab) AS v),
         |lp AS (SELECT tok.doc_id,
         |    CAST(FLOOR(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM tok JOIN vocab USING (t) CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9 FROM lp GROUP BY 1),
         |dd AS (SELECT doc_id, n_tokens,
         |    CAST(FLOOR(CAST(0 - slp9 AS DOUBLE) / n_tokens / 1000.0)
         |      AS BIGINT) AS dm
         |  FROM s),
         |r AS (SELECT dd.*, doc.source,
         |    NTILE(4) OVER (ORDER BY dm, dd.doc_id) AS stage
         |  FROM dd JOIN documents doc ON dd.doc_id = doc.doc_id)
         |SELECT CAST(stage AS INT) AS stage, source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  ${val6("CAST(SUM(dm) AS DOUBLE) / COUNT(*) / 1000000.0")}
         |    AS mean_nll
         |FROM r GROUP BY 1, 2
         |ORDER BY stage NULLS FIRST, source NULLS FIRST""".stripMargin,

    // q215: split distribution shift — add-one KL(split ‖ train) over
    // the corpus vocabulary; per-(token, split) terms nano-floor-scale
    // before the per-split sums. Train vs itself telescopes to 0.,
    "q215_split_divergence" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |assigned AS (SELECT doc.doc_id,
         |    COALESCE(c.component, doc.doc_id) AS component
         |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id),
         |bkt AS (SELECT doc_id,
         |    CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      CAST(${h32("CAST(component AS VARCHAR)")} % 10 AS INT)
         |        AS b
         |    FROM assigned)),
         |tk AS (SELECT bkt.split, x.t FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |    FROM documents) x JOIN bkt USING (doc_id)),
         |cnt AS (SELECT split, t, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |voc AS (SELECT DISTINCT t FROM cnt),
         |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM voc),
         |nt AS (SELECT split, CAST(SUM(c) AS BIGINT) AS n
         |  FROM cnt GROUP BY 1),
         |tr AS (SELECT t, c AS ct FROM cnt WHERE split = 'train'),
         |ntr AS (SELECT n AS ntrain FROM nt WHERE split = 'train'),
         |x2 AS (SELECT g.split, g.n, COALESCE(c2.c, 0) AS c0,
         |    COALESCE(tr.ct, 0) AS ct, vv.v, ntr.ntrain
         |  FROM (SELECT voc.t, nt.split, nt.n
         |    FROM voc CROSS JOIN nt) g
         |  LEFT JOIN cnt c2 ON g.split = c2.split AND g.t = c2.t
         |  LEFT JOIN tr ON g.t = tr.t
         |  CROSS JOIN vv CROSS JOIN ntr),
         |t9 AS (SELECT split,
         |    CAST(FLOOR((CAST(c0 + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |      * ln((CAST(c0 + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
         |        / (CAST(ct + 1 AS DOUBLE)
         |           / CAST(ntrain + v AS DOUBLE)))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS k9
         |  FROM x2),
         |kl AS (SELECT split, CAST(SUM(k9) AS BIGINT) AS sk9
         |  FROM t9 GROUP BY 1),
         |nd AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM bkt GROUP BY 1)
         |SELECT nd.split, nd.n_docs, nt.n AS n_tokens,
         |  ${val6("CAST(kl.sk9 AS DOUBLE) / 1000000000.0")}
         |    AS kl_vs_train
         |FROM nd JOIN nt USING (split) JOIN kl USING (split)
         |ORDER BY split NULLS FIRST""".stripMargin,

    // q216: split-integrity audit — the leakage-safety proof as a
    // query: near-dup pairs reduced to a (split, split) matrix whose
    // off-diagonal must be empty under component-hash splitting.,
    "q214_cross_source_dups" ->
      s"""WITH $minhashPairsCtes,
         |px AS (SELECT LEAST(da.source, db.source) AS source_a,
         |    GREATEST(da.source, db.source) AS source_b
         |  FROM pairs JOIN documents da ON pairs.ida = da.doc_id
         |  JOIN documents db ON pairs.idb = db.doc_id)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM px GROUP BY 1, 2
         |ORDER BY source_a NULLS FIRST, source_b NULLS FIRST"""
        .stripMargin,

    // q210: dedup-aware sampling weights — rides the q65 closure;
    // per-doc effective mass micro-floor-scales before the source sums.,
    "q210_dedup_weights" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |cl AS (SELECT doc.doc_id,
         |    COUNT(*) OVER (PARTITION BY
         |      COALESCE(c.component, doc.doc_id)) AS cluster_size
         |  FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id),
         |dw AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |xw AS (SELECT dw.source, dw.n_tokens, cl.cluster_size,
         |    CAST(FLOOR(CAST(dw.n_tokens AS DOUBLE) * 1000000.0
         |      / CAST(cl.cluster_size AS DOUBLE)) AS BIGINT) AS eff6
         |  FROM dw JOIN cl ON dw.doc_id = cl.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
         |  ${val6("CAST(SUM(eff6) AS DOUBLE) / 1000000.0")}
         |    AS effective_tokens,
         |  ${val6("CAST(SUM(n_tokens) AS DOUBLE) / " +
             "(CAST(SUM(eff6) AS DOUBLE) / 1000000.0)")} AS inflation
         |FROM xw GROUP BY 1
         |ORDER BY source NULLS FIRST""".stripMargin,

    // q211: bigram LM — ln once per distinct bigram, nano-floor-scaled
    // before the per-doc integer sums (the q178 discipline).,
    "q211_bigram_lm" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
         |    SELECT doc_id, UNNEST(list_transform(range(1, len(ws)),
         |      i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS p
         |    FROM w WHERE len(ws) >= 2)),
         |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg GROUP BY 1, 2),
         |cc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
         |  FROM bg GROUP BY 1),
         |vv AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM (
         |  SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)),
         |lp AS (SELECT w1, w2,
         |    CAST(FLOOR(ln(CAST(c12 + 1 AS DOUBLE)
         |      / CAST(c1 + v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM bc JOIN cc USING (w1) CROSS JOIN vv),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9
         |  FROM bg JOIN lp USING (w1, w2)
         |  WHERE doc_id < 100 GROUP BY 1),
         |f AS (SELECT doc_id, n_bigrams,
         |    -(CAST(slp9 AS DOUBLE) / 1000000000.0) / n_bigrams
         |      AS nll FROM s)
         |SELECT doc_id, n_bigrams, ${val6("nll")} AS nll_nats,
         |  nll <= 7.0 AS keep
         |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q308: Kneser-Ney bigram LM — absolute discount d = 3/4 keeps the
    // numerator integral (4c - 3); continuation counts off the bigram
    // TYPE table; one fixed IEEE tree per bigram, nano-floored before
    // the per-doc sum.,
    "q308_kn_bigram_lm" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
         |    SELECT doc_id, UNNEST(list_transform(range(1, len(ws)),
         |      i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS p
         |    FROM w WHERE len(ws) >= 2)),
         |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
         |  FROM bg GROUP BY 1, 2),
         |cc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1b
         |  FROM bg GROUP BY 1),
         |np AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1p
         |  FROM bc GROUP BY 1),
         |ncw AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc
         |  FROM bc GROUP BY 1),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes FROM bc),
         |lp AS (SELECT w1, w2,
         |    CAST(FLOOR(ln(
         |      (CAST(c12 * 4 - 3 AS DOUBLE) / CAST(c1b * 4 AS DOUBLE))
         |      + (3.0 * CAST(n1p AS DOUBLE) / CAST(c1b * 4 AS DOUBLE))
         |        * (CAST(nc AS DOUBLE) / CAST(ntypes AS DOUBLE))
         |    ) * 1000000000.0 + 0.5) AS BIGINT) AS lp9
         |  FROM bc JOIN cc USING (w1) JOIN np USING (w1)
         |  JOIN ncw USING (w2) CROSS JOIN nt),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(lp9) AS BIGINT) AS slp9
         |  FROM bg JOIN lp USING (w1, w2)
         |  WHERE doc_id < 100 GROUP BY 1),
         |f AS (SELECT doc_id, n_bigrams,
         |    -(CAST(slp9 AS DOUBLE) / 1000000000.0) / n_bigrams
         |      AS nll FROM s)
         |SELECT doc_id, n_bigrams, ${val6("nll")} AS nll_nats,
         |  nll <= 7.0 AS keep
         |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q195: embedding drift — q169's PSI arithmetic over q185's
    // projections, label<5 vs label>=5 populations, clamped
    // projection buckets.,
    "q164_sentiment_lexicon" -> {
      val lexVals = graft.operators.TextOps.sentimentLex
        .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |      FROM documents),
         |lex(t, w) AS (VALUES $lexVals),
         |sc AS (SELECT tok.doc_id,
         |    CAST(COALESCE(SUM(l.w), 0) AS BIGINT) AS sentiment_raw
         |  FROM tok LEFT JOIN lex l USING (t) GROUP BY tok.doc_id),
         |n AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT n.doc_id, n.n_tokens, sc.sentiment_raw,
         |  ${val6("CAST(sc.sentiment_raw AS DOUBLE) / n.n_tokens")}
         |    AS sentiment,
         |  CASE WHEN sc.sentiment_raw > 0 THEN 'positive'
         |       WHEN sc.sentiment_raw < 0 THEN 'negative'
         |       ELSE 'neutral' END AS label
         |FROM n JOIN sc USING (doc_id)
         |ORDER BY n.doc_id NULLS FIRST""".stripMargin
    },

    // q165: leakage-safe split — the SAME recursive closure as q65,
    // then split = hash(component) % 10 so near-dup cluster members
    // can never straddle a split boundary. The hash mirrors
    // Portable.portable32 exactly (q64's precedent).,
    // q298: tokenizer fertility by language — q56's regex pre-token
    // count vs whitespace words, ratios as exact micro-unit integer
    // divisions at language grain.,
    "q298_tokenizer_fertility" ->
      """WITH t AS (SELECT lang,
        |    len(string_split(text, ' ')) AS w,
        |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
        |      AS tk,
        |    length(text) AS ch
        |  FROM documents),
        |g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(w) AS BIGINT) AS n_words,
        |    CAST(SUM(tk) AS BIGINT) AS n_tokens,
        |    CAST(SUM(ch) AS BIGINT) AS n_chars
        |  FROM t GROUP BY 1)
        |SELECT lang, n_docs, n_words, n_tokens, n_chars,
        |  CAST((n_tokens * 1000000) // n_words AS DOUBLE) / 1000000.0
        |    AS fertility,
        |  CAST((n_chars * 1000000) // n_tokens AS DOUBLE) / 1000000.0
        |    AS chars_per_token
        |FROM g ORDER BY lang NULLS FIRST""".stripMargin,

    "q56_regex_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
        |    AS n_regex_tokens,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_numeric,
        |  len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct
        |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q58_explode_tokens" ->
      """SELECT doc_id, CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos,
        |  unnest(w) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM documents WHERE doc_id < 20)
        |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin,

    // The salted two-phase plan must equal the PLAIN aggregate — that
    // equivalence is the whole point, so the oracle is the plain form.,
    "q63_tfidf" ->
      s"""WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(FLOOR(tf * ln(CAST(n_docs AS DOUBLE) / df)
         |      * 1000000.0 + 0.5) AS BIGINT) AS tfidf_i
         |  FROM tfc JOIN df USING (term) CROSS JOIN n
         |  WHERE doc_id < 100),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY tfidf_i DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
         |  CAST(tfidf_i AS DOUBLE) / 1000000.0 AS tfidf
         |FROM r WHERE rank <= 5
         |ORDER BY doc_id NULLS FIRST, rank ASC""".stripMargin,

    "q64_stratified_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${h32("CAST(doc_id AS VARCHAR)")} % 20 <
         |  CASE WHEN lang = 'en' THEN 1 WHEN lang = 'es' THEN 2
         |       WHEN lang = 'de' THEN 4 ELSE 1 END
         |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // Connected components over the MinHash near-dup graph: the oracle
    // recomputes the closure with a recursive CTE (reach = transitive
    // neighbors; component = min reachable id). Near-dup clusters have
    // tiny diameters, keeping the recursion shallow.,
    "q234_bm25_after_deletes" ->
      s"""WITH ${bm25CtesFor("WHERE doc_id % 7 <> 3")},
         |r AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rank
         |  FROM bs)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS score
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q232: posting-stats delete maintenance. Spark subtracts the
    // deleted docs' term stats from the stored full-corpus artifact
    // (DeltaLog tombstone feed, df=0 rows dropped); the oracle
    // recomputes the post-delete corpus from scratch.,
    "q232_posting_stats_deletes" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE doc_id % 7 <> 3),
        |tf0 AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(c) AS BIGINT) AS tf
        |FROM tf0 GROUP BY t ORDER BY t""".stripMargin,

    // q237: ANN served from the streaming-maintained index state —
    // the oracle recomputes multi-probe probe-and-rank over the
    // post-epoch corpus from scratch; a hash match proves the
    // delta-maintained inverted lists (assigned + centroids state
    // tables) ARE the post-epoch index. Both sides multi-probe, so
    // candidates dedupe (DISTINCT) before ranking.,
    "q244_prf_expansion" ->
      s"""WITH $bm25Ctes,
         |fb AS (SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY s9 DESC, doc_id) AS rn
         |    FROM bs) WHERE rn <= 3),
         |ex AS (SELECT query_id, t FROM (
         |    SELECT fb.query_id, tf.t, SUM(tf.tf) AS wt,
         |      ROW_NUMBER() OVER (PARTITION BY fb.query_id
         |        ORDER BY SUM(tf.tf) DESC, tf.t) AS rn
         |    FROM fb JOIN tf ON fb.doc_id = tf.doc_id
         |    LEFT JOIN q q0
         |      ON q0.query_id = fb.query_id AND q0.t = tf.t
         |    WHERE q0.t IS NULL
         |    GROUP BY 1, 2) WHERE rn <= 3),
         |qx AS (SELECT query_id, t FROM q
         |       UNION SELECT query_id, t FROM ex),
         |dfx AS (SELECT t, COUNT(*) AS df FROM tf
         |  WHERE t IN (SELECT t FROM qx) GROUP BY 1),
         |c2 AS (SELECT qx.query_id, tf.doc_id,
         |    CAST(FLOOR(
         |      ln((CAST(nd - df AS DOUBLE) + 0.5)
         |          / (CAST(df AS DOUBLE) + 0.5) + 1.0)
         |      * ((CAST(tf AS DOUBLE) * 2.2)
         |         / (CAST(tf AS DOUBLE) + 1.2
         |            * (0.25 + 0.75
         |               * (CAST(dl AS DOUBLE)
         |                  / (CAST(nt AS DOUBLE) / nd)))))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
         |  FROM qx JOIN tf USING (t) JOIN dfx USING (t)
         |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot
         |  WHERE tf.doc_id <> qx.query_id),
         |bs2 AS (SELECT query_id, doc_id, CAST(SUM(c9) AS BIGINT) AS s9
         |  FROM c2 GROUP BY 1, 2),
         |r2 AS (SELECT query_id, doc_id, s9,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY s9 DESC, doc_id) AS rank
         |  FROM bs2)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(s9 AS DOUBLE) / 1000000000.0 AS score
         |FROM r2 WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q242: the ISO-BMFF box walk — the oracle reconstructs the same
    // byte stream as a hex string and RE-WALKS it with data-driven
    // offsets (every box size read from the string, q156's
    // discipline); TRY_CAST turns truncated reads into NULLs that
    // fail the validity predicate exactly where the JVM walker bails.,
    "q242_mp4_box_walk" ->
      """WITH m AS (SELECT r AS media_id,
        |    CAST(r * 7 % 900 + 100 AS INT) AS ts,
        |    CAST(r * 13 % 100000 + 1000 AS INT) AS dur,
        |    CAST(r % 11 AS INT) AS fl,
        |    CAST(r % 37 AS INT) AS mp
        |  FROM range(500) t(r)),
        |c AS (SELECT media_id,
        |    '0000001466747970' || '69736F6D' || '00000200' || '69736F6D' ||
        |    CASE WHEN media_id % 3 = 0 THEN
        |        lpad(to_hex(fl + 8), 8, '0') || '66726565' ||
        |        repeat('00', fl)
        |      ELSE '' END ||
        |    '000000746D6F6F76' ||
        |    '0000006C' || '6D766864' || '00000000' || '00000000' ||
        |    '00000000' ||
        |    lpad(to_hex(ts), 8, '0') || lpad(to_hex(dur), 8, '0') ||
        |    '00010000' || '0100' || repeat('00', 10) ||
        |    '000100000000000000000000' || '000000000001000000000000' ||
        |    '000000000000000040000000' ||
        |    repeat('00', 24) || '00000002' ||
        |    lpad(to_hex(mp + 24), 8, '0') || '6D646174' ||
        |    repeat('00', mp) || md5(media_id || ':g') AS full_hx
        |  FROM m),
        |x AS (SELECT media_id,
        |    upper(CASE WHEN media_id % 17 = 0 THEN substring(full_hx, 1, 20)
        |      ELSE full_hx END) AS hx
        |  FROM c),
        |w1 AS (SELECT media_id, hx, len(hx) // 2 AS n_bytes,
        |    TRY_CAST('0x' || substring(hx, 1, 8) AS BIGINT) AS s1b,
        |    substring(hx, 9, 8) AS f1
        |  FROM x),
        |w2 AS (SELECT *, 1 + 2 * s1b AS o2 FROM w1),
        |w3 AS (SELECT *,
        |    TRY_CAST('0x' || substring(hx, o2, 8) AS BIGINT) AS s2b,
        |    substring(hx, o2 + 8, 8) = '66726565' AS hasfree
        |  FROM w2),
        |w4 AS (SELECT *,
        |    CASE WHEN hasfree THEN o2 + 2 * s2b ELSE o2 END AS om
        |  FROM w3),
        |w5 AS (SELECT *,
        |    TRY_CAST('0x' || substring(hx, om, 8) AS BIGINT) AS smb,
        |    substring(hx, om + 8, 8) AS fm,
        |    substring(hx, om + 24, 8) AS fmv,
        |    substring(hx, om + 32, 2) AS ver,
        |    TRY_CAST('0x' || substring(hx, om + 56, 8) AS BIGINT) AS tsv,
        |    TRY_CAST('0x' || substring(hx, om + 64, 8) AS BIGINT) AS durv
        |  FROM w4),
        |w6 AS (SELECT *, om + 2 * smb AS od FROM w5),
        |w7 AS (SELECT *,
        |    TRY_CAST('0x' || substring(hx, od, 8) AS BIGINT) AS sdb,
        |    substring(hx, od + 8, 8) AS fd
        |  FROM w6),
        |v AS (SELECT *,
        |    COALESCE(f1 = '66747970' AND s1b >= 8
        |      AND (NOT hasfree OR s2b >= 8)
        |      AND fm = '6D6F6F76' AND smb >= 40
        |      AND fmv = '6D766864' AND ver = '00'
        |      AND fd = '6D646174' AND sdb >= 8
        |      AND tsv > 0 AND od + 2 * sdb - 1 = len(hx), FALSE) AS ok
        |  FROM w7)
        |SELECT media_id, CAST(n_bytes AS INT) AS n_bytes,
        |  CASE WHEN ok THEN CAST(3 + CASE WHEN hasfree THEN 1 ELSE 0 END
        |    AS INT) ELSE -1 END AS n_boxes,
        |  COALESCE(ok AND hasfree, FALSE) AS has_free,
        |  CASE WHEN ok THEN CAST(sdb - 8 AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS mdat_bytes,
        |  CASE WHEN ok THEN CAST(tsv AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS timescale,
        |  CASE WHEN ok THEN CAST(durv AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS duration,
        |  CASE WHEN ok THEN CAST(durv * 1000 // tsv AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS dur_ms
        |FROM v ORDER BY media_id NULLS FIRST""".stripMargin,

    // q240: exact shared-substring spans (Lee et al. ExactSubstr as
    // window-grain dataflow) — k-token windows shared by 2..100 docs
    // (the df cap mirrors Spark's super-frequent skip), position
    // pairs merged into maximal spans per diagonal by
    // gaps-and-islands.,
    "q240_shared_substrings" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |win AS (SELECT doc_id, i AS pos,
        |    array_to_string(ts[i+1:i+8], ' ') AS w
        |  FROM d, UNNEST(range(0, len(ts) - 7)) AS u(i)),
        |df AS (SELECT w FROM win GROUP BY w
        |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 100),
        |sw AS (SELECT win.* FROM win JOIN df USING (w)),
        |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    a.pos AS posa, b.pos AS posb
        |  FROM sw a JOIN sw b ON a.w = b.w AND a.doc_id < b.doc_id),
        |i AS (SELECT ida, idb, posa - posb AS diag, posa,
        |    posa - ROW_NUMBER() OVER (PARTITION BY ida, idb, posa - posb
        |      ORDER BY posa) AS grp
        |  FROM p)
        |SELECT ida, idb, CAST(MIN(posa) AS BIGINT) AS start_a,
        |  CAST(MIN(posa) - diag AS BIGINT) AS start_b,
        |  CAST(MAX(posa) - MIN(posa) + 8 AS BIGINT) AS span_tokens
        |FROM i GROUP BY ida, idb, diag, grp
        |ORDER BY ida NULLS FIRST, idb NULLS FIRST,
        |  start_a NULLS FIRST, start_b NULLS FIRST""".stripMargin,

    // q238: PII pseudonymization mart — deterministic keyed pseudonym
    // (md5), digit-masked display name, $1000 banding of the sensitive
    // balance (cents discipline + double floor, identical expression
    // tree both engines).,
    "q238_pii_redaction" ->
      """SELECT c_custkey, md5(c_name) AS name_hash,
        |  regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
        |  CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |    AS DOUBLE) / 100000.0) AS BIGINT) AS acct_band,
        |  c_nationkey, c_mktsegment
        |FROM customer
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    // q241: the k-anonymized release — q238's redaction shipped under
    // q239's cell verdicts (released keep segment, generalized ship
    // '*', suppressed don't ship).,
    "q241_anonymized_release" ->
      """WITH cells AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |mer AS (SELECT c_nationkey, SUM(n) AS n
        |  FROM cells WHERE n < 5 GROUP BY 1),
        |r AS (SELECT c_custkey, md5(c_name) AS name_hash,
        |    regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
        |    CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |      AS DOUBLE) / 100000.0) AS BIGINT) AS acct_band,
        |    c_nationkey, c_mktsegment
        |  FROM customer)
        |SELECT r.c_custkey, r.name_hash, r.name_masked, r.acct_band,
        |  r.c_nationkey,
        |  CASE WHEN c0.n IS NOT NULL THEN r.c_mktsegment ELSE '*' END
        |    AS segment_out
        |FROM r
        |LEFT JOIN (SELECT * FROM cells WHERE n >= 5) c0
        |  ON r.c_nationkey = c0.c_nationkey
        |  AND r.c_mktsegment = c0.c_mktsegment
        |LEFT JOIN mer ON r.c_nationkey = mer.c_nationkey
        |WHERE c0.n IS NOT NULL OR mer.n >= 5
        |ORDER BY r.c_custkey NULLS FIRST""".stripMargin,

    // q239: k-anonymity audit with one-step lattice generalization —
    // (nation, segment) cells under k merge to nation grain
    // ('generalized') or are withheld ('suppressed').,
    "q239_k_anonymity" ->
      """WITH cells AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |mer AS (SELECT c_nationkey, SUM(n) AS n
        |  FROM cells WHERE n < 5 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT c_nationkey, c_mktsegment AS segment,
        |    CAST(n AS BIGINT) AS n, 0 AS gen_level,
        |    'released' AS status
        |  FROM cells WHERE n >= 5
        |  UNION ALL
        |  SELECT c_nationkey, '*' AS segment, CAST(n AS BIGINT) AS n,
        |    CASE WHEN n >= 5 THEN 1 ELSE 2 END AS gen_level,
        |    CASE WHEN n >= 5 THEN 'generalized' ELSE 'suppressed' END
        |      AS status
        |  FROM mer)
        |ORDER BY c_nationkey NULLS FIRST, segment NULLS FIRST""".stripMargin,

    // q236: the streaming posting-stats maintainer drains a seed +
    // CDC epoch (appends % 6 = 0, tombstones % 7 = 3 of the prev
    // snapshot) against a DeltaLog vocabulary table and must land on
    // the from-scratch stats of the post-epoch corpus — q196's
    // additive merge and q232's subtraction as one running process.,
    "q228_source_overlap" ->
      s"""WITH fps AS (SELECT DISTINCT source, $fpSqlExpr AS fp
         |  FROM documents),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM fps GROUP BY 1),
         |iv AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT * FROM (
         |  SELECT iv.source_a, iv.source_b, sa.n AS na, sb.n AS nb,
         |    iv.n_shared,
         |    ${val6("CAST(n_shared AS DOUBLE) / " +
             "(CAST(sa.n + sb.n AS DOUBLE) - CAST(n_shared AS DOUBLE))")}
         |      AS jaccard
         |  FROM iv JOIN sz sa ON iv.source_a = sa.source
         |    JOIN sz sb ON iv.source_b = sb.source
         |  UNION ALL
         |  SELECT source, source, n, n, n, 1.0 FROM sz)
         |ORDER BY source_a NULLS FIRST, source_b NULLS FIRST"""
        .stripMargin,

    // q227: seasonal decomposition — detrending multiplies through by
    // the window width to stay integer; weekday means and σ divide out
    // of exact moments; whole-dollar residual quantization (milli
    // would overflow the squared sums at day grain).,
    "q226_unseen_mass" ->
      """WITH v AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY 1)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_doubletons,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS unseen_mass,
        |  CAST(FLOOR(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) / 1000000.0 AS hapax_share
        |FROM v""".stripMargin,

    // q224: Poisson bootstrap — hash-drawn inverse-CDF weights
    // (thresholds are shared Scala constants), exact integer
    // per-replicate sums, milli-scaled means into integer-moment
    // variance.,
    "q78_doc_histogram" ->
      """SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket_lo,
        |  COUNT(*) AS n_docs, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY 1
        |ORDER BY bucket_lo NULLS FIRST""".stripMargin,

    // Long-form melt of the q45 matrix: one UNION ALL arm per value
    // column, zero cells dropped — semantically UNPIVOT.,
    "q105_top_bigrams" ->
      """WITH b AS (
        |  SELECT lang, UNNEST(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |c AS (SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY 1, 2),
        |r AS (SELECT lang, bigram, n,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY n DESC NULLS LAST, bigram ASC NULLS FIRST) AS rank
        |  FROM c)
        |SELECT lang, rank, bigram, n FROM r WHERE rank <= 5
        |ORDER BY lang ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    // Missing pivot cells coalesce to zero on both sides.,
    "q97_media_meta" -> {
      val hexstr = (0 until 32)
        .map(i => s"md5(id || ':$i')").mkString("concat(", ", ", ")")
      s"""WITH m AS (
         |  SELECT id,
         |    (['image', 'audio', 'video'])[CAST(id % 3 AS INT) + 1] AS kind,
         |    $hexstr AS hexstr
         |  FROM range(500) t(id))
         |SELECT kind, COUNT(*) AS n_media,
         |  CAST(SUM(len(hexstr) // 2) AS BIGINT) AS total_bytes,
         |  COUNT(DISTINCT substring(hexstr, 1, 4)) AS n_prefixes,
         |  MIN(md5(hexstr)) AS min_fp,
         |  MAX(md5(hexstr)) AS max_fp
         |FROM m GROUP BY kind ORDER BY kind ASC NULLS FIRST""".stripMargin
    },

    // q156: rebuilds the same header bytes as a hex string (PNG chunk /
    // JPEG marker layout, dims derived from the id) and parses the
    // dimensions back out with computed-offset substring arithmetic —
    // reading APP0's length and the optional COM segment from the
    // STRING exactly as the JVM walker reads them from the bytes.,
    "q156_media_header_dims" ->
      s"""WITH $mediaDimsCtes
         |SELECT media_id, kind, n_bytes, width, height
         |FROM dims ORDER BY media_id NULLS FIRST""".stripMargin,

    // Replays the same two 64-hash sketches and the same integer
    // estimators; exact counts ride along. Single row — no ORDER BY.,
    "q93_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |o AS (SELECT doc_id, ws,
        |  UNNEST(range(0, GREATEST(len(ws), 1), 40)) AS off FROM t)
        |SELECT doc_id, CAST(off // 40 AS BIGINT) AS chunk_idx,
        |  CAST(LEAST(50, len(ws) - off) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(ws, off + 1, off + 50), ' ')
        |    AS chunk_text
        |FROM o
        |ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST""".stripMargin,

    // Spark dayofweek is 1-based from Sunday; DuckDB 0-based (+1 here).
    // Month-add clamps to month-end identically in both engines.,
    "q110_token_entropy" ->
      s"""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |c AS (SELECT lang, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
         |g AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS n_types,
         |  CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
         |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_clnc
         |  FROM c GROUP BY lang)
         |SELECT lang, n_tokens, n_types,
         |  ${val6("(ln(CAST(n_tokens AS DOUBLE)) - " +
           "(CAST(s_clnc AS DOUBLE) / 1000000.0) / CAST(n_tokens AS DOUBLE))")}
         |    AS entropy_nats
         |FROM g ORDER BY lang NULLS FIRST""".stripMargin,

    // PageRank unrolled: ranks are BIGINT trillionths, every iteration
    // pure integer arithmetic (// division, * , +) — bit-identical in
    // both engines with zero float-order hazard.,
    "q112_hof_sweep" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(ws, t -> len(t) > 5)) AS BIGINT)
        |    AS n_long_tokens,
        |  array_to_string(list_transform(ws[1:3], t -> upper(t)), '_')
        |    AS head3_upper,
        |  CAST(len(text) - (len(ws) - 1) AS BIGINT) AS total_token_chars,
        |  len(list_filter(ws, t -> t = 'the')) > 0 AS has_the,
        |  len(list_filter(ws, t -> len(t) = 0)) = 0 AS all_nonempty,
        |  CAST(list_max(list_transform(ws, t -> len(t))) AS BIGINT)
        |    AS longest_token
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |      FROM documents WHERE doc_id < 150)
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    // Per-label centroids: element values floor-scaled to integer
    // millionths before the sum; the mean divides back once per
    // (label, pos) in the same left-assoc order as the Spark side.,
    "q127_cosine_tf_pairs" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |    FROM documents WHERE doc_id < 60)
         |  GROUP BY doc_id, term),
         |norms AS (SELECT doc_id, SUM(tf * tf) AS q FROM tf GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS ida, b.doc_id AS idb,
         |    CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
         |  FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT ida, idb, dot,
         |  ${val6("dot / (sqrt(CAST(na.q AS DOUBLE)) * sqrt(CAST(nb.q AS DOUBLE)))")}
         |    AS cos_sim
         |FROM pairs
         |JOIN norms na ON na.doc_id = ida
         |JOIN norms nb ON nb.doc_id = idb
         |WHERE dot >= 3
         |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin,

    "q136_pack_sequences" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) AS BIGINT) AS tokens_before,
        |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    1 PRECEDING), 0) // 256 AS BIGINT) AS pack_id
        |FROM d ORDER BY source NULLS FIRST, doc_id NULLS FIRST""".stripMargin,

    // Pack-level summary mart: same window as q136 then a keyed agg;
    // utilization as exact integer permille on both sides.,
    "q140_pack_stats" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT source, doc_id, n_tokens,
        |  COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 256
        |    AS pack_id
        |  FROM d)
        |SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
        |  CAST(SUM(n_tokens) * 1000 // 256 AS BIGINT) AS util_permille
        |FROM p GROUP BY source, pack_id
        |ORDER BY source NULLS FIRST, pack_id NULLS FIRST""".stripMargin,

    // PII redaction: both regexes live in the Java∩RE2 common dialect;
    // exactly one phone + one email per constructed row, so DuckDB's
    // first-match regexp_replace equals Spark's replace-all.,
    "q137_pii_redaction" ->
      """WITH c AS (SELECT c_custkey,
        |    c_name || ' <user' || c_custkey || '@example.com> phone ' ||
        |    (c_custkey % 90 + 10) || '-' || (c_custkey % 900 + 100) || '-' ||
        |    ((c_custkey * 7) % 900 + 100) || '-' ||
        |    ((c_custkey * 13) % 9000 + 1000) ||
        |    ' segment: ' || c_mktsegment AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(raw,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]'),
        |    '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]') AS redacted,
        |  regexp_matches(raw, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')
        |    AS had_phone,
        |  regexp_matches(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')
        |    AS had_email
        |FROM c ORDER BY c_custkey NULLS FIRST""".stripMargin,

    // Golden streaming funnel: the oracle reads the SAME published
    // reference CSV the Spark side streams — batch read vs streamed
    // drain must land on identical counts and exact payment cents.,
    "q142_decontaminate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |eg AS (SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS gram
        |  FROM d, UNNEST(range(1, len(w) - 2)) AS u(i)
        |  WHERE doc_id % 25 = 0 AND len(w) >= 4),
        |tg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS gram
        |  FROM d, UNNEST(range(1, len(w) - 2)) AS u(i)
        |  WHERE doc_id % 25 <> 0 AND len(w) >= 4),
        |h AS (SELECT doc_id, count(*) AS contaminated_grams
        |  FROM tg JOIN eg USING (gram) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(h.contaminated_grams, 0) AS contaminated_grams,
        |  COALESCE(h.contaminated_grams, 0) > 0 AS is_contaminated
        |FROM d LEFT JOIN h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 25 <> 0
        |ORDER BY d.doc_id NULLS FIRST""".stripMargin,

    "q143_repetition_stats" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents),
         |tg AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
         |  FROM d, UNNEST(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
         |tri AS (SELECT doc_id, count(*) AS tri_total,
         |  count(DISTINCT g) AS tri_distinct FROM tg GROUP BY doc_id),
         |bg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
         |  FROM d, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
         |bic AS (SELECT doc_id, g, count(*) AS cnt
         |  FROM bg GROUP BY doc_id, g),
         |bi AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS bi_total,
         |  CAST(MAX(cnt) AS BIGINT) AS top_bi_cnt FROM bic GROUP BY doc_id),
         |j AS (SELECT d.doc_id,
         |    COALESCE(tri.tri_total, 0) AS tri_total,
         |    COALESCE(tri.tri_distinct, 0) AS tri_distinct,
         |    CASE WHEN COALESCE(tri.tri_total, 0) > 0 THEN ${val6(
          "CAST(tri.tri_total - tri.tri_distinct AS DOUBLE) / tri.tri_total")}
         |      ELSE 0.0 END AS dup_tri_frac,
         |    CASE WHEN COALESCE(bi.bi_total, 0) > 0 THEN ${val6(
          "CAST(bi.top_bi_cnt AS DOUBLE) / bi.bi_total")}
         |      ELSE 0.0 END AS top_bi_frac
         |  FROM d LEFT JOIN tri ON d.doc_id = tri.doc_id
         |  LEFT JOIN bi ON d.doc_id = bi.doc_id)
         |SELECT doc_id, tri_total, tri_distinct, dup_tri_frac, top_bi_frac,
         |  dup_tri_frac <= 0.2 AND top_bi_frac <= 0.2 AS keep
         |FROM j ORDER BY doc_id NULLS FIRST""".stripMargin,

    // the composed curation chain: every stage CTE is the same logic
    // already gated standalone (q29/q28/q143/q142/q65),
    "q145_curation_verdicts" ->
      s"""WITH RECURSIVE $curationCtes
         |SELECT doc_id, lang_ok, quality_ok, rep_ok, decon_ok, dedup_ok,
         |  lang_ok AND quality_ok AND rep_ok AND decon_ok AND dedup_ok
         |    AS keep
         |FROM v ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q154: the ENTIRE training pipeline (curate → balance → shard →
    // pack, four truncate-written layers) replayed relationally. Stage
    // CTEs are the same logic gated standalone: verdicts = q145 minus
    // the lang-select (the pipeline balances languages instead of
    // selecting one), mixture = q149 with rates from the KEPT corpus,
    // shard = q144 over the MIXED corpus, packs = q136 scoped to
    // (shard, source).,
    "q154_training_pipeline" ->
      s"""WITH RECURSIVE $curationCtes,
         |mk AS (SELECT doc_id FROM v
         |  WHERE quality_ok AND rep_ok AND decon_ok AND dedup_ok),
         |kept AS (SELECT doc.doc_id, doc.lang, doc.source, doc.text
         |  FROM documents doc JOIN mk USING (doc_id)),
         |lc AS (SELECT lang, count(*) AS cnt FROM kept GROUP BY lang),
         |lr AS (SELECT lang,
         |  (SELECT min(cnt) FROM lc) * 1000000 // cnt AS mix_threshold
         |  FROM lc),
         |mixed AS (SELECT k.* FROM kept k JOIN lr USING (lang)
         |  WHERE ${h32("'mix:' || k.doc_id")} % 1000000
         |    < lr.mix_threshold),
         |sr AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (ORDER BY md5('shard:' || doc_id), doc_id)
         |    AS rk FROM mixed),
         |shd AS (SELECT doc_id, (rk - 1) % 8 AS shard, (rk - 1) // 8 AS pos
         |  FROM sr),
         |tok AS (SELECT m.doc_id, m.lang, m.source, shd.shard, shd.pos,
         |    CAST(len(string_split(m.text, ' ')) AS BIGINT) AS n_tokens
         |  FROM mixed m JOIN shd USING (doc_id)),
         |packed AS (SELECT *,
         |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard, source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    1 PRECEDING), 0) // 256 AS BIGINT) AS pack_id
         |  FROM tok)
         |SELECT doc_id, lang, source, CAST(shard AS BIGINT) AS shard,
         |  CAST(pos AS BIGINT) AS pos, n_tokens, pack_id
         |FROM packed ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q157: the Spark side answers INCREMENTALLY (stored prev verdicts
    // + delta-only stage recompute + affected-component-only closure);
    // the oracle recomputes the FULL chain on the current snapshot from
    // scratch — a hash match proves incremental ≡ full on every row.,
    "q157_incremental_curation" -> incrementalCurationOracle,

    // q162 maintains the same verdict table CONTINUOUSLY (foreachBatch
    // applying one incremental step per micro-batch, tombstones for
    // removals); the drained end state must equal q157's — same oracle.,
    "q146_curation_funnel" ->
      s"""WITH RECURSIVE $curationCtes
         |SELECT * FROM (
         |  SELECT 0 AS stage_no, 'ingest' AS stage, count(*) AS survivors
         |    FROM v
         |  UNION ALL SELECT 1, 'lang', count(*) FROM v WHERE lang_ok
         |  UNION ALL SELECT 2, 'quality', count(*) FROM v
         |    WHERE lang_ok AND quality_ok
         |  UNION ALL SELECT 3, 'repetition', count(*) FROM v
         |    WHERE lang_ok AND quality_ok AND rep_ok
         |  UNION ALL SELECT 4, 'decontamination', count(*) FROM v
         |    WHERE lang_ok AND quality_ok AND rep_ok AND decon_ok
         |  UNION ALL SELECT 5, 'dedup', count(*) FROM v
         |    WHERE lang_ok AND quality_ok AND rep_ok AND decon_ok
         |      AND dedup_ok)
         |ORDER BY stage_no""".stripMargin,

    // q159: same pair graph + closure as q65; the canonical within each
    // cluster is the highest-quality copy (most tokens, doc_id ties)
    "q159_quality_canonical" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
         |edges AS (SELECT ida AS s, idb AS d FROM pairs
         |  UNION SELECT idb, ida FROM pairs),
         |reach(id, r) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
         |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
         |  FROM reach GROUP BY id),
         |q AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
         |  FROM documents),
         |a AS (SELECT q.doc_id, q.n_tokens,
         |    COALESCE(c.component, q.doc_id) AS component
         |  FROM q LEFT JOIN comp c ON q.doc_id = c.id)
         |SELECT doc_id, component,
         |  COUNT(*) OVER (PARTITION BY component) AS cluster_size,
         |  CAST(n_tokens AS INT) AS n_tokens,
         |  ROW_NUMBER() OVER (PARTITION BY component
         |    ORDER BY n_tokens DESC, doc_id ASC) = 1 AS is_canonical
         |FROM a ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q160: vocabulary CDF — DuckDB states the rank/cumsum as plain
    // global windows; Spark reaches the identical values through the
    // two-phase range-partitioned prefix-sum (no single-partition sort),
    "q160_vocab_coverage" ->
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
         |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
         |r AS (SELECT token, cnt,
         |    ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM c)
         |SELECT token, cnt, rank, cum_tokens,
         |  ${val6("cum_tokens / (SELECT total FROM tot)")} AS coverage
         |FROM r WHERE rank <= 200
         |ORDER BY rank""".stripMargin,

    // the doubled stream delivers every content twice; after per-feed
    // fingerprint dedup the stats must equal the batch distinct-
    // (source, content) aggregation — duplicate contents share one
    // token count, so the representative choice cannot skew n_tokens,
    "q149_lang_mixture" ->
      s"""WITH c AS (SELECT lang, count(*) AS cnt
         |  FROM documents GROUP BY lang),
         |m AS (SELECT min(cnt) AS mc FROM c),
         |r AS (SELECT lang, cnt,
         |  (SELECT mc FROM m) * 1000000 // cnt AS mix_threshold FROM c)
         |SELECT d.doc_id, d.lang, r.cnt, r.mix_threshold,
         |  ${h32("'mix:' || d.doc_id")} % 1000000 AS hash_bucket,
         |  ${h32("'mix:' || d.doc_id")} % 1000000 < r.mix_threshold AS keep
         |FROM documents d JOIN r USING (lang)
         |ORDER BY d.doc_id NULLS FIRST""".stripMargin,

    // the oracle recomputes the upsert+delete chain relationally: the
    // %6 updates are a subset of the %3 base (pure matched-update), the
    // %9 delete prunes after,
    "q150_corpus_diff" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |v1 AS (SELECT doc_id,
        |    md5(regexp_replace(lower(CASE WHEN doc_id % 11 = 0
        |      THEN text || ' [edited]' ELSE text END), '\s+', ' ', 'g'))
        |      AS fp1
        |  FROM d WHERE doc_id % 7 <> 0),
        |v2 AS (SELECT doc_id,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp2
        |  FROM d WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.fp1 IS NULL THEN 'added'
        |       WHEN v2.fp2 IS NULL THEN 'removed'
        |       WHEN v1.fp1 <> v2.fp2 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY 1 NULLS FIRST""".stripMargin,

    // md5 of the seeded key gives both engines the identical shuffle
    // order; shard/pos are integer math over the global row number,
    "q144_shuffle_shard" ->
      """WITH r AS (SELECT doc_id,
        |  ROW_NUMBER() OVER (ORDER BY md5('shard:' || doc_id), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, (rk - 1) % 8 AS shard, (rk - 1) // 8 AS pos
        |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin,

    // q246: rank-based 10%-trimmed + winsorized means — no percentile
    // interpolation; ties broken on o_orderkey so ranks are exact.,
    "q247_zipf_profile" ->
      """WITH tf AS (SELECT token, COUNT(*) AS freq FROM (
        |    SELECT UNNEST(string_split(text, ' ')) AS token
        |    FROM documents) GROUP BY token),
        |r AS (SELECT token, freq,
        |    ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rk FROM tf),
        |p AS (SELECT rk, token, freq FROM r
        |  WHERE rk <= 8192 AND (rk & (rk - 1)) = 0)
        |SELECT a.rk AS rk, a.token AS token, a.freq AS freq,
        |  a.freq * a.rk AS zipf_product,
        |  CAST(CAST(FLOOR(CAST(a.freq AS DOUBLE) / CAST(b.freq AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0
        |    AS doubling_ratio
        |FROM p a LEFT JOIN p b ON b.rk = a.rk * 2
        |ORDER BY rk NULLS FIRST""".stripMargin,

    // q248: l-diversity audit — band-grain count then cell-grain
    // rollup; top_share is an exact-integer IEEE division.,
    "q248_l_diversity" ->
      """WITH b AS (SELECT CAST(c_nationkey AS INT) AS c_nationkey,
        |    c_mktsegment,
        |    CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |      AS DOUBLE) / 100000.0) AS BIGINT) AS band
        |  FROM customer),
        |bf AS (SELECT c_nationkey, c_mktsegment, band,
        |    CAST(COUNT(*) AS BIGINT) AS f
        |  FROM b GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment AS segment,
        |  CAST(SUM(f) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  CAST(MAX(f) AS BIGINT) AS max_f,
        |  CAST(MAX(f) AS DOUBLE) / CAST(SUM(f) AS DOUBLE) AS top_share,
        |  CASE WHEN COUNT(*) >= 3 THEN 'diverse' ELSE 'exposed' END
        |    AS status
        |FROM bf GROUP BY 1, 2
        |ORDER BY c_nationkey NULLS FIRST, segment NULLS FIRST"""
        .stripMargin,

    // q303: chunk-grain near-dups — the q33 MinHash CTE chain run over
    // the q93 chunk derivation (keys packed doc_id*1e5 + chunk_idx),
    // folded to cross-doc pairs with shared-chunk counts.,
    "q303_chunk_near_dups" ->
      s"""WITH tq AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |oq AS (SELECT doc_id, ws,
         |  UNNEST(range(0, GREATEST(len(ws), 1), 40)) AS off FROM tq),
         |ck AS (SELECT doc_id * 100000 + (off // 40) AS doc_id,
         |    array_to_string(list_slice(ws, off + 1, off + 50), ' ')
         |      AS text
         |  FROM oq),
         |${minhashPairsCtesFrom("ck")}
         |SELECT ida // 100000 AS doc_a, idb // 100000 AS doc_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_chunk_pairs,
         |  MAX(jaccard) AS max_jaccard
         |FROM pairs WHERE ida // 100000 <> idb // 100000
         |GROUP BY 1, 2
         |ORDER BY doc_a NULLS FIRST, doc_b NULLS FIRST""".stripMargin,

    // q304: DP noisy release — deterministic inverse-CDF two-sided
    // geometric from the portable cell-key hash; one ln + IEEE
    // mul/divs stated identically (the q182 determinism class).,
    "q304_dp_noisy_release" ->
      s"""WITH g AS (SELECT CAST(c_nationkey AS INT) AS c_nationkey,
         |    c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM customer GROUP BY 1, 2),
         |w AS (SELECT *,
         |    2.0 * ((CAST(${h32(
              "CAST(c_nationkey AS VARCHAR) || '|' || segment")}
         |      % 1000000 AS DOUBLE) + 0.5) / 1000000.0) - 1.0 AS up
         |  FROM g),
         |z AS (SELECT *, CAST(SIGN(up) AS BIGINT)
         |    * CAST(FLOOR(ln(1.0 - ABS(up)) / -1.0) AS BIGINT) AS noise
         |  FROM w)
         |SELECT c_nationkey, segment, n, noise, n + noise AS noisy_count,
         |  1.0 AS epsilon, n + noise < 5 AS suppressed
         |FROM z
         |ORDER BY c_nationkey NULLS FIRST, segment NULLS FIRST"""
        .stripMargin,

    // q301: t-closeness — EMD over ordered acctbal bands as the mean
    // |cumulative micro-share gap| between each cell's distribution
    // and the table's; every share a BIGINT micro division, the gap
    // sum order-independent.,
    "q301_t_closeness" ->
      """WITH b AS (SELECT CAST(c_nationkey AS INT) AS c_nationkey,
        |    c_mktsegment,
        |    CAST(FLOOR(CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
        |      AS DOUBLE) / 100000.0) AS BIGINT) AS band
        |  FROM customer),
        |bf AS (SELECT c_nationkey, c_mktsegment, band,
        |    CAST(COUNT(*) AS BIGINT) AS f
        |  FROM b GROUP BY 1, 2, 3),
        |gd AS (SELECT band, CAST(SUM(f) AS BIGINT) AS g FROM bf
        |  GROUP BY 1),
        |gt AS (SELECT CAST(SUM(f) AS BIGINT) AS nn,
        |    CAST(COUNT(DISTINCT band) AS BIGINT) AS m FROM bf),
        |gcum AS (SELECT band, m,
        |    (CAST(SUM(g) OVER (ORDER BY band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) * 1000000) // nn AS pg6
        |  FROM gd CROSS JOIN gt),
        |cells AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM bf),
        |grid AS (SELECT c.c_nationkey, c.c_mktsegment, g.band, g.m,
        |    g.pg6, COALESCE(bf.f, 0) AS f
        |  FROM cells c CROSS JOIN gcum g
        |  LEFT JOIN bf ON bf.c_nationkey = c.c_nationkey
        |    AND bf.c_mktsegment = c.c_mktsegment AND bf.band = g.band),
        |cum AS (SELECT *,
        |    CAST(SUM(f) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cum_f,
        |    CAST(SUM(f) OVER (PARTITION BY c_nationkey, c_mktsegment)
        |      AS BIGINT) AS n
        |  FROM grid)
        |SELECT c_nationkey, c_mktsegment AS segment,
        |  CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(ABS((cum_f * 1000000) // n - pg6)) AS BIGINT)
        |    // (MAX(m) - 1) AS emd6,
        |  CAST(CAST(SUM(ABS((cum_f * 1000000) // n - pg6)) AS BIGINT)
        |    // (MAX(m) - 1) AS DOUBLE) / 1000000.0 AS emd,
        |  CAST(SUM(ABS((cum_f * 1000000) // n - pg6)) AS BIGINT)
        |    // (MAX(m) - 1) <= 200000 AS t_close
        |FROM cum GROUP BY 1, 2
        |ORDER BY c_nationkey NULLS FIRST, segment NULLS FIRST"""
        .stripMargin,

    // q249: item-item cosine recommendations — co/sqrt(du*dv) on
    // exact integers; rank on the raw double, ties (co desc, v asc).,

    // q291: epoch-mix plan — pure integer arithmetic over per-source
    // token sums; floor divisions stated identically on both engines.,
    "q291_epoch_mix" ->
      """WITH s AS (SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_sources FROM s),
        |plan AS (SELECT source, n_docs, n_tokens,
        |    total_tokens // 2 // n_sources AS target_tokens,
        |    LEAST(4000000,
        |      (total_tokens // 2 // n_sources) * 1000000 // n_tokens)
        |      AS repeat_micro
        |  FROM s CROSS JOIN tot)
        |SELECT source, n_docs, n_tokens, target_tokens,
        |  CAST(repeat_micro AS BIGINT) AS repeat_micro,
        |  CAST(n_tokens * repeat_micro // 1000000 AS BIGINT)
        |    AS planned_tokens,
        |  repeat_micro = 4000000 AS capped,
        |  CAST(target_tokens - n_tokens * repeat_micro // 1000000
        |    AS BIGINT) AS shortfall
        |FROM plan ORDER BY source NULLS FIRST""".stripMargin,

    // q289: the tar member walk — the oracle derives the ustar layout
    // analytically from the same generative parameters (name/size
    // formulas, 512-byte header + NUL-padded data blocks, offsets via
    // a windowed prefix sum of padded sizes) and the payload head
    // from the same md5-repeat payload; the Spark side extracts those
    // bytes by genuinely parsing headers (octal size field, checksum
    // re-sum, magic/typeflag, end-of-archive zero blocks), so any
    // drift between walker arithmetic and layout fails the hash.
    // Shards ≡ 0 (mod 17) truncate mid-header → sentinel rows.,
    // q302: zip central-directory walk — the oracle re-derives the
    // member listing from the generator's closed-form parameters
    // (data offset = running sum of 30 + name + payload per local
    // header, + this member's 30 + name); CRC-32 has no SQL closed
    // form, so its validation lives entirely in the walker (a CRC
    // mismatch yields the sentinel row the oracle would not match).,
    "q302_zip_member_walk" ->
      """WITH shards AS (SELECT r AS sid FROM range(500) t(r)),
        |mem AS (SELECT sid, UNNEST(range(0, sid % 3 + 2)) AS j
        |  FROM shards),
        |base AS (SELECT sid, j,
        |    's' || CAST(sid AS VARCHAR) || '/d' || CAST(j AS VARCHAR)
        |      || '.' || CASE j % 3 WHEN 0 THEN 'txt'
        |        WHEN 1 THEN 'json' ELSE 'jpg' END AS name,
        |    (sid * 31 + j * 17) % 200 AS sz
        |  FROM mem),
        |off AS (SELECT sid, j, name, sz,
        |    COALESCE(SUM(30 + length(name) + sz)
        |      OVER (PARTITION BY sid ORDER BY j
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + 30 + length(name) AS doff
        |  FROM base)
        |SELECT sid AS shard_id, CAST(j AS INT) AS member_idx, name,
        |  CAST(sz AS BIGINT) AS size_bytes,
        |  CAST(doff AS BIGINT) AS data_offset,
        |  upper(substr(repeat(md5(CAST(sid AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)), 13),
        |    1, CAST(LEAST(16, sz * 2) AS INT))) AS payload_head,
        |  TRUE AS crc_ok
        |FROM off WHERE sid % 17 <> 0
        |UNION ALL
        |SELECT sid, CAST(-1 AS INT), '', CAST(-1 AS BIGINT),
        |  CAST(-1 AS BIGINT), '', FALSE
        |FROM shards WHERE sid % 17 = 0
        |ORDER BY shard_id NULLS FIRST, member_idx NULLS FIRST"""
        .stripMargin,

    "q289_tar_member_walk" ->
      """WITH shards AS (SELECT r AS sid FROM range(500) t(r)),
        |mem AS (SELECT sid, UNNEST(range(0, sid % 3 + 2)) AS j
        |  FROM shards),
        |base AS (SELECT sid, j,
        |    's' || CAST(sid AS VARCHAR) || '/d' || CAST(j AS VARCHAR)
        |      || '.' || CASE j % 3 WHEN 0 THEN 'txt'
        |        WHEN 1 THEN 'json' ELSE 'jpg' END AS name,
        |    (sid * 31 + j * 17) % 200 AS sz
        |  FROM mem),
        |off AS (SELECT sid, j, name, sz,
        |    512 * (j + 1) + COALESCE(SUM(CASE WHEN sz = 0 THEN 0
        |        ELSE ((sz + 511) // 512) * 512 END)
        |      OVER (PARTITION BY sid ORDER BY j
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS doff
        |  FROM base)
        |SELECT sid AS shard_id, CAST(j AS INT) AS member_idx, name,
        |  CAST(sz AS BIGINT) AS size_bytes,
        |  CAST(doff AS BIGINT) AS data_offset,
        |  upper(substr(repeat(md5(CAST(sid AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)), 13),
        |    1, CAST(LEAST(16, sz * 2) AS INT))) AS payload_head
        |FROM off WHERE sid % 17 <> 0
        |UNION ALL
        |SELECT sid, CAST(-1 AS INT), '', CAST(-1 AS BIGINT),
        |  CAST(-1 AS BIGINT), ''
        |FROM shards WHERE sid % 17 = 0
        |ORDER BY shard_id NULLS FIRST, member_idx NULLS FIRST"""
        .stripMargin,

    // q318: WARC record walk — the oracle re-derives the listing from
    // the generator's closed form (record population, sizes, md5
    // payload streams); header/separator/offset validation lives in
    // the walker.,
    "q318_warc_record_walk" ->
      """WITH shards AS (SELECT r AS sid FROM range(500) t(r)),
        |mem AS (SELECT sid, UNNEST(range(0, sid % 3 + 2)) AS j
        |  FROM shards),
        |base AS (SELECT sid, j,
        |    'http://ex.com/s' || CAST(sid AS VARCHAR) || '/p'
        |      || CAST(j AS VARCHAR) AS uri,
        |    (sid * 37 + j * 19) % 300 AS sz
        |  FROM mem)
        |SELECT sid AS shard_id, CAST(j AS INT) AS record_idx,
        |  'response' AS warc_type, uri AS target_uri,
        |  CAST(sz AS BIGINT) AS content_length,
        |  upper(substr(repeat(md5(CAST(sid AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)), 19),
        |    1, CAST(LEAST(16, sz * 2) AS INT))) AS payload_head
        |FROM base WHERE sid % 17 <> 0
        |UNION ALL
        |SELECT sid, CAST(-1 AS INT), '', '', CAST(-1 AS BIGINT), ''
        |FROM shards WHERE sid % 17 = 0
        |ORDER BY shard_id NULLS FIRST, record_idx NULLS FIRST"""
        .stripMargin,

    // q315: CCNet perplexity terciles — q178's exact integer LM score
    // per doc, integer per-token NLL as the rank key, head/middle/tail
    // by per-language rank thirds (3r <= n / 3r <= 2n).,
    "q315_ccnet_buckets" ->
      s"""WITH tok AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS t FROM documents),
         |vo AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM tok),
         |sc AS (SELECT doc_id, MIN(lang) AS lang,
         |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(FLOOR(
         |      ln(CAST(vo.c + 1 AS DOUBLE) / CAST(tt.n + tt.v AS DOUBLE))
         |      * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS slp9
         |  FROM tok JOIN vo USING (t) CROSS JOIN tt GROUP BY doc_id),
         |np AS (SELECT doc_id, lang, n_tokens,
         |    (-slp9) // n_tokens AS npt9 FROM sc),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY npt9 NULLS FIRST, doc_id NULLS FIRST) AS r,
         |    COUNT(*) OVER (PARTITION BY lang) AS n_lang FROM np),
         |b AS (SELECT *, CASE WHEN r * 3 <= n_lang THEN 'head'
         |    WHEN r * 3 <= n_lang * 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket FROM r)
         |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(MIN(npt9) AS DOUBLE) / 1000000000.0 AS nll_lo,
         |  CAST(MAX(npt9) AS DOUBLE) / 1000000000.0 AS nll_hi,
         |  ${val6("CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_lang) AS DOUBLE)")}
         |    AS share,
         |  (bucket <> 'tail') AS kept
         |FROM b GROUP BY lang, bucket
         |ORDER BY lang NULLS FIRST, bucket NULLS FIRST""".stripMargin,
  )
}
