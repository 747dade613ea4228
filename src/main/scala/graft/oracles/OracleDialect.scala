package graft.oracles

import graft.operators.{Analytics, Events, Expectations, Features, Gold, Graphs, PrefixJoin, Privacy, Relational, Scd2, TextOps, VectorOps}
import graft.util.Portable.Sql._

/** The DuckDB oracle dialect toolkit shared by the per-family oracle
  * registries: portable float/money forms, shared CTE fragments
  * (SCD2, BM25, IVF epochs, k-means, MinHash, curation, …), and the
  * engine-mirrored expression trees (Wilson, cosine). Every helper
  * moved verbatim from the pre-split SparkEntry — the strings these
  * produce are byte-identical to round 7's (the gate hashes prove
  * it).
  */
object OracleDialect {

  // ---- DuckDB oracle SQL ------------------------------------------------

  /** The retrieval family's FIXED query cohort — mirrors
    * [[graft.operators.Retrieval.QueryCohortBound]]: every 100th doc
    * within the base corpus id space [0, 10.5M). At the gate fixtures
    * (sf ≤ 1) the bound is a no-op; on ScaleGen decade fixtures it
    * pins the workload to copy 0's queries so the corpus scales and
    * the query set does not. */
  private[graft] def queryCohort(col: String): String =
    s"$col % 100 = 0 AND $col < ${graft.operators.Retrieval.QueryCohortBound}"

  /** The Wilson 95% tree (q263/q274) as SQL strings — mirrors
    * `Analytics.wilson` expression-for-expression. Returns
    * (phat, lo, hi). */
  private[graft] def wilsonSql(n: String, k: String)
      : (String, String, String) = {
    val phat = s"($k) / ($n)"
    val denom = s"1.0 + (1.96 * 1.96) / ($n)"
    val center = s"(($phat) + (1.96 * 1.96) / (2.0 * ($n))) / ($denom)"
    val half = s"1.96 * sqrt(($phat) * (1.0 - ($phat)) / ($n)" +
      s" + (1.96 * 1.96) / (4.0 * ($n) * ($n))) / ($denom)"
    (phat, s"($center) - ($half)", s"($center) + ($half)")
  }
  // Money mirrors graft.util.Portable: floor(x*scale+0.5) scaled-integer
  // sums, divided back to double only at the output boundary. Every
  // multi-row result carries a total ORDER BY.

  private[graft] val netExpr = "l_extendedprice * (1.0 - l_discount)"

  /** Shared by q169 (batch PSI) and q176 (the continuous monitor —
    * the drained incremental state must read off the identical
    * statistic). */
  private[graft] val psiDriftSql: String =
    """WITH e AS (SELECT event_type,
      |    CAST(LEAST(FLOOR(value / 50.0), 9.0) AS INT) AS bucket,
      |    ts < TIMESTAMP '2024-01-16 00:00:00' AS is_a
      |  FROM events),
      |g AS (SELECT event_type, bucket,
      |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM e GROUP BY 1, 2),
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
      |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin

  /** DuckDB mirror of [[graft.util.Portable.portable32]]. */
  private[graft] def h32(x: String) = s"CAST('0x' || substr(md5($x), 1, 8) AS BIGINT)"

  /** DuckDB mirror of [[TextOps.contentFp]] (for interpolated contexts
    * where a literal backslash escape is awkward). */
  private[graft] val fpSqlExpr =
    "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Generated CTE chain mirroring [[graft.operators.BpeTrain]]: one
    * chain link per merge round (pair counts → argmax → positional
    * rebuild). Shared by q206 (per-round stats) and q207 (the apply
    * pass over the final vocabulary v8). */
  private[graft] val bpeIters = 8
  private[graft] val bpeCtes: String = {
    val iters = bpeIters
    val v0 =
      """v0 AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
        |    list_transform(range(1, len(word)+1),
        |      i -> substr(word, i, 1)) AS syms
        |  FROM (SELECT UNNEST(string_split(text, ' ')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""p$i AS (
         |  SELECT p.l AS l, p.r AS r,
         |    CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, UNNEST(list_transform(range(1, len(syms)),
         |      j -> struct_pack(l := syms[j], r := syms[j+1]))) AS p
         |    FROM v$p WHERE len(syms) >= 2)
         |  WHERE p.l <> p.r GROUP BY 1, 2),
         |b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r
         |  LIMIT 1),
         |v$i AS (
         |  SELECT word, freq,
         |    list_filter(list_transform(range(1, len(syms)+1), j ->
         |      CASE WHEN j > 1 AND syms[j-1] = b.l AND syms[j] = b.r
         |        THEN NULL
         |      WHEN syms[j] = b.l AND j < len(syms)
         |          AND syms[j+1] = b.r
         |        THEN syms[j] || syms[j+1]
         |      ELSE syms[j] END), x -> x IS NOT NULL) AS syms
         |  FROM v$p CROSS JOIN b$i b)""".stripMargin
    }
    (v0 +: rounds).mkString(",\n")
  }

  private[graft] val bpeTrainSql: String = {
    val stats = (1 to bpeIters).map { i =>
      s"""SELECT CAST($i AS INT) AS iteration, b.l AS left_sym,
         |  b.r AS right_sym, b.cnt AS n_sites,
         |  (SELECT CAST(COUNT(DISTINCT s) AS BIGINT)
         |   FROM v$i, UNNEST(syms) t(s)) AS vocab_size
         |FROM b$i b""".stripMargin
    }
    s"WITH $bpeCtes\n" +
      stats.mkString("\nUNION ALL\n") + "\nORDER BY iteration"
  }

  /** q191's full MMR oracle — also the base subquery of q218. */
  private[graft] lazy val mmrOracle: String =
    s"""WITH $docVecCtes,
         |rdots AS (SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
         |    SUM(a.w * b.w) AS dot
         |  FROM dvec a JOIN dvec b ON a.dim = b.dim
         |  WHERE ${queryCohort("a.doc_id")} AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |rel0 AS (SELECT qn.doc_id AS query_id, cn.doc_id,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
         |      AS rel
         |  FROM dnorm qn JOIN dnorm cn
         |    ON ${queryCohort("qn.doc_id")} AND cn.doc_id <> qn.doc_id
         |  LEFT JOIN rdots d ON d.query_id = qn.doc_id
         |    AND d.doc_id = cn.doc_id
         |  WHERE qn.n2 > 0 AND cn.n2 > 0),
         |pool AS (SELECT query_id, doc_id, rel FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC NULLS LAST, doc_id) AS rr
         |    FROM rel0) WHERE rr <= 10),
         |pids AS (SELECT DISTINCT doc_id FROM pool),
         |pvec AS (SELECT v.* FROM dvec v JOIN pids USING (doc_id)),
         |pdots AS (SELECT a.doc_id AS da, b.doc_id AS db,
         |    SUM(a.w * b.w) AS dot
         |  FROM pvec a JOIN pvec b ON a.dim = b.dim
         |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
         |psim AS (SELECT p1.query_id, p1.doc_id AS da, p2.doc_id AS db,
         |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
         |      AS sim
         |  FROM pool p1 JOIN pool p2 ON p1.query_id = p2.query_id
         |    AND p1.doc_id <> p2.doc_id
         |  JOIN dnorm na ON na.doc_id = p1.doc_id
         |  JOIN dnorm nb ON nb.doc_id = p2.doc_id
         |  LEFT JOIN pdots d ON d.da = p1.doc_id AND d.db = p2.doc_id),
         |s1 AS (SELECT query_id, doc_id AS d1, 0.7 * rel AS score1
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC NULLS LAST, doc_id) AS rn
         |    FROM pool) WHERE rn = 1),
         |m2 AS (SELECT p.query_id, p.doc_id, s1.d1, s1.score1,
         |    0.7 * p.rel - 0.3 * ps.sim AS mmr2
         |  FROM pool p JOIN s1 USING (query_id)
         |  JOIN psim ps ON ps.query_id = p.query_id
         |    AND ps.da = p.doc_id AND ps.db = s1.d1
         |  WHERE p.doc_id <> s1.d1),
         |s2 AS (SELECT query_id, d1, score1, doc_id AS d2, mmr2 AS score2
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY mmr2 DESC NULLS LAST, doc_id) AS rn
         |    FROM m2) WHERE rn = 1),
         |m3 AS (SELECT p.query_id, p.doc_id, s2.d1, s2.d2, s2.score1,
         |    s2.score2,
         |    0.7 * p.rel - 0.3 * GREATEST(pa.sim, pb.sim) AS mmr3
         |  FROM pool p JOIN s2 USING (query_id)
         |  JOIN psim pa ON pa.query_id = p.query_id
         |    AND pa.da = p.doc_id AND pa.db = s2.d1
         |  JOIN psim pb ON pb.query_id = p.query_id
         |    AND pb.da = p.doc_id AND pb.db = s2.d2
         |  WHERE p.doc_id <> s2.d1 AND p.doc_id <> s2.d2),
         |s3 AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY mmr3 DESC NULLS LAST,
         |      doc_id) AS rn
         |    FROM m3) WHERE rn = 1),
         |u AS (SELECT query_id, 1 AS pick_no, d1 AS doc_id,
         |    score1 AS score FROM s3
         |  UNION ALL SELECT query_id, 2, d2, score2 FROM s3
         |  UNION ALL SELECT query_id, 3, doc_id, mmr3 FROM s3)
         |SELECT query_id, pick_no, doc_id, ${val6("score")} AS score
         |FROM u ORDER BY query_id, pick_no""".stripMargin

  /** Relational exact containment (shared by q209's batch join and
    * q212's drained streaming monitor — one contract, two run modes). */
  private[graft] lazy val containmentOracle: String =
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
       |  FROM documents),
       |s AS (SELECT doc_id, list_distinct($shingleExpr) AS shs FROM d),
       |ta AS (SELECT doc_id, UNNEST(shs) AS tok FROM s
       |  WHERE doc_id % 25 = 0),
       |sa AS (SELECT doc_id, len(shs) AS m FROM s
       |  WHERE doc_id % 25 = 0),
       |tb AS (SELECT doc_id, UNNEST(shs) AS tok FROM s),
       |ov AS (SELECT a.doc_id AS eval_id, b.doc_id AS doc_id,
       |    CAST(COUNT(*) AS DOUBLE) AS c
       |  FROM ta a JOIN tb b ON a.tok = b.tok
       |    AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2),
       |j AS (SELECT eval_id, ov.doc_id, c / sa.m AS cont
       |  FROM ov JOIN sa ON ov.eval_id = sa.doc_id)
       |SELECT eval_id, doc_id, ${val6("cont")} AS containment
       |FROM j WHERE cont >= 0.5
       |ORDER BY eval_id NULLS FIRST, doc_id NULLS FIRST""".stripMargin

  /** DuckDB mirror of TextOps.shingles over `text` and `ws` columns. */
  private[graft] val shingleExpr =
    "CASE WHEN len(ws) < 3 THEN [text] ELSE " +
      "list_transform(range(1, len(ws) - 1), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END"

  /** DuckDB mirror of TextOps.simhash: 32 bit-majority terms. */
  private[graft] val simhashCore: String = {
    val terms = (0 until TextOps.SimhashBits).map { b =>
      s"CASE WHEN 2 * len(list_filter(hs, x -> ((x >> $b) & 1) = 1)) " +
        s">= len(hs) THEN ${1L << b} ELSE 0 END"
    }
    s"""h AS (SELECT doc_id,
       |  list_transform(string_split(text, ' '), t -> ${h32("t")}) AS hs
       |  FROM documents),
       |sim AS (
       |  SELECT doc_id, CAST(${terms.mkString("\n  + ")} AS BIGINT) AS simhash
       |  FROM h)""".stripMargin
  }

  private[graft] val simhashSql: String =
    s"WITH $simhashCore\nSELECT doc_id, simhash FROM sim ORDER BY doc_id NULLS FIRST"

  private[graft] def minhashCols: String =
    (0 until TextOps.MinhashSeeds).map(i =>
      s"list_min(list_transform(hs, h -> (h * ${TextOps.MinhashA(i)} " +
        s"+ ${TextOps.MinhashB(i)}) % ${TextOps.MinhashP})) AS mh$i")
      .mkString(",\n  ")

  private[graft] val minhashSigSql: String =
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
       |  FROM documents),
       |s AS (SELECT doc_id,
       |  list_transform($shingleExpr, x -> ${h32("x")}) AS hs FROM d)
       |SELECT doc_id,
       |  $minhashCols
       |FROM s ORDER BY doc_id NULLS FIRST""".stripMargin

  private[graft] val jaccardExpr =
    "CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) " +
      "/ len(list_distinct(list_concat(a.shs, b.shs)))"

  /** CTE chain ending in `pairs(ida, idb, jaccard)` — the verified
    * MinHash near-dup pairs. Shared by q33 (the pair list itself) and
    * q65 (connected components over the pair graph); `src` parameterizes
    * the corpus so q157 can run the identical chain over a SNAPSHOT
    * derivation CTE instead of the raw documents table. */
  private[graft] def minhashPairsCtesFrom(src: String): String = {
    val bands = (0 until TextOps.MinhashSeeds / 2).map(b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig")
      .mkString("\n  UNION ALL ")
    s"""d AS (SELECT doc_id, text, string_split(text, ' ') AS ws
       |  FROM $src),
       |s AS (SELECT doc_id, $shingleExpr AS sh FROM d),
       |sh AS (SELECT doc_id,
       |  list_transform(sh, x -> ${h32("x")}) AS hs FROM s),
       |sig AS (SELECT doc_id,
       |  $minhashCols
       |  FROM sh),
       |bands AS (
       |  $bands),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.h1 = y.h1 AND x.h2 = y.h2
       |   AND x.doc_id < y.doc_id),
       |sets AS (SELECT doc_id, list_distinct(sh) AS shs FROM s),
       |cpairs AS (
       |  SELECT ida, idb, $jaccardExpr AS jacc
       |  FROM cand JOIN sets a ON ida = a.doc_id JOIN sets b ON idb = b.doc_id),
       |pairs AS (
       |  SELECT ida, idb, ${val6("jacc")} AS jaccard
       |  FROM cpairs WHERE jacc >= 0.7)""".stripMargin
  }

  private[graft] val minhashPairsCtes: String = minhashPairsCtesFrom("documents")

  private[graft] val minhashNearDupSql: String =
    s"""WITH $minhashPairsCtes
       |SELECT ida, idb, jaccard FROM pairs
       |ORDER BY ida NULLS FIRST, idb NULLS FIRST""".stripMargin

  /** Shared by q65 (min-label propagation) and q104 (large-star/small-
    * star): two algorithms, one contract, one oracle closure. */
  private[graft] val dedupClustersOracle: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (SELECT ida AS s, idb AS d FROM pairs
       |  UNION SELECT idb, ida FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
       |  FROM reach GROUP BY id)
       |SELECT doc.doc_id,
       |  COALESCE(c.component, doc.doc_id) AS component,
       |  COUNT(*) OVER (PARTITION BY COALESCE(c.component, doc.doc_id))
       |    AS cluster_size,
       |  doc.doc_id = COALESCE(c.component, doc.doc_id) AS is_canonical
       |FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.id
       |ORDER BY doc.doc_id NULLS FIRST""".stripMargin

  /** CTE chain ending in `v(doc_id, lang_ok, quality_ok, rep_ok,
    * decon_ok, dedup_ok)` — the per-stage curation verdicts shared by
    * q145 (verdict table), q146 (funnel counts), q154 (the pipeline) and
    * q157 (incremental re-curation: full recompute over the CURRENT
    * snapshot). Composes the MinHash pair CTEs + recursive closure (q65)
    * with the q29/q28/q143/q142 stage logic, renamed to avoid CTE
    * collisions. `corpus` is the training snapshot; `evalSrc` is where
    * the benchmark registry (doc_id ≡ 0 mod 25, original text) lives —
    * the full documents table in every current caller. */
  private[graft] def curationCtesOver(corpus: String, evalSrc: String): String =
    s"""${minhashPairsCtesFrom(corpus)},
       |edges AS (SELECT ida AS s, idb AS d FROM pairs
       |  UNION SELECT idb, ida FROM pairs),
       |reach(id, r) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT w.id, e.d FROM reach w JOIN edges e ON w.r = e.s),
       |comp AS (SELECT id, LEAST(id, MIN(r)) AS component
       |  FROM reach GROUP BY id),
       |qual AS (SELECT doc_id, len(w) AS n_tokens,
       |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $corpus)),
       |rd AS (SELECT doc_id, string_split(text, ' ') AS w FROM $corpus),
       |rtg AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
       |  FROM rd, UNNEST(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
       |rtri AS (SELECT doc_id, count(*) AS tri_total,
       |  count(DISTINCT g) AS tri_distinct FROM rtg GROUP BY doc_id),
       |rbg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
       |  FROM rd, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
       |rbic AS (SELECT doc_id, g, count(*) AS cnt FROM rbg GROUP BY doc_id, g),
       |rbi AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS bi_total,
       |  CAST(MAX(cnt) AS BIGINT) AS top_bi_cnt FROM rbic GROUP BY doc_id),
       |rep AS (SELECT rd.doc_id,
       |    CASE WHEN COALESCE(rtri.tri_total, 0) > 0 THEN ${val6(
          "CAST(rtri.tri_total - rtri.tri_distinct AS DOUBLE) / rtri.tri_total")}
       |      ELSE 0.0 END AS dup_tri_frac,
       |    CASE WHEN COALESCE(rbi.bi_total, 0) > 0 THEN ${val6(
          "CAST(rbi.top_bi_cnt AS DOUBLE) / rbi.bi_total")}
       |      ELSE 0.0 END AS top_bi_frac
       |  FROM rd LEFT JOIN rtri ON rd.doc_id = rtri.doc_id
       |  LEFT JOIN rbi ON rd.doc_id = rbi.doc_id),
       |ed AS (SELECT doc_id, string_split(text, ' ') AS w FROM $evalSrc
       |  WHERE doc_id % 25 = 0),
       |deg AS (SELECT DISTINCT array_to_string(w[i:i+3], ' ') AS gram
       |  FROM ed, UNNEST(range(1, len(w) - 2)) AS u(i)
       |  WHERE len(w) >= 4),
       |dtg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+3], ' ') AS gram
       |  FROM rd, UNNEST(range(1, len(w) - 2)) AS u(i)
       |  WHERE doc_id % 25 <> 0 AND len(w) >= 4),
       |dh AS (SELECT doc_id, count(*) AS contaminated_grams
       |  FROM dtg JOIN deg USING (gram) GROUP BY doc_id),
       |v AS (SELECT doc.doc_id,
       |    doc.lang = 'en' AS lang_ok,
       |    q.ttr >= 0.35 AND q.n_tokens >= 20 AS quality_ok,
       |    rep.dup_tri_frac <= 0.2 AND rep.top_bi_frac <= 0.2 AS rep_ok,
       |    COALESCE(dh.contaminated_grams, 0) = 0 AS decon_ok,
       |    doc.doc_id = COALESCE(c.component, doc.doc_id) AS dedup_ok
       |  FROM $corpus doc
       |  JOIN qual q ON doc.doc_id = q.doc_id
       |  JOIN rep ON doc.doc_id = rep.doc_id
       |  LEFT JOIN dh ON doc.doc_id = dh.doc_id
       |  LEFT JOIN comp c ON doc.doc_id = c.id
       |  WHERE doc.doc_id % 25 <> 0)""".stripMargin

  private[graft] val curationCtes: String = curationCtesOver("documents", "documents")

  /** Shared by q77 (batch session_window) and q106 (streaming session
    * windows, append mode): identical session semantics, one oracle. */
  private[graft] val sessionWindowOracle: String =
    s"""WITH e AS (SELECT user_id, ts, value FROM events),
       |g AS (SELECT user_id, ts, value,
       |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
       |        PARTITION BY user_id ORDER BY ts ASC)) >= 1800000000
       |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) IS NULL
       |      THEN 1 ELSE 0 END AS new_session
       |  FROM e),
       |s AS (SELECT user_id, ts, value,
       |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM g)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL 30 MINUTE AS session_end,
       |  COUNT(*) AS n_events,
       |  ${sum2("value")} AS session_value
       |FROM s GROUP BY user_id, session_id
       |ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""".stripMargin

  /** DuckDB replay of VectorOps.kmeansQuantize: same init (first K
    * vectors), same strict-argmin tiebreak, and the same floor-scaled
    * INTEGER dimension sums — which is what makes an iterative float
    * algorithm bit-reproducible across engines. */
  /** DuckDB mirror of [[graft.operators.VectorOps]]'s Lloyd trainer:
    * the L2 assignment + integer-sum update CTE builders, shared by the
    * q76 trainer oracle and the q155 trained-index oracle (both replay
    * the SAME two rounds from the first-K init). */
  private[graft] def kmDistExpr(dim: Int)(e: String, c: String) =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
       |      i -> (CAST($e[i] AS DOUBLE) - $c[i])
       |         * (CAST($e[i] AS DOUBLE) - $c[i])), (x, y) -> x + y)""".stripMargin
  private[graft] def kmAssignCte(dim: Int)(src: String, cents: String, out: String) =
    s"""$out AS (
       |  SELECT vec_id, cid, embedding, d FROM (
       |    SELECT vec_id, cid, embedding, d, row_number() OVER (
       |        PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM (SELECT e.vec_id, c.cid, e.embedding,
       |        ${kmDistExpr(dim)("e.embedding", "c.c")} AS d
       |      FROM $src e CROSS JOIN $cents c))
       |  WHERE rn = 1)""".stripMargin
  private[graft] def kmUpdateCte(src: String, out: String) =
    s"""$out AS (
       |  SELECT cid, list(m ORDER BY pos) AS c FROM (
       |    SELECT cid, pos,
       |      CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
       |        AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS m
       |    FROM (SELECT cid, generate_subscripts(embedding, 1) AS pos,
       |        unnest(embedding) AS x FROM $src)
       |    GROUP BY 1, 2)
       |  GROUP BY cid)""".stripMargin

  /** Two Lloyd rounds from the first-`k`-vectors init of `src`
    * (default: the full embeddings table; q163 trains on the prev
    * snapshot); CTE names are prefixed so two trainers can coexist in
    * one WITH list. The final centroid table is `<prefix>c2(cid, c)`. */
  private[graft] def kmTrainCtes(k: Int, dim: Int, p: String,
      src: String = "embeddings"): String =
    s"""${p}c0 AS (SELECT vec_id AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
       |  FROM $src WHERE vec_id < $k),
       |${kmAssignCte(dim)(src, s"${p}c0", s"${p}a0")},
       |${kmUpdateCte(s"${p}a0", s"${p}c1")},
       |${kmAssignCte(dim)(src, s"${p}c1", s"${p}a1")},
       |${kmUpdateCte(s"${p}a1", s"${p}c2")}""".stripMargin

  private[graft] val kmeansSql: String =
    s"""WITH ${kmTrainCtes(8, 64, "")},
       |${kmAssignCte(64)("embeddings", "c2", "a2")}
       |SELECT vec_id, cid, ${val6("d")} AS dist2,
       |  COUNT(*) OVER (PARTITION BY cid) AS cluster_size
       |FROM a2 ORDER BY vec_id NULLS FIRST""".stripMargin

  /** q219: coreset selection — the q76 trainer + assignment, ranked
    * per cluster on the micro-floor-scaled integer distance (the only
    * cross-engine-total key) with vec_id tie-break. */
  private[graft] val coresetSql: String =
    s"""WITH ${kmTrainCtes(8, 64, "")},
       |${kmAssignCte(64)("embeddings", "c2", "a2")},
       |r AS (SELECT cid, vec_id,
       |    CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT) AS d6
       |  FROM a2),
       |rk AS (SELECT cid, vec_id, d6, ROW_NUMBER() OVER (
       |    PARTITION BY cid ORDER BY d6 ASC, vec_id ASC) AS rn
       |  FROM r)
       |SELECT cid, CAST(rn AS INT) AS "rank", vec_id,
       |  CAST(d6 AS DOUBLE) / 1000000.0 AS dist2
       |FROM rk WHERE rn <= 5
       |ORDER BY cid NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** q175: per-subspace Lloyd training (the q76 CTEs over sliced
    * virtual sources), code assignment, and the ADC sum of nano-scaled
    * distance-table lookups — the full PQ pipeline replayed
    * relationally. */
  /** The PQ CTE chain shared by q175 and q177: per-subspace slices,
    * per-subspace Lloyd training (`s<i>c2` codebooks), code assignment
    * (`s<i>a2`), and the queries' nano-scaled distance tables
    * (`dt<i>`), plus the per-candidate ADC sum keyed (query_id,
    * neighbor_id) as `adc`. */
  private[graft] val pqCtes: String = {
    val m = 4; val sub = 16; val kSub = 4
    val subCtes = (0 until m).map(s =>
      s"sub$s AS (SELECT vec_id, list_slice(embedding, ${s * sub + 1}, " +
        s"${(s + 1) * sub}) AS embedding FROM embeddings)").mkString(",\n")
    val trains = (0 until m)
      .map(s => kmTrainCtes(kSub, sub, s"s$s", s"sub$s")).mkString(",\n")
    val assigns = (0 until m)
      .map(s => kmAssignCte(sub)(s"sub$s", s"s${s}c2", s"s${s}a2"))
      .mkString(",\n")
    val dts = (0 until m).map(s =>
      s"""dt$s AS (SELECT q.vec_id AS query_id, c.cid,
         |  CAST(FLOOR((${kmDistExpr(sub)("q.embedding", "c.c")})
         |    * 1000000000.0 + 0.5) AS BIGINT) AS d9
         |  FROM sub$s q CROSS JOIN s${s}c2 c
         |  WHERE q.vec_id < 10)""".stripMargin).mkString(",\n")
    s"""$subCtes,
       |$trains,
       |$assigns,
       |$dts,
       |adc AS (
       |  SELECT d0.query_id, a0.vec_id AS neighbor_id,
       |    d0.d9 + d1.d9 + d2.d9 + d3.d9 AS adist9
       |  FROM s0a2 a0
       |  JOIN s1a2 a1 USING (vec_id)
       |  JOIN s2a2 a2 USING (vec_id)
       |  JOIN s3a2 a3 USING (vec_id)
       |  JOIN dt0 d0 ON d0.cid = a0.cid
       |  JOIN dt1 d1 ON d1.cid = a1.cid AND d1.query_id = d0.query_id
       |  JOIN dt2 d2 ON d2.cid = a2.cid AND d2.query_id = d0.query_id
       |  JOIN dt3 d3 ON d3.cid = a3.cid AND d3.query_id = d0.query_id
       |  WHERE a0.vec_id <> d0.query_id)""".stripMargin
  }

  private[graft] val pqSql: String =
    s"""WITH $pqCtes,
       |r AS (SELECT query_id, neighbor_id, adist9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist9 ASC, neighbor_id NULLS FIRST) AS rn FROM adc)
       |SELECT query_id, rn AS "rank", neighbor_id,
       |  CAST(adist9 AS DOUBLE) / 1000000000.0 AS adist
       |FROM r WHERE rn <= 5
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** q177 — IVFADC: the q50 coarse quantizer restricts candidates to
    * the query's probed buckets; the PQ ADC sum (same CTEs as q175)
    * re-scores only those. */
  /** The IVFADC candidate CTEs shared by q177 and the q293 re-rank:
    * PQ codes + distance tables ([[pqCtes]]), the coarse assignment,
    * the queries' probe lists, and the per-candidate ADC sum as
    * `scored(query_id, neighbor_id, adist9)`. */
  private[graft] val ivfadcCandCtes: String =
    s"""$pqCtes,
       |e2 AS (SELECT vec_id, embedding FROM embeddings),
       |cc AS (SELECT vec_id AS cid, embedding AS cv FROM e2
       |  WHERE vec_id < 16),
       |ac2 AS (
       |  SELECT e.vec_id, c.cid,
       |    ${cosCols("e.embedding", "c.cv")} AS ccos
       |  FROM e2 e CROSS JOIN cc c),
       |assign2 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac2) WHERE rn = 1),
       |qc2 AS (
       |  SELECT query_id, cid FROM (
       |    SELECT vec_id AS query_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac2 WHERE vec_id < 10) WHERE rn <= 4),
       |cand AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id
       |  FROM qc2 q JOIN assign2 a USING (cid)
       |  WHERE a.vec_id <> q.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id, adc.adist9
       |  FROM cand c JOIN adc
       |    ON adc.query_id = c.query_id AND adc.neighbor_id = c.neighbor_id)"""
      .stripMargin

  private[graft] val ivfadcSql: String =
    s"""WITH $ivfadcCandCtes,
       |r AS (SELECT query_id, neighbor_id, adist9,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist9 ASC, neighbor_id NULLS FIRST) AS rn
       |  FROM scored)
       |SELECT query_id, rn AS "rank", neighbor_id,
       |  CAST(adist9 AS DOUBLE) / 1000000000.0 AS adist
       |FROM r WHERE rn <= 5
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** q293 — the ADC shortlist (top-20 by approximate distance, q177's
    * exact ordering) refined by an EXACT cosine over the raw vectors,
    * re-ranked; only the shortlist rows ever touch floats. */
  private[graft] val ivfadcRerankSql: String =
    s"""WITH $ivfadcCandCtes,
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adist9 ASC, neighbor_id NULLS FIRST) AS rn
       |    FROM scored) WHERE rn <= 20),
       |rr AS (SELECT s.query_id, s.neighbor_id,
       |    ${cosCols("q.embedding", "n.embedding")} AS cos
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.query_id
       |  JOIN embeddings n ON n.vec_id = s.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC NULLS LAST, neighbor_id NULLS FIRST) AS rn
       |  FROM rr)
       |SELECT query_id, rn AS "rank", neighbor_id,
       |  ${val6("cos")} AS cos_sim
       |FROM r WHERE rn <= 5
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** q296/q305 — Holt level+trend at α=β=½: the dyadic recurrences
    * tracked at scale 4^t stay BIGINT (L_t = 2·4^{t−1}y_t + 2L + 2Q,
    * Q_t = 4^{t−1}y_t − L + 3Q); 7 unrolled CTE steps, one IEEE cast
    * at the edge. Shared verbatim by the batch form and the drained
    * streaming monitor (maintenance must be invisible). */
  private[graft] lazy val holtSql: String = {
    val lagCols = (0 to 6)
      .map(i => s"LAG(cents, ${7 - i}) OVER w AS y$i").mkString(", ")
    val steps = (1 to 7).map { t =>
      val s = 1L << (2 * (t - 1))
      s"""f$t AS (SELECT *, ${2 * s} * y$t + 2 * l${t - 1}
         |    + 2 * q${t - 1} AS l$t,
         |  $s * y$t - l${t - 1} + 3 * q${t - 1} AS q$t FROM f${t - 1})"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |f0 AS (SELECT event_type, day, cents, $lagCols,
       |    cents AS y7, LAG(cents, 7) OVER w AS l0,
       |    CAST(0 AS BIGINT) AS q0
       |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |$steps
       |SELECT event_type, day, CAST(cents AS DOUBLE) / 100.0 AS revenue,
       |  CAST(l7 AS DOUBLE) / 1638400.0 AS level,
       |  CAST(q7 AS DOUBLE) / 1638400.0 AS trend,
       |  CAST(l7 + q7 AS DOUBLE) / 1638400.0 AS forecast
       |FROM f7 WHERE y0 IS NOT NULL
       |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin
  }

  /** q294 — Gonzalez greedy k-center unrolled: seed = vec_id 0, each
    * round picks the not-yet-selected vector with the max min-distance
    * (micro-scaled integer cosine distance, vec_id tie-break) to the
    * selected set, then every vector assigns to its nearest center
    * (d6 ASC, pick_no ASC). Mirrors `VectorOps.kcenterSelect`
    * round-for-round. */
  private[graft] val kcenterSql: String = {
    val k = 8
    def d6(v: String, c: String) =
      s"""CAST(FLOOR((1.0 - (${cosCols(v, c)}))
         |    * 1000000.0 + 0.5) AS BIGINT)""".stripMargin
    val rounds = (1 until k).map { t =>
      s"""m$t AS (SELECT e.vec_id,
         |    MIN(${d6("e.embedding", "s.cv")}) AS dmin6
         |  FROM embeddings e CROSS JOIN s${t - 1} s
         |  WHERE e.vec_id NOT IN (SELECT cid FROM s${t - 1})
         |  GROUP BY e.vec_id),
         |p$t AS (SELECT $t AS pick_no, w.vec_id AS cid, e2.embedding AS cv
         |  FROM (SELECT vec_id FROM m$t
         |        ORDER BY dmin6 DESC, vec_id LIMIT 1) w
         |  JOIN embeddings e2 ON e2.vec_id = w.vec_id),
         |s$t AS (SELECT * FROM s${t - 1} UNION ALL SELECT * FROM p$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH s0 AS (SELECT 0 AS pick_no, vec_id AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id = 0),
       |$rounds,
       |ad AS (SELECT e.vec_id, s.cid, s.pick_no,
       |    ${d6("e.embedding", "s.cv")} AS d6
       |  FROM embeddings e CROSS JOIN s${k - 1} s),
       |asg AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY d6 ASC, pick_no ASC) AS rn FROM ad)
       |SELECT vec_id, cid AS center_id, CAST(pick_no AS INT) AS pick_no,
       |  CAST(d6 AS DOUBLE) / 1000000.0 AS dist
       |FROM asg WHERE rn = 1 ORDER BY vec_id NULLS FIRST""".stripMargin
  }

  /** DuckDB mirror of VectorOps.dot/norm/cosine: left folds match
    * Spark's `aggregate` order (and the typed kernel's independent
    * accumulators), so the doubles are bit-identical. `a`/`b` are any
    * list-typed SQL expressions. */
  /** Full rebuild over the POST-EPOCH corpus (prev ∖ tombstones ∪
    * appends) with the frozen prev centroids (first-16 of the prev
    * snapshot — frozen even where deleted) — the shared oracle for the
    * staged one-shot epoch (q233) and the streaming maintainer's
    * drained replay of the same epoch (q235). */
  /** The post-epoch assignment replay shared by q233/q235/q237's
    * oracles: frozen prev centroids, post-epoch corpus `e`, multi-probe
    * (top-4) assignment `assign`. */
  private[graft] def ivfPostEpochCtes: String =
    s"""c AS (SELECT vec_id AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 16 AND vec_id % 6 <> 0),
       |e AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % 6 = 0 OR vec_id % 7 <> 3),
       |ac AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosCols("e.embedding", "c.cv")} AS ccos
       |  FROM e CROSS JOIN c),
       |assign AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC NULLS LAST, cid NULLS FIRST) AS rn
       |    FROM ac) WHERE rn <= 4)""".stripMargin

  private[graft] def ivfPostEpochOracle: String =
    s"""WITH RECURSIVE $ivfPostEpochCtes,
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
       |  CASE WHEN v.vec_id % 6 = 0 THEN 'appended' ELSE 'retained' END
       |    AS status
       |FROM e v LEFT JOIN comp c2 ON v.vec_id = c2.id
       |ORDER BY v.vec_id NULLS FIRST""".stripMargin

  /** ANN from the post-epoch index state — the shared oracle for the
    * full-state-scan serve (q237) and the published bucket-pruned
    * serve (q286): multi-probe probe-and-rank recomputed over the
    * post-epoch corpus from scratch. The two queries differ only in
    * the Spark-side index representation; the result set must not
    * move. */
  private[graft] def ivfServeFromStateOracle: String =
    s"""WITH $ivfPostEpochCtes,
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
       |  SELECT DISTINCT query_id, a.vec_id AS neighbor_id,
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
       |ORDER BY query_id NULLS FIRST, rn NULLS FIRST""".stripMargin

  private[graft] def cosCols(a: String, b: String) =
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |      (x, y) -> x + y)
       |  / (sqrt(list_reduce(list_transform($a,
       |       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
       |   * sqrt(list_reduce(list_transform($b,
       |       v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))"""
      .stripMargin

  private[graft] def cosExpr(a: String, b: String) =
    cosCols(s"$a.embedding", s"$b.embedding")

  /** Prefix-d cosine (q287): the same left-to-right folds as
    * [[cosCols]] but over the first `d` positions only — mirrors
    * `VectorOps.cosPrefixes`' partial-accumulator snapshots
    * expression-for-expression. */
  private[graft] def cosColsPrefix(a: String, b: String, d: Int) =
    s"""list_reduce(list_transform(range(1, ${d + 1}),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |      (x, y) -> x + y)
       |  / (sqrt(list_reduce(list_transform(range(1, ${d + 1}),
       |       i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)),
       |       (x, y) -> x + y))
       |   * sqrt(list_reduce(list_transform(range(1, ${d + 1}),
       |       i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),
       |       (x, y) -> x + y)))"""
      .stripMargin

  /** DuckDB mirror of [[graft.operators.Scd2.ordersHistory]]: the WITH
    * body (shared by q23 and the q43 as-of lookup) … */
  private[graft] val scd2Ctes: String =
    """base AS (
      |  SELECT o_orderkey AS order_id, o_orderstatus AS order_status,
      |    o_totalprice AS total_price, o_orderpriority AS priority
      |  FROM orders),
      |dim0 AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY order_id NULLS FIRST) AS BIGINT)
      |    AS order_sk
      |  FROM base WHERE order_id % 10 < 8),
      |staging AS (
      |  SELECT order_id,
      |    CASE WHEN order_id % 5 = 0 THEN 'D' ELSE order_status END
      |      AS order_status,
      |    total_price, priority
      |  FROM base),
      |changed AS (
      |  SELECT s.* FROM staging s JOIN dim0 d USING (order_id)
      |  WHERE s.order_status <> d.order_status
      |     OR s.total_price <> d.total_price OR s.priority <> d.priority),
      |fresh AS (
      |  SELECT s.* FROM staging s
      |  WHERE NOT EXISTS (SELECT 1 FROM dim0 d WHERE d.order_id = s.order_id)),
      |inserts AS (
      |  SELECT i.*, (SELECT COUNT(*) FROM dim0)
      |      + ROW_NUMBER() OVER (ORDER BY order_id NULLS FIRST) AS order_sk
      |  FROM (SELECT * FROM changed UNION ALL SELECT * FROM fresh) i)""".stripMargin

  /** … and the full-history union select (no ORDER BY). */
  private[graft] val scd2HistSelect: String =
    """SELECT order_id, order_status, total_price, priority, order_sk,
      |  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
      |  TIMESTAMP '2024-06-01 00:00:00' AS valid_to, FALSE AS is_current
      |FROM dim0 WHERE EXISTS (SELECT 1 FROM changed c
      |                        WHERE c.order_id = dim0.order_id)
      |UNION ALL
      |SELECT order_id, order_status, total_price, priority, order_sk,
      |  TIMESTAMP '2024-01-01 00:00:00',
      |  TIMESTAMP '2261-12-31 23:59:59', TRUE
      |FROM dim0 WHERE NOT EXISTS (SELECT 1 FROM changed c
      |                            WHERE c.order_id = dim0.order_id)
      |UNION ALL
      |SELECT order_id, order_status, total_price, priority, order_sk,
      |  TIMESTAMP '2024-06-01 00:00:00',
      |  TIMESTAMP '2261-12-31 23:59:59', TRUE
      |FROM inserts""".stripMargin

  private[graft] val funnelSql =
    """WITH stages(stage, stage_rank) AS
      |  (VALUES ('signup', 1), ('view', 2), ('click', 3), ('purchase', 4)),
      |counts AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1)
      |SELECT stage, stage_rank, COALESCE(n, 0) AS n_events
      |FROM stages LEFT JOIN counts ON stage = event_type
      |ORDER BY stage_rank NULLS FIRST""".stripMargin

  private[graft] val lastEventSql =
    """SELECT user_id, last_ts, last_event FROM (
      |  SELECT user_id, ts AS last_ts, event_type AS last_event,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id NULLS FIRST""".stripMargin


  /** The q157/q162 oracle: full recompute of the CURRENT snapshot. */
  /** The q174 chunk-grain dense scoring CTEs (hash-trick vectors over
    * 50-token chunks, cosine vs the %100 query set), ending at `p`
    * (query_id, doc_id, chunk_idx, score) — shared by q174 and the
    * q290 RRF fusion. Moved verbatim from the q174 oracle string. */
  private[graft] lazy val denseChunkCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM documents),
       |o AS (SELECT doc_id, ws,
       |  UNNEST(range(0, GREATEST(len(ws), 1), 40)) AS off FROM t),
       |ch AS (SELECT doc_id, CAST(off // 40 AS BIGINT) AS chunk_idx,
       |    list_slice(ws, off + 1, off + 50) AS cw FROM o),
       |ctok AS (SELECT doc_id, chunk_idx, UNNEST(cw) AS tk FROM ch),
       |cdim AS (SELECT doc_id, chunk_idx, ${h32("tk")} % 16 AS dim,
       |    CASE WHEN (${h32("tk")} // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg
       |  FROM ctok),
       |cvec AS (SELECT doc_id, chunk_idx, dim, CAST(SUM(sg) AS BIGINT) AS w
       |  FROM cdim GROUP BY 1, 2, 3),
       |cnorm AS (SELECT doc_id, chunk_idx, SUM(w * w) AS n2
       |  FROM cvec GROUP BY 1, 2),
       |qtok AS (SELECT doc_id AS query_id,
       |    UNNEST(string_split(text, ' ')) AS tk
       |  FROM documents WHERE ${queryCohort("doc_id")}),
       |qdim AS (SELECT query_id, ${h32("tk")} % 16 AS dim,
       |    CASE WHEN (${h32("tk")} // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg
       |  FROM qtok),
       |qvec AS (SELECT query_id, dim, CAST(SUM(sg) AS BIGINT) AS w
       |  FROM qdim GROUP BY 1, 2),
       |qnorm AS (SELECT query_id, SUM(w * w) AS n2 FROM qvec GROUP BY 1),
       |dots AS (SELECT q.query_id, c.doc_id, c.chunk_idx,
       |    SUM(q.w * c.w) AS dot
       |  FROM qvec q JOIN cvec c ON q.dim = c.dim GROUP BY 1, 2, 3),
       |p AS (SELECT qn.query_id, cn.doc_id, cn.chunk_idx,
       |    CAST(COALESCE(d.dot, 0) AS DOUBLE)
       |      / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
       |      AS score
       |  FROM qnorm qn CROSS JOIN cnorm cn
       |  LEFT JOIN dots d ON d.query_id = qn.query_id
       |    AND d.doc_id = cn.doc_id AND d.chunk_idx = cn.chunk_idx
       |  WHERE cn.doc_id <> qn.query_id AND qn.n2 > 0 AND cn.n2 > 0)"""
      .stripMargin

  /** Doc-grain hash-trick vector CTEs (q174's arithmetic): `dvec`
    * (doc_id, dim, w) and `dnorm` (doc_id, n2) — shared by q188 and
    * q191. */
  private[graft] lazy val docVecCtes: String =
    s"""dtok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tk
       |  FROM documents),
       |ddim AS (SELECT doc_id, ${h32("tk")} % 16 AS dim,
       |    CASE WHEN (${h32("tk")} // 16) % 2 = 0 THEN 1 ELSE -1 END AS sg
       |  FROM dtok),
       |dvec AS (SELECT doc_id, dim, CAST(SUM(sg) AS BIGINT) AS w
       |  FROM ddim GROUP BY 1, 2),
       |dnorm AS (SELECT doc_id, SUM(w * w) AS n2 FROM dvec GROUP BY 1)"""
      .stripMargin

  /** The q156 synthetic-container replay (hex build + truncation +
    * marker walk), ending at CTE `dims` (media_id, kind, n_bytes,
    * width, height; -1 = undecodable) — shared by q156 and the q198
    * media corpus card. */
  private[graft] lazy val mediaDimsCtes: String =
    s"""m AS (SELECT r AS media_id,
       |    CASE WHEN r % 2 = 0 THEN 'png' ELSE 'jpeg' END AS kind,
       |    CAST(r * 31 % 613 + 16 AS INT) AS w,
       |    CAST(r * 17 % 401 + 16 AS INT) AS h,
       |    CAST(r % 8 + 16 AS INT) AS l0,
       |    CAST(r % 5 + 8 AS INT) AS lc
       |  FROM range(500) t(r)),
       |c AS (SELECT media_id, kind,
       |    CASE WHEN kind = 'png' THEN
       |      '89504E470D0A1A0A' || '0000000D' || '49484452' ||
       |      lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0') ||
       |      '0806000000' || substring(md5(media_id || ':crc'), 1, 8) ||
       |      md5(media_id || ':g')
       |    ELSE
       |      'FFD8' || 'FFE0' || lpad(to_hex(l0), 4, '0') ||
       |      repeat('00', l0 - 2) ||
       |      CASE WHEN media_id % 3 = 0 THEN
       |           'FFFE' || lpad(to_hex(lc), 4, '0') || repeat('00', lc - 2)
       |         ELSE '' END ||
       |      'FFC0' || '0011' || '08' ||
       |      lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0') ||
       |      '03' || '012200' || '021101' || '031101' ||
       |      md5(media_id || ':g')
       |    END AS full_hx
       |  FROM m),
       |x AS (SELECT media_id, kind,
       |    upper(CASE WHEN media_id % 17 = 0 THEN substring(full_hx, 1, 20)
       |      ELSE full_hx END) AS hx
       |  FROM c),
       |j AS (SELECT media_id, kind, hx, len(hx) // 2 AS n_bytes,
       |    CASE WHEN len(hx) >= 12
       |      THEN 5 + CAST(('0x' || substring(hx, 9, 4)) AS INT)
       |      ELSE 999999 END AS s1
       |  FROM x),
       |j2 AS (SELECT *, CASE WHEN substring(hx, 2 * s1 - 1, 4) = 'FFFE'
       |      THEN s1 + 2 + CAST(('0x' || substring(hx, 2 * s1 + 3, 4)) AS INT)
       |      ELSE s1 END AS s2
       |  FROM j),
       |dims AS (
       |  SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes,
       |  CASE
       |    WHEN kind = 'png' AND n_bytes >= 24
       |      AND substring(hx, 1, 16) = '89504E470D0A1A0A'
       |      THEN CAST(('0x' || substring(hx, 33, 8)) AS INT)
       |    WHEN kind = 'jpeg' AND substring(hx, 1, 4) = 'FFD8'
       |      AND substring(hx, 2 * s2 - 1, 4) = 'FFC0' AND n_bytes >= s2 + 18
       |      THEN CAST(('0x' || substring(hx, 2 * s2 + 13, 4)) AS INT)
       |    ELSE -1 END AS width,
       |  CASE
       |    WHEN kind = 'png' AND n_bytes >= 24
       |      AND substring(hx, 1, 16) = '89504E470D0A1A0A'
       |      THEN CAST(('0x' || substring(hx, 41, 8)) AS INT)
       |    WHEN kind = 'jpeg' AND substring(hx, 1, 4) = 'FFD8'
       |      AND substring(hx, 2 * s2 - 1, 4) = 'FFC0' AND n_bytes >= s2 + 18
       |      THEN CAST(('0x' || substring(hx, 2 * s2 + 9, 4)) AS INT)
       |    ELSE -1 END AS height
       |  FROM j2)""".stripMargin

  /** Brute-force ranking over the q/e CTEs of [[ivfServeCtes]],
    * ending at `br` (query_id, neighbor_id, rn) — shared by q186 and
    * q197. */
  private[graft] lazy val bruteRankCtes: String =
    s"""bp AS (SELECT q.query_id, cc.vec_id AS neighbor_id,
       |    ${cosCols("q.qv", "cc.embedding")} AS bcos
       |  FROM q JOIN e cc ON cc.vec_id <> q.query_id),
       |br AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY bcos DESC NULLS LAST, neighbor_id NULLS FIRST)
       |      AS rn
       |  FROM bp)""".stripMargin

  /** The q182 BM25 scoring replay (k1=1.2, b=0.75), ending at CTE
    * `bs` = (query_id, doc_id, s9) — shared by q182 and the q188
    * hard-negative miner. */
  /** BM25 CTE chain over an optionally-filtered corpus — `where` is
    * the survivor predicate for the delete-maintained variant (q234);
    * empty for q182/q188. */
  private[graft] def bm25CtesFor(where: String): String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents $where),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       |  FROM tok GROUP BY 1),
       |dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
       |tot AS (SELECT (SELECT COUNT(*) FROM documents $where) AS nd,
       |               (SELECT COUNT(*) FROM tok) AS nt),
       |q AS (SELECT DISTINCT doc_id AS query_id, t FROM tok
       |  WHERE ${queryCohort("doc_id")}),
       |c AS (SELECT q.query_id, tf.doc_id,
       |    CAST(FLOOR(
       |      ln((CAST(nd - df AS DOUBLE) + 0.5)
       |          / (CAST(df AS DOUBLE) + 0.5) + 1.0)
       |      * ((CAST(tf AS DOUBLE) * 2.2)
       |         / (CAST(tf AS DOUBLE) + 1.2
       |            * (0.25 + 0.75
       |               * (CAST(dl AS DOUBLE)
       |                  / (CAST(nt AS DOUBLE) / nd)))))
       |      * 1000000000.0 + 0.5) AS BIGINT) AS c9
       |  FROM q JOIN tf USING (t) JOIN dfq USING (t)
       |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot
       |  WHERE tf.doc_id <> q.query_id),
       |bs AS (SELECT query_id, doc_id, CAST(SUM(c9) AS BIGINT) AS s9
       |  FROM c GROUP BY 1, 2)""".stripMargin

  private[graft] lazy val bm25Ctes: String = bm25CtesFor("")


  /** The q50/q161 IVF serve replay (first-16 centroids, single-probe
    * assignment, top-4 probes, candidates ranked), shared by q161 and
    * the q186 recall audit. Ends at CTE `r` (ranked candidates). */
  private[graft] lazy val ivfServeCtes: String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
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
       |  FROM cand)""".stripMargin

  /** q185's oracle: both power-iteration steps replayed verbatim —
    * per-row dots are the same left-fold expression tree Spark
    * evaluates, contributions floor-scale to nano BIGINTs before the
    * 64 component sums, and each step normalizes by the exact integer
    * max |component|. */
  /** The q185 power-iteration replay, ending at CTE `p`
    * (vec_id, label, proj) — shared by q185 and the q195 drift
    * monitor. */
  private[graft] lazy val pcaPowerCtes: String = {
    def dotV(e: String, v: String) =
      s"""list_reduce(list_transform(range(1, 65),
         |      i -> CAST($e[i] AS DOUBLE) * $v[i]), (x, y) -> x + y)"""
        .stripMargin
    def step(src: String, dotCol: String, sOut: String, vOut: String) =
      s"""c_$sOut AS (SELECT generate_subscripts(embedding, 1) AS pos,
         |    unnest(embedding) AS x, $dotCol AS dot FROM $src),
         |$sOut AS (SELECT pos, CAST(SUM(CAST(FLOOR(
         |      CAST(x AS DOUBLE) * dot * 1000000000.0 + 0.5) AS BIGINT))
         |    AS BIGINT) AS s9
         |  FROM c_$sOut GROUP BY 1),
         |m_$sOut AS (SELECT MAX(abs(s9)) AS m FROM $sOut),
         |$vOut AS (SELECT list(CAST(s9 AS DOUBLE) / CAST(m AS DOUBLE)
         |    ORDER BY pos) AS v
         |  FROM $sOut CROSS JOIN m_$sOut)""".stripMargin
    s"""e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    embedding FROM embeddings),
       |d1 AS (SELECT vec_id, label, embedding,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> CAST(embedding[i] AS DOUBLE) * 0.125),
       |      (x, y) -> x + y) AS dot
       |  FROM e),
       |${step("d1", "dot", "s1", "v1")},
       |d2 AS (SELECT vec_id, label, embedding,
       |    ${dotV("embedding", "v")} AS dot
       |  FROM e CROSS JOIN v1),
       |${step("d2", "dot", "s2", "v2")},
       |p AS (SELECT vec_id, label,
       |    ${dotV("embedding", "v")} AS proj
       |  FROM e CROSS JOIN v2)""".stripMargin
  }

  private[graft] lazy val pcaPowerSql: String =
    s"""WITH $pcaPowerCtes
       |SELECT vec_id, label, ${val6("proj")} AS proj
       |FROM p ORDER BY vec_id NULLS FIRST""".stripMargin

  /** q183's oracle: the greedy longest-match loop unrolled as fixed
    * argmax-prefix steps at distinct-word grain (max word length in
    * the fixture is 8, and every step advances >= 1 char or
    * terminates as [UNK], so 8 steps always finish). The vocabulary
    * VALUES list is generated from [[TextOps.WpVocab]] — the same
    * literal the Spark segmenter closes over. */
  private[graft] lazy val wordpieceSql: String = {
    val vocabVals = TextOps.WpVocab.map(p => s"('$p')").mkString(", ")
    val steps = (1 to 8).map { i =>
      val prev = s"s${i - 1}"
      s"""s$i AS (
         |  SELECT word, pos, np, unk, done FROM $prev WHERE done
         |  UNION ALL
         |  SELECT word,
         |    CASE WHEN piece IS NULL THEN CAST(len(word) AS BIGINT)
         |         ELSE pos + len(piece) END AS pos,
         |    np + 1 AS np,
         |    unk + CASE WHEN piece IS NULL THEN 1 ELSE 0 END AS unk,
         |    CASE WHEN piece IS NULL THEN TRUE
         |         ELSE pos + len(piece) >= len(word) END AS done
         |  FROM (
         |    SELECT s.word, s.pos, s.np, s.unk, v.piece,
         |      ROW_NUMBER() OVER (PARTITION BY s.word
         |        ORDER BY len(v.piece) DESC NULLS LAST,
         |                 v.piece NULLS FIRST) AS rn
         |    FROM (SELECT * FROM $prev WHERE NOT done) s
         |    LEFT JOIN vocab v
         |      ON substr(s.word, CAST(s.pos + 1 AS INTEGER),
         |                len(v.piece)) = v.piece
         |  ) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH vocab(piece) AS (VALUES $vocabVals),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |cnt AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |s0 AS (SELECT t AS word, CAST(0 AS BIGINT) AS pos, 0 AS np,
       |    0 AS unk, FALSE AS done
       |  FROM (SELECT DISTINCT t FROM tok)),
       |$steps,
       |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |    CAST(SUM(c * np) AS BIGINT) AS n_pieces,
       |    CAST(SUM(c * unk) AS BIGINT) AS n_unk
       |  FROM cnt JOIN s8 ON cnt.t = s8.word GROUP BY 1)
       |SELECT doc_id, n_words, n_pieces, n_unk,
       |  ${val6("CAST(n_pieces AS DOUBLE) / n_words")} AS fertility
       |FROM agg ORDER BY doc_id NULLS FIRST""".stripMargin
  }

  private[graft] lazy val incrementalCurationOracle: String =
      s"""WITH RECURSIVE c157 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' [edited]'
         |      ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 0),
         |${curationCtesOver("c157", "documents")},
         |pfp AS (SELECT doc_id, $fpSqlExpr AS fp
         |  FROM documents WHERE doc_id % 6 <> 0),
         |cfp AS (SELECT doc_id, $fpSqlExpr AS fp
         |  FROM c157),
         |st AS (SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
         |    CASE WHEN p.doc_id IS NULL THEN 'added'
         |         WHEN c.doc_id IS NULL THEN 'removed'
         |         WHEN p.fp <> c.fp THEN 'changed'
         |         ELSE 'unchanged' END AS status
         |  FROM pfp p FULL OUTER JOIN cfp c ON p.doc_id = c.doc_id)
         |SELECT v.doc_id, lang_ok, quality_ok, rep_ok, decon_ok, dedup_ok,
         |  lang_ok AND quality_ok AND rep_ok AND decon_ok AND dedup_ok
         |    AS keep,
         |  st.status
         |FROM v JOIN st ON v.doc_id = st.doc_id
         |ORDER BY v.doc_id NULLS FIRST""".stripMargin

  /** Continuation of [[oracleSql]] (split so the shared q157/q162
    * oracle can live as a named val between the halves). */
}
