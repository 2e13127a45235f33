package graft.similarity

import graft.Queries.Q
import graft.text.TextOps.DuckD

/** Registry for the embedding-similarity family. Oracles replicate the
  * exact fold-order arithmetic and (for LSH) the same literal hyperplanes,
  * so DuckDB reproduces every value bit-for-bit. */
object QueriesAnn {

  private val NQueries = 8
  private val K = 5
  private val LshK = 3
  private val IvfK = 5
  private val IvfNProbe = 2
  private val NearDupT = 0.4
  private val CentroidDims = 4
  private val KCenter = 8

  /** Oracle base: vectors as double lists + precomputed self-dot. */
  private val base: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings
       |), w AS (
       |  SELECT vec_id, label, v, ${Ann.dot(DuckD, "v", "v")} AS nrm FROM e
       |)""".stripMargin

  private def cosAB =
    Ann.cosine(DuckD, "a.v", "b.v", "a.nrm", "b.nrm")

  private val qCosTopK = Q(
    "q_cos_topk",
    (s, dir) => Ann.cosineTopK(s, dir, NQueries, K),
    Some(
      s"""$base
         |SELECT qid, nid, cos, CAST(rnk AS INTEGER) AS rnk FROM (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid, $cosAB AS cos,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY $cosAB DESC, b.vec_id) AS rnk
         |  FROM w a JOIN w b ON a.vec_id < $NQueries AND b.vec_id != a.vec_id
         |) WHERE rnk <= $K""".stripMargin))

  private val qAnnLsh = Q(
    "q_ann_lsh",
    (s, dir) => Ann.lshTopK(s, dir, NQueries, LshK),
    Some(
      s"""$base,
         |sg AS (
         |  SELECT vec_id, v, nrm, ${Ann.signature(DuckD, "v")} AS sig FROM w
         |)
         |SELECT qid, nid, cos, CAST(rnk AS INTEGER) AS rnk FROM (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid, $cosAB AS cos,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY $cosAB DESC, b.vec_id) AS rnk
         |  FROM sg a JOIN sg b
         |    ON a.vec_id < $NQueries AND a.sig = b.sig AND b.vec_id != a.vec_id
         |) WHERE rnk <= $LshK""".stripMargin))

  /** int8 max-abs quantization facts: the oracle replicates scale + codes
    * with the same op order (abs -> max -> /scale*127 -> floor). */
  private val qEmbedQuant = Q(
    "q_embed_quant",
    (s, dir) => Ann.int8QuantFacts(s, dir),
    Some(
      s"""$base,
         |qt AS (
         |  SELECT vec_id, amax,
         |    list_transform(v, x -> CAST(floor(x / greatest(amax, 1e-30) * 127.0) AS BIGINT)) AS codes
         |  FROM (SELECT vec_id, v,
         |          list_max(list_transform(v, x -> abs(x))) AS amax FROM w)
         |)
         |SELECT vec_id, amax,
         |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
         |  list_min(codes) AS code_min,
         |  list_max(codes) AS code_max
         |FROM qt""".stripMargin))

  /** IVF ANN: the oracle rebuilds the identical coarse codebook (integer-
    * quantized per-label means), the identical nearest-cell assignment and
    * probes, and the identical refine — so the approximate result is
    * deterministic and hash-exact. ≙ kmeans_retriever.py:76-124. */
  private val qAnnIvf = Q(
    "q_ann_ivf",
    (s, dir) => Ann.ivfTopK(s, dir, NQueries, IvfK, IvfNProbe),
    Some {
      val sums = (1 to Ann.Dim)
        .map(i => s"CAST(sum(CAST(floor(v[$i] * 1000000) AS BIGINT)) AS BIGINT) AS s_$i")
        .mkString(",\n    ")
      val cdims = (1 to Ann.Dim)
        .map(i => s"CAST(s_$i AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1000000.0)")
        .mkString(", ")
      def nearest(filter: String, keep: Int, idAs: String) =
        s"""SELECT vec_id AS $idAs, acell FROM (
           |    SELECT w.vec_id, cent2.acell,
           |      row_number() OVER (PARTITION BY w.vec_id ORDER BY
           |        (w.nrm - 2.0 * ${Ann.dot(DuckD, "w.v", "cent2.c")} + cent2.cn),
           |        cent2.acell) AS crnk
           |    FROM w CROSS JOIN cent2$filter
           |  ) WHERE crnk <= $keep""".stripMargin
      val cosQB = Ann.cosine(DuckD, "q.v", "b.v", "q.nrm", "b.nrm")
      s"""$base,
         |cagg AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS cnt,
         |    $sums
         |  FROM w GROUP BY label
         |), cent AS (
         |  SELECT label AS acell, list_value($cdims) AS c FROM cagg
         |), cent2 AS (
         |  SELECT acell, c, ${Ann.dot(DuckD, "c", "c")} AS cn FROM cent
         |), assign AS (
         |  ${nearest("", 1, "vec_id")}
         |), probes AS (
         |  ${nearest(s" WHERE w.vec_id < $NQueries", IvfNProbe, "qid")}
         |)
         |SELECT qid, nid, cos, CAST(rnk AS INTEGER) AS rnk FROM (
         |  SELECT p.qid, b.vec_id AS nid, $cosQB AS cos,
         |    row_number() OVER (PARTITION BY p.qid ORDER BY $cosQB DESC, b.vec_id) AS rnk
         |  FROM probes p
         |  JOIN assign a ON a.acell = p.acell AND a.vec_id != p.qid
         |  JOIN w q ON q.vec_id = p.qid
         |  JOIN w b ON b.vec_id = a.vec_id
         |) WHERE rnk <= $IvfK""".stripMargin
    })

  /** Shipped form is the banded-LSH candidate join (scale-safe — no
    * nested-loop pair generator); the oracle replicates the banding with
    * the same literal hyperplanes, so the probabilistic candidate set is
    * deterministic and the compare stays exact. The quadratic all-pairs
    * form survives only as AnnSpec's recall oracle. */
  private val qEmbedNearDup = Q(
    "q_embed_neardup",
    (s, dir) => Ann.lshCosNearDupPairs(s, dir, NearDupT),
    Some {
      val bandCols = (0 until Ann.NdBands)
        .map(b => s"${Ann.bandSig(DuckD, "v", b)} AS b$b").mkString(",\n    ")
      val anyBand = (0 until Ann.NdBands)
        .map(b => s"a.b$b = b.b$b").mkString(" OR ")
      s"""$base,
         |nb AS (
         |  SELECT vec_id, $bandCols FROM w
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS ai, b.vec_id AS bi
         |  FROM nb a JOIN nb b ON a.vec_id < b.vec_id AND ($anyBand)
         |)
         |SELECT ai, bi, cos FROM (
         |  SELECT c.ai, c.bi, $cosAB AS cos
         |  FROM cand c JOIN w a ON a.vec_id = c.ai JOIN w b ON b.vec_id = c.bi
         |) WHERE cos >= $NearDupT""".stripMargin
    })

  private val qLabelCentroid = Q(
    "q_label_centroid",
    (s, dir) => Ann.labelCentroidFacts(s, dir, CentroidDims),
    Some {
      val sums = (1 to CentroidDims)
        .map(i => s"CAST(sum(CAST(floor(v[$i] * 1000000) AS BIGINT)) AS BIGINT) AS s_$i")
        .mkString(",\n  ")
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
         |  FROM embeddings
         |)
         |SELECT label, CAST(count(*) AS BIGINT) AS cnt,
         |  $sums
         |FROM e GROUP BY label""".stripMargin
    })

  /** Shared PQ oracle chain: codebook (cagg/cent/cent2), subvectors
    * (vsub/vsub2), per-subspace argmin (best). Appended after [[base]]. */
  private val pqCtes: String =
    s"""cagg AS (
         |  SELECT (t.r - 1) // ${Ann.PqSubDim} AS s, label AS cid, t.r AS r,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(CAST(floor(v[t.r] * 1000000) AS BIGINT)) AS BIGINT) AS sm
         |  FROM w, range(1, ${Ann.Dim + 1}) t(r)
         |  GROUP BY 1, 2, 3
         |), cent AS (
         |  SELECT s, cid,
         |    list(CAST(sm AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1000000.0)
         |      ORDER BY r) AS c
         |  FROM cagg GROUP BY s, cid
         |), cent2 AS (
         |  SELECT s, cid, c, ${Ann.dot(DuckD, "c", "c")} AS cn FROM cent
         |), vsub AS (
         |  SELECT vec_id, t.s AS s,
         |    v[t.s * ${Ann.PqSubDim} + 1 : t.s * ${Ann.PqSubDim} + ${Ann.PqSubDim}] AS vs
         |  FROM w, range(0, ${Ann.PqM}) t(s)
         |), vsub2 AS (
         |  SELECT vec_id, s, vs, ${Ann.dot(DuckD, "vs", "vs")} AS vn FROM vsub
         |), best AS (
         |  SELECT vec_id, s, cid, d FROM (
         |    SELECT a.vec_id, a.s, c.cid,
         |      (a.vn - 2.0 * ${Ann.dot(DuckD, "a.vs", "c.c")} + c.cn) AS d,
         |      row_number() OVER (PARTITION BY a.vec_id, a.s ORDER BY
         |        (a.vn - 2.0 * ${Ann.dot(DuckD, "a.vs", "c.c")} + c.cn),
         |        c.cid) AS rnk
         |    FROM vsub2 a JOIN cent2 c ON c.s = a.s
         |  ) WHERE rnk = 1
         |)""".stripMargin

  /** PQ encoding: 64 floats -> one BIGINT (8 subspaces x 4-bit codeword
    * id) + the quantization error in order-free integer micro-units. The
    * oracle rebuilds the identical per-(subspace, label) codebook, the
    * identical per-subspace argmin (same fold-order distances, same
    * (d, cid) tie-break as the engine's struct array_min), and the same
    * packing — so the compressed representation is hash-exact
    * cross-engine. The memory half of IVF-PQ (q_ann_ivf is the compute
    * half). */
  private val qPqCodes = Q(
    "q_pq_codes",
    (s, dir) => Ann.pqCodes(s, dir),
    Some(
      s"""$base,
         |$pqCtes
         |SELECT vec_id,
         |  CAST(sum(CAST(cid AS BIGINT) << (4 * s)) AS BIGINT) AS pq_code,
         |  CAST(sum(CAST(floor(d * 1000000.0) AS BIGINT)) AS BIGINT) AS err_q
         |FROM best GROUP BY vec_id""".stripMargin))

  /** ADC search over the compressed codes: the oracle replays the full
    * pipeline — codebook, codes, per-query subspace LUT, nibble-indexed
    * lookup-sum (order-free integer micro-units), per-query rank. */
  private val qPqAdc = Q(
    "q_pq_adc",
    (s, dir) => Ann.pqAdcTopK(s, dir, NQueries, K),
    Some(
      s"""$base,
         |$pqCtes,
         |codes AS (
         |  SELECT vec_id,
         |    CAST(sum(CAST(cid AS BIGINT) << (4 * s)) AS BIGINT) AS pq_code
         |  FROM best GROUP BY vec_id
         |), qlut AS (
         |  SELECT a.vec_id AS qid, a.s, c.cid,
         |    (a.vn - 2.0 * ${Ann.dot(DuckD, "a.vs", "c.c")} + c.cn) AS dq
         |  FROM vsub2 a JOIN cent2 c ON c.s = a.s
         |  WHERE a.vec_id < $NQueries
         |), scored AS (
         |  SELECT q.qid, b.vec_id AS nid,
         |    CAST(sum(CAST(floor(q.dq * 1000000.0) AS BIGINT)) AS BIGINT)
         |      AS adc_q
         |  FROM codes b
         |  CROSS JOIN range(0, ${Ann.PqM}) t(s)
         |  JOIN qlut q ON q.s = t.s
         |    AND q.cid = ((b.pq_code >> (4 * t.s)) & 15)
         |    AND q.qid <> b.vec_id
         |  GROUP BY 1, 2
         |)
         |SELECT qid, nid, adc_q, CAST(rnk AS INTEGER) AS rnk FROM (
         |  SELECT qid, nid, adc_q,
         |    row_number() OVER (PARTITION BY qid ORDER BY adc_q, nid) AS rnk
         |  FROM scored
         |) WHERE rnk <= $K""".stripMargin))

  /** Farthest-point (k-center greedy) sampling — diverse-subset selection
    * ([[Ann.farthestPoints]]); oracle = the greedy unrolled as a CTE chain
    * with the identical least-fold distance arithmetic, so a hash match
    * proves every pick AND its quantized spread distance cross-engine. */
  private val qKcenterSample = Q(
    "q_kcenter_sample",
    (s, dir) => Ann.farthestPoints(s, dir, KCenter),
    Some(s"$base,\n${Ann.farthestPointsSql(KCenter)}"))

  /** QUANTIZATION RECALL — the accuracy audit of the int8 compression
    * path ([[qEmbedQuant]] proves the CODES; this proves what the codes
    * COST): recall@K of brute cosine top-K run over max-abs-DEQUANTIZED
    * vectors (`code·amax/127` — the exact vectors an int8 index serves)
    * against the full-precision top-K, per query. Both rankings use the
    * proven mirrored-fold cosine; only the integer OVERLAP COUNT is
    * hashed — floats order candidates, integers carry the verdict.
    *
    * Scale shape: two broadcast-query map-only scans + query-keyed
    * top-K windows (the q_cos_topk contract, twice) + one keyed
    * intersection count. */
  private val qQuantRecall = Q(
    "q_quant_recall",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val dq = Ann.vecs(s, dir)
        .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
        .select(col("vec_id"), expr(
          "transform(v, x -> cast(floor(x / greatest(amax, 1e-30) * 127.0)" +
            " as bigint) * amax / 127.0)").as("v"))
        .withColumn("nrm", functions.vec_dot(col("v"), col("v")))
      val q = dq.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      val quantK = dq.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cos", Ann.cosCol("qv", "v", "qn", "nrm"))
        .select(col("qid"), col("vec_id").as("nid"), col("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select("qid", "nid")
      val fullK = Ann.cosineTopK(s, dir, NQueries, K).select("qid", "nid")
      val ov = fullK.join(quantK, Seq("qid", "nid"))
        .groupBy("qid").agg(count(lit(1)).as("n_common"))
      fullK.select("qid").distinct()
        .join(ov, Seq("qid"), "left_outer")
        .select(col("qid"), coalesce(col("n_common"), lit(0L)).as("n_common"),
          lit(K).as("k"))
    },
    Some(
      s"""$base, qt AS (
         |  SELECT vec_id,
         |    list_transform(v, x ->
         |      CAST(floor(x / greatest(amax, 1e-30) * 127.0) AS BIGINT)
         |        * amax / 127.0) AS dv
         |  FROM (SELECT vec_id, v,
         |          list_max(list_transform(v, x -> abs(x))) AS amax FROM w)
         |), wq AS (
         |  SELECT vec_id, dv AS v, ${Ann.dot(DuckD, "dv", "dv")} AS nrm
         |  FROM qt
         |), fullk AS (
         |  SELECT qid, nid FROM (
         |    SELECT a.vec_id AS qid, b.vec_id AS nid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY $cosAB DESC, b.vec_id) AS rnk
         |    FROM w a JOIN w b ON a.vec_id < $NQueries AND b.vec_id != a.vec_id
         |  ) WHERE rnk <= $K
         |), quantk AS (
         |  SELECT qid, nid FROM (
         |    SELECT a.vec_id AS qid, b.vec_id AS nid,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY $cosAB DESC, b.vec_id) AS rnk
         |    FROM wq a JOIN wq b
         |      ON a.vec_id < $NQueries AND b.vec_id != a.vec_id
         |  ) WHERE rnk <= $K
         |), ov AS (
         |  SELECT f.qid, CAST(count(*) AS BIGINT) AS n_common
         |  FROM fullk f JOIN quantk qk ON qk.qid = f.qid AND qk.nid = f.nid
         |  GROUP BY 1
         |)
         |SELECT qs.qid, coalesce(ov.n_common, 0) AS n_common,
         |  CAST($K AS INTEGER) AS k
         |FROM (SELECT DISTINCT qid FROM fullk) qs
         |LEFT JOIN ov ON ov.qid = qs.qid""".stripMargin))

  private val MmrPool = 20
  private val MmrM = 5

  /** MMR diversity re-ranking of query 0's top-[[MmrPool]] page
    * ([[Ann.mmrRerank]]); oracle = the greedy unrolled as a CTE chain
    * with the identical fold-order cosine and `0.5·cosq − 0.5·maxsim`
    * arithmetic, so a hash match proves every pick and its RAW selection
    * score cross-engine (the q_cos_topk precedent for hashing mirrored
    * doubles). */
  private val qMmrRerank = Q(
    "q_mmr_rerank",
    (s, dir) => Ann.mmrRerank(s, dir, MmrPool, MmrM),
    Some(s"$base,\n${Ann.mmrOracleSql(MmrPool, MmrM)}"))

  val all: Seq[Q] = Seq(qCosTopK, qQuantRecall, qAnnLsh, qAnnIvf, qEmbedNearDup,
    qEmbedQuant, qLabelCentroid, qPqCodes, qPqAdc, qKcenterSample, qMmrRerank)
}
