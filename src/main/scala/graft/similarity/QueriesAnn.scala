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
  private val NearDupT = 0.4
  private val CentroidDims = 4

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

  private val qEmbedNearDup = Q(
    "q_embed_neardup",
    (s, dir) => Ann.cosineNearDupPairs(s, dir, NearDupT),
    Some(
      s"""$base
         |SELECT ai, bi, cos FROM (
         |  SELECT a.vec_id AS ai, b.vec_id AS bi, $cosAB AS cos
         |  FROM w a JOIN w b ON a.vec_id < b.vec_id
         |) WHERE cos >= $NearDupT""".stripMargin))

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

  val all: Seq[Q] = Seq(qCosTopK, qAnnLsh, qEmbedNearDup, qLabelCentroid)
}
