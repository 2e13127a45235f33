package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.text.TextOps._

/** Inverted-index lexical search over the `documents` corpus — the LEXICAL
  * counterpart of the engine's dense-retrieval family (brute cosine / LSH /
  * IVF over embeddings ≙ the reference's FaissRetriever.py:166-201; this is
  * the posting-list path a production corpus keeps NEXT to the vector
  * index). Three operators:
  *
  *   1. index build — token→(df, tf) posting statistics;
  *   2. conjunctive (AND) search — candidate intersection as a KEYED count,
  *      never a cross product;
  *   3. weighted ranked (OR) search — reciprocal-df term weighting with
  *      integer-exact arithmetic (ln-free: `floor(1e6·N / df)` — a raw
  *      transcendental double in hashed output was the q_bic_k lesson).
  *
  * Scale shape: postings are (token, doc) pairs — the classic inverted
  * index. The search-side filter `token IN (terms)` lands BEFORE the
  * keyed aggregation, so only the query terms' postings ever shuffle; at
  * 100 TB the index is materialized once, bucketed by token
  * ([[graft.operators.BucketStore]]), and every search is a bucket-pruned
  * scan + exchange-free keyed count. Document scoring joins the tiny
  * per-term df frame broadcast, and top-k is a global sort-LIMIT
  * (TakeOrderedAndProject — O(k) per partition, no partitionless window).
  */
object QueriesSearch {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** DuckDB posting-pairs CTE (tokenization identical to [[TextOps]]). */
  private val postingsCte: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${DuckD.splitToks("text")} AS toks FROM documents
       |), p AS (
       |  SELECT doc_id, unnest(toks) AS token FROM d
       |)""".stripMargin

  /** Inverted-index build: per-token document frequency + total term
    * frequency. The index itself is the (token, doc_id, tf) relation; the
    * emitted frame is its per-token statistics row (what a query planner
    * reads to order terms rarest-first). One keyed shuffle on token. */
  private val qIndexPostings = Q(
    "q_index_postings",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        explode(expr(SparkD.splitToks("text"))).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total")),
    Some(
      s"""$postingsCte
         |SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         |  CAST(count(*) AS BIGINT) AS tf_total
         |FROM p GROUP BY token""".stripMargin))

  /** Conjunctive search terms: 'dup' is rare (the planted near-dup docs),
    * the others are common — the AND is decided by the rare term's posting
    * list, exactly the rarest-first intersection a lexical engine plans. */
  private val AndTerms = Seq("dup", "vector", "key")

  /** Conjunctive (AND-of-terms) search: distinct (doc, token) postings
    * filtered to the query terms (the filter sits on the scan side of the
    * shuffle — only query-term postings move), then a keyed count equal to
    * the term count = the doc contains ALL terms. Intersection as
    * aggregation: no pairwise joins, no cross product, one shuffle. */
  private val qTokenSearch = Q(
    "q_token_search",
    (s, dir) => {
      val matched = docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(expr(SparkD.splitToks("text")))).as("token"))
        .filter(col("token").isin(AndTerms: _*))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("hits"))
        .filter(col("hits") === AndTerms.size)
        .select(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"),
          size(expr(SparkD.splitToks("text"))).as("n_tokens"))
        .join(broadcast(matched), "doc_id")
    },
    Some {
      val preds = AndTerms.map(t => s"list_contains(toks, '$t')")
        .mkString(" AND ")
      s"""WITH d AS (
         |  SELECT doc_id, ${DuckD.splitToks("text")} AS toks FROM documents
         |)
         |SELECT doc_id, ${DuckD.size("toks")} AS n_tokens
         |FROM d WHERE $preds""".stripMargin
    })

  /** Ranked search terms: one rare + two common, so the reciprocal-df
    * weighting visibly reorders (a 'dup' hit outweighs ~15 common hits). */
  private val OrTerms = Seq("dup", "vector", "spark")
  private val TopK = 10

  /** Weighted ranked (OR-of-terms) search: per-(doc, term) tf from the
    * filtered postings, per-term weight `w = (1e6 · N) div df` (integer
    * reciprocal-df — idf's monotone, cross-engine-exact surrogate), score
    * = Σ tf·w, global top-k by (score desc, doc_id) — a sort-LIMIT, which
    * Spark plans as TakeOrderedAndProject (per-partition heap of k, no
    * global sort materialized). df and N are broadcast scalars. */
  private val qSearchRanked = Q(
    "q_search_ranked",
    (s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"),
          explode(expr(SparkD.splitToks("text"))).as("token"))
        .filter(col("token").isin(OrTerms: _*))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfPerTerm = tf.groupBy(col("token"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      tf.join(broadcast(dfPerTerm), "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("w", expr("(1000000 * n_docs) div df"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("w")).as("score_q"))
        .orderBy(col("score_q").desc, col("doc_id"))
        .limit(TopK)
    },
    Some {
      val in = OrTerms.map(t => s"'$t'").mkString(", ")
      s"""$postingsCte, tf AS (
         |  SELECT doc_id, token, count(*) AS tf
         |  FROM p WHERE token IN ($in) GROUP BY doc_id, token
         |), dfx AS (
         |  SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token
         |), n AS (
         |  SELECT count(*) AS n_docs FROM documents
         |)
         |SELECT doc_id,
         |  CAST(sum(tf * ((1000000 * n_docs) // df)) AS BIGINT) AS score_q
         |FROM tf JOIN dfx USING (token), n
         |GROUP BY doc_id
         |ORDER BY score_q DESC, doc_id
         |LIMIT $TopK""".stripMargin
    })

  /** Phrase to find adjacently — two common tokens, so the adjacency join
    * (not mere co-occurrence) decides the result. */
  private val Phrase = ("key", "agg")

  /** PHRASE search over POSITIONAL postings: the index keeps (token,
    * doc_id, pos) — the positional posting list every lexical engine
    * stores next to the df stats — and a phrase match is an equi-join of
    * the two terms' postings on (doc_id, pos) with the second term's
    * position shifted by one. Adjacency as a KEYED join: each term's
    * filter lands before its shuffle, candidates are the two posting
    * lists (not documents), and the join key (doc_id, pos) is unique per
    * side — linear, never a per-document scan. */
  private val qPhraseSearch = Q(
    "q_phrase_search",
    (s, dir) => {
      val pos = docs(s, dir)
        .select(col("doc_id"),
          posexplode(expr(SparkD.splitToks("text"))).as(Seq("pos", "token")))
      val first = pos.filter(col("token") === Phrase._1)
        .select(col("doc_id"), col("pos"))
      val second = pos.filter(col("token") === Phrase._2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      first.join(second, Seq("doc_id", "pos"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
    },
    Some(
      s"""WITH d AS (
         |  SELECT doc_id, ${DuckD.splitToks("text")} AS toks FROM documents
         |), p AS (
         |  SELECT doc_id, unnest(toks) AS token,
         |    generate_subscripts(toks, 1) AS pos
         |  FROM d
         |), t1 AS (
         |  SELECT doc_id, pos FROM p WHERE token = '${Phrase._1}'
         |), t2 AS (
         |  SELECT doc_id, pos - 1 AS pos FROM p WHERE token = '${Phrase._2}'
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM t1 JOIN t2 USING (doc_id, pos)
         |GROUP BY doc_id""".stripMargin))

  /** Phrase search over the BUCKETED positional-postings STORE: the same
    * adjacency join as [[qPhraseSearch]], but the (token, doc_id, pos)
    * relation is first persisted as a catalog table bucketed by `token`
    * ([[graft.operators.BucketStore]], the SCALE.md store layout for the
    * lexical index — VERDICT r4 task 9b). Each term's posting list then
    * comes from a BUCKET-PRUNED scan: `token = t` reads 1 of the 8 bucket
    * files (SelectedBucketsCount — SearchSpec pins the plan), which at
    * 100 TB is the difference between reading one term's shard and
    * re-scanning the whole positional index per query. The oracle is
    * identical to q_phrase_search's, so a hash match proves the
    * write → catalog → pruned-scan → join chain is lossless. */
  private val qPhraseBucketed = Q(
    "q_phrase_bucketed",
    (s, dir) => {
      import graft.operators.BucketStore
      val pos = docs(s, dir)
        .select(col("doc_id"),
          posexplode(expr(SparkD.splitToks("text"))).as(Seq("pos", "token")))
      BucketStore.write(pos, "graft_bkt_postings", nBuckets = 8,
        key = "token")
      val store = BucketStore.table(s, "graft_bkt_postings")
      val first = store.filter(col("token") === Phrase._1)
        .select(col("doc_id"), col("pos"))
      val second = store.filter(col("token") === Phrase._2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      first.join(second, Seq("doc_id", "pos"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
    },
    qPhraseSearch.oracle)

  val all: Seq[Q] = Seq(qIndexPostings, qTokenSearch, qSearchRanked,
    qPhraseSearch, qPhraseBucketed)
}
