package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BucketStore

/** Inverted-index lexical search ([[graft.text.QueriesSearch]]): semantics
  * vs brute-force contains-all, plan shape of the ranked top-k, and bucket
  * PRUNING of a token-bucketed postings store (the at-scale search path:
  * `token IN (...)` reads only the query terms' buckets). */
class SearchSpec extends SparkFunSuite {

  private val Toks = "split(trim(text), ' +')"

  private def docs: DataFrame =
    spark.read.parquet(s"${SparkSpec.Sf}/documents.parquet")

  test("conjunctive search == brute contains-all filter") {
    val terms = Seq("dup", "vector", "key")
    val viaIndex = graft.SparkEntry.queries("q_token_search")(
      spark, SparkSpec.Sf).select("doc_id").collect().map(_.getLong(0)).toSet
    val brute = docs
      .withColumn("toks", expr(Toks))
      .filter(terms.map(t => array_contains(col("toks"), t)).reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == brute && brute.nonEmpty)
  }

  test("ranked search: integer scores match a direct recomputation") {
    val terms = Seq("dup", "vector", "spark")
    val got = graft.SparkEntry.queries("q_search_ranked")(spark, SparkSpec.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // direct recomputation over the collected corpus (500 docs)
    val corpus = docs.select(col("doc_id"), expr(Toks).as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = corpus.length.toLong
    val tf = corpus.flatMap { case (id, toks) =>
      toks.filter(terms.contains).map(t => (id, t))
    }.groupBy(identity).map { case ((id, t), hits) => (id, t, hits.length.toLong) }
    val dfx = tf.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet.size.toLong }
    val scores = tf.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, t, c) => c * ((1000000L * n) / dfx(t)) }.sum
    }
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.toSeq == want)
  }

  test("ranked top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = graft.SparkEntry.queries("q_search_ranked")(spark, SparkSpec.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a top-k operator, got:\n$plan")
  }

  test("bm25: integer chain matches a direct recomputation; " +
    "length normalization reorders vs raw reciprocal-df") {
    val terms = Seq("dup", "vector", "spark")
    val got = graft.SparkEntry.queries("q_bm25")(spark, SparkSpec.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val corpus = docs.select(col("doc_id"), expr(Toks).as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = corpus.length.toLong
    val dlen = corpus.map { case (id, t) => id -> t.length.toLong }.toMap
    val avgdl1000 = (1000L * dlen.values.sum) / n
    val tf = corpus.flatMap { case (id, toks) =>
      toks.filter(terms.contains).map(t => (id, t))
    }.groupBy(identity).map { case ((id, t), xs) => (id, t, xs.length.toLong) }
    val dfx = tf.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).toSet.size.toLong }
    val scores = tf.groupBy(_._1).map { case (id, xs) =>
      val norm1000 = 250L + (750000L * dlen(id)) / avgdl1000
      id -> xs.map { case (_, t, c) =>
        val tfPart = (c * 2200000L) / (c * 1000L + (1200L * norm1000) / 1000L)
        ((1000000L * n) / dfx(t)) * tfPart
      }.sum
    }
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
      .map { case (id, s) => (id, dlen(id), s) }
    assert(got.toSeq == want)
    // the normalization must actually bite: BM25's top-10 differs from the
    // raw reciprocal-df top-10 (otherwise the operator adds nothing)
    val recip = graft.SparkEntry.queries("q_search_ranked")(spark, SparkSpec.Sf)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet != recip)
  }

  test("rank fusion: rrf recomputed from the two collected rankings; " +
    "ranks are 1..k permutations, absent lists contribute zero") {
    def ranks(q: String): Map[Long, Long] =
      graft.SparkEntry.queries(q)(spark, SparkSpec.Sf)
        .collect().map(_.getLong(0)).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
    val ra = ranks("q_search_ranked")
    val rb = ranks("q_bm25")
    val want = (ra.keySet ++ rb.keySet).map { id =>
      val a = ra.getOrElse(id, 0L)
      val b = rb.getOrElse(id, 0L)
      val rrf = (if (a > 0) 1000000L / (60L + a) else 0L) +
        (if (b > 0) 1000000L / (60L + b) else 0L)
      (id, a, b, rrf)
    }
    val got = graft.SparkEntry.queries("q_rank_fusion")(spark, SparkSpec.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(ra.values.toSeq.sorted == (1L to 10L) &&
      rb.values.toSeq.sorted == (1L to 10L))
  }

  test("token-bucketed postings store: IN-filter scan is bucket-pruned") {
    val postings = docs
      .select(col("doc_id"), explode(expr(Toks)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    BucketStore.write(postings, "postings_spec", nBuckets = 8, key = "token")
    // per-term totals: the groupBy on the bucket key keeps the bucketed
    // scan enabled (the planner drops bucketing when nothing needs the
    // distribution), the IN filter prunes to the terms' buckets, and the
    // aggregation plans with no shuffle exchange.
    val q = BucketStore.table(spark, "postings_spec")
      .filter(col("token").isin("dup", "vector"))
      .groupBy("token").agg(sum("tf").as("tf"))
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val Sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.unanchored
    formatted match {
      case Sel(k, n) =>
        assert(k.toInt < n.toInt && k.toInt <= 2,
          s"expected <=2 of $n buckets selected, got $k")
      case _ => fail(s"no bucket pruning in plan:\n$formatted")
    }
    assert(!formatted.contains("Exchange"),
      s"bucketed groupBy must not shuffle:\n$formatted")
    // pruned scan answers exactly
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = postings.filter(col("token").isin("dup", "vector"))
      .groupBy("token").agg(sum("tf").as("tf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("bucketed positional phrase search == plain phrase search, " +
    "each term's posting scan pruned to one bucket") {
    val plain = graft.SparkEntry.queries("q_phrase_search")(spark, SparkSpec.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketed = graft.SparkEntry
      .queries("q_phrase_bucketed")(spark, SparkSpec.Sf)
    val got = bucketed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == plain && got.nonEmpty)
    // each term's scan reads ONE of the 8 bucket files
    val term = BucketStore.table(spark, "graft_bkt_postings")
      .filter(col("token") === "key")
    val formatted = term.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val Sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.unanchored
    formatted match {
      case Sel(k, n) => assert(k.toInt == 1 && n.toInt == 8,
        s"expected 1 of 8 buckets, got $k of $n")
      case _ => fail(s"no bucket pruning in plan:\n$formatted")
    }
  }
}
