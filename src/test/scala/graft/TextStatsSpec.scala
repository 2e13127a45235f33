package graft

/** Driver-side brute replay of q_bigram_rare: independent Scala
  * tokenization + df computation vs the engine's distributed plan. */
class TextStatsSpec extends SparkFunSuite {

  test("q_bigram_rare matches an independent driver-side replay") {
    val docs = spark.read.parquet(s"${SparkSpec.Sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // engine tokenization: split(trim(text), ' +'); bigrams distinct
    val bigrams = docs.view.mapValues { t =>
      val toks = t.trim.split(" +")
      if (toks.length < 2) Set.empty[String]
      else toks.sliding(2).map(_.mkString(" ")).toSet
    }.toMap.filter(_._2.nonEmpty)
    val df = bigrams.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rows = Queries.queryMap("q_bigram_rare")(spark, SparkSpec.Sf).collect()
    assert(rows.length == bigrams.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bg = bigrams(id)
      val rare = bg.count(df(_) <= 2).toLong
      assert(r.getAs[Long]("n_bigrams") == bg.size.toLong, id)
      assert(r.getAs[Long]("n_rare") == rare, id)
      assert(r.getAs[Double]("rare_rate") == rare.toDouble / bg.size, id)
    }
  }
}
