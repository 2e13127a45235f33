package graft

import org.apache.spark.sql.functions._

import graft.text.{ChunkKernel, ChunkerFunctions}

/** The chunker (raptor/utils.py:23-111 split_text): the shipped kernel vs
  * an INDEPENDENT literal transliteration (immutable-list style), plus
  * directed cases for every quirk the reference carries — the buggy
  * overlap length recompute, the oversize-sub TODO path, blank skipping.
  * The overlap=0 default path is additionally DuckDB-oracle-proven by
  * q_chunk_rows. */
class ChunkerSpec extends SparkFunSuite {

  /** Second implementation, written as a direct line-by-line transcription
    * of the Python (functional style, separate from the kernel's
    * while-loop form) — protects the kernel against refactor drift. */
  private def pythonLiteral(text: String, max: Long, overlap: Int): List[String] = {
    val sentences = text.split("[.!?\n]", -1).toList
    val nTokens = sentences.map(ChunkKernel.nTok)
    var chunks = List.empty[String]
    var currentChunk = List.empty[String]
    var currentLength = 0L
    for ((sentence, tokenCount) <- sentences.zip(nTokens)) {
      if (sentence.trim.nonEmpty) {
        if (tokenCount > max) {
          val subs = sentence.split("[,;:]", -1).toList.map(_.trim).filter(_.nonEmpty)
          val subTc = subs.map(ChunkKernel.nTok)
          var subChunk = List.empty[String]
          var subLength = 0L
          for ((s, c) <- subs.zip(subTc)) {
            if (subLength + c > max) {
              if (subChunk.nonEmpty) {
                chunks :+= subChunk.mkString(" ")
                subChunk = if (overlap > 0) subChunk.takeRight(overlap) else Nil
                subLength = subTc.slice(
                  math.max(0, subChunk.length - overlap), subChunk.length).sum
              }
            }
            subChunk :+= s; subLength += c
          }
          if (subChunk.nonEmpty) chunks :+= subChunk.mkString(" ")
        } else if (currentLength + tokenCount > max) {
          chunks :+= currentChunk.mkString(" ")
          currentChunk = if (overlap > 0) currentChunk.takeRight(overlap) else Nil
          currentLength = nTokens.slice(
            math.max(0, currentChunk.length - overlap), currentChunk.length).sum
          currentChunk :+= sentence; currentLength += tokenCount
        } else {
          currentChunk :+= sentence; currentLength += tokenCount
        }
      }
    }
    if (currentChunk.nonEmpty) chunks :+= currentChunk.mkString(" ")
    chunks
  }

  test("kernel == literal transliteration on the corpus, several configs") {
    val texts = spark.read.parquet(s"${SparkSpec.Sf}/documents.parquet")
      .select(expr("array_join(transform(split(trim(text), ' +'), " +
        "(w, i) -> concat(w, (CASE WHEN (i+1) % 26 = 0 THEN '! ' " +
        "WHEN (i+1) % 13 = 0 THEN '. ' WHEN (i+1) % 11 = 0 THEN '; ' " +
        "WHEN (i+1) % 7 = 0 THEN ': ' WHEN (i+1) % 5 = 0 THEN ', ' " +
        "ELSE ' ' END))), '')").as("pt"))
      .collect().map(_.getString(0))
    assert(texts.nonEmpty)
    for {
      (max, ov) <- Seq((6L, 0), (10L, 0), (10L, 1), (8L, 2), (5L, 1))
      t <- texts
    } assert(ChunkKernel.chunks(t, max, ov) == pythonLiteral(t, max, ov),
      s"drift at max=$max overlap=$ov for: $t")
  }

  test("overlap>0 pins the reference's buggy length recompute (utils.py:98)") {
    // tc per sentence: 1, 4, 4, 3; max=8, overlap=1. The buggy recompute
    // charges the carried sentence with n_tokens[0] (=1, the FIRST
    // sentence's count) instead of its own 4 -> the third sentence fits
    // and only TWO chunks come out; a "fixed" implementation would emit 3.
    val text = "a. b c d e. f g h i. j k l"
    val got = ChunkKernel.chunks(text, 8, 1)
    assert(got == Seq("a  b c d e", " b c d e  f g h i  j k l"),
      s"buggy-overlap contract drifted: $got")
  }

  test("oversize sentence: stage-2 comma split packs sub-pieces") {
    val got = ChunkKernel.chunks("aaa bbb, ccc ddd, eee fff, ggg hhh", 4, 0)
    assert(got == Seq("aaa bbb ccc ddd", "eee fff ggg hhh"))
  }

  test("TODO path: a sub-piece longer than max is emitted oversize") {
    val got = ChunkKernel.chunks("v w x y z", 3, 0)
    assert(got == Seq("v w x y z"))
    assert(ChunkKernel.nTok(got.head) > 3)
  }

  test("blank sentences are skipped, not emitted") {
    assert(ChunkKernel.chunks("x.. . y", 10, 0) == Seq("x  y"))
    assert(ChunkKernel.chunks("...", 10, 0) == Seq.empty)
  }

  test("kernel == literal transliteration on random punctuated texts (seeded sweep)") {
    // randomized edge-case sweep: consecutive delimiters, blank sentences,
    // delimiter-only texts, oversize runs, every (max, overlap) combo
    val rnd = new scala.util.Random(224) // the reference's own seed
    val chars = "ab cd. efg, h;i:j!k?\nl mno pq r"
    (0 until 400).foreach { _ =>
      val len = 1 + rnd.nextInt(120)
      val text = Seq.fill(len)(chars(rnd.nextInt(chars.length))).mkString
      val max = 1L + rnd.nextInt(12)
      val ov = rnd.nextInt(3)
      assert(ChunkKernel.chunks(text, max, ov) == pythonLiteral(text, max, ov),
        s"drift at max=$max overlap=$ov for: ${text.replace("\n", "\\n")}")
    }
  }

  test("overlap=0 chunks conserve the kept pieces (multiset)") {
    // structural invariant: with no overlap every kept (non-blank) piece
    // appears in exactly one chunk — no loss, no duplication. NOTE the
    // order across chunks is NOT sequential: an oversize sentence's
    // sub-chunks are emitted immediately while the surrounding main chunk
    // stays open and flushes later (the reference's interleaving,
    // utils.py:58-105 — the oversize branch never touches current_chunk).
    val rnd = new scala.util.Random(42)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    (0 until 100).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val text = (0 until n).map { i =>
        words(rnd.nextInt(words.length)) +
          (rnd.nextInt(6) match {
            case 0 => ". "; case 1 => ", "; case 2 => "! "; case _ => " "
          })
      }.mkString
      val max = 2L + rnd.nextInt(6)
      val got = ChunkKernel.chunks(text, max, 0)
      val gotWords = got.flatMap(_.split("[.!?\n,;:\\s]+")).filter(_.nonEmpty)
      val wantWords = text.split("[.!?\n,;:\\s]+").filter(_.nonEmpty).toSeq
      assert(gotWords.sorted == wantWords.sorted,
        s"pieces lost or duplicated for: $text")
    }
  }

  test("expression stays inside whole-stage codegen") {
    import spark.implicits._
    val df = Seq("a b. c d").toDF("t")
      .select(posexplode(ChunkerFunctions.split_text_chunks(
        col("t"), lit(3), lit(0))))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("))
  }
}
