package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's document chunker (raptor/utils.py:23-111 `split_text` —
  * its single most-used function), re-expressed as a per-row codegen'd
  * kernel feeding `posexplode`: 1 document row -> N chunk rows, fully
  * distributed (map-only; no shuffle, no UDF).
  *
  * Semantics transliterated EXACTLY, including the reference's quirks:
  *  - stage 1: split on the single-char delimiters `[.!?\n]` (empty
  *    sentences KEPT in the token-count list, skipped by the loop —
  *    utils.py:42-54);
  *  - token surrogate: `tiktoken` is replaced by the deterministic
  *    piece count `[a-z]+|[0-9]+|[^a-z0-9 ]` over the lowercased text
  *    (the same surrogate as q_doc_stats/q_chunk_plan — SURVEY.md F2);
  *  - greedy re-pack of sentences into chunks of <= maxTokens, flushing
  *    BEFORE the overflowing sentence (utils.py:89-105);
  *  - stage 2: a single sentence whose count exceeds maxTokens is
  *    sub-split on `[,;:]`, stripped, blank-dropped, and greedily packed
  *    by its own independent sub-fold (utils.py:58-86) — the surrounding
  *    main chunk accumulates ACROSS it untouched, so emitted chunk order
  *    interleaves;
  *  - a sub-piece still longer than maxTokens is emitted as an oversize
  *    chunk (the reference's own TODO at utils.py:71);
  *  - overlap > 0 keeps the last `overlap` pieces AND recomputes the
  *    carried length from the token-count list indexed by the KEPT COUNT
  *    (`n_tokens[max(0, len(cc)-overlap):len(cc)]`, utils.py:80,98 — i.e.
  *    the counts of the FIRST `overlap` sentences of the document, not of
  *    the kept sentences; the reference comments this "said to have bugs").
  *    Replicated bit-for-bit; ChunkerSpec pins a case where the quirk
  *    observably changes the packing.
  *
  * The overlap=0 default path is additionally proven against a DuckDB
  * oracle that replays the same state machine as a `list_reduce` fold
  * (q_chunk_rows). */
object ChunkKernel {

  private val Delims = java.util.regex.Pattern.compile("[.!?\n]")
  private val SubDelims = java.util.regex.Pattern.compile("[,;:]")
  private val Piece = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")

  /** Deterministic token surrogate: piece count of the lowercased text
    * (identical to `len(regexp_extract_all(lower(s), PiecePat))`). */
  def nTok(s: String): Long = {
    val m = Piece.matcher(s.toLowerCase(java.util.Locale.ROOT))
    var n = 0L
    while (m.find()) n += 1
    n
  }

  /** Faithful transliteration of `split_text` (see object scaladoc). */
  def chunks(text: String, maxTokens: Long, overlap: Int): Seq[String] = {
    // python re.split keeps empty strings -> limit -1
    val sentences = Delims.split(text, -1)
    val nTokens = sentences.map(nTok)
    val out = ArrayBuffer.empty[String]
    val cur = ArrayBuffer.empty[String]
    var curLen = 0L
    var idx = 0
    while (idx < sentences.length) {
      val sentence = sentences(idx)
      val tc = nTokens(idx)
      if (sentence.trim.nonEmpty) {
        if (tc > maxTokens) {
          // stage-2 sub-split; independent sub-fold, main chunk untouched
          val subs = SubDelims.split(sentence, -1).map(_.trim).filter(_.nonEmpty)
          val subTc = subs.map(nTok)
          val sub = ArrayBuffer.empty[String]
          var subLen = 0L
          var k = 0
          while (k < subs.length) {
            if (subLen + subTc(k) > maxTokens && sub.nonEmpty) {
              out += sub.mkString(" ")
              val kept = if (overlap > 0) sub.takeRight(overlap).toArray
                         else Array.empty[String]
              sub.clear(); sub ++= kept
              // BUG-FAITHFUL: indexes subTc by the kept COUNT (utils.py:80)
              val lo = math.max(0, sub.length - overlap)
              subLen = subTc.slice(lo, sub.length).sum
            }
            sub += subs(k); subLen += subTc(k)
            k += 1
          }
          if (sub.nonEmpty) out += sub.mkString(" ")
        } else if (curLen + tc > maxTokens) {
          out += cur.mkString(" ")
          val kept = if (overlap > 0) cur.takeRight(overlap).toArray
                     else Array.empty[String]
          cur.clear(); cur ++= kept
          // BUG-FAITHFUL: indexes the GLOBAL sentence token-count list
          // (incl. blanks) by the kept COUNT (utils.py:98)
          val lo = math.max(0, cur.length - overlap)
          curLen = nTokens.slice(lo, cur.length).sum
          cur += sentence; curLen += tc
        } else {
          cur += sentence; curLen += tc
        }
      }
      idx += 1
    }
    if (cur.nonEmpty) out += cur.mkString(" ")
    out.toSeq
  }

  /** Expression entry point (UTF8String in/out). */
  def pack(text: UTF8String, maxTokens: Long, overlap: Int): ArrayData =
    new GenericArrayData(chunks(text.toString, maxTokens, overlap)
      .map(UTF8String.fromString).toArray[Any])
}

/** `SPLIT_TEXT_CHUNKS(text, max_tokens, overlap) -> array<string>` — the
  * chunker as a codegen'd expression; `posexplode` the result for
  * (chunk_id, chunk) rows. */
case class SplitTextChunks(text: Expression, maxTokens: Expression,
                           overlap: Expression) extends TernaryExpression {
  override def first: Expression = text
  override def second: Expression = maxTokens
  override def third: Expression = overlap
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, m: Any, o: Any): Any =
    ChunkKernel.pack(t.asInstanceOf[UTF8String],
      m.asInstanceOf[Number].longValue(), o.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, m, o) => s"graft.text.ChunkKernel.pack($t, $m, $o)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  override def prettyName: String = "split_text_chunks"
}

object ChunkerFunctions {
  def split_text_chunks(text: Column, maxTokens: Column, overlap: Column): Column =
    GraftBridge.column(SplitTextChunks(GraftBridge.expression(text),
      GraftBridge.expression(maxTokens), GraftBridge.expression(overlap)))
}
