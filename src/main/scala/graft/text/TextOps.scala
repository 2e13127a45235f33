package graft.text

/** Text-analysis / dedup kernels over the `documents` table, expressed as
  * SQL fragments generated for BOTH engines (Spark SQL and the DuckDB
  * oracle) from one definition — the parity strategy of SURVEY.md §5.6:
  * every operator's oracle replicates the exact algorithm, so the driver's
  * value-hash compare proves the distributed implementation bit-for-bit.
  *
  * ≙ the reference's chunking + embedding + dedup surface
  * (raptor/utils.py:23-111 split_text; test_k_mean_datasets.py:291-301
  * `seen_contexts` dedup; EmbeddingModels.py:16-53 per-record encode):
  * the "embedding" of a document here is its shingle set / MinHash
  * signature / SimHash — deterministic, engine-computable analogs of the
  * reference's dense vectors, over which the same cluster-prefilter +
  * brute-verify retrieval shapes run (SURVEY.md J3).
  *
  * All functions are dialect-parameterized fragment builders; the shared
  * 32-bit word hash is `int(md5(s)[0:8], 16)` — md5 is identical in both
  * engines, giving a cross-engine deterministic hash (Spark's `hash()` and
  * DuckDB's `hash()` differ, so neither is usable for parity).
  */
object TextOps {

  /** SQL dialect abstraction: Spark SQL vs DuckDB. Only what the text ops
    * need; both sides are ANSI-ish, the deltas are function names and
    * 0- vs 1-based array indexing. */
  sealed trait Dialect {
    def splitToks(text: String): String
    /** 32-bit unsigned hash of a string expression, as BIGINT. */
    def hash32(s: String): String
    def transform(arr: String, v: String, body: String): String
    def filter(arr: String, v: String, body: String): String
    /** Sequential left fold to a BIGINT sum (deterministic order). */
    def sumFold(arr: String): String
    def arrMin(a: String): String
    def arrDistinct(a: String): String
    def arrSort(a: String): String
    def arrIntersectSize(a: String, b: String): String
    def arrUnionSize(a: String, b: String): String
    def size(a: String): String
    /** element at 1-based index expression `i1`. */
    def at(arr: String, i1: String): String
    /** [1-based from, 1-based to] inclusive integer sequence. */
    def seqIncl(from: String, to: String): String
    /** slice of `len` elements starting at 1-based `i1`. */
    def slice(arr: String, i1: String, len: String): String
    def shr(x: String, i: Int): String
    def xor(a: String, b: String): String
    def bitCount(x: String): String
    def arrJoin(arr: String, sep: String): String
    def contains(items: Seq[String], v: String): String
  }

  object SparkD extends Dialect {
    def splitToks(text: String) = s"split(trim($text), ' +')"
    def hash32(s: String) = s"cast(conv(substring(md5($s), 1, 8), 16, 10) as bigint)"
    def transform(arr: String, v: String, body: String) = s"transform($arr, $v -> $body)"
    def filter(arr: String, v: String, body: String) = s"filter($arr, $v -> $body)"
    def sumFold(arr: String) = s"aggregate($arr, cast(0 as bigint), (acc, x) -> acc + x)"
    def arrMin(a: String) = s"array_min($a)"
    def arrDistinct(a: String) = s"array_distinct($a)"
    def arrSort(a: String) = s"array_sort($a)"
    def arrIntersectSize(a: String, b: String) = s"size(array_intersect($a, $b))"
    def arrUnionSize(a: String, b: String) = s"size(array_union($a, $b))"
    def size(a: String) = s"size($a)"
    def at(arr: String, i1: String) = s"element_at($arr, $i1)"
    def seqIncl(from: String, to: String) = s"sequence($from, $to)"
    def slice(arr: String, i1: String, len: String) = s"slice($arr, $i1, $len)"
    def shr(x: String, i: Int) = s"shiftright($x, $i)"
    def xor(a: String, b: String) = s"($a ^ $b)"
    def bitCount(x: String) = s"bit_count($x)"
    def arrJoin(arr: String, sep: String) = s"array_join($arr, '$sep')"
    def contains(items: Seq[String], v: String) =
      s"array_contains(array(${items.map(s => s"'$s'").mkString(",")}), $v)"
  }

  object DuckD extends Dialect {
    def splitToks(text: String) = s"regexp_split_to_array(trim($text), ' +')"
    def hash32(s: String) = s"(('0x' || substr(md5($s), 1, 8))::BIGINT)"
    def transform(arr: String, v: String, body: String) = s"list_transform($arr, $v -> $body)"
    def filter(arr: String, v: String, body: String) = s"list_filter($arr, $v -> $body)"
    def sumFold(arr: String) = s"CAST(coalesce(list_sum($arr), 0) AS BIGINT)"
    def arrMin(a: String) = s"list_min($a)"
    def arrDistinct(a: String) = s"list_distinct($a)"
    def arrSort(a: String) = s"list_sort($a)"
    def arrIntersectSize(a: String, b: String) = s"len(list_intersect($a, $b))"
    def arrUnionSize(a: String, b: String) = s"len(list_distinct(list_concat($a, $b)))"
    def size(a: String) = s"len($a)"
    def at(arr: String, i1: String) = s"$arr[$i1]"
    def seqIncl(from: String, to: String) = s"range($from, ($to) + 1)"
    def slice(arr: String, i1: String, len: String) = s"$arr[$i1:($i1) + ($len) - 1]"
    def shr(x: String, i: Int) = s"($x >> $i)"
    def xor(a: String, b: String) = s"xor($a, $b)"
    def bitCount(x: String) = s"bit_count($x)"
    def arrJoin(arr: String, sep: String) = s"array_to_string($arr, '$sep')"
    def contains(items: Seq[String], v: String) =
      s"list_contains([${items.map(s => s"'$s'").mkString(",")}], $v)"
  }

  // --------------------------------------------------------------- shingling

  val ShingleN = 3

  /** Distinct word n-gram (shingle) array from a token array (caller filters
    * size >= n). ≙ reference chunk overlap windows (utils.py:83-99). */
  def shingles(d: Dialect, toks: String, n: Int = ShingleN): String = {
    val gram = (0 until n).map(j => d.at(toks, s"i + $j")).mkString(" || ' ' || ")
    val sparkGram = (0 until n).map(j => d.at(toks, s"i + $j")).mkString(", ")
    val body = d match {
      case SparkD => s"concat_ws(' ', $sparkGram)"
      case DuckD  => gram
    }
    d.arrDistinct(d.transform(d.seqIncl("1", s"${d.size(toks)} - ${n - 1}"), "i", body))
  }

  /** Per-shingle 32-bit hash array (shared across MinHash / winnowing). */
  def shingleHashes(d: Dialect, sh: String): String =
    d.transform(sh, "s", d.hash32("s"))

  /** Jaccard similarity of two DISTINCT string arrays, as double
    * (int-cardinality division — bit-exact in both engines). */
  def jaccard(d: Dialect, a: String, b: String): String =
    s"(CAST(${d.arrIntersectSize(a, b)} AS DOUBLE) / CAST(${d.arrUnionSize(a, b)} AS DOUBLE))"

  // ----------------------------------------------------------------- MinHash

  /** m permutations (a_j*h + b_j) mod p over 32-bit shingle hashes;
    * p = 2^31-1 (Mersenne prime), a odd. a*h < 2^38 — no int64 overflow. */
  val MinHashM = 16
  val MinHashP = 2147483647L
  def mhA(j: Int): Long = 2L * j + 1
  def mhB(j: Int): Long = 97L * j + 31

  /** The j-th MinHash over a hash array expression `hs`. */
  def minhash(d: Dialect, hs: String, j: Int): String =
    d.arrMin(d.transform(hs, "h", s"(${mhA(j)} * h + ${mhB(j)}) % $MinHashP"))

  /** LSH banding: bands of r consecutive signature slots; b = m / r. */
  val LshR = 2
  val LshB: Int = MinHashM / LshR

  // ----------------------------------------------------------------- SimHash

  val SimHashBits = 32

  /** 32-bit SimHash over token hashes WITH multiplicity (weight = term
    * frequency): bit i set iff sum of (2*bit_i(h) - 1) > 0. Generated as 32
    * unrolled terms — no nested lambdas, identical in both engines. */
  def simhash(d: Dialect, hs: String): String =
    (0 until SimHashBits).map { i =>
      val contrib = d.transform(hs, "h", s"2 * (${d.shr("h", i)} & 1) - 1")
      s"(CASE WHEN ${d.sumFold(contrib)} > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** SimHash band value: 8-bit slice k (k in 0..3). Pigeonhole: hamming <= 3
    * over 4 bands -> at least one band equal, so band-join is a LOSSLESS
    * prefilter for hamming <= 3 (SURVEY.md J3 prefilter+refine, exact). */
  val SimBandBits = 8
  val SimBands: Int = SimHashBits / SimBandBits
  val SimHammingMax: Int = SimBands - 1
  def simBand(d: Dialect, sim: String, k: Int): String =
    s"(${d.shr(sim, k * SimBandBits)} & ${(1 << SimBandBits) - 1})"

  // ------------------------------------------------------- language profiles

  /** Synthetic "language" profiles over the corpus vocabulary — the n-gram
    * heuristic language-ID analog (profile = stopword list; score = token
    * hits with multiplicity). Deterministic argmax with first-profile
    * tie-break. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "sqlish" -> Seq("join", "merge", "group", "order", "sort", "query", "filter", "scan"),
    "datast" -> Seq("stream", "batch", "window", "vector", "data", "value", "key", "hash"),
    "infra"  -> Seq("spark", "table", "row", "column", "line", "part", "customer", "agg"),
    "misc"   -> Seq("a", "the", "big", "small", "fast", "slow", "dup"))

  def langScore(d: Dialect, toks: String, words: Seq[String]): String =
    d.size(d.filter(toks, "w", d.contains(words, "w")))

  /** CASE chain argmax over score columns s_<name>, ties -> earlier profile. */
  def langArgmax(scoreCols: Seq[(String, String)]): String = {
    val names = scoreCols
    val cases = names.init.zipWithIndex.map { case ((n, c), i) =>
      val rest = names.drop(i + 1).map(_._2)
      s"WHEN ${rest.map(r => s"$c >= $r").mkString(" AND ")} THEN '$n'"
    }
    s"(CASE ${cases.mkString(" ")} ELSE '${names.last._1}' END)"
  }

  // ----------------------------------------------------------------- quality

  /** Deterministic quality score in [0,1]:
    * 0.4*coverage(n_tokens/80 capped) + 0.3*type-token ratio +
    * 0.3*(1 - stop ratio). All-double arithmetic in one fixed op order. */
  def qualityScore(d: Dialect, nToks: String, nDistinct: String, nStop: String): String =
    s"(0.4 * least(CAST($nToks AS DOUBLE) / 80.0, 1.0)" +
      s" + 0.3 * (CAST($nDistinct AS DOUBLE) / CAST($nToks AS DOUBLE))" +
      s" + 0.3 * (1.0 - CAST($nStop AS DOUBLE) / CAST($nToks AS DOUBLE)))"

  val StopWords: Seq[String] = Seq("a", "the")

  def qualityBucket(score: String): String =
    s"(CASE WHEN $score >= 0.8 THEN 'high' WHEN $score >= 0.6 THEN 'mid' ELSE 'low' END)"

  // -------------------------------------------------------------- winnowing

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03): k-gram hashes ->
    * min per sliding window of w -> distinct sorted set. Emitted as a
    * comma-joined string (stable cross-engine rendering). */
  val WinnowK = 5 // token k-grams
  val WinnowW = 4 // window of consecutive k-gram hashes

  /** k-gram hash array over a token COLUMN (one lambda level — callers
    * materialize this as its own column/CTE before windowing over it). */
  def kgramHashes(d: Dialect, toks: String): String = {
    val kgram = d match {
      case SparkD =>
        s"concat_ws(' ', ${(0 until WinnowK).map(j => d.at(toks, s"i + $j")).mkString(", ")})"
      case DuckD =>
        (0 until WinnowK).map(j => d.at(toks, s"i + $j")).mkString(" || ' ' || ")
    }
    d.transform(d.seqIncl("1", s"${d.size(toks)} - ${WinnowK - 1}"), "i", d.hash32(kgram))
  }

  /** Winnow a k-gram hash COLUMN `hs`: min per sliding window of w ->
    * distinct sorted -> comma-joined string (stable cross-engine render). */
  def winnowFromHashes(d: Dialect, hs: String): String = {
    val mins = d.transform(
      d.seqIncl("1", s"${d.size(hs)} - ${WinnowW - 1}"), "i",
      d.arrMin(d.slice(hs, "i", WinnowW.toString)))
    d.arrJoin(d.transform(d.arrSort(d.arrDistinct(mins)), "x",
      d match { case SparkD => "cast(x as string)"; case DuckD => "x::VARCHAR" }), ",")
  }
}
