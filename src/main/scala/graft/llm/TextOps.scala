package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, token hashing, shingling, MinHash signatures, SimHash,
  * rolling-hash fingerprints, stopword/quality heuristics.
  *
  * Everything here is a pure per-row Column expression built from Spark's
  * codegen'd higher-order functions (`transform`/`aggregate`/`filter`/
  * `zip_with`) — no UDFs, no shuffles, fully whole-stage-codegen friendly.
  * At 100 TB these run map-side inside the scan stage; the only shuffles
  * in the derived dedup queries are the groupBy/join on hash keys.
  *
  * All hashing is integer arithmetic mod a fixed prime so that an external
  * oracle (DuckDB) evaluating the same formulas reproduces values exactly —
  * this is what makes MinHash/LSH results hash-verifiable across engines
  * (floating point would not survive the round trip).
  */
object TextOps {

  /** Modulus for the per-token/char polynomial rolling hash. */
  val HashP = 1000000007L

  /** Modulus for MinHash permutation hashes h(x) = (a*x + b) mod P. */
  val MinhashP = 999999937L

  /** Fixed (a, b) parameters for the MinHash permutation family.
    * 8 hashes → 4 LSH bands of 2 rows each (see [[Dedup]]).
    */
  val MinhashParams: Seq[(Long, Long)] = Seq(
    (379L, 91L), (1031L, 167L), (1543L, 271L), (2039L, 443L),
    (2689L, 613L), (3181L, 787L), (3673L, 911L), (4219L, 1063L))

  /** Rows per LSH band (signature is chunked into bands of this size). */
  val BandRows = 2

  /** English stopwords used by the language-ID / quality heuristics. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in")

  /** Whitespace tokens of a trimmed text column. Empty tokens (from
    * leading non-space whitespace or empty text) are dropped — they would
    * hash to null and propagate differently across engines (Spark's fold
    * nulls the whole sum; DuckDB's list_sum skips nulls, and list_reduce
    * on an empty char list errors outright).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** Left-fold without an initial value (first element seeds the fold),
    * matching DuckDB's `list_reduce` semantics exactly.
    */
  def reduceNoInit(arr: Column, f: (Column, Column) => Column): Column =
    aggregate(
      slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
      element_at(arr, 1), f)

  /** Polynomial char hash of one token: fold (acc*131 + ascii(c)) % HashP.
    * Spark's `split(tok, "")` emits a trailing "" (Java split, limit -1)
    * that DuckDB's `string_split` does not — filtered out for parity.
    */
  def tokenHash(tok: Column): Column = {
    val chars = filter(split(tok, ""), c => c =!= lit(""))
    val ints = transform(chars, c => ascii(c).cast("long"))
    reduceNoInit(ints, (a, b) => (a * 131 + b) % HashP)
  }

  /** All token hashes of a text, in order (duplicates kept — used as
    * SimHash weights).
    */
  def tokenHashes(text: Column): Column = transform(tokens(text), tokenHash(_))

  /** Ordered "w1 w2 …" n-gram list, duplicates kept — the single gram
    * builder behind [[bigrams]] and [[shingles]] (mirrors the SQL side,
    * where [[sqlShingleHashes]] builds on [[sqlBigrams]]).
    */
  private def grams(text: Column, n: Int): Column = {
    require(n >= 2, "use tokens() for n=1")
    val ts = tokens(text)
    (1 until n).foldLeft(slice(ts, lit(1), greatest(size(ts) - (n - 1), lit(0)))) {
      (acc, i) =>
        zip_with(acc, slice(ts, lit(1 + i), greatest(size(ts) - (n - 1), lit(0))),
          (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Word bigrams as "w1 w2" strings, duplicates KEPT in order — the
    * repetition-filter input ([[shingles]] de-duplicates; repetition
    * scoring is precisely about the duplicates).
    */
  def bigrams(text: Column): Column = grams(text, 2)

  /** General duplicates-kept n-grams (the [[bigrams]] builder at any n) —
    * the Gopher duplicate-n-gram character-mass filters need the
    * occurrence counts, so de-duplication would destroy the signal.
    */
  def ngramsKept(text: Column, n: Int): Column = grams(text, n)

  /** Word n-gram shingles of a text as "w1 w2 …" strings, de-duplicated. */
  def shingles(text: Column, n: Int = 2): Column =
    array_distinct(grams(text, n))

  /** Distinct hashes of the n-gram shingle set — the MinHash input. */
  def shingleHashes(text: Column, n: Int = 2): Column =
    array_distinct(transform(shingles(text, n), tokenHash(_)))

  /** Winnowing window width (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
    * guarantees any shared run of `WinnowWindow + 1` consecutive bigrams
    * yields at least one shared fingerprint.
    */
  val WinnowWindow = 4

  /** Evaluate-once binding for an expensive array expression that a
    * lambda body must reference: Spark re-evaluates any NON-lambda-var
    * expression appearing inside a HOF lambda once PER ELEMENT (there is
    * no CSE across lambda iterations), so `slice(chain, j, w)` inside a
    * per-window transform recomputes the whole chain n times — a silent
    * O(n) → O(n²) blowup (measured 47× on winnowing). Wrapping the chain
    * in a 1-element array and transforming binds it to a lambda VARIABLE,
    * which is evaluated once per row and only read thereafter.
    */
  def bindOnce(expensive: Column, body: Column => Column): Column =
    element_at(transform(array(expensive), body), 1)

  /** Winnowing fingerprints: min hash of every [[WinnowWindow]]-wide
    * window over the ORDERED (duplicates-kept) bigram hash sequence,
    * de-duplicated — the MOSS document fingerprint. Short docs (< one
    * window of bigrams) contribute their single overall min; empty docs
    * an empty set. Pure per-row expression; the guard keeps
    * `sequence(1, n-w+1)` from generating a DESCENDING range when
    * n < w (Spark's sequence flips direction, it does not clamp).
    * The hash chain is [[bindOnce]]-bound — referenced naively from the
    * per-window lambda it would re-evaluate once per window.
    */
  def winnowFingerprints(text: Column): Column = {
    val w = WinnowWindow
    bindOnce(transform(bigrams(text), tokenHash(_)), { hs =>
      val n = size(hs)
      when(n === 0, array().cast("array<bigint>"))
        .when(n < w, array(array_min(hs)))
        .otherwise(array_distinct(transform(sequence(lit(1), n - (w - 1)),
          j => array_min(slice(hs, j, lit(w))))))
    })
  }

  /** One MinHash value: min over the set of (a*x + b) % MinhashP. */
  def minhash(hashSet: Column, a: Long, b: Long): Column =
    array_min(transform(hashSet, x => (x * a + b) % MinhashP))

  /** Full MinHash signature as one column per hash (mh0, mh1, …). */
  def minhashSignature(hashSet: Column): Seq[(String, Column)] =
    MinhashParams.zipWithIndex.map { case ((a, b), i) =>
      s"mh$i" -> minhash(hashSet, a, b)
    }

  /** 16-bit SimHash over the (weighted) token-hash list: bit i is set when
    * the sum of ±1 votes from each token's i-th hash bit is positive.
    * Pure per-row expression — bit index is a Scala-level constant so
    * `shiftright` stays codegen'd.
    */
  def simhash16(tokenHashList: Column): Column =
    (0 until 16).map { i =>
      val votes = aggregate(tokenHashList, lit(0L),
        (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Order-sensitive rolling-hash fingerprint of the whole document:
    * fold (acc*31 + tokenHash) % HashP over tokens in order. Two docs get
    * equal fingerprints iff their token sequences hash identically —
    * an exact-dup candidate key that ignores inter-token whitespace.
    * Zero-token documents (empty / whitespace-only text) fingerprint to
    * null: the seedless fold has no seed element, and under ANSI mode
    * `element_at(arr, 1)` on an empty array would throw (DuckDB's
    * `list_reduce` errors on empty lists too — both engines must take the
    * guarded branch).
    */
  def fingerprint(text: Column): Column = {
    val th = tokenHashes(text)
    when(size(th) === 0, lit(null).cast("long"))
      .otherwise(reduceNoInit(th, (a, b) => (a * 31 + b) % HashP))
  }

  /** Number of stopword occurrences among the tokens. */
  def stopwordHits(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*)))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap proxy for subword tokenizer counts.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0)))

  // ---- PII scrubbing (per-row regex; Java and RE2 agree on these
  //      patterns, so the DuckDB oracle reproduces them exactly) ----

  /** Email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** US-style phone numbers (123-456-7890 / dots / spaces). */
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Bare number runs (account ids, zips — the catch-all digit pass). */
  val NumberRe = "\\b\\d+\\b"

  /** Staged PII redaction: emails, then phones, then bare numbers — each
    * stage runs on the previous stage's output so a pattern consumed by
    * an earlier stage (digits inside a phone) is never double-counted.
    */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      NumberRe, "<NUM>")

  // ---- DuckDB oracle SQL fragments (same formulas, same constants) ----

  /** SQL: whitespace tokens of trim(text), empty tokens dropped (same
    * robustness rule as [[tokens]]). */
  val sqlTokens = raw"list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')"

  /** SQL: polynomial char hash of token expression `t`. */
  def sqlTokenHash(t: String): String =
    s"list_reduce(list_transform(string_split($t, ''), c -> CAST(ascii(c) AS BIGINT)), " +
      s"(a, b) -> (a*131 + b) % $HashP)"

  /** SQL: ordered token-hash list of the document. */
  val sqlTokenHashes: String =
    s"list_transform($sqlTokens, t -> ${sqlTokenHash("t")})"

  /** SQL: ordered bigram list, duplicates kept (mirrors [[bigrams]]). */
  val sqlBigrams: String = {
    val ts = sqlTokens
    s"list_transform(list_zip($ts[1:len($ts)-1], $ts[2:len($ts)]), s -> s[1] || ' ' || s[2])"
  }

  /** SQL: distinct bigram-shingle hash set of the document. */
  val sqlShingleHashes: String =
    s"list_distinct(list_transform($sqlBigrams, t -> ${sqlTokenHash("t")}))"

  /** SQL: ordered "w1 … wn" n-gram list, duplicates kept (mirrors the
    * general [[grams]] builder; [[sqlBigrams]] is the n=2 instance).
    */
  def sqlGrams(n: Int): String = {
    require(n >= 2, "use sqlTokens for n=1")
    val ts = sqlTokens
    val slices = (0 until n).map { i =>
      val drop = n - 1 - i
      if (drop == 0) s"$ts[${i + 1}:len($ts)]"
      else s"$ts[${i + 1}:len($ts)-$drop]"
    }.mkString(", ")
    val joined = (1 to n).map(i => s"s[$i]").mkString(" || ' ' || ")
    // short-doc guard: DuckDB slice stops < -1 wrap around from the END
    // (['a','b','c','d','e'][1:5-7] = first four elements!) and list_zip
    // NULL-pads to the longest input — a doc with < n tokens must yield
    // [] like Spark's greatest(size-(n-1), 0) slice bound does, not
    // NULL-laced garbage grams
    s"CASE WHEN len($ts) < $n THEN CAST([] AS VARCHAR[]) " +
      s"ELSE list_transform(list_zip($slices), s -> $joined) END"
  }

  /** SQL: one MinHash value over hash-set expression `hs`. */
  def sqlMinhash(hs: String, a: Long, b: Long): String =
    s"list_min(list_transform($hs, x -> (x*$a + $b) % $MinhashP))"

  /** SQL: 16-bit SimHash over token-hash-list expression `th`. */
  def sqlSimhash16(th: String): String =
    (0 until 16).map { i =>
      s"(CASE WHEN list_sum(list_transform($th, h -> ((h >> $i) & 1)*2 - 1)) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** SQL: rolling-hash fingerprint over token-hash-list expression `th`
    * (empty token list → NULL, mirroring [[fingerprint]]'s guard —
    * DuckDB's `list_reduce` errors on empty lists).
    */
  def sqlFingerprint(th: String): String =
    s"CASE WHEN len($th) = 0 THEN NULL ELSE list_reduce($th, (a, b) -> (a*31 + b) % $HashP) END"

  /** SQL: winnowing fingerprint set from an ordered bigram-hash-list
    * expression `hs` (bind the hash list in a CTE first — the fragment
    * references it several times). Mirrors [[winnowFingerprints]]:
    * empty → [], under one window → overall min, else de-duplicated
    * per-window mins.
    */
  def sqlWinnowFromHashes(hs: String): String =
    s"CASE WHEN len($hs) = 0 THEN CAST([] AS BIGINT[]) " +
      s"WHEN len($hs) < $WinnowWindow THEN [list_min($hs)] " +
      s"ELSE list_distinct(list_transform(range(1, len($hs) - ${WinnowWindow - 2}), " +
      s"j -> list_min($hs[j:j+${WinnowWindow - 1}]))) END"

  /** SQL: stopword hit count. */
  val sqlStopwordHits: String =
    s"len(list_filter($sqlTokens, t -> t IN (${Stopwords.map(s => s"'$s'").mkString(", ")})))"

  /** SQL: BPE-ish token count. */
  val sqlBpeTokenCount = raw"len(regexp_extract_all(text, '[a-z]+|[0-9]+|\S'))"

  /** SQL: staged PII redaction of text expression `t` (same patterns and
    * stage order as [[piiScrub]]; 'g' = replace-all, Spark's default).
    */
  def sqlPiiScrub(t: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($t, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g'), '$NumberRe', '<NUM>', 'g')"
}
