package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text-hashing primitives shared by the text-analysis and
  * dedup pipelines. Everything is exact int64 arithmetic (polynomial
  * rolling hashes mod a prime), so the DuckDB oracle reproduces results
  * bit-for-bit — no reliance on engine-specific hash functions.
  */
object TextFunctions {

  val Mod = 1000000007L
  /** MinHash signature length and LSH banding shape (4 bands × 4 rows). */
  val MinhashH = 16
  val Bands = 4
  val RowsPerBand: Int = MinhashH / Bands

  /** Tokenize on single spaces. */
  def toks(text: Column): Column = split(text, " ")

  /** Adjacent-pair n-grams as space-joined strings: zip_with over two
    * shifted slices of the token array — pure array expressions, stays
    * inside whole-stage codegen. A 1-token document yields an empty
    * array (slice length 0), matching DuckDB's empty range(1, 1). */
  def bigrams(tokens: Column): Column =
    zip_with(
      slice(tokens, lit(1), size(tokens) - 1),
      slice(tokens, lit(2), size(tokens) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Count of the most frequent element = longest run in the SORTED array,
    * as one array_sort + one fold — no explode/groupBy, so callers stay
    * shuffle-free per-row projections. (The run counter resets to 1 on
    * every mismatch, so the `prev = ""` seed is safe even when the first
    * element IS the empty string: 0+1 and the reset both yield 1.) */
  def maxRun(tokens: Column): Column =
    aggregate(
      array_sort(tokens),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Rolling polynomial hash of a token: fold (acc*31 + codepoint) % Mod.
    * Native codegen kernel (sparkx.TokenHashExpr) — value-identical to
    * the original HOF fold over split(t, "") (fuzz-pinned by
    * TextHashSpec), which interpreted a lambda per CHARACTER and
    * allocated a single-char UTF8String each step.
    * (Spark's split("") emits a trailing "" that DuckDB's doesn't —
    * filtered out; both then agree, including on empty tokens → 0.) */
  def tokenHash(t: Column): Column =
    org.apache.spark.sql.graftx.TextHashExpressions.tokenHash(t)

  /** Document fingerprint: fold token hashes with the same recurrence.
    * Native kernel (sparkx.DocFingerprintExpr) ≡ the nested HOF fold —
    * fuzz-pinned by TextHashSpec; the HOF form interpreted a lambda per
    * character and allocated a single-char UTF8String each step. */
  def docFingerprint(text: Column): Column =
    org.apache.spark.sql.graftx.TextHashExpressions.docFingerprint(text)

  /** MinHash signature (ARRAY<LONG>, length H) over the *distinct* token
    * set: sig[i] = min over tokens of ((2i+1)·h(t) + 7919·i) mod Mod.
    * Order-independent (min), so engine-side set ordering is irrelevant. */
  def minhashSig(text: Column): Column =
    org.apache.spark.sql.graftx.TextHashExpressions.minhashSig(text, MinhashH)

  /** MinHash signature over an ALREADY-hashed distinct-token array.
    * Loop order matters under interpreted HOF evaluation (no codegen
    * subexpression elimination): the naive transform-outside /
    * aggregate-inside form evaluates its token input once per signature
    * row (×[[MinhashH]] re-hashes). This folds the token array ONCE,
    * carrying all [[MinhashH]] running minima as the accumulator — min
    * is commutative, so the flipped fold is value-identical. */
  def minhashFromHashes(tokenHashes: Column): Column =
    aggregate(tokenHashes,
      array_repeat(lit(Mod), MinhashH),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(MinhashH - 1)),
        (m, i) => least(m, ((lit(2L) * i + 1L) * h + lit(7919L) * i) % Mod)))

  /** LSH band key: ordered fold of the band's signature rows. */
  def bandKey(sig: Column, band: Column): Column =
    bandKeyOf(sig, band, RowsPerBand)

  /** Band key at an explicit rows-per-band — callers trade candidate
    * recall against selectivity (more rows per band = only
    * higher-Jaccard pairs collide; the edit-distance verifier wants
    * exactly that, since its keep rule only passes near-identical
    * pairs anyway). */
  def bandKeyOf(sig: Column, band: Column, rows: Int): Column =
    aggregate(
      slice(sig, band * rows + 1, lit(rows)),
      lit(0L),
      (acc, s) => (acc * 31L + s) % Mod)

  /** Rolling n-gram hashes: position i (1-based) folds tokenHash over
    * tokens [i, i+n) with the fingerprint recurrence. Documents shorter
    * than n yield an empty array (guarded — Spark's `sequence` would
    * otherwise generate a DESCENDING [1, 0] ramp for size < n). */
  /** Window fold over an ALREADY-hashed token array. Split out so
    * callers can materialize the hash array as its own projected column
    * first — HOF lambdas are interpreted (no codegen subexpression
    * elimination), so hashing inline here would re-hash every token
    * once per window it appears in. */
  def ngramWindow(tokenHashes: Column, n: Int): Column =
    when(size(tokenHashes) < n, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(tokenHashes) - (n - 1)), i =>
        aggregate(slice(tokenHashes, i, lit(n)), lit(0L),
          (acc, h) => (acc * 31L + h) % Mod)))

  def ngramHashes(tokens: Column, n: Int): Column =
    ngramWindow(transform(tokens, t => tokenHash(t)), n)

  /** DuckDB mirror of [[ngramHashes]] over a token-list expression `t`. */
  def sqlNgramHashes(t: String, n: Int): String =
    s"""list_transform(range(1, greatest(len($t) - ${n - 2}, 1)), i ->
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(list_slice($t, i, i + ${n - 1}), tok -> ${sqlTokenHash("tok")})),
       |  (a, b) -> (a * 31 + b) % $Mod))""".stripMargin.replaceAll("\n\\s*", " ")

  /** 32-bit SimHash over token hashes: bit b is set iff the ±1 majority
    * vote of bit b across token hashes is positive. */
  def simhash(text: Column): Column = {
    val hs = transform(toks(text), t => tokenHash(t))
    val pow2 = (b: Column) => pow(lit(2.0), b).cast("long")
    // fold the token hashes ONCE carrying all 32 vote counters (votes
    // sum commutatively), then fold the votes to the bit pattern — the
    // bits-outside/tokens-inside form re-evaluates the token-hash array
    // once per bit under interpreted HOF evaluation (×32 re-hash)
    val votes = aggregate(hs, array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(31)),
        (v, b) => v + when(h % (pow2(b) * 2L) >= pow2(b), 1L).otherwise(-1L)))
    aggregate(zip_with(votes, sequence(lit(0), lit(31)),
        (v, b) => when(v > 0, pow2(b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Jaccard similarity of two pre-distinct arrays — exact rational from
    * intersection/union sizes, so both engines produce the identical
    * double and threshold comparisons can't diverge. */
  def jaccard(a: Column, b: Column): Column = {
    // ONE array_intersect: the old form wrote it twice (once in the
    // numerator, once in the union-size denominator) — interpreted eval
    // paths build the intersection hash set twice per pair. |A|, |B| and
    // |A∩B| are small exact integers, so folding the denominator in
    // double arithmetic is bit-identical to the int-then-cast form.
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  // ---- DuckDB oracle fragments mirroring the above ----

  /** Token hash of a string expression `t`. */
  def sqlTokenHash(t: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($t, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % $Mod)""".stripMargin.replaceAll("\n\\s*", " ")

  /** Document fingerprint over the column `text` — the DuckDB twin of
    * [[docFingerprint]]. ONE definition for every oracle that gates on
    * content fingerprints (doc_fingerprint, doc_split, sample_stratified,
    * mixture_sample): a change to the recurrence lands everywhere or
    * nowhere. */
  def sqlDocFingerprint: String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(text, ' '), t -> ${sqlTokenHash("t")})), " +
      s"(a, b) -> (a * 31 + b) % $Mod)"

  /** MinHash signature over a distinct token-list expression `ts`. */
  def sqlMinhashSig(ts: String): String =
    s"""list_transform(range(0, $MinhashH), i ->
       |  list_reduce(list_prepend(CAST($Mod AS BIGINT),
       |    list_transform($ts, t -> ((2*i + 1) * ${sqlTokenHash("t")} + 7919*i) % $Mod)),
       |  (a, b) -> least(a, b)))""".stripMargin.replaceAll("\n\\s*", " ")

  /** Band key over a signature list expression `sig` and band index `b`. */
  def sqlBandKey(sig: String, b: String): String = sqlBandKeyOf(sig, b, RowsPerBand)

  /** SQL mirror of [[bandKeyOf]]. */
  def sqlBandKeyOf(sig: String, b: String, rows: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_slice($sig, $b * $rows + 1, $b * $rows + $rows)),
       |  (a, x) -> (a * 31 + x) % $Mod)""".stripMargin.replaceAll("\n\\s*", " ")

  /** SimHash over a token-list expression `ts`. */
  def sqlSimhash(ts: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), b ->
       |  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform($ts, t -> CASE WHEN ${sqlTokenHash("t")} % (CAST(power(2, b) AS BIGINT) * 2)
       |      >= CAST(power(2, b) AS BIGINT) THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
       |    (s, v) -> s + v) > 0
       |  THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
       |  (a, x) -> a + x)""".stripMargin.replaceAll("\n\\s*", " ")

  /** Jaccard of two distinct-list expressions. */
  def sqlJaccard(a: String, b: String): String =
    s"""(CAST(len(list_intersect($a, $b)) AS DOUBLE) /
       |  (len($a) + len($b) - len(list_intersect($a, $b))))""".stripMargin.replaceAll("\n\\s*", " ")
}
