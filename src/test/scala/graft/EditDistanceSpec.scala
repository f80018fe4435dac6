package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, levenshtein, length, concat_ws, transform, sequence, lit, substring, pmod, xxhash64}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftx.{EditDistanceKernel, EditDistanceExpressions}

/** The Myers bit-parallel Levenshtein kernel (sparkx.EditDistExpr) must
  * be VALUE-identical to the classic unit-cost DP — it replaces the
  * built-in `levenshtein` in near_dup_edit_verify, whose oracle is
  * DuckDB's cell-DP levenshtein, so any divergence is a correctness
  * break, not a perf bug. Fuzzed over short/long strings, multiple
  * alphabet sizes (incl. the repo corpus's tiny-vocab regime where
  * distances sit far below length), multi-byte code points, and the
  * empty/equal edges; plus a distributed parity run against Spark's
  * own `levenshtein` through codegen.
  */
class EditDistanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  private def classic(a: String, b: String): Int = {
    val ai = a.codePoints().toArray
    val bi = b.codePoints().toArray
    val m = ai.length
    val dp = Array.tabulate(m + 1)(identity)
    for (j <- 1 to bi.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to m) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (ai(i - 1) == bi(j - 1)) 0 else 1))
        prev = t
      }
    }
    dp(m)
  }

  private def myers(a: String, b: String): Int =
    EditDistanceKernel.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand cases: empty, equal, single edit, swap, known distances") {
    assert(myers("", "") == 0)
    assert(myers("", "abc") == 3)
    assert(myers("abc", "") == 3)
    assert(myers("abc", "abc") == 0)
    assert(myers("kitten", "sitting") == 3)
    assert(myers("flaw", "lawn") == 2)
    assert(myers("ab", "ba") == 2)
    assert(myers("a" * 100, "a" * 100 + "b") == 1)
  }

  test("multi-byte code points: the UTF8 fast path never misroutes") {
    assert(myers("日本語", "日本") == 1)
    assert(myers("héllo", "hello") == 1)
    assert(myers("한국어abc", "abc") == 3)
  }

  test("fuzz: myers ≡ classic DP across alphabets, lengths 0–200, incl. >64-block patterns") {
    val rnd = new scala.util.Random(987654321L)
    val alphabets = Seq("ab", "abcde", "abcdefghijklmnopqrstuvwxyz ", "日本語中文한국", "aé≤b")
    for (trial <- 0 until 3000) {
      val alpha = alphabets(trial % alphabets.size)
      def mk(len: Int) = Array.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      // every 7th trial exercises multi-word (m > 64) patterns
      val cap = if (trial % 7 == 0) 200 else 70
      val a = mk(rnd.nextInt(cap))
      val b = mk(rnd.nextInt(cap))
      val got = myers(a, b)
      val want = classic(a, b)
      assert(got == want, s"a='$a' b='$b': myers=$got classic=$want")
    }
  }

  test("distributed parity: editDistance ≡ built-in levenshtein through codegen") {
    val ds = spark.range(2000).select(col("id"),
      concat_ws("", transform(sequence(lit(1), pmod(xxhash64(col("id")), lit(180L)).cast("int") + 1),
        i => substring(lit("abcdefgh"),
          (pmod(xxhash64(col("id") * 7919 + i), lit(8)) + 1).cast("int"), lit(1)))).as("ta"),
      concat_ws("", transform(sequence(lit(1), pmod(xxhash64(col("id") + 1), lit(180L)).cast("int") + 1),
        i => substring(lit("abcdefgh"),
          (pmod(xxhash64(col("id") * 104729 + i), lit(8)) + 1).cast("int"), lit(1)))).as("tb"))
    val bad = ds.where(
      EditDistanceExpressions.editDistance(col("ta"), col("tb")) =!=
        levenshtein(col("ta"), col("tb"))).count()
    assert(bad == 0L)
  }
}
