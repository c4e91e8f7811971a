package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared deterministic text primitives for the dedup / text-analysis
  * operators. All arithmetic is integer/modular so results are exactly
  * reproducible by any ANSI-SQL engine (the DuckDB oracle in particular) —
  * no engine-specific hash functions in the semantics-bearing path.
  *
  * A character k-shingle is encoded injectively as a base-128 integer
  * (`code = Σ ascii(c_d) * 128^(k-1-d)`, charset is ASCII), then hashed with
  * `h_j(code) = (a_j * (code mod P) + b_j) mod P`, P = 2^31 - 1.
  */
object TextOps {
  /** Mersenne prime 2^31-1: keeps `a * code + b` inside 63 bits. */
  final val P = 2147483647L

  /** Tie-free 6-dp quantization: `floor(x·10⁶ + 0.5) / 10⁶` — THE
    * cross-engine rounding contract, defined once for every operator
    * family. Spark's `round(x, 6)` routes through BigDecimal HALF_UP
    * (~2 µs/call, a double→string parse) and DuckDB's round() is
    * HALF_EVEN, so the two disagree on exact-ratio ties; this form is
    * three deterministic IEEE double ops with identical results in both
    * engines. The SQL twin is `floor(x * 1000000 + 0.5) / 1000000`. */
  def q6(x: Column): Column = floor(x * lit(1e6) + lit(0.5)) / lit(1e6)

  /** `ln(x)` quantized to integer MILLInats — THE cross-engine surprisal
    * contract (perplexity / tf-idf / PMI / entropy families). Quantizes at
    * MICROnat grain first (`floor(ln·10⁶ + 0.5)`, the only float-sensitive
    * step), then derives millinats with exact arithmetic on that integer
    * (`floor((micro + 500) / 1000)` — IEEE-identical in both engines for
    * |micro| < 2⁵², and exact: ulp near the quotient ≪ 1/1000). A 1-ulp
    * `ln` divergence between engines can now flip the result only when
    * ln(x)·10⁶ lands within an ulp of a .5 boundary — 1000× narrower than
    * rounding at milli grain directly, where a boundary graze would shift
    * a per-term surprisal and could cascade into a rank flip downstream
    * (ADVICE r7 on pipeline_ccnet). [[milliLnSql]] generates the same
    * formula for the DuckDB oracle — never hand-copy it into SQL. */
  def milliLn(x: Column): Column =
    floor((floor(log(x) * lit(1e6) + lit(0.5)) + lit(500L)) / lit(1e3)).cast("long")

  /** DuckDB twin of [[milliLn]], generated from the same formula. */
  def milliLnSql(x: String): String =
    s"CAST(floor((CAST(floor(ln($x) * 1000000 + 0.5) AS BIGINT) + 500) / 1000.0) AS BIGINT)"

  /** `ln(x)` quantized to integer MICROnats — [[milliLn]]'s inner step,
    * exposed for operators that weight each surprisal by an exact integer
    * count BEFORE summation (entropy-rate family): the weighted sum of
    * micro-integers is order-independent, and the grain argument from
    * [[milliLn]]'s scaladoc applies unchanged. */
  def microLn(x: Column): Column =
    floor(log(x) * lit(1e6) + lit(0.5)).cast("long")

  /** DuckDB twin of [[microLn]], generated from the same formula. */
  def microLnSql(x: String): String =
    s"CAST(floor(ln($x) * 1000000 + 0.5) AS BIGINT)"

  /** Deterministic per-permutation coefficients (odd multipliers derived
    * from the golden-ratio constant, reduced mod P). */
  def hashCoeffs(n: Int): Seq[(Long, Long)] =
    (0 until n).map { j =>
      val a = ((2L * j + 1) * 2654435761L) % P
      val b = (j * 40503L + 2654435769L) % P
      (if (a == 0) 1L else a, b)
    }

  /** Column: base-128 code of the k-char shingle of `text` starting at
    * 1-based position `pos` (requires ASCII input; safe for < 9 chars). */
  def shingleCode(text: Column, pos: Column, k: Int): Column = {
    require(k <= 9, "base-128 shingle codes overflow beyond k=9")
    (0 until k).map { d =>
      ascii(text.substr(pos + lit(d), lit(1))).cast("long") * lit(pow128(k - 1 - d))
    }.reduce(_ + _)
  }

  def pow128(e: Int): Long = { var v = 1L; (0 until e).foreach(_ => v *= 128L); v }

  /** `(doc_id, code)` k-shingle codes per document, via the O(len) rolling
    * [[graft.functions.ShingleCodes]] expression (one array per doc, one
    * explode). `distinct = false` skips the per-doc dedup — correct for
    * duplicate-insensitive consumers (MIN-aggregation in MinHash /
    * fingerprints).
    *
    * `distinct = true` dedups INSIDE the per-doc array (`array_distinct`
    * before the explode) instead of a corpus-wide `.distinct()`: every
    * caller feeds one row per `idCol`, so the (id, code) set is identical —
    * but the set arrives with ZERO shuffle where `.distinct()` exchanged
    * the full exploded pair stream (the largest relation in the whole
    * shingle-join family; r13 bench: the removed exchange was ~10M rows at
    * sf0.1). Downstream per-doc aggregations also map-side-combine fully,
    * since a doc's codes stay contiguous in its scan partition. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int,
      distinct: Boolean = true): DataFrame = {
    val codes = graft.functions.GraftFunctions.shingle_codes(col(textCol), k)
    df.select(col(idCol),
      explode(if (distinct) array_distinct(codes) else codes).as("code"))
  }

  /** Modular permutation hash of a code column. */
  def permHash(code: Column, a: Long, b: Long): Column =
    (lit(a) * (code % lit(P)) + lit(b)) % lit(P)

  /** `v^n` as an EXPLICIT left-associated multiplication chain —
    * `((v * v) * v) * …` — because `pow()` is NOT cross-engine exact
    * (libm differences), while a fixed chain of IEEE multiplies is
    * bit-identical in any engine (the dedup_lsh_curve precedent). The
    * returned string is valid in both Spark SQL and DuckDB; parenthesized
    * so associativity can never be re-grouped by a parser. */
  def powChainSql(v: String, n: Int): String = {
    require(n >= 1)
    (1 until n).foldLeft(v)((acc, _) => s"($acc * $v)")
  }

  /** LSH catch probability `1 − (1 − s^r)^b` for a banded MinHash index,
    * in integer MICRO units (`floor(p·10⁶ + 0.5)`), as one deterministic
    * expression string shared by the Spark query (via `expr`) and the
    * DuckDB twin — generated, never hand-copied, so the two engines run
    * the IDENTICAL IEEE multiply chain ([[powChainSql]]). `s` must be a
    * q6-quantized jaccard column name. */
  def lshCatchMicroSql(s: String, r: Int, b: Int): String = {
    val sr = powChainSql(s, r)
    val miss = powChainSql(s"(1.0 - $sr)", b)
    s"CAST(floor((1.0 - $miss) * 1000000 + 0.5) AS BIGINT)"
  }
}
