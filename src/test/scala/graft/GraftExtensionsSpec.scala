package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions path: a session built with GraftExtensions
  * can use every native function from plain SQL with no register() call.
  * This suite cycles the shared local SparkContext (suites run
  * sequentially in the forked test JVM), so it stops its session when
  * done and later suites rebuild theirs. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject SQL functions at session build") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("GraftExtensionsSpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT fnv1a64(CAST('hello' AS BINARY)) AS h,
          |  round(cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
          |  size(shingle_codes('abcd', 2)) AS n,
          |  projection_dot(array(CAST(1.0 AS FLOAT)), 0, 1) AS p
          |""".stripMargin).head()
      assert(r.getLong(0) == 0xa430d84680aabd0bL) // published FNV-1a vector
      assert(r.getDouble(1) == 1.0)
      assert(r.getInt(2) == 3)
      assert(r.getDouble(3) == graft.operators.Similarity.projComponent(0, 0))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("every native expression compiles under CODEGEN_ONLY (no interpreter fallback)") {
    // Regression guard: a companion helper whose name clashes with
    // Expression.eval loses its static forwarder, the generated Java fails
    // to compile, and Spark silently falls back to interpreted eval —
    // correct values, interpreted speed. CODEGEN_ONLY turns that silent
    // fallback into a test failure.
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("CodegenOnlySpec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT fnv1a64(CAST('hello' AS BINARY)) AS h,
          |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
          |  size(shingle_codes('abcdef', 2)) AS n,
          |  projection_dot(array(CAST(1.0 AS FLOAT)), 0, 1) AS p,
          |  minhash_signature('abcdefgh', 3, 4) AS mh,
          |  shingle_overlap('abcdef', 'abcxyz', 3) AS ov,
          |  pq_code(array(CAST(0.25 AS FLOAT), CAST(-0.5 AS FLOAT)), 2, 2, 1, 301) AS pq,
          |  sq8_recon(array(1.0D, 3.0D), array(0.0D, 0.0D), array(255.0D, 255.0D)) AS sq,
          |  size(winnow_fingerprints('abcdefghijkl', 3, 4, 5, 7)) AS wf
          |""".stripMargin).head()
      assert(r.getLong(0) == 0xa430d84680aabd0bL)
      assert(r.getDouble(1) == 1.0)
      assert(r.getInt(2) == 5)
      assert(r.getSeq[Long](4).length == 4)
      assert(r.getStruct(5).getLong(0) == 1L) // only "abc" shared
      // grid points land exactly on the inputs -> zero reconstruction error
      assert(r.getStruct(7).getDouble(3) == 0.0)
      // 12 chars, k=3 -> 10 shingles, w=4 -> 7 windows, >=1 distinct min
      assert(r.getInt(8) >= 1 && r.getInt(8) <= 7)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
