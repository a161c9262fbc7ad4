package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point injects the full native
  * function set (what a session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` would register).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects every native function") {
    val names = org.apache.spark.sql.GraftExtensionsProbe
      .registeredNames(new GraftExtensions)
    val expected = Set("cosine_sim", "dot_product", "minhash_signature",
      "minhash_match_count", "word_shingles", "word_shingle_hashes",
      "simhash64", "simhash64b", "hyperplane_bucket", "nfc_normalize",
      "canonicalize_url", "doc_fingerprint", "token_count", "clean_street")
    assert(expected.subsetOf(names), s"missing: ${expected -- names}")
  }

  test("composed functions are callable from pure SQL") {
    val spark = SparkSpec.spark // Graft.session registers SqlSurface
    val r = spark.sql(
      """SELECT canonicalize_url('HTTP://Ex.COM:80/a/?utm_source=x&b=1#f') AS u,
        |  token_count(' a b  c ') AS n""".stripMargin).collect()(0)
    assert(r.getString(0) == "http://ex.com/a?b=1")
    assert(r.getLong(1) == 3L)
  }

  test("wrong arity fails analysis instead of silently dropping args") {
    val spark = SparkSpec.spark
    val two = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT canonicalize_url('a', 'b')").collect()
    }
    assert(two.getMessage.contains("canonicalize_url"))
    assert(two.getMessage.contains("requires 1 parameters"))
    val zero = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT token_count()").collect()
    }
    assert(zero.getMessage.contains("token_count"))
  }
}
