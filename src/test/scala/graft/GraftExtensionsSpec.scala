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
      "simhash64", "hyperplane_bucket", "nfc_normalize")
    assert(expected.subsetOf(names), s"missing: ${expected -- names}")
  }
}
