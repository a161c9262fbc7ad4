package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Clean

/** Property-based tests (SURVEY §5.2): the cleaning functions are pure
  * column expressions, so properties are checked by evaluating them over
  * generated single-column frames.
  */
class CleanPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling loop standing in for forAll (the
    * scalatest-scalacheck bridge isn't in the offline dependency cache).
    */
  private def forAll[A](gen: Gen[A], trials: Int = 20)(body: A => Unit): Unit =
    (0 until trials).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(body)
    }

  private def evalStr(c: org.apache.spark.sql.Column, inputs: Seq[String]): Seq[String] =
    inputs.toDF("v").select(c.as("r")).collect().map(_.getString(0)).toSeq

  private val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString).suchThat(_.nonEmpty)
  private val streetName = for {
    n <- Gen.choose(1, 3)
    ws <- Gen.listOfN(n, word)
    suffix <- Gen.oneOf(Clean.streetMapping.keys.toSeq)
  } yield (ws :+ suffix).mkString(" ")

  test("street cleaning is idempotent") {
    forAll(Gen.listOfN(10, streetName)) { names =>
      val once = evalStr(Clean.cleanStreet(col("v")), names)
      val twice = evalStr(Clean.cleanStreet(col("v")), once)
      assert(once == twice)
    }
  }

  test("street cleaning always expands a mapped trailing type") {
    forAll(Gen.listOfN(10, streetName)) { names =>
      val cleaned = evalStr(Clean.cleanStreet(col("v")), names)
      val expansions = Clean.streetMapping.values.toSet
      cleaned.foreach { c =>
        assert(expansions.exists(c.endsWith), s"'$c' still abbreviated")
      }
    }
  }

  test("encoded-array decode round-trips the {a|b|c} encoding") {
    val items = Gen.nonEmptyListOf(word).map(_.take(5))
    forAll(Gen.listOfN(5, items)) { lists =>
      val encoded = lists.map(_.mkString("{", "|", "}"))
      val decoded = encoded.toDF("v")
        .select(Clean.decodeEncodedArray(col("v")).as("r"))
        .collect().map(_.getSeq[String](0).toList).toList
      assert(decoded == lists)
    }
  }

  test("year-range expansion has length end-start+1 and is sorted") {
    val range = for {
      s <- Gen.choose(1900, 2000)
      len <- Gen.choose(0, 30)
    } yield (s, s + len)
    forAll(Gen.listOfN(4, range), trials = 10) { ranges =>
      val starts = array(ranges.map(r => lit(r._1)): _*)
      val ends = array(ranges.map(r => lit(r._2)): _*)
      val got = spark.range(1)
        .select(Clean.expandYearRanges(starts, ends).as("r"))
        .collect()(0).getSeq[Int](0)
      // sorted starts zip sorted ends (reference semantics): total size
      val sortedS = ranges.map(_._1).sorted
      val sortedE = ranges.map(_._2).sorted
      val expectLen = sortedS.zip(sortedE).map { case (s, e) => e - s + 1 }.sum
      assert(got.length == expectLen)
    }
  }

  test("keyClass is total: every string lands in exactly one class") {
    val anyKey = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(':', '_', ' ', ';', '.')))
      .map(_.mkString)
    forAll(Gen.listOfN(20, anyKey), trials = 10) { keys =>
      val classes = evalStr(Clean.keyClass(col("v")), keys.map(k => if (k == null) "" else k))
      assert(classes.forall(Set("lower", "lower_colon", "problemchars", "other")))
    }
  }

  test("minhash estimate is within tolerance of exact jaccard on shared-vocabulary docs") {
    // deterministic pseudo-random docs from a small vocabulary
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(seed: Int): String =
      (0 until 40).map(i => vocab((seed * 31 + i * 7) % vocab.size)).mkString(" ")
    val docs = (0 until 20).map(i => (i.toLong, doc(i)))
    val df = docs.toDF("doc_id", "text")
    val sigs = graft.operators.Dedup
      .minhashSignatures(df, "doc_id", "text", k = 64, shingleSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def shingles(t: String) =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    for (i <- 0 until 5; j <- (i + 1) until 10) {
      val a = shingles(docs(i)._2); val b = shingles(docs(j)._2)
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val est = sigs(i.toLong).zip(sigs(j.toLong)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - exact) < 0.3,
        s"pair ($i,$j): est=$est exact=$exact")
    }
  }

  test("URL canonicalization is idempotent over generated dirty URLs") {
    val dirtyUrl = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      user <- Gen.oneOf("", "u:p@", "bob@")
      host <- Gen.oneOf("Example.COM", "example.com", "A.b.C.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/x//")
      query <- Gen.oneOf("", "?utm_source=t", "?b=2&a=1", "?b=2&utm_x=1&a=1", "?")
      frag <- Gen.oneOf("", "#f", "#a=1", "#a?b=1")
    } yield s"$scheme://$user$host$port$path$query$frag"
    forAll(Gen.listOfN(15, dirtyUrl)) { urls =>
      val once = evalStr(Clean.canonicalizeUrl(col("v")), urls)
      val twice = evalStr(Clean.canonicalizeUrl(col("v")), once)
      assert(once == twice, s"not idempotent: ${urls.zip(once).zip(twice)}")
      // canonical invariants: no fragment, no tracking params, no userinfo
      once.foreach { u =>
        assert(!u.contains("#") && !u.contains("utm_") && !u.contains("@"), u)
      }
    }
  }
}
