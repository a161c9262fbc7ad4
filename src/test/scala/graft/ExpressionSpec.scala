package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{HyperplaneImpl, NormalizeImpl, SimHashImpl}

/** Direct unit/property tests for the engine-replicable native
  * expressions (the SQL-mirror contract is separately enforced by the
  * DuckDB oracle; these pin the Scala-side invariants).
  */
class ExpressionSpec extends AnyFunSuite {

  test("nfc: composes decomposed accents; identity (same ref) on NFC text") {
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("Café naïve")
    val composed = NormalizeImpl.nfc(decomposed)
    assert(composed.toString == "Café naïve")
    assert(composed.numChars() == decomposed.numChars() - 2)
    // fast path: already-NFC input returns the SAME object (no copy)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NormalizeImpl.nfc(ascii) eq ascii)
    // canonical equivalence collapses to equal bytes — the dedup premise
    assert(NormalizeImpl.nfc(decomposed).binaryEquals(
      NormalizeImpl.nfc(UTF8String.fromString("Café naïve"))))
  }

  test("minhash_from_hashes is bit-identical to the string-shingle path") {
    import graft.expressions.MinHashImpl
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val text = UTF8String.fromString(
      "the quick brown fox jumps over the lazy dog again and again")
    for (k <- Seq(8, 32); n <- Seq(2, 3)) {
      val strings = MinHashImpl.wordShingles(text, n)
      val hashes = MinHashImpl.wordShingleHashes(text, n)
      // distinct hashes (the pipeline's set form) must not change the min
      val distinct = new GenericArrayData(
        (0 until hashes.numElements()).map(hashes.getLong).distinct.toArray)
      val a = MinHashImpl.signature(strings, k)
      val b = MinHashImpl.signatureFromHashes(distinct, k)
      assert((0 until k).forall(i => a.getLong(i) == b.getLong(i)),
        s"k=$k n=$n signatures diverge")
    }
  }

  test("mix31 stays in [0, 2^31) across the input domain") {
    val rnd = new scala.util.Random(42)
    val samples = Seq(0L, 1L, (1L << 31) - 1) ++
      Seq.fill(500)(math.abs(rnd.nextLong()) % (1L << 31))
    samples.foreach { x =>
      val v = SimHashImpl.mix31(x)
      assert(v >= 0L && v < (1L << 31), s"mix31($x) = $v out of range")
    }
  }

  test("hyperplane weights are in [-0.5, 0.5) and deterministic") {
    for (seed <- 0 until 4; bit <- 0 until 8; dim <- 0 until 64) {
      val w = HyperplaneImpl.weight(seed, bit, dim)
      assert(w >= -0.5 && w < 0.5)
      assert(w == HyperplaneImpl.weight(seed, bit, dim))
    }
  }

  test("hyperplane weights vary across seeds/bits/dims (not constant)") {
    val ws = for (seed <- 0 until 2; bit <- 0 until 4; dim <- 0 until 16)
      yield HyperplaneImpl.weight(seed, bit, dim)
    assert(ws.distinct.size > ws.size / 2)
  }

  private def sig(s: String, k: Int = 3): Long =
    SimHashImpl.simhash(org.apache.spark.unsafe.types.UTF8String.fromString(s), k)

  test("simhash: empty/short text → 0; deterministic; bounded to 62 bits") {
    assert(sig("") == 0L)
    assert(sig("one two") == 0L) // fewer tokens than shingle size
    val t = "the quick brown fox jumps over the lazy dog"
    assert(sig(t) == sig(t))
    assert(sig(t) >= 0L && sig(t) < (1L << 62))
    assert(sig(t) != 0L)
  }

  test("simhash: near-identical docs are close, disjoint docs are far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = (1 to 30).map(i => s"tok${i % 12}").mkString(" ")
    val near = base + " extra"
    val far = (1 to 30).map(i => s"other${i % 12}").mkString(" ")
    assert(ham(sig(base), sig(near)) <= 12)
    assert(ham(sig(base), sig(far)) > 12)
  }

  test("simhash shingleSize=1 hashes tokens (order-insensitive by multiset)") {
    assert(sig("a b c a b c", 1) == sig("c b a c b a", 1))
  }
}
