package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 3 heavy keys (3000/2000/1000 rows) + 500 light keys (≤10 each);
  // n = 9,000 → with capacity 64 the guarantee bar is n/64 ≈ 141:
  // every heavy key clears it, no light key does.
  private lazy val data = {
    val heavy = Seq("alpha" -> 3000, "beta" -> 2000, "gamma" -> 1000)
      .flatMap { case (k, n) => Seq.fill(n)(k) }
    val light = for (k <- 1 to 500; i <- 1 to (k % 10 + 1)) yield s"key$k"
    (heavy ++ light).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }
      .toDF("key", "id")
      .repartition(7) // several partitions → the merge path actually runs
  }

  test("MG exactTopK equals the plain groupBy top-k above the guarantee bar") {
    val expected = data.groupBy("key").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("key").asc).limit(3)
      .collect().toSeq
    val got = HeavyHitters.exactTopK(data, "key", 3, capacity = 64)
      .collect().toSeq
    assert(got === expected)
    assert(got.map(r => r.getString(0)) === Seq("alpha", "beta", "gamma"))
  }

  test("MG summary keeps every key above n/capacity (no false negatives)") {
    val mg = udaf(new HeavyHitters.MisraGries(64))
    val cands = data.agg(mg(col("key")).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet
    assert(Set("alpha", "beta", "gamma").subsetOf(cands),
      s"heavy keys missing from summary: $cands")
    assert(cands.size <= 64)
  }

  test("MG property: keys above n/capacity survive arbitrary partition splits") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def forAll[A](gen: Gen[A], trials: Int)(body: A => Unit): Unit =
      (0 until trials).foreach { i =>
        gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
      }
    val gen = for {
      nKeys <- Gen.choose(2, 30)
      n <- Gen.choose(50, 500)
      stream <- Gen.listOfN(n, Gen.frequency(
        (0 until nKeys).map(i => (i * i + 1, Gen.const(s"k$i"))): _*))
      capacity <- Gen.choose(2, 16)
      nParts <- Gen.choose(1, 5)
    } yield (stream, capacity, nParts)
    forAll(gen, 40) { case (stream, capacity, nParts) =>
      val agg = new HeavyHitters.MisraGries(capacity)
      val parts = stream.grouped(
        math.max(1, stream.size / nParts)).toList
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .reduceLeft(agg.merge)
      val out = agg.finish(merged).toSet
      assert(out.size <= capacity)
      val bar = stream.size.toDouble / capacity
      stream.groupBy(identity).foreach { case (k, occ) =>
        if (occ.size > bar)
          assert(out.contains(k),
            s"key $k freq=${occ.size} > bar=$bar missing (capacity=$capacity, parts=$nParts)")
      }
    }
  }

  test("null keys are ignored") {
    val withNulls = data.withColumn("key",
      when(col("id") % 5 === 0, lit(null)).otherwise(col("key")))
    val got = HeavyHitters.exactTopK(withNulls, "key", 1, capacity = 64)
      .collect()(0).getString(0)
    assert(got == "alpha")
  }
}
