package graft

import graft.operators.Bpe

/** The learned-BPE trainer's contracts (operators.Bpe): greedy
  * left-to-right apply including the l=r run parity ("aaaa" merges at
  * offsets 0 and 2, "aaa" at 0 only), deterministic tiebreaks, merged
  * symbols feeding later rounds, and the length cap fallback.
  */
class BpeSpec extends SparkSpec {

  test("run parity and weighted counts: the classic greedy scan") {
    import spark.implicits._
    // vocabulary: aaaa (freq 2), bc (freq 3), aaa (freq 1)
    val docs = Seq("aaaa bc bc aaaa", "aaa bc").toDF("text")
    val t = Bpe.train(docs, "text", rounds = 2)
    assert(t.totalWords == 6L)
    // round 1: (a,a) counts 2·3 + 1·2 = 8 adjacent occurrences, beats
    // (b,c)=3; greedy apply leaves aaaa→[aa,aa], aaa→[aa,a] — so the
    // weighted symbol count is 2·2 + 3·2 + 1·2 = 12
    assert(t.merges.head == Bpe.Merge(1L, "a", "a", 8L, 12L))
    // round 2: (aa,aa)=2, (b,c)=3, (aa,a)=1 → (b,c) wins; symbols drop
    // by one per bc occurrence
    assert(t.merges(1) == Bpe.Merge(2L, "b", "c", 3L, 9L))
    val syms = t.syms.orderBy("w", "pos").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3)))
    assert(syms.toSeq == Seq(("aaa", 0, "aa"), ("aaa", 1, "a"),
      ("aaaa", 0, "aa"), ("aaaa", 1, "aa"), ("bc", 0, "bc")))
    graft.Graft.releaseTruncated(t.syms)
  }

  test("merged symbols feed later rounds; ties break lexicographically") {
    import spark.implicits._
    // xy dominates, then (xy, z) must use the ROUND-1 OUTPUT symbol
    val docs = Seq("xyz xyz xy ab ab").toDF("text")
    val t = Bpe.train(docs, "text", rounds = 2)
    assert(t.merges.head.lhs == "x" && t.merges.head.rhs == "y" &&
      t.merges.head.nPairs == 3L)
    // round 2: (xy,z)=2 beats (a,b)=2? tie at 2 → lexicographic: "a"<"xy"
    assert(t.merges(1) == Bpe.Merge(2L, "a", "b", 2L,
      t.merges.head.totalSymbols - 2L))
    graft.Graft.releaseTruncated(t.syms)
  }

  test("words over the length cap are excluded from training") {
    import spark.implicits._
    val long = "q" * 20
    val docs = Seq(s"$long $long de de de").toDF("text")
    val t = Bpe.train(docs, "text", rounds = 1, maxWordLen = 16)
    assert(t.totalWords == 3L) // only the de's
    assert(t.merges.head.lhs == "d" && t.merges.head.rhs == "e")
    graft.Graft.releaseTruncated(t.syms)
  }

  test("driver-local trainer parity: identical merges and vocabulary on real documents") {
    // the production-crossover shape (Bpe.trainLocal — collected
    // vocabulary, in-process merge loop) must be a pure re-expression
    // of the relational trainer: same winner rule, same greedy apply ⇒
    // the SAME learned tokenizer, merge-for-merge and symbol-for-symbol
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val rel = Bpe.train(docs, "text", rounds = 8)
    val loc = Bpe.trainLocal(docs, "text", rounds = 8)
    assert(loc.totalWords == rel.totalWords)
    assert(loc.merges == rel.merges,
      s"merge tables diverge:\n rel=${rel.merges}\n loc=${loc.merges}")
    val relSyms = rel.syms.orderBy("w", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val locSyms = loc.syms.orderBy("w", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
    assert(relSyms.toSeq == locSyms.toSeq)
    graft.Graft.releaseTruncated(rel.syms)
  }

  test("driver-local trainer: production merge counts run without per-round jobs") {
    import spark.implicits._
    // rounds ≫ the relational demo's 8 — the whole loop is in-process
    // hash-map passes over the bounded vocabulary, so 64 rounds on a
    // small vocab is instant (the relational shape would be 128
    // sequential Spark jobs)
    val docs = Seq("the quick brown fox jumps over the lazy dog " * 3,
      "pack my box with five dozen liquor jugs").toDF("text")
    val t = Bpe.trainLocal(docs, "text", rounds = 64)
    assert(t.merges.nonEmpty && t.merges.size <= 64)
    // rounds are exhausted or every word fully merged — both are valid
    // terminal states; the merge table stays strictly consistent
    assert(t.merges.map(_.round) == (1L to t.merges.size.toLong))
  }
}
