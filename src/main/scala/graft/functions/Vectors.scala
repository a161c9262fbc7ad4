package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (array<float>/array<double>).
  *
  * Dot products and norms are computed with exact DECIMAL accumulation so
  * results are association-order independent — bit-identical between
  * Spark partial aggregation and the DuckDB oracle — then surfaced as
  * doubles. For pure-Spark hot paths (`dotFast`) a double accumulator is
  * provided (faster; deterministic per-row since aggregate() folds
  * left-to-right within the array).
  */
object Vectors {

  private val DEC = "decimal(18,7)"

  // Accumulation types are sized so decimal ADDITION never reaches the
  // precision cap of 38 — at the cap Spark silently drops scale 14→13
  // per fold step (≈1e-13 error/term), breaking bit-parity with the
  // oracle. (24,14)+(20,14) → (25,14): exact. Bounds: |component| < 1e5,
  // |product| < 1e6, |dot| < 1e9 — ample for embedding vectors.
  private val DECPROD = "decimal(20,14)"
  private val DECACC = "decimal(24,14)"

  /** Exact dot product via decimal accumulation, as double. The merge
    * result is cast back to the accumulator type (Spark's aggregate()
    * requires a type-stable fold).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      // float → double first (exact in every engine), THEN double →
      // decimal: a direct float→decimal cast rounds from the float's
      // shortest decimal repr in Spark and disagrees with DuckDB.
      zip_with(a, b, (x, y) =>
        (x.cast("double").cast(DEC) * y.cast("double").cast(DEC)).cast(DECPROD)),
      lit(0).cast(DECACC),
      (acc, v) => (acc + v).cast(DECACC)).cast("double")

  /** L2 norm via exact decimal sum of squares, as double. */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, exact-decimal inner sums, double end arithmetic. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Fast dot/cosine: native codegen'd expressions (primitive loop in
    * whole-stage codegen — see graft.expressions.VectorExpressions),
    * registered by Graft.tune. The throughput path for LSH/ANN scoring;
    * the decimal variants above remain the oracle-parity path.
    */
  def dotFast(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  def norm2Fast(a: Column): Column = sqrt(dotFast(a, a))

  def cosineFast(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Signed random-hyperplane LSH signature of length `bits`: bit i is
    * the sign of <v, h_i> where h_i is a deterministic pseudo-random
    * hyperplane derived from an engine-replicable 31-bit LCG (see
    * graft.expressions.HyperplaneImpl — the DuckDB oracle regenerates the
    * identical planes in SQL). Returns a long bucket id — vectors with
    * equal buckets are ANN candidates. Native codegen'd expression,
    * registered by Graft.tune.
    */
  def hyperplaneBucket(v: Column, bits: Int, seed: Int): Column =
    call_function("hyperplane_bucket", v, lit(bits), lit(seed))

  /** Symmetric per-vector int8 quantization scale: max|x| / 127.
    * Storage drops 4x (float32 → int8 + one float scale per vector) —
    * at 100 TB of embeddings that is the difference between 100 TB and
    * 25 TB at rest and on the wire. max is order-independent, so the
    * scale is bit-identical under any partitioning.
    */
  def i8Scale(v: Column): Column =
    aggregate(v, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double")))) / lit(127.0d)

  /** int8 round-trip (quantize then dequantize): floor(x/scale + 0.5) is
    * round-half-up in BOTH Java and DuckDB (plain `round` differs on
    * half-way semantics across engines), so the reconstructed vector is
    * bit-identical in the oracle.
    */
  def i8RoundTrip(v: Column, scale: Column): Column =
    transform(v, x =>
      floor(x.cast("double") / scale + lit(0.5d)).cast("double") * scale)

  /** Deterministic ±1 Johnson-Lindenstrauss sign for (seed, output dim
    * `j`, input dim `d` — 1-based Column): the SAME engine-replicable
    * 31-bit LCG mix the hyperplane machinery uses
    * (graft.expressions.HyperplaneImpl / the sqlBucket oracle mirror),
    * thresholded at 2³⁰ instead of scaled to a weight — so the oracle
    * regenerates identical signs with pure integer SQL.
    */
  private def jlSign(seed: Int, j: Int, d: Column): Column = {
    val M = 2147483648L // 2^31
    val key = (lit(seed.toLong * 1000003L + j.toLong * 4096L) +
      d.cast("long") - lit(1L)) % lit(M)
    val mixed =
      ((key * lit(2654435761L) + lit(2654435769L)) % lit(M) *
        lit(2654435761L) + lit(40503L)) % lit(M)
    when(mixed >= lit(1073741824L), lit(1.0d)).otherwise(lit(-1.0d))
  }

  /** Johnson-Lindenstrauss random projection with Achlioptas ±1 signs:
    * `out[j] = Σ_d v[d]·s(seed,j,d)`, `s ∈ {−1,+1}` from [[jlSign]].
    * The dimensionality-reduction stage of an embedding pipeline —
    * JL preserves pairwise angles to ~1/√outDim, so a 64→16 projection
    * is the cheap prefilter space (4× less compute/storage per
    * comparison) ahead of exact re-scoring. A pure per-row expression:
    * no shuffle, no state, embarrassingly parallel at any corpus size.
    * The canonical JL 1/√outDim scale factor is deliberately omitted —
    * cosine similarity (the only consumer here) is scale-invariant.
    *
    * Engine parity: each term is `CAST(v[d] AS DOUBLE) · (±1)` (exact),
    * and the in-row left fold is order-deterministic on both engines
    * (Spark `aggregate` == DuckDB `list_sum` over `list_transform`), so
    * projected vectors are bit-identical to the oracle's.
    */
  def jlProject(v: Column, outDim: Int, inDim: Int, seed: Int): Column =
    array((0 until outDim).map { j =>
      aggregate(sequence(lit(1), lit(inDim)), lit(0.0d),
        (acc, d) => acc + element_at(v, d).cast("double") * jlSign(seed, j, d))
    }: _*)
}
