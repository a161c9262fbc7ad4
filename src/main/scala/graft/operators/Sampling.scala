package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-replicable sampling operators for corpus
  * selection — the front door of data mixing (language/source-balanced
  * subcorpora; the reference reports per-category counts, e.g.
  * wrangle_map.py's tag census — this generalizes counting to exact
  * budgeted selection).
  *
  * Everything here is integer arithmetic over counts plus an LCG hash,
  * so any engine with 64-bit integers reproduces the exact same sample —
  * the property that makes a training-data cut auditable months later.
  */
object Sampling {

  /** 31-bit LCG mix of an integral id (the x10 sampling hash): pure
    * integer arithmetic, replicable in ANSI SQL on any engine. Output in
    * [0, 2^31); intermediates stay below 2^63 because the id is reduced
    * mod 2^31 before each multiply.
    *
    * CAVEAT: this is an AFFINE map — n consecutive ids land on an
    * arithmetic progression (step ~1.65e6 mod 2^31), equidistributed
    * only once n·step wraps the circle several times (n >> 1300). Fine
    * for RATE sampling over a large id range (x10); useless as a rank
    * key for k-smallest selection on small strata — use hashHex32.
    */
  def mix31(id: Column): Column =
    (((id % lit(2147483648L)) * lit(2654435761L) + lit(2654435769L)) %
      lit(2147483648L) * lit(2654435761L) + lit(40503L)) % lit(2147483648L)

  /** Uniform 32-bit rank key of an integral id: the first 8 hex chars of
    * md5(id-as-decimal-string). Lowercase-hex string order IS numeric
    * order (same length, '0'-'9' < 'a'-'f'), and md5 of a decimal string
    * is bit-identical on every engine — the property threshold
    * prefilters need that mix31's affine structure lacks.
    */
  def hashHex32(id: Column): Column =
    substring(md5(id.cast("string")), 1, 8)

  /** Hamilton / largest-remainder apportionment of a `1/budgetDiv` total
    * budget across strata: every stratum gets `floor(n_g·target/n)` and
    * the strata with the largest remainders (stratum name as tiebreak)
    * get the leftover +1s, so allocations sum EXACTLY to
    * `target = n div budgetDiv` in pure integer arithmetic.
    *
    * `counts` must be one row per stratum (`stratumCol`, `nCol`) — it is
    * strata-cardinality-sized (languages, sources), so the unpartitioned
    * window and the two tiny cross-joined aggregates here are bounded by
    * contract, never corpus-sized. Returns (stratumCol, nCol, alloc).
    * Intermediate products n_g·target must stay below 2^63 (holds to
    * ~10^9 docs per stratum at any budget; re-scale counts first past
    * that).
    */
  def largestRemainderAlloc(counts: DataFrame, stratumCol: String,
      nCol: String, budgetDiv: Long): DataFrame = {
    val tot = counts.agg(sum(col(nCol)).cast("long").as("n"))
    val a0 = counts.crossJoin(tot)
      .withColumn("target", expr(s"n div $budgetDiv"))
      .withColumn("fl", expr(s"($nCol * target) div n"))
      .withColumn("rem", expr(s"($nCol * target) % n"))
    a0.withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col(stratumCol).asc)))
      .crossJoin(a0.agg(sum("fl").as("sumfl")))
      .withColumn("alloc", col("fl") +
        when(col("rk") <= col("target") - col("sumfl"), lit(1L)).otherwise(lit(0L)))
      .select(col(stratumCol), col(nCol), col("alloc"))
  }

  /** Keep each stratum's `alloc` smallest-`hashHex32(id)` rows, without
    * ever sorting the corpus: a map-side hash-threshold prefilter (4x
    * margin, keep-all once 4·alloc >= n_g) bounds the ranked volume to
    * ~4·Σalloc rows TOTAL regardless of corpus size, then a per-stratum
    * rank takes the exact k smallest (id as tiebreak). md5 is uniform,
    * so a margin shortfall is Chernoff-improbable (P < exp(-alloc)) —
    * and one would surface as a picked count below alloc (callers report
    * n_picked vs alloc), never as a wrong pick. The threshold compares
    * as a string: `printf('%08x', 4·alloc/n_g of 2^32)` against the hex
    * key — same-length lowercase hex, so string order is numeric order
    * on any engine.
    *
    * `alloc` is largestRemainderAlloc's output (stratumCol, nCol,
    * alloc) and is broadcast — strata-cardinality-sized by contract.
    * Returns df's rows plus (h, nCol, alloc, rn) for picked rows only.
    */
  def stratifiedPick(df: DataFrame, stratumCol: String, idCol: String,
      alloc: DataFrame, nCol: String = "n_g"): DataFrame =
    df.withColumn("h", hashHex32(col(idCol)))
      .join(broadcast(alloc), Seq(stratumCol))
      .filter(col("h") < when(expr(s"4 * alloc >= $nCol"), lit("g"))
        .otherwise(format_string("%08x",
          expr(s"(alloc * 4 * 4294967296) div $nCol + 1"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(stratumCol).orderBy(col("h"), col(idCol))))
      .filter(col("rn") <= col("alloc"))
}
