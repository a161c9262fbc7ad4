package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters over a (possibly astronomically) high-cardinality key.
  *
  * `groupBy(key).count().orderBy(...).limit(k)` shuffles one row PER
  * DISTINCT KEY — at 100 TB with billions of distinct keys that shuffle
  * is the job. The two-pass sketch-then-verify shape here shuffles
  * `capacity` entries per partition instead, then exact-counts only the
  * surviving candidates:
  *
  *   pass 1 — Misra-Gries summaries per partition (bounded state,
  *     streaming), merged with the count-shift merge (mergeable-
  *     summaries property: the merged summary obeys the same error
  *     bound). Guarantee: every key with true frequency > n/capacity is
  *     IN the final summary — no false negatives above that bar;
  *   pass 2 — exact counts for the candidate keys only (broadcast
  *     membership filter, then an aggregation whose key domain is at
  *     most `capacity`), exact top-k of those.
  *
  * Result is EXACTLY the true top-k whenever the k-th heaviest key's
  * frequency exceeds n/capacity (size the capacity from n and the
  * expected skew; assert the margin like o19 does). Same
  * sketch-generates-candidates / exact-pass-verifies contract as the
  * MinHash and IVF pipelines — the approximation decides what is
  * CONSIDERED, never the reported values.
  */
object HeavyHitters {

  /** Misra-Gries summary as a typed, merge-able Aggregator (§2.13: the
    * one aggregation shape Catalyst's built-ins cannot express — bounded
    * per-partition state with a non-trivial merge).
    */
  class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
    require(capacity > 0)

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(b: mutable.HashMap[String, Long],
        key: String): mutable.HashMap[String, Long] = {
      if (key == null) return b
      b.get(key) match {
        case Some(c) => b.update(key, c + 1L)
        case None if b.size < capacity => b.update(key, 1L)
        case None =>
          // the classic MG step: decrement every counter, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          b.keysIterator.foreach { k =>
            val c = b(k) - 1L
            if (c == 0L) dead += k else b.update(k, c)
          }
          dead.foreach(b.remove)
      }
      b
    }

    override def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
      if (a.size > capacity) {
        // count-shift merge (Agarwal et al., Mergeable Summaries): shift
        // every counter down by the (capacity+1)-th largest so at most
        // `capacity` survive; preserves the n/capacity error bound
        val cut = a.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        val dead = a.iterator.filter(_._2 <= cut).map(_._1).toList
        dead.foreach(a.remove)
        a.keysIterator.toList.foreach(k => a.update(k, a(k) - cut))
      }
      a
    }

    override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
      b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Exact top-k heaviest values of `keyCol` via MG candidates + exact
    * recount. Columns: (<keyCol>, count) — identical to the plain
    * groupBy/count top-k whenever the k-th frequency > n/capacity.
    */
  def exactTopK(df: DataFrame, keyCol: String, k: Int,
      capacity: Int = 1024): DataFrame = {
    val mg = udaf(new MisraGries(capacity))
    val cands = df.select(col(keyCol).cast("string").as("__k"))
      .agg(mg(col("__k")).as("cands"))
      .select(explode(col("cands")).as("__cand"))
    df.join(broadcast(cands), col(keyCol).cast("string") === col("__cand"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(keyCol).asc)
      .limit(k)
  }
}
