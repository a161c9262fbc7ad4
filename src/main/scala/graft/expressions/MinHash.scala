package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature computation.
  *
  * The expression-library form (transform×transform over xxhash64) pays
  * interpreted lambda dispatch per (shingle × permutation) — ~2300
  * interpreted evals per row for k=32 over a ~70-shingle doc, which
  * measured ~9 ms/row. This version runs ONE compiled loop: each shingle
  * is XXH64-hashed once from its UTF8 bytes, then the k permutations are
  * k cheap hashLong mixes; the row cost drops to microseconds.
  */
object MinHashImpl {

  /** signature[j] = min over shingles of XXH64(XXH64(bytes, 42), seed=j).
    * Empty input → Long.MaxValue components (callers filter empty docs).
    */
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s: UTF8String = shingles.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val v = XXH64.hashLong(h, j.toLong)
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** signature() factored over precomputed shingle hashes: the string
    * path hashes each shingle with XXH64(bytes, 42) — the exact value
    * `wordShingleHashes` emits — so min-mixing those hashes yields a
    * BIT-IDENTICAL signature while letting a pipeline that also needs
    * the hash sets (near-dedup verification) tokenize the text ONCE.
    * Duplicate hashes don't affect the min, so distinct sets are fine.
    */
  def signatureFromHashes(hashes: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, j.toLong)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Number of equal components between two equal-length signatures. */
  def matchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** XXH64 (seed 42) of each k-token shingle — the compact form of the
    * shingle set for set-similarity verification: 8 bytes per shingle
    * instead of the string, so candidate-pair verification shuffles ~5×
    * less. Jaccard over the hash sets equals Jaccard over the string
    * sets unless two distinct shingles of the SAME pair collide in 64
    * bits (P ≈ |set|²/2^64 ≈ 1e-15 — negligible).
    */
  def wordShingleHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.trim match {
      case "" => Array.empty[String]
      case t => t.split("\\s+")
    }
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-token shingles of whitespace-tokenized text, single compiled pass
    * (the builtin transform/slice/array_join pipeline is interpreted and
    * ~ms/row). Matches Text.wordShingles semantics: trim, split on \s+,
    * join k consecutive tokens with single spaces; fewer than k tokens →
    * empty array.
    */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.trim match {
      case "" => Array.empty[String]
      case t => t.split("\\s+")
    }
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** word_shingles(text, k) → array<string> of k-token shingles. */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, literal int)")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashImpl.wordShingles(l.asInstanceOf[UTF8String], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.expressions.MinHashImpl.wordShingles($t, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** word_shingle_hashes(text, k) → array<long> of XXH64 shingle hashes. */
case class WordShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "word_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, literal int)")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashImpl.wordShingleHashes(l.asInstanceOf[UTF8String], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.expressions.MinHashImpl.wordShingleHashes($t, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** minhash_signature(shingles, k) → array<long> of length k. */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.foldable &&
        right.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, literal int), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashImpl.signature(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.expressions.MinHashImpl.signature($a, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** minhash_from_hashes(shingleHashes, k) → array<long> of length k —
  * bit-identical to minhash_signature over the same shingles' strings.
  */
case class MinHashFromHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "minhash_from_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.foldable &&
        right.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<long>, literal int), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashImpl.signatureFromHashes(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.expressions.MinHashImpl.signatureFromHashes($a, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** minhash_match_count(sigA, sigB) → int (equal components). */
case class MinHashMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "minhash_match_count"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> inputs")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    MinHashImpl.matchCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.MinHashImpl.matchCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
