package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct polynomial hashes of the word w-shingles of a document, as
  * one codegen'd expression: split on single spaces, hash each w-gram
  * "w1 w2 … ww" (single-space joined) char by char with the same
  * Horner-mod-prime recurrence as [[WinnowFingerprints]], return the
  * sorted distinct hashes as `ARRAY<BIGINT>`.
  *
  * This replaces the `transform(sequence…, concat_ws(element_at…))` +
  * `array_distinct` + `md5` pipeline of round 1, which ran INTERPRETED
  * (HOF lambdas execute outside whole-stage codegen) and dominated the
  * MinHash stage: shingle construction + hashing is now a compiled
  * O(chars·w) pass with no intermediate shingle strings at all.
  *
  * Consumers that need shingle SETS (MinHash, Jaccard on hashes) are
  * exactly served; consumers needing the string shingles (d4's
  * inverted-index join) keep the HOF formulation in
  * [[graft.functions.wordShingles]].
  *
  * The DuckDB oracle reproduces the hash with
  * `list_reduce(list_prepend(0, codepoints), (acc, c) -> (acc*B + c) % P)`
  * over each shingle string — equality is by construction, and the min
  * taken downstream by MinHash is insensitive to the (negligible)
  * within-doc collision case because collapsing duplicates never moves a
  * minimum.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (STRING, literal INT), got ${l.catalogString} / ${r.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any, w: Any): Any =
    ShingleHashes.hashes(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, w) => s"graft.functions.ShingleHashes.hashes($s, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shingle_hashes"
}

/** Positional (bag) variant of [[ShingleHashes]]: one hash per shingle
  * occurrence, in document order, no distinct/sort — for consumers with
  * BAG semantics (t12's bigram frequency model counts every occurrence).
  * Same compiled O(chars·w) pass, same Horner-mod-prime hash, so the
  * DuckDB oracle replays it with the shared `polyHashSql` fold.
  */
case class ShingleHashesBag(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_bag expects (STRING, literal INT), got ${l.catalogString} / ${r.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any, w: Any): Any =
    ShingleHashes.bagHashes(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, w) => s"graft.functions.ShingleHashes.bagHashes($s, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "shingle_hashes_bag"
}

/** One compiled pass producing, per bigram occurrence in document order,
  * the struct `(uh, bh)`: the polynomial hash of the LEFT word (the LM
  * context) and of the full bigram. t19's add-one bigram model needs both
  * keys per transition; two separate bag passes + a `zip_with` lambda
  * would re-hash every word AND run interpreted (LambdaFunction escapes
  * whole-stage codegen — the r8 no-lambda invariant). Here `uh` is the
  * Horner-fold PREFIX of `bh`, so the bigram hash resumes from the
  * context hash: O(chars) total, not O(2·chars).
  */
case class BigramContextHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_context_hashes expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("uh", LongType, nullable = false),
      StructField("bh", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(s: Any): Any =
    ShingleHashes.bigramContextHashes(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.ShingleHashes.bigramContextHashes($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bigram_context_hashes"
}

object ShingleHashes {
  import WinnowFingerprints.{Base, Mod}

  /** All w-shingle hashes in positional order (bag — duplicates kept).
    * A shingle's hash is the Horner fold over the code points of
    * "word_i␣word_{i+1}␣…␣word_{i+w-1}" — computed by folding word spans
    * and separator spaces directly, never materializing the joined
    * string.
    */
  def bagHashes(text: UTF8String, w: Int): ArrayData = {
    val words = splitWords(text.toString)
    val n = words.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var k = 0
      while (k < w) {
        if (k > 0) acc = (acc * Base + ' ') % Mod
        val word = words(i + k)
        var j = 0
        while (j < word.length) {
          val cp = word.codePointAt(j)
          acc = (acc * Base + cp) % Mod
          j += Character.charCount(cp)
        }
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct polynomial hashes of the w-shingles (set form). */
  def hashes(text: UTF8String, w: Int): ArrayData = {
    val bag = bagHashes(text, w)
    val n = bag.numElements()
    if (n == 0) return bag
    val out = bag.toLongArray()
    java.util.Arrays.sort(out)
    var cnt = 0
    var j = 0
    while (j < n) {
      if (j == 0 || out(j) != out(j - 1)) { out(cnt) = out(j); cnt += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** Per-transition (context-hash, bigram-hash) structs in document
    * order: `uh(i) = fold(word_i)`, `bh(i)` resumes that fold over
    * `' ' + word_{i+1}` — exactly the hash of "word_i word_{i+1}", at
    * O(chars) total. See [[BigramContextHashes]].
    */
  def bigramContextHashes(text: UTF8String): ArrayData = {
    val words = splitWords(text.toString)
    val n = words.length - 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    def wordHash(from: Long, word: String): Long = {
      var acc = from
      var j = 0
      while (j < word.length) {
        val cp = word.codePointAt(j)
        acc = (acc * Base + cp) % Mod
        j += Character.charCount(cp)
      }
      acc
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val uh = wordHash(0L, words(i))
      val bh = wordHash((uh * Base + ' ') % Mod, words(i + 1))
      out(i) = org.apache.spark.sql.catalyst.InternalRow(uh, bh)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Split on single spaces, preserving empty tokens — the exact
    * semantics of Spark's `split(text, " ")` and DuckDB's
    * `string_split(text, ' ')`, which the r1 pipeline and the oracle use.
    */
  private def splitWords(s: String): Array[String] = s.split(" ", -1)
}
