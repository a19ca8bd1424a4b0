package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Binary (sign) quantization of a float vector: bit i is set iff
  * `vec(i) > 0`, packed 32 bits per output long (word `i / 32`, bit
  * `i % 32`) — the 1-bit-per-dimension code modern vector stores use as
  * their cheapest index tier (a 64-dim float32 vector compresses 32:1 to
  * two words), scored by popcount Hamming distance over the packed words
  * with the built-in codegen'd `^`/`bit_count`.
  *
  * 32 bits per word, not 64, so every word is a NON-NEGATIVE long: the
  * DuckDB oracle can rebuild each word as a plain sum of `1 << (i % 32)`
  * terms without touching the sign bit (a 64-bit pack would need bit 63,
  * where `1::BIGINT << 63` overflows DuckDB's checked arithmetic). The
  * wasted half-word costs one extra xor+popcount per 32 dims — noise next
  * to the 32× scan-width saving the code exists for.
  *
  * One compiled pass, no intermediate boolean array; `> 0` (not `>= 0`)
  * so an exact-zero dimension quantizes identically in both engines
  * regardless of signed-zero representation.
  */
case class SignBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bits expects ARRAY<FLOAT>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SignBits.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.SignBits.pack($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_bits"
}

object SignBits {
  /** Bits per packed word — see the class note on why not 64. */
  val WordBits = 32

  def pack(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val words = new Array[Long]((n + WordBits - 1) / WordBits)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) > 0f) words(i / WordBits) |= 1L << (i % WordBits)
      i += 1
    }
    new GenericArrayData(words)
  }
}
