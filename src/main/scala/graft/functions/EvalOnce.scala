package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Evaluate-exactly-once barrier: a zero-cost passthrough that reports
  * itself NON-DETERMINISTIC so the optimizer may not duplicate,
  * constant-fold, or push a referencing filter below it (the guide §4.4
  * discipline, applied to JVM expressions rather than Python UDFs —
  * Catalyst's filter pushdown otherwise clones an expensive aliased
  * expression into a scan-side Filter AND keeps it in the Project above,
  * paying the expression twice per surviving row and, on a single-split
  * scan, paying the filter copy serially below the fan exchange).
  *
  * Value/null semantics are the child's, untouched — eval and codegen
  * both delegate verbatim (the `TaggingExpression` passthrough shape), so
  * whole-stage codegen is preserved and results are bit-identical; only
  * the optimizer's freedom to re-site the subtree is withdrawn. Wrap the
  * EXPENSIVE projection only; every wrapped site must state why the
  * barrier wins there (a barrier also blocks pushdown a cheap expression
  * would be happy to accept).
  */
case class EvalOnce(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  // The entire point of the wrapper — see the class note.
  override lazy val deterministic: Boolean = false

  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "eval_once"
}
