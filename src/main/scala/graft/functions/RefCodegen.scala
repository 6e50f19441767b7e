package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** Real whole-stage codegen for the native per-row expressions (r14/r15).
  *
  * CodegenFallback routes evaluation through `expr.eval(INPUT_ROW)`, which
  * forces the surrounding stage to materialize the input row and evaluates
  * the CHILD subtree interpreted — breaking the whole-stage pipeline around
  * Generate/aggregate/join consumers (measured +0.5 s per BPE row when
  * WsSplit was a fallback). These traits instead codegen the children
  * normally and call the expression instance's row-level worker through a
  * plan reference — the per-row loop itself is unchanged.
  *
  * Only for expressions whose nullSafeEval never returns null (defineCodeGen
  * assumes a non-null result once the children are non-null).
  */
trait RefCodegen extends UnaryExpression {
  /** public bridge — generated Java cannot call the protected nullSafeEval */
  def evalOne(v: Any): Any = nullSafeEval(v)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this,
      "graft.functions.RefCodegen")
    val boxed = CodeGenerator.boxedType(dataType)
    defineCodeGen(ctx, ev, c => s"(($boxed) $ref.evalOne($c))")
  }
}

/** [[RefCodegen]] for binary expressions. */
trait RefCodegen2 extends BinaryExpression {
  def evalTwo(l: Any, r: Any): Any = nullSafeEval(l, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this,
      "graft.functions.RefCodegen2")
    val boxed = CodeGenerator.boxedType(dataType)
    defineCodeGen(ctx, ev, (l, r) => s"(($boxed) $ref.evalTwo($l, $r))")
  }
}
