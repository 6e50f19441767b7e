package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Serializable scalar-expression AST for model functions.
  *
  * The reference compiles `fit_curve`/`predict_curve` model subgraphs to
  * Python source strings and `exec`s them (openeo_odc_driver.py:228-278,
  * 1518-1530, 1567-1578). Here the same subgraph compiles to this typed AST,
  * which renders EITHER as a Catalyst `Column` (predict path — stays in
  * codegen) OR as a fast scalar evaluator usable inside an `Aggregator` on
  * executors (fit path — the optimizer calls it millions of times per
  * group, no Row overhead wanted).
  */
sealed trait ScalarExpr extends Serializable {
  import ScalarExpr._
  def eval(x: Double, p: Array[Double]): Double = this match {
    case Const(v)    => v
    case X           => x
    case Param(i)    => p(i)
    case Add(a, b)   => a.eval(x, p) + b.eval(x, p)
    case Sub(a, b)   => a.eval(x, p) - b.eval(x, p)
    case Mul(a, b)   => a.eval(x, p) * b.eval(x, p)
    case Div(a, b)   => a.eval(x, p) / b.eval(x, p)
    case Pow(a, b)   => math.pow(a.eval(x, p), b.eval(x, p))
    case Sin(a)      => math.sin(a.eval(x, p))
    case Cos(a)      => math.cos(a.eval(x, p))
    case Ln(a)       => math.log(a.eval(x, p))
    case Sqrt(a)     => math.sqrt(a.eval(x, p))
    case Abs(a)      => math.abs(a.eval(x, p))
  }
  /** Render as a Column; `xc` binds X, `params` binds Param(i) to
    * element_at(params, i+1) — used by predict_curve. */
  def toColumn(xc: Column, params: Column): Column = this match {
    case Const(v)    => lit(v)
    case X           => xc
    case Param(i)    => element_at(params, i + 1)
    case Add(a, b)   => a.toColumn(xc, params) + b.toColumn(xc, params)
    case Sub(a, b)   => a.toColumn(xc, params) - b.toColumn(xc, params)
    case Mul(a, b)   => a.toColumn(xc, params) * b.toColumn(xc, params)
    case Div(a, b)   => a.toColumn(xc, params) / b.toColumn(xc, params)
    case Pow(a, b)   => pow(a.toColumn(xc, params), b.toColumn(xc, params))
    case Sin(a)      => sin(a.toColumn(xc, params))
    case Cos(a)      => cos(a.toColumn(xc, params))
    case Ln(a)       => log(a.toColumn(xc, params))
    case Sqrt(a)     => sqrt(a.toColumn(xc, params))
    case Abs(a)      => abs(a.toColumn(xc, params))
  }
  def nParams: Int = this match {
    case Param(i) => i + 1
    case Add(a, b) => math.max(a.nParams, b.nParams)
    case Sub(a, b) => math.max(a.nParams, b.nParams)
    case Mul(a, b) => math.max(a.nParams, b.nParams)
    case Div(a, b) => math.max(a.nParams, b.nParams)
    case Pow(a, b) => math.max(a.nParams, b.nParams)
    case Sin(a) => a.nParams; case Cos(a) => a.nParams
    case Ln(a) => a.nParams; case Sqrt(a) => a.nParams; case Abs(a) => a.nParams
    case _ => 0
  }
}

object ScalarExpr {
  final case class Const(v: Double) extends ScalarExpr
  case object X extends ScalarExpr
  final case class Param(i: Int) extends ScalarExpr
  final case class Add(a: ScalarExpr, b: ScalarExpr) extends ScalarExpr
  final case class Sub(a: ScalarExpr, b: ScalarExpr) extends ScalarExpr
  final case class Mul(a: ScalarExpr, b: ScalarExpr) extends ScalarExpr
  final case class Div(a: ScalarExpr, b: ScalarExpr) extends ScalarExpr
  final case class Pow(a: ScalarExpr, b: ScalarExpr) extends ScalarExpr
  final case class Sin(a: ScalarExpr) extends ScalarExpr
  final case class Cos(a: ScalarExpr) extends ScalarExpr
  final case class Ln(a: ScalarExpr) extends ScalarExpr
  final case class Sqrt(a: ScalarExpr) extends ScalarExpr
  final case class Abs(a: ScalarExpr) extends ScalarExpr

  /** The openEO example model: a0 + a1*cos(2πx/31557600) + a2*sin(...) —
    * the seasonal harmonic used with fit_curve in openEO docs. */
  def harmonic(periodSeconds: Double = 31557600.0): ScalarExpr = {
    val w = Mul(Const(2 * math.Pi / periodSeconds), X)
    Add(Param(0), Add(Mul(Param(1), Cos(w)), Mul(Param(2), Sin(w))))
  }
  /** Simple line a0 + a1*x (closed-form checkable against SQL regr_*). */
  def linear: ScalarExpr = Add(Param(0), Mul(Param(1), X))
}
