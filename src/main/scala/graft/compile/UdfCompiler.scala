package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** `run_udf` source → Catalyst expression compiler.
  *
  * The reference executes arbitrary R UDF source against the cube through
  * an external R worker pool (openeo_odc_driver.py:282-339). A language
  * bridge is the wrong execution model on Spark — every value would leave
  * codegen and cross a process boundary. In practice openEO UDFs passed to
  * this backend are element-wise math (`function(x, context) { x * 2 }`),
  * so the Spark-first equivalent is to COMPILE that subset straight into
  * `Column` expressions: the "UDF" then runs vectorized inside whole-stage
  * codegen like any other apply node. Source outside the subset raises a
  * typed openEO error instead of silently degrading.
  *
  * Accepted forms: R `function(x[, context]) [{] expr [}]` (with optional
  * `return(expr)`), Python `lambda x[, context]: expr`, or a bare
  * expression in `x`. Grammar: numbers, `x`, + - * / ^ %% , parens, unary
  * minus, and the 1/2-arg math functions below.
  */
object UdfCompiler {

  final case class UdfParseError(reason: String) extends RuntimeException(
    s"run_udf: only element-wise expression UDFs are supported ($reason)")

  /** Compile UDF source to a Column over the value column `x`. */
  def compile(source: String, x: Column): Column =
    new Parser(strip(source), None).parseAll(x)

  /** Compile a series→series UDF over an ordered per-group window — the
    * `apply_dimension`-position run_udf shape (array in → array out along
    * one dimension, openeo_odc_driver.py:282-339). Same grammar as
    * [[compile]] plus series functions bound to `w`:
    *
    *  - `cummax/cummin/cumsum(e)` — running reduction over a RANGE frame
    *    (ties on the order key are included together, so results are
    *    deterministic and match the SQL default frame);
    *  - `lag/lead(e[, n])` — row offsets (literal integer n, default 1);
    *  - `rollmean(e, k)` — centered moving mean, odd literal k; edge rows
    *    average the available window (zoo::rollmean pads NA instead —
    *    divergence documented here).
    *
    * Series calls cannot nest inside each other — `cummax(lag(x))` raises
    * UdfParseError at parse time (it would be a window-in-window Spark
    * rejects only at analysis, escaping the typed-error contract);
    * composing them element-wise (`cummax(x) - lag(x)`) is fine.
    *
    * Determinism: the cum* family is tie-safe (RANGE frames: ties on the
    * order key aggregate together). lag/lead/rollmean are ROW-based by
    * definition, so with duplicate labels on the order dimension
    * (possible after `rename_labels` with ordinal labels,
    * openeo_odc_driver.py:1118-1121) a bare ROW frame would depend on the
    * arbitrary intra-tie order. Callers pass `wRows` — the same window
    * with a deterministic secondary sort key (the value column) — and the
    * ROW-frame functions run over THAT spec: within a label tie rows are
    * processed in value order, so the result is a pure function of the
    * row multiset. With unique labels the tiebreak never engages and the
    * two specs are interchangeable. */
  def compileSeries(source: String, x: Column, w: WindowSpec,
      wRows: WindowSpec): Column =
    new Parser(strip(source), Some(w), wRowsOpt = Some(wRows)).parseAll(x)

  /** [[compileSeries]] with no separate ROW-frame spec — only safe when
    * labels along the order dimension are unique. */
  def compileSeries(source: String, x: Column, w: WindowSpec): Column =
    new Parser(strip(source), Some(w), wRowsOpt = Some(w)).parseAll(x)

  /** Compile a series→scalar UDF for the `reduce_dimension` position: the
    * same grammar with AGGREGATE functions — `sum/mean/max/min/median/sd/
    * var/prod/length(e)`, `quantile(e, p)` (literal p) — composable with
    * element-wise math on either side (`sqrt(mean(x^2))` is RMS,
    * `mean(x^2) - mean(x)^2` a population variance). Two rules keep the
    * result a valid one-pass aggregation:
    *
    *  - the series variable may only appear INSIDE an aggregate call (a
    *    bare `x` has no scalar meaning in reduce position);
    *  - aggregates cannot nest (`mean(max(x))` is meaningless over one
    *    dimension and Spark would reject it only at analysis time).
    *
    * Both violations, like everything else here, raise the typed
    * [[UdfParseError]] at parse time. R naming: `sd`/`var` are the
    * sample statistics, matching R's. */
  def compileReduce(source: String, x: Column): Column =
    new Parser(strip(source), None, reduceMode = true).parseAll(x)

  /** Can this source be compiled? (used for eager validation) */
  def supported(source: String): Boolean =
    try { compile(source, lit(0.0)); true }
    catch { case _: UdfParseError => false }

  /** [[supported]] for the series grammar. */
  def supportedSeries(source: String): Boolean =
    try {
      compileSeries(source, lit(0.0),
        Window.partitionBy(lit(0)).orderBy(lit(0)))
      true
    } catch { case _: UdfParseError => false }

  /** [[supported]] for the reduce grammar. */
  def supportedReduce(source: String): Boolean =
    try { compileReduce(source, lit(0.0)); true }
    catch { case _: UdfParseError => false }

  /** Strip function headers/braces/return down to the body expression. */
  private[compile] def strip(src0: String): String = {
    var s = src0.trim
    // R: function(args) body   |   \(args) body (R 4.1 lambda)
    val rHead = """^(?s)(?:function|\\)\s*\(([^)]*)\)\s*(.*)$""".r
    val pyHead = """^(?s)lambda\s+([^:]*):\s*(.*)$""".r
    s match {
      case rHead(_, body)  => s = body.trim
      case pyHead(_, body) => s = body.trim
      case _               =>
    }
    if (s.startsWith("{") && s.endsWith("}")) s = s.substring(1, s.length - 1).trim
    val ret = """^(?s)return\s*\((.*)\)\s*;?$""".r
    s match { case ret(inner) => s = inner.trim; case _ => }
    if (s.endsWith(";")) s = s.dropRight(1).trim
    s
  }

  private val fn1: Map[String, Column => Column] = Map(
    "sqrt" -> ((c: Column) => sqrt(c)), "abs" -> ((c: Column) => abs(c)),
    "exp" -> ((c: Column) => exp(c)),
    "log" -> ((c: Column) => log(c)), // R log(x) is natural log
    "ln" -> ((c: Column) => log(c)),
    "log10" -> ((c: Column) => log10(c)), "log2" -> ((c: Column) => log2(c)),
    "sin" -> ((c: Column) => sin(c)), "cos" -> ((c: Column) => cos(c)),
    "tan" -> ((c: Column) => tan(c)),
    "floor" -> ((c: Column) => floor(c)),
    "ceiling" -> ((c: Column) => ceil(c)), "ceil" -> ((c: Column) => ceil(c)),
    "round" -> ((c: Column) => round(c, 0)))

  private val fn2: Map[String, (Column, Column) => Column] = Map(
    "log" -> ((c: Column, b: Column) => log(c) / log(b)), // R log(x, base)
    "pow" -> ((c: Column, p: Column) => pow(c, p)),
    "pmin" -> ((a: Column, b: Column) => least(a, b)),
    "min" -> ((a: Column, b: Column) => least(a, b)),
    "pmax" -> ((a: Column, b: Column) => greatest(a, b)),
    "max" -> ((a: Column, b: Column) => greatest(a, b)))

  /** Series functions over the apply_dimension window (None = not one).
    * `w` orders by the dimension label alone (RANGE frames — label ties
    * aggregate together); `wRows` carries the deterministic secondary
    * sort key for the ROW-frame functions (see [[compileSeries]]). */
  private def seriesCall(name: String, args: Seq[Column], raw: Seq[String],
      w: WindowSpec, wRows: WindowSpec): Option[Column] = {
    def intArg(t: String): Int = t.trim.toIntOption.getOrElse(
      throw UdfParseError(s"'$name' needs a literal integer, got '${t.trim}'"))
    // RANGE frame: ties on the order key aggregate together → results are
    // deterministic even with duplicate labels (and match SQL's default
    // frame with ORDER BY)
    val range = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    (name, args.length) match {
      case ("cummax", 1) => Some(max(args(0)).over(range))
      case ("cummin", 1) => Some(min(args(0)).over(range))
      case ("cumsum", 1) => Some(sum(args(0)).over(range))
      case ("lag", 1)    => Some(lag(args(0), 1).over(wRows))
      case ("lag", 2)    => Some(lag(args(0), intArg(raw(1))).over(wRows))
      case ("lead", 1)   => Some(lead(args(0), 1).over(wRows))
      case ("lead", 2)   => Some(lead(args(0), intArg(raw(1))).over(wRows))
      case ("rollmean", 2) =>
        val k = intArg(raw(1))
        if (k < 1 || k % 2 == 0)
          throw UdfParseError(s"rollmean width must be odd positive, got $k")
        val h = (k - 1) / 2
        Some(avg(args(0)).over(wRows.rowsBetween(-h, h)))
      case _ => None
    }
  }

  private val seriesNames =
    Set("cummax", "cummin", "cumsum", "lag", "lead", "rollmean")

  private val aggNames =
    Set("sum", "mean", "max", "min", "median", "sd", "var", "prod",
      "length", "n", "quantile")

  /** Reduce-position aggregate call → aggregate Column. */
  private def aggCall(name: String, args: Seq[Column],
      raw: Seq[String]): Column = {
    def dblArg(t: String): Double = t.trim.toDoubleOption.getOrElse(
      throw UdfParseError(s"'$name' needs a literal number, got '${t.trim}'"))
    (name, args.length) match {
      case ("sum", 1)    => sum(args(0))
      case ("mean", 1)   => avg(args(0))
      case ("max", 1)    => max(args(0))
      case ("min", 1)    => min(args(0))
      // R's min/max over multiple args reduce over ALL of them:
      // min(x, 2) == min of the series and the scalar 2
      case ("max", 2)    => max(greatest(args(0), args(1)))
      case ("min", 2)    => min(least(args(0), args(1)))
      case ("median", 1) => percentile(args(0), lit(0.5))
      case ("sd", 1)     => stddev_samp(args(0))
      case ("var", 1)    => var_samp(args(0))
      case ("prod", 1)   => graft.functions.ProductAgg.product(args(0))
      case ("length", 1) | ("n", 1) => count(args(0))
      case ("quantile", 2) =>
        val p = dblArg(raw(1))
        if (p < 0 || p > 1)
          throw UdfParseError(s"quantile probability must be in [0,1], got $p")
        percentile(args(0), lit(p))
      case _ => throw UdfParseError(s"unknown aggregate '$name'/${args.length}")
    }
  }

  private final class Parser(s: String, wOpt: Option[WindowSpec],
      reduceMode: Boolean = false,
      wRowsOpt: Option[WindowSpec] = None) {
    private var i = 0
    private var seriesDepth = 0
    private var aggDepth = 0
    private var aggCount = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s(i) else '\u0000'
    private def eat(c: Char): Unit = {
      ws()
      if (peek != c) throw UdfParseError(s"expected '$c' at ${i} in '$s'")
      i += 1
    }

    def parseAll(x: Column): Column = {
      val e = expr(x); ws()
      if (i < s.length) throw UdfParseError(s"trailing input '${s.substring(i)}'")
      if (reduceMode && aggCount == 0) throw UdfParseError(
        "reduce-position UDF must contain an aggregate (sum/mean/median/...)")
      e
    }

    private def expr(x: Column): Column = {
      var left = term(x)
      var done = false
      while (!done) {
        ws()
        peek match {
          case '+' => i += 1; left = left + term(x)
          case '-' => i += 1; left = left - term(x)
          case _   => done = true
        }
      }
      left
    }

    private def term(x: Column): Column = {
      var left = factor(x)
      var done = false
      while (!done) {
        ws()
        if (peek == '*') { i += 1; left = left * factor(x) }
        else if (peek == '/') { i += 1; left = left / factor(x) }
        else if (peek == '%' && i + 1 < s.length && s(i + 1) == '%') {
          i += 2; left = pmod(left, factor(x)) // R %% is floored modulo
        } else done = true
      }
      left
    }

    private def factor(x: Column): Column = {
      ws()
      // unary minus binds LOOSER than ^ like R/Python: -x^2 = -(x^2)
      if (peek == '-') { i += 1; return -factor(x) }
      if (peek == '+') { i += 1; return factor(x) }
      val base = atom(x)
      ws()
      if (peek == '^') { i += 1; pow(base, factor(x)) } // right-assoc
      else if (peek == '*' && i + 1 < s.length && s(i + 1) == '*') {
        i += 2; pow(base, factor(x)) // Python **
      } else base
    }

    private def atom(x: Column): Column = {
      ws()
      peek match {
        case '(' => i += 1; val e = expr(x); eat(')'); e
        case c if c.isDigit || c == '.' =>
          val st = i
          while (i < s.length && (s(i).isDigit || s(i) == '.' ||
            s(i) == 'e' || s(i) == 'E' ||
            ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E'))))
            i += 1
          val text = s.substring(st, i)
          // malformed literals ('1.2.3', trailing '2e') must stay inside
          // the typed-error contract, not escape as NumberFormatException
          try lit(text.toDouble)
          catch { case _: NumberFormatException =>
            throw UdfParseError(s"malformed number literal '$text'")
          }
        case c if c.isLetter || c == '_' =>
          val st = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.'))
            i += 1
          val name = s.substring(st, i)
          ws()
          if (peek == '(') {
            i += 1
            // nested series calls would be window-in-window — reject at
            // parse time so the failure stays a typed UdfParseError, not
            // a Spark AnalysisException after acceptance
            val isSeries = wOpt.isDefined && seriesNames(name)
            if (isSeries && seriesDepth > 0) throw UdfParseError(
              s"series function '$name' cannot nest inside another series function")
            if (isSeries) seriesDepth += 1
            // reduce position: min/max/sum/… are aggregates with R
            // semantics (min(x, 2) reduces over the series AND the
            // scalar). Nested aggregates are rejected the same way nested
            // series calls are.
            val isAggName = reduceMode && aggNames(name)
            if (isAggName && aggDepth > 0) throw UdfParseError(
              s"aggregate '$name' cannot nest inside another aggregate")
            if (isAggName) aggDepth += 1
            // raw arg spans kept so series functions can demand literal
            // integer parameters (lag offset, rollmean width)
            val args = scala.collection.mutable.ArrayBuffer.empty[Column]
            val raw = scala.collection.mutable.ArrayBuffer.empty[String]
            var st2 = i; args += expr(x); raw += s.substring(st2, i)
            ws()
            while (peek == ',') {
              i += 1; st2 = i; args += expr(x); raw += s.substring(st2, i)
              ws()
            }
            eat(')')
            if (isSeries) seriesDepth -= 1
            if (isAggName) aggDepth -= 1
            if (isAggName) { aggCount += 1; aggCall(name, args.toSeq, raw.toSeq) }
            else wOpt.flatMap(w =>
              seriesCall(name, args.toSeq, raw.toSeq, w, wRowsOpt.getOrElse(w)))
              .getOrElse((args.length, fn1.get(name), fn2.get(name)) match {
                case (1, Some(f), _) => f(args(0))
                case (2, _, Some(f)) => f(args(0), args(1))
                case _ => throw UdfParseError(
                  s"unknown function '$name'/${args.length}")
              })
          } else if (name == "x" || name == "data" || name == "value") {
            if (reduceMode && aggDepth == 0) throw UdfParseError(
              s"'$name' outside an aggregate has no scalar meaning in reduce position")
            x
          }
          else if (name == "pi") lit(math.Pi)
          else throw UdfParseError(s"unknown identifier '$name'")
        case other => throw UdfParseError(s"unexpected character '$other'")
      }
    }
  }
}
