package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's expression/matcher DSL (its "expression IR"), re-expressed
  * as config → Spark `Column` compilation.
  *
  * Semantics follow /root/reference/src/MEDS_transforms/parser.py:
  *  - matcher_to_expr (parser.py:85-147): conjunction of per-column tests —
  *    equality, {present: bool} null test, {regex: pat} unanchored search.
  *  - cfg_to_expr (parser.py:358-619): column refs, "f-string" interpolation,
  *    literals, regex group extraction, coalescing lists, and conditional
  *    (when/then) expressions.
  *
  * Every compiled expression also reports the set of input columns it needs,
  * used by stages for input validation — and it is exactly what lets Catalyst
  * prune the parquet scan to only those columns at 100 TB.
  */
object Dsl {
  import Cfg._

  /** Polars-parity edge case: `regexp_extract` in Spark returns "" when the
    * pattern does not match; Polars' `str.extract` returns null. Null is the
    * contract (parser.py doctest: extract "([ac]).*" over ["a","b","c"] →
    * ['a', None, 'c']). A NON-PARTICIPATING group (e.g. "a(b)?c" on "ac")
    * also yields "" in Spark but null in Polars — the length guard maps it
    * to null too (at the cost of conflating a genuinely empty participating
    * match, which no reference config produces).
    */
  def extractOrNull(c: Column, pattern: String, groupIdx: Int): Column = {
    val extracted = regexp_extract(c, pattern, groupIdx)
    when(c.rlike(pattern) && length(extracted) > 0, extracted)
  }

  /** Interpolation pattern for "bar//{foo}" strings (parser.py:622). */
  private val InterpRegex = """\{([^{}]+)\}""".r

  def isInterpolated(s: String): Boolean = InterpRegex.findFirstIn(s).isDefined

  /** `pl.format`-equivalent: literal segments concatenated with column refs,
    * null-propagating (concat in Spark is null-intolerant, matching Polars).
    */
  def interpolate(s: String): (Column, Set[String]) = {
    val cols = InterpRegex.findAllMatchIn(s).map(_.group(1)).toSeq
    val segments = InterpRegex.pattern.split(s, -1) // literal parts around the {...}s
    val parts = new scala.collection.mutable.ArrayBuffer[Column]
    for (i <- segments.indices) {
      if (segments(i).nonEmpty) parts += lit(segments(i))
      if (i < cols.length) parts += col(cols(i)).cast("string")
    }
    val e = if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
    (e, cols.toSet)
  }

  // ---- matchers ---------------------------------------------------------

  /** Validate a matcher config: a map of column → (scalar | {present: bool}
    * | {regex: str}).
    */
  def isMatcher(cfg: Cfg): Boolean = cfg match {
    case M(m) =>
      m.values.forall {
        case M(v) =>
          v.size == 1 && (v.get("regex").exists(_.isInstanceOf[S]) ||
            v.get("present").exists(_.isInstanceOf[B]))
        case _: L | _: M => false
        case _ => true
      }
    case _ => false
  }

  /** matcher → boolean Column (conjunction; empty matcher matches all). */
  def matcherToExpr(cfg: Cfg): (Column, Set[String]) = cfg match {
    case M(m) =>
      val exprs = m.map {
        case (k, M(v)) if v.contains("present") =>
          // parser.py:138-141 rejects non-boolean present values; a silent
          // fallback would compile the INVERTED test
          v("present") match {
            case B(true) => col(k).isNotNull
            case B(false) => col(k).isNull
            case other => throw new IllegalArgumentException(
              s"matcher {$k: {present: ...}} needs a boolean, got $other")
          }
        case (k, M(v)) => v.get("regex") match {
          case Some(S(pat)) => col(k).rlike(pat)
          case _ => throw new IllegalArgumentException(
            s"bad matcher map for $k: expected {present: bool} or {regex: str}, got $v")
        }
        case (k, S(s)) => col(k) === lit(s)
        case (k, I(i)) => col(k) === lit(i)
        case (k, D(d)) => col(k) === lit(d)
        case (k, B(b)) => col(k) === lit(b)
        // reference parity (pl.col(k) == None): a null scalar compares to
        // null for every row, i.e. matches NOTHING under filter — a null
        // test is spelled {present: false}
        case (k, Null) => col(k) === lit(null)
        case (k, v) => throw new IllegalArgumentException(s"bad matcher value for $k: $v")
      }.toSeq
      (exprs.reduceOption(_ && _).getOrElse(lit(true)), m.keySet.toSet)
    case other => throw new IllegalArgumentException(s"Matcher must be a map. Got $other")
  }

  // ---- column expressions ----------------------------------------------

  private def litOf(c: Cfg): Column = c match {
    case S(s) => lit(s)
    case I(i) => lit(i)
    case D(d) => lit(d)
    case B(b) => lit(b)
    case L(xs) => array(xs.map(litOf): _*)
    case Null => lit(null)
    case m: M => throw new IllegalArgumentException(s"cannot make a literal of a map: $m")
  }

  private val exprTypeKeys = Set("col", "str", "literal", "extract")

  /** Whether a single-entry map is a WELL-FORMED expr-type config; malformed
    * shapes (e.g. a column literally named "extract" with a matcher value)
    * fall through to the simple-form-conditional branch, like parser.py's
    * ColExprType.is_valid fallback.
    */
  private def exprShapeOk(kv: (String, Cfg)): Boolean = kv match {
    case ("col", S(_)) | ("str", S(_)) | ("literal", _) => true
    // keys present AND string-typed — a mis-typed from/regex must fall
    // through to the fallback branches (and their typed error), not surface
    // as a raw ClassCastException from the compile path
    case ("extract", M(e)) =>
      e.get("from").exists(_.isInstanceOf[S]) && e.get("regex").exists(_.isInstanceOf[S])
    case _ => false
  }

  /** cfg_to_expr: compile any column-expression config to a Column plus the
    * set of input columns it reads.
    */
  def colExpr(cfg: Cfg): (Column, Set[String]) = cfg match {
    case S(s) if isInterpolated(s) => interpolate(s)
    case S(s) => (col(s), Set(s))
    case L(xs) => // coalescing list: first non-null
      require(xs.nonEmpty,
        "empty coalescing list in column-expression config (an empty [] value)")
      val compiled = xs.map(colExpr)
      (coalesce(compiled.map(_._1): _*), compiled.flatMap(_._2).toSet)
    case M(m) if m.keySet == Set("output", "matcher") =>
      val (cond, mcols) = matcherToExpr(m("matcher"))
      val (out, ocols) = colExpr(m("output"))
      (when(cond, out), mcols ++ ocols)
    case M(m) if m.size == 1 && exprTypeKeys.contains(m.head._1) && exprShapeOk(m.head) =>
      m.head match {
        case ("col", S(s)) => (col(s), Set(s))
        case ("str", S(s)) => interpolate(s)
        case ("literal", v) => (litOf(v), Set.empty)
        case ("extract", M(e)) =>
          val from = e("from").asInstanceOf[S].v
          val pat = e("regex").asInstanceOf[S].v
          val gi = e.get("group_index").map {
            case I(i) => i.toInt
            case D(d) => d.toInt // YAML→JSON round-trips often float ints
            case other => throw new IllegalArgumentException(
              s"extract.group_index must be an integer, got $other")
          }.getOrElse(1)
          (extractOrNull(col(from), pat, gi), Set(from))
        case (k, v) => throw new IllegalArgumentException(s"bad col expr {$k: $v}")
      }
    case M(m) if m.size == 1 && isMatcher(m.head._2) =>
      // simple-form conditional: {outputExpr: matcher}
      val (cond, mcols) = matcherToExpr(m.head._2)
      val (out, ocols) = colExpr(S(m.head._1))
      (when(cond, out), mcols ++ ocols)
    case other => throw new IllegalArgumentException(s"bad column expression config: $other")
  }
}
