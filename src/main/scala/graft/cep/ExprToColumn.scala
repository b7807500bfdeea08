package graft.cep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Lower a condition `Expr` to a Catalyst `Column` for pre-NFA filter
  * pushdown. Only pure-attribute expressions translate (a reference to a
  * data register makes the predicate run-dependent → not pushable).
  * Attributes are compared on their long-cast values, exactly as the NFA
  * evaluates them.
  */
object ExprToColumn {

  def translate(e: Expr, spec: SparkCep.CepSpec,
      dataVars: Set[String]): Option[Column] = {
    val attrs = (spec.orderCol +: spec.attrCols).toSet
    def go(e: Expr): Option[Column] = e match {
      case Expr.Lit(v)     => Some(lit(v))
      case Expr.BoolLit(b) => Some(lit(b))
      case Expr.Ref(n) =>
        if (dataVars.contains(n) || !attrs.contains(n)) None
        else Some(col(n).cast(LongType))
      case Expr.Arith(op, l, r) =>
        for (a <- go(l); b <- go(r)) yield op match {
          case "+"  => a + b
          case "-"  => a - b
          case "*"  => a * b
          // `%` is pushed only for a positive-literal divisor, where Spark's
          // pmod equals the NFA's Math.floorMod; for a variable or negative
          // divisor they diverge (floorMod(7,-3) = -2 vs pmod(7,-3) = 1) and
          // the general ((a%b)+b)%b rewrite can overflow under ANSI where
          // floorMod would not
          case "%" => r match {
            case Expr.Lit(d) if d > 0 && d <= Long.MaxValue / 2 => pmod(a, b)
            case _ => return None
          }
          // "//" is NOT pushed down: a double-division floor diverges from
          // Math.floorDiv above 2^53, and the prefilter must never disagree
          // with the NFA evaluator
          case _ => return None
        }
      // string tier (round 16): comparison against a literal and IN
      // push as UNCAST string comparisons — the NFA compares the
      // projected string value verbatim, so the predicates agree
      // (ordering too: `Expr.strCompare` is code-point order, which is
      // UTF8String's byte order). (A NULL string attribute is dropped
      // by the filter where the NFA would raise its NameError — the
      // same relationship the numeric casts have.)
      case Expr.Cmp(op, l, r)
          if l.isInstanceOf[Expr.StrLit] || r.isInstanceOf[Expr.StrLit] =>
        for (a <- goStr(l); b <- goStr(r)) yield op match {
          case "==" => a === b
          case "!=" => a =!= b
          case "<"  => a < b
          case "<=" => a <= b
          case ">"  => a > b
          case ">=" => a >= b
          case _    => return None
        }
      case Expr.InSet(x, vs) =>
        goStr(x).map(_.isin(vs: _*))
      // `like` pushes as Spark's own like. Without ESCAPE the dialect
      // treats backslash as an ordinary literal while Spark's default
      // escape is '\\' — doubling every backslash makes Spark read each
      // as an escaped literal backslash, so backslash-containing
      // patterns push too (round 18; they used to fall to the NFA).
      // With ESCAPE, `functions.like(str, pat, esc)` implements the
      // same SQL:2016 rule `likeRegex` mirrors (escape before %/_/
      // itself only — invalid patterns were already rejected at parse
      // time), so the predicates agree exactly. Guards: an astral
      // (supplementary) code point anywhere in the pattern stays
      // NFA-only — Spark's escapeLikeRegex quotes per UTF-16 char, and
      // a separately-quoted surrogate half never matches the intact
      // code point (the engine-side regex quotes literal RUNS and is
      // correct; pushing would disagree) — and so does an astral
      // escape character (Spark's escape is a single UTF-16 char).
      case Expr.Like(x, p, esc)
          if p.codePoints().noneMatch(cp => cp > 0xFFFF) &&
            esc.forall(_.length == 1) =>
        esc match {
          case None    => goStr(x).map(_.like(p.replace("\\", "\\\\")))
          case Some(e) => goStr(x).map(c => like(c, lit(p), lit(e)))
        }
      case Expr.Cmp(op, l, r) =>
        for (a <- go(l); b <- go(r)) yield op match {
          case "==" => a === b
          case "!=" => a =!= b
          case "<"  => a < b
          case "<=" => a <= b
          case ">"  => a > b
          case ">=" => a >= b
          case _    => return None
        }
      case Expr.And(l, r) if isBool(l) && isBool(r) =>
        for (a <- go(l); b <- go(r)) yield a && b
      case Expr.Or(l, r) if isBool(l) && isBool(r) =>
        for (a <- go(l); b <- go(r)) yield a || b
      case Expr.Not(x) if isBool(x) => go(x).map(!_)
      case Expr.Neg(x)              => go(x).map(c => -c)
      case _                        => None // Python truthy-int logic: not pushable
    }
    def goStr(e: Expr): Option[Column] = e match {
      case Expr.StrLit(s) => Some(lit(s))
      case Expr.Ref(n) =>
        if (dataVars.contains(n) || !attrs.contains(n)) None
        else Some(col(n))
      case _ => None
    }
    if (isBool(e)) go(e) else None
  }

  /** Whether the expression is statically boolean-valued (Catalyst logical
    * operators require it; Python's truthy-int `and`/`or` chains are left
    * to the NFA evaluator).
    */
  private def isBool(e: Expr): Boolean = e match {
    case _: Expr.BoolLit => true
    case _: Expr.Cmp     => true
    case _: Expr.InSet   => true
    case _: Expr.Like    => true
    case Expr.And(l, r)  => isBool(l) && isBool(r)
    case Expr.Or(l, r)   => isBool(l) && isBool(r)
    case Expr.Not(x)     => isBool(x)
    case _               => false
  }
}
