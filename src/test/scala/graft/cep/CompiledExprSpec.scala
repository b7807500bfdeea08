package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Differential gate for the slot-compiled evaluator ([[CompiledExpr]])
  * against the interpreter (`Expr.evalNumIn`) over the same 5,000-case
  * Python-eval corpus as `ExprDifferentialSpec` — value equality AND
  * error-ness equality (same NameError/arith-error raising), under
  * every binding scenario the NFA can produce:
  *
  *   1. registers only (ε evaluations: event = null);
  *   2. event attrs under a MATCHING bound layout (the fast path);
  *   3. event attrs under a WRONG bound layout (guard miss → generic
  *      fallback must stay exact);
  *   4. bound layout but an event that lacks the attrs (slot out of
  *      range / name mismatch → register fallback);
  *   5. env split across attrs and registers;
  *   6. a name bound in BOTH attrs and registers — attrs must shadow
  *      (the `{**env, **attrs}` merge of the reference).
  */
class CompiledExprSpec extends AnyFunSuite {

  private def loadCases(): Iterator[(Int, String, Map[String, Long])] = {
    val in = getClass.getResourceAsStream("/exprdiff/cases.jsonl.gz")
    require(in != null, "expr corpus missing — run tools/gen_expr_differential.py")
    val gz = new java.util.zip.GZIPInputStream(in)
    scala.io.Source.fromInputStream(gz, "UTF-8").getLines().map { line =>
      val j = JsonMethods.parse(line)
      val JInt(id) = (j \ "id"): @unchecked
      val JString(expr) = (j \ "expr"): @unchecked
      val env = (j \ "env") match {
        case JObject(fields) => fields.map {
          case (k, JInt(v)) => k -> v.toLong
          case other        => fail(s"bad env $other")
        }.toMap
        case _ => Map.empty[String, Long]
      }
      (id.toInt, expr, env)
    }
  }

  /** Error key: exact message for the engine's own EvalException
    * (NameError wording must match); class name only for VM-thrown
    * arithmetic errors, whose message the JIT's fast-throw
    * optimization (OmitStackTraceInFastThrow) nulls out once the
    * throwing site is hot — message equality there would be flaky.
    */
  private def errKey(ex: Exception): String = ex match {
    case ee: Expr.EvalException => s"EvalException:${ee.getMessage}"
    case other                  => other.getClass.getSimpleName
  }

  /** Interpreter verdict: Right(value) or Left(error key). */
  private def interp(e: Expr, attrs: Map[String, Long],
      eta: Map[String, Long]): Either[String, Long] =
    try Right(Expr.evalNumIn(e, Expr.env(attrs, eta)))
    catch { case ex: Exception => Left(errKey(ex)) }

  private def comp(c: CompiledExpr.CExpr, ev: Event,
      eta: Map[String, Long]): Either[String, Long] =
    try Right(CompiledExpr.eval(c, ev, eta))
    catch { case ex: Exception => Left(errKey(ex)) }

  test("compiled == interpreted over the corpus, all binding scenarios") {
    var n = 0
    var checked = 0L
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def check(id: Int, tag: String, want: Either[String, Long],
        got: Either[String, Long]): Unit = {
      checked += 1
      if (want != got && failures.length < 5)
        failures += s"case $id [$tag]: want=$want got=$got"
    }
    loadCases().foreach { case (id, exprStr, env) =>
      n += 1
      val parsed =
        try Some(Expr.parse(exprStr)) catch { case _: Exception => None }
      parsed.foreach { e =>
        val names = env.keys.toVector.sorted
        // 1. registers only, no layout (ε path)
        check(id, "eta-only", interp(e, Map.empty, env),
          comp(CompiledExpr.compile(e, null), null, env))
        // 2. attrs under a matching layout
        val ev = Event("t", names.map(k => k -> env(k)))
        check(id, "attrs-matched", interp(e, ev.attrMap, Map.empty),
          comp(CompiledExpr.compile(e, names), ev, Map.empty))
        // 3. attrs under a WRONG layout (reversed + a bogus head slot)
        val wrong = ("__bogus__" +: names.reverse)
        check(id, "attrs-wrong-layout", interp(e, ev.attrMap, Map.empty),
          comp(CompiledExpr.compile(e, wrong), ev, Map.empty))
        // 4. layout bound but the event has no attrs — register fallback
        val bare = Event("t", Vector.empty)
        check(id, "guard-miss-to-eta", interp(e, Map.empty, env),
          comp(CompiledExpr.compile(e, names), bare, env))
        // 5. env split across attrs and registers
        val (aPart, ePart) = names.splitAt(names.length / 2)
        val evSplit = Event("t", aPart.map(k => k -> env(k)))
        val etaSplit = ePart.map(k => k -> env(k)).toMap
        check(id, "split", interp(e, evSplit.attrMap, etaSplit),
          comp(CompiledExpr.compile(e, aPart), evSplit, etaSplit))
        // 6. shadowing: every name also in eta with a different value;
        // attrs must win in both paths
        val etaShadow = env.map { case (k, v) => k -> (v + 1000L) }
        check(id, "shadow", interp(e, ev.attrMap, etaShadow),
          comp(CompiledExpr.compile(e, names), ev, etaShadow))
      }
    }
    assert(failures.isEmpty,
      s"diverged:\n${failures.mkString("\n")}")
    info(s"$n corpus cases x 6 scenarios = $checked checks, all equal")
  }

  test("bound predicates keep exact semantics on layout-mismatched events") {
    // a compiled DST evaluated against events whose layout differs from
    // the declared schema (attrs permuted + an extra attr) must match
    // the pure interpreter run (Pred falls back through the slot guard)
    val schema = Vector("purchase" -> Vector("event_id", "value"))
    val q = CepQuery(
      Pattern.lpat("a", "purchase", "value < 40", Contiguity.Relaxed, 2, 2),
      schema)
    val events = (0 until 200).map { i =>
      // permuted layout with a leading extra attr: slot guesses all miss
      Event("purchase", Vector("extra" -> -1L, "value" -> (i * 37 % 100).toLong,
        "event_id" -> i.toLong))
    }
    val got = CepOperator.run(q, events)
    // reference interpreter result: strip the bindings by rebuilding the
    // DST and nulling every compiled form
    val dst = DstCompiler.compile(q)
    dst.delta.foreach { t => t.p.compiled = null; t.alpha.compiled = null }
    val ex = new Executor(dst, q.strategy)
    ex.reset()
    val want = events.flatMap(ex.feed)
    assert(got == want.toVector)
    assert(got.nonEmpty)
  }
}
