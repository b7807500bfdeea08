#!/usr/bin/env python3
"""Expression-language differential corpus: random expressions from the
condition grammar (SURVEY.md par.1.3 — int literals, identifiers,
comparisons, + - * % //, and/or/not, parentheses, True/False, unary minus)
evaluated by PYTHON eval semantics — the reference's evaluation path
(/root/reference/reflinkcep/DST.py:84-89) — against deterministic integer
environments.

Generation rules keep the corpus inside the shared grammar:
 - comparison operands never contain a bare comparison (Python would
   chain `a < b < c`; the engine grammar, like the observed corpus,
   has single comparisons);
 - cases whose evaluation touches an intermediate outside +/-2^62 are
   dropped (Python has big ints; the engine is 64-bit).

Output: src/test/resources/exprdiff/cases.jsonl.gz with lines
  {"id": n, "expr": <str>, "env": {name: int, ...},
   "value": <int>, "truthy": <bool>, "error": <bool>}

Run:  python3 tools/gen_expr_differential.py
"""
import gzip
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/exprdiff/cases.jsonl.gz"

NAMES = ["price", "name", "x1", "z1"]
CMPS = ["==", "!=", "<", "<=", ">", ">="]
ARITH = ["+", "-", "*", "%", "//"]
LIMIT = 1 << 62

rng = random.Random(20260812)


class Overflow(Exception):
    pass


class EvalErr(Exception):
    pass


# node: ("lit", v) | ("name", s) | ("bool", b) | ("arith", op, l, r)
#       | ("cmp", op, l, r) | ("andor", op, l, r) | ("not", x) | ("neg", x)

def gen(depth, allow_cmp=True):
    r = rng.random()
    if depth <= 0 or r < 0.25:
        k = rng.random()
        if k < 0.45:
            return ("lit", rng.randint(0, 60))
        if k < 0.85:
            return ("name", rng.choice(NAMES))
        return ("bool", rng.random() < 0.5)
    if r < 0.45:
        return ("arith", rng.choice(ARITH),
                gen(depth - 1, allow_cmp), gen(depth - 1, allow_cmp))
    if r < 0.65 and allow_cmp:
        # comparison operands must not contain a bare comparison
        return ("cmp", rng.choice(CMPS),
                gen(depth - 1, False), gen(depth - 1, False))
    if r < 0.78:
        return ("andor", rng.choice(["and", "or"]),
                gen(depth - 1, allow_cmp), gen(depth - 1, allow_cmp))
    if r < 0.86:
        return ("not", gen(depth - 1, allow_cmp))
    if r < 0.93:
        return ("neg", gen(depth - 1, False))
    return gen(depth - 1, allow_cmp)


PREC = {"or": 1, "and": 2, "not": 3, "cmp": 4, "add": 5, "mul": 6, "neg": 7,
        "atom": 8}


def prec(node):
    t = node[0]
    if t in ("lit", "name", "bool"):
        return PREC["atom"]
    if t == "arith":
        return PREC["add"] if node[1] in "+-" else PREC["mul"]
    if t == "cmp":
        return PREC["cmp"]
    if t == "andor":
        return PREC[node[1]]
    if t == "not":
        return PREC["not"]
    return PREC["neg"]


def render(node, parent_prec=0):
    t = node[0]
    if t == "lit":
        s = str(node[1])
    elif t == "name":
        s = node[1]
    elif t == "bool":
        s = "True" if node[1] else "False"
    elif t == "arith":
        p = prec(node)
        s = "{} {} {}".format(render(node[2], p), node[1],
                              render(node[3], p + 1))
    elif t == "cmp":
        p = prec(node)
        s = "{} {} {}".format(render(node[2], p + 1), node[1],
                              render(node[3], p + 1))
    elif t == "andor":
        p = prec(node)
        s = "{} {} {}".format(render(node[2], p), node[1],
                              render(node[3], p + 1))
    elif t == "not":
        s = "not {}".format(render(node[1], PREC["not"]))
    else:
        s = "-{}".format(render(node[1], PREC["neg"]))
    if prec(node) < parent_prec:
        s = "(" + s + ")"
    return s


def check(v):
    if isinstance(v, bool):
        return v
    if abs(v) > LIMIT:
        raise Overflow()
    return v


def ev(node, env):
    t = node[0]
    if t == "lit":
        return node[1]
    if t == "bool":
        return node[1]
    if t == "name":
        if node[1] not in env:
            raise EvalErr()
        return env[node[1]]
    if t == "arith":
        a = int(ev(node[2], env))
        b = int(ev(node[3], env))
        op = node[1]
        if op in ("%", "//") and b == 0:
            raise EvalErr()
        if op == "+":
            return check(a + b)
        if op == "-":
            return check(a - b)
        if op == "*":
            return check(a * b)
        if op == "%":
            return check(a % b)
        return check(a // b)
    if t == "cmp":
        a = ev(node[2], env)
        b = ev(node[3], env)
        op = node[1]
        return {"==": a == b, "!=": a != b, "<": a < b,
                "<=": a <= b, ">": a > b, ">=": a >= b}[op]
    if t == "andor":
        a = ev(node[2], env)
        if node[1] == "and":
            return a if not a else ev(node[3], env)
        return a if a else ev(node[3], env)
    if t == "not":
        return not ev(node[1], env)
    return check(-int(ev(node[1], env)))


def main():
    OUT.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    dropped = 0
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        i = 0
        while n < 5000:
            i += 1
            node = gen(rng.randint(1, 4))
            env = {nm: rng.choice([-7, -3, -1, 0, 1, 2, 3, 5, 11, 40])
                   for nm in rng.sample(NAMES, rng.randint(0, len(NAMES)))}
            expr = render(node)
            # sanity: the rendered string round-trips through Python eval
            # with identical semantics (validates the renderer itself)
            case = {"id": n, "expr": expr, "env": env}
            try:
                v = ev(node, env)
                pv = eval(compile(expr, "<e>", "eval"),
                          {**env, "__builtins__": None})
                assert (pv == v and isinstance(pv, bool) == isinstance(
                    v, bool)), (expr, env, v, pv)
                case["value"] = int(v)
                case["truthy"] = bool(v)
                case["error"] = False
            except Overflow:
                dropped += 1
                continue
            except EvalErr:
                # confirm python also raises
                try:
                    eval(compile(expr, "<e>", "eval"),
                         {**env, "__builtins__": None})
                except Exception:
                    pass
                else:
                    raise AssertionError((expr, env))
                case["error"] = True
            f.write(json.dumps(case) + "\n")
            n += 1
    print(f"wrote {n} cases ({dropped} overflow-dropped) to {OUT}")


if __name__ == "__main__":
    main()
