#!/usr/bin/env python3
"""STRING-TIER expression differential corpus (round 17): random
expressions mixing the numeric grammar with string-typed atoms —
`host <cmp> '<lit>'` (all six comparators; Python compares str by CODE
POINT, exactly the engine's `Expr.strCompare`), `'<lit>' <cmp> host`,
and `host [not] in ('<l1>', '<l2>', ...)` — evaluated by PYTHON eval
(the reference's path) against deterministic environments carrying one
string variable.

Constraints that keep the corpus inside the SHARED semantics (the
engine's literal-side typing rule is a documented deviation from
Python where they disagree, so those shapes are excluded):
 - `host` appears ONLY opposite a string literal or inside an in-list
   (a bare `host` leaf, `host == price`, or `price == 'a'` would give
   Python truthiness/False where the engine raises);
 - in-lists have >= 2 elements (Python renders `('a')` as a plain
   string — substring membership, not set membership);
 - string literals contain no quote/backslash/newline (neither grammar
   escapes them identically).
 - `like` is NOT in the corpus — Python has no analog; its oracle is
   the greedy-matcher model differential in `ExprStringOrderLikeSpec`.

Output: src/test/resources/exprdiff/str_cases.jsonl.gz with lines
  {"id": n, "expr": str, "env": {name: int}, "strenv": {name: str},
   "value": int, "truthy": bool, "error": bool}

Run:  python3 tools/gen_str_expr_differential.py
"""
import gzip
import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/exprdiff/str_cases.jsonl.gz"

NAMES = ["price", "x1"]
SNAME = "host"
CMPS = ["==", "!=", "<", "<=", ">", ">="]
ARITH = ["+", "-", "*", "%", "//"]
# includes '' (prefix edge), multi-byte BMP chars and an ASTRAL char —
# Python compares by code point, the engine by Expr.strCompare (UTF-8
# byte order == code-point order), so these must agree
STRS = ["a.com", "b.com", "a", "b", "", "zz", "a b", "é", "中", "😀",
        "a.como", "b!"]
LIMIT = 1 << 62

rng = random.Random(20260816)


class Overflow(Exception):
    pass


class EvalErr(Exception):
    pass


def gen_num(depth, allow_cmp=True):
    r = rng.random()
    if depth <= 0 or r < 0.3:
        k = rng.random()
        if k < 0.5:
            return ("lit", rng.randint(0, 60))
        if k < 0.9:
            return ("name", rng.choice(NAMES))
        return ("bool", rng.random() < 0.5)
    if r < 0.55:
        return ("arith", rng.choice(ARITH),
                gen_num(depth - 1, allow_cmp), gen_num(depth - 1, allow_cmp))
    if r < 0.75 and allow_cmp:
        return ("cmp", rng.choice(CMPS),
                gen_num(depth - 1, False), gen_num(depth - 1, False))
    return ("neg", gen_num(depth - 1, False))


def gen_str_atom():
    r = rng.random()
    if r < 0.6:
        lit = ("slit", rng.choice(STRS))
        ref = ("sname", SNAME)
        if rng.random() < 0.5:
            return ("scmp", rng.choice(CMPS), ref, lit)
        return ("scmp", rng.choice(CMPS), lit, ref)
    vals = rng.sample(STRS, rng.randint(2, 4))
    node = ("sin", SNAME, vals)
    if r < 0.8:
        return node
    return ("notin", SNAME, vals)


def gen(depth):
    r = rng.random()
    if depth <= 0:
        return gen_str_atom() if rng.random() < 0.6 else \
            gen_num(1, allow_cmp=True)
    if r < 0.35:
        return gen_str_atom()
    if r < 0.55:
        return ("andor", rng.choice(["and", "or"]),
                gen(depth - 1), gen(depth - 1))
    if r < 0.7:
        return ("not", gen(depth - 1))
    return gen_num(depth, allow_cmp=True)


PREC = {"or": 1, "and": 2, "not": 3, "cmp": 4, "add": 5, "mul": 6,
        "neg": 7, "atom": 8}


def prec(node):
    t = node[0]
    if t in ("lit", "name", "bool", "slit", "sname"):
        return PREC["atom"]
    if t == "arith":
        return PREC["add"] if node[1] in "+-" else PREC["mul"]
    if t in ("cmp", "scmp", "sin", "notin"):
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
    elif t == "name" or t == "sname":
        s = node[1]
    elif t == "bool":
        s = "True" if node[1] else "False"
    elif t == "slit":
        s = "'" + node[1] + "'"
    elif t == "arith":
        p = prec(node)
        s = "{} {} {}".format(render(node[2], p), node[1],
                              render(node[3], p + 1))
    elif t in ("cmp", "scmp"):
        p = prec(node)
        s = "{} {} {}".format(render(node[2], p + 1), node[1],
                              render(node[3], p + 1))
    elif t == "sin":
        s = "{} in ({})".format(node[1],
                                ", ".join("'" + v + "'" for v in node[2]))
    elif t == "notin":
        s = "{} not in ({})".format(
            node[1], ", ".join("'" + v + "'" for v in node[2]))
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


def main():
    OUT.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        while n < 3000:
            node = gen(rng.randint(1, 3))
            env = {nm: rng.choice([-7, -1, 0, 1, 3, 11])
                   for nm in rng.sample(NAMES, rng.randint(0, len(NAMES)))}
            # host present ~85% of the time (absence = engine NameError
            # == python NameError)
            strenv = {SNAME: rng.choice(STRS)} \
                if rng.random() < 0.85 else {}
            expr = render(node)
            case = {"id": n, "expr": expr, "env": env, "strenv": strenv}
            try:
                pv = eval(compile(expr, "<e>", "eval"),
                          {**env, **strenv, "__builtins__": None})
                if isinstance(pv, str):
                    # a bare-string result has no engine value shape —
                    # the generator never produces one (string atoms
                    # are comparisons), so this is a generator bug
                    raise AssertionError((expr, pv))
                if not isinstance(pv, bool) and abs(pv) > LIMIT:
                    continue
                case["value"] = int(pv)
                case["truthy"] = bool(pv)
                case["error"] = False
            except AssertionError:
                raise
            except Exception:
                case["error"] = True
            f.write(json.dumps(case, ensure_ascii=False) + "\n")
            n += 1
    print(f"wrote {n} cases to {OUT}")


if __name__ == "__main__":
    main()
