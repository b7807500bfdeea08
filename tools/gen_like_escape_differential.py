#!/usr/bin/env python3
"""LIKE / LIKE ESCAPE differential corpus (round 18): random
(pattern, escape?, input) cases evaluated by DUCKDB — a real SQL
engine, the same oracle the correctness gate replays — and pinned
against the engine's `Expr.Like` (interpreted AND slot-compiled) by
`LikeEscapeDifferentialSpec`.

Domain notes, probed against duckdb 1.x:
 - Escape rule: SQL:2016 (and Spark, and this dialect) allow an escape
   character only before `%`, `_` or itself, and reject a pattern
   ENDING with it. DuckDB rejects the trailing form too ("Like pattern
   must not end with escape character") but is LENIENT on
   escape-before-ordinary-char (`'a' LIKE '!a' ESCAPE '!'` is true —
   `!a` reads as a literal `a`). Cases in that divergent class are
   emitted with kind="misplaced" and NO matches field: the spec
   asserts the ENGINE rejects them at pattern-compile time (the
   SQL:2016 side), documenting the divergence instead of comparing.
 - Without ESCAPE there is no escape character at all: backslash is an
   ordinary literal in both engines (DuckDB `'a\\b' LIKE 'a\\b'` is
   true).
 - `%`/`_` are DOTALL (cross newlines) and `_` consumes one CODE POINT
   (an astral char matches a single `_`) in both engines.

Output: src/test/resources/exprdiff/like_escape_cases.jsonl.gz with
  {"id": n, "pattern": str, "escape": str|None, "input": str,
   "kind": "ok"|"trailing"|"misplaced", "matches": bool (kind=ok only)}

Run:  python3 tools/gen_like_escape_differential.py
"""
import gzip
import json
import random
from pathlib import Path

import duckdb

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/exprdiff/like_escape_cases.jsonl.gz"

# no quote characters (the dialect's string literals have no escapes);
# astral char exercises the round-18 code-point run-quoting fix
PAT_CHARS = ["a", "b", "%", "_", "!", "\\", "é", "\U0001F600"]
IN_CHARS = ["a", "b", "x", "%", "_", "!", "\\", "\n", "é",
            "\U0001F600"]

rng = random.Random(20260818)
con = duckdb.connect()


def classify(pattern, esc):
    """SQL:2016 escape rule: 'ok', 'trailing', or 'misplaced'."""
    if esc is None:
        return "ok"
    i, n = 0, len(pattern)
    while i < n:
        if pattern[i] == esc:
            if i + 1 >= n:
                return "trailing"
            nxt = pattern[i + 1]
            if nxt not in ("%", "_", esc):
                return "misplaced"
            i += 2
        else:
            i += 1
    return "ok"


def duck_like(inp, pattern, esc):
    if esc is None:
        q = "SELECT ? LIKE ?"
        return bool(con.execute(q, [inp, pattern]).fetchone()[0])
    q = "SELECT ? LIKE ? ESCAPE ?"
    return bool(con.execute(q, [inp, pattern, esc]).fetchone()[0])


def rnd_str(chars, max_len):
    return "".join(rng.choice(chars) for _ in range(rng.randrange(max_len)))


def derive_input(pattern, esc):
    """An input the pattern SHOULD match (positives are vanishingly
    rare between independent random strings): wildcards replaced by
    random filler, escaped tokens by their literals. Occasionally
    perturbed afterwards, so derived cases stay two-sided."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if esc is not None and c == esc and i + 1 < n:
            out.append(pattern[i + 1])
            i += 2
        elif c == "%":
            out.append(rnd_str(IN_CHARS, 4))
            i += 1
        elif c == "_":
            out.append(rng.choice(IN_CHARS))
            i += 1
        else:
            out.append(c)
            i += 1
    s = "".join(out)
    if rng.random() < 0.3:  # perturb: may or may not still match
        s = s + rng.choice(IN_CHARS) if rng.random() < 0.5 else s[:-1]
    return s


def main():
    OUT.parent.mkdir(parents=True, exist_ok=True)
    n_ok = n_trail = n_mis = n_true = 0
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        for i in range(3000):
            pattern = rnd_str(PAT_CHARS, 8)
            esc = "!" if rng.random() < 0.6 else None
            inp = (derive_input(pattern, esc)
                   if rng.random() < 0.35 and classify(pattern, esc) == "ok"
                   else rnd_str(IN_CHARS, 9))
            kind = classify(pattern, esc)
            case = {"id": i, "pattern": pattern, "escape": esc,
                    "input": inp, "kind": kind}
            if kind == "ok":
                case["matches"] = duck_like(inp, pattern, esc)
                n_ok += 1
                n_true += case["matches"]
            elif kind == "trailing":
                n_trail += 1
            else:
                n_mis += 1
            f.write(json.dumps(case, ensure_ascii=False) + "\n")
    print(f"wrote {OUT}: ok={n_ok} (true={n_true}) "
          f"trailing={n_trail} misplaced={n_mis}")
    assert n_ok > 1500 and n_true > 150 and n_trail > 50 and n_mis > 200


if __name__ == "__main__":
    main()
