#!/usr/bin/env python3
"""Differential-corpus generator: enumerate the pattern-shape cross-product
(the same shape families the reference's exp harness validates against real
FlinkCEP — SURVEY.md par.5), run each case through the REFERENCE engine at
/root/reference as the oracle, and emit JSONL consumed by DifferentialSpec.

Output: src/test/resources/differential/cases.jsonl.gz with lines
  {"id": n, "query": <yaml str>, "input": [[name, price], ...],
   "expected": <python repr of the reference MatchStream>}

Run:  python3 tools/gen_differential.py
"""
import gzip
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402

from reflinkcep.ast import Query  # noqa: E402
from reflinkcep.compile import compile as ref_compile  # noqa: E402
from reflinkcep.event import Event  # noqa: E402
from reflinkcep.operator import CEPOperator  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/differential/cases.jsonl.gz"

SPAT = {"type": "spat", "name": "ps", "event": "e",
        "cndt": {"expr": "name == 1"}}

CONTIGUITIES = ["strict", "relaxed", "nd-relaxed"]
STRATEGIES = ["NoSkip", "SkipToNext", "SkipPastLastEvent"]

INPUTS = [
    # base stream of the differential harness, and the division variant
    # with event 6 swapped to type c (name 3) so `until: name == 3` fires
    [(1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (2, 2), (1, 0), (2, 5), (1, 8)],
    [(1, 0), (2, 5), (1, 0), (2, 2), (1, 0), (3, 2), (1, 0), (2, 5), (1, 8)],
]


def lpat_variants():
    cndts = [
        {"cndt": {"expr": "name == 2"}},
        {"cndt": {"expr": "z1 + price <= 10"},
         "variables": {"z1": {"update": "z1 + price", "initial": 0}}},
        # two interacting registers: running sum + take count, both read
        # by the condition (multi-register fold coverage)
        {"cndt": {"expr": "z1 + price <= 12 and z2 < 3"},
         "variables": {"z1": {"update": "z1 + price", "initial": 0},
                       "z2": {"update": "z2 + 1", "initial": 0}}},
    ]
    base = {"name": "pl", "event": "e"}
    for cndt in cndts:
        for theta in CONTIGUITIES:
            for n, m in [(0, 3), (1, 3), (3, 3)]:
                yield {**base, **cndt, "type": "lpat",
                       "loop": {"contiguity": theta, "from": n, "to": m}}
            for until in [{}, {"until": {"expr": "name == 3"}}]:
                for n in [0, 1]:
                    yield {**base, **cndt, "type": "lpat-inf",
                           "loop": {"contiguity": theta, "from": n}, **until}


def group_variants():
    yield {"type": "gpat"}
    for n, m in [(0, 3), (1, 3), (3, 3)]:
        yield {"type": "gpat-times", "loop": {"from": n, "to": m}}
    for until in [{}, {"until": {"expr": "name == 3"}}]:
        for n in [0, 1]:
            yield {"type": "gpat-inf", "loop": {"from": n}, **until}


def tiny_group_variants():
    yield {"type": "gpat"}
    yield {"type": "gpat-times", "loop": {"from": 0, "to": 3}}
    yield {"type": "gpat-inf", "loop": {"from": 1}}


def asts():
    lpats = list(lpat_variants())
    # division "no-gpat": spat ⊕θ lpat
    for lp, theta in itertools.product(lpats, CONTIGUITIES):
        yield {"type": "combine", "contiguity": theta,
               "left": SPAT, "right": lp}
    # division "gpat-single": group(lpat)
    for lp, g in itertools.product(lpats, group_variants()):
        yield {"child": lp, **g}
    # division "gpat-combine": group(spat ⊕θ lpat)
    for lp, theta in itertools.product(lpats, CONTIGUITIES):
        child = {"type": "combine", "contiguity": theta,
                 "left": SPAT, "right": lp}
        for g in group_variants():
            yield {"child": child, **g}
    # division "gpat-combine-gpat": combine whose RIGHT side is itself a
    # group, optionally wrapped in an outer group — exercises ε-chained
    # boundaries into sub-automata. Relaxed combine with a group right side
    # is rejected by the reference (KeyError on right_ast["event"]) and the
    # runner below skips those identically.
    for lp, inner, theta in itertools.product(
            lpats, tiny_group_variants(), CONTIGUITIES):
        comb = {"type": "combine", "contiguity": theta,
                "left": SPAT, "right": {"child": lp, **inner}}
        yield comb
        for outer in tiny_group_variants():
            yield {"child": comb, **outer}
    # combine with a group on the LEFT (all contiguities valid: boundary
    # ignore edges only inspect the right head, which is a spat here)
    for lp, inner, theta in itertools.product(
            lpats, tiny_group_variants(), CONTIGUITIES):
        yield {"type": "combine", "contiguity": theta,
               "left": {"child": lp, **inner}, "right": SPAT}


def main():
    OUT.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    skipped = 0
    with gzip.open(OUT, "wt") as f:
        def emit(qdict, typed_input):
            nonlocal n, skipped
            qyaml = yaml.dump(qdict)
            events = [Event(t, {"id": i + 1, "name": nm, "price": pr})
                      for i, (t, nm, pr) in enumerate(typed_input)]
            try:
                op = CEPOperator.from_query(Query.from_dict(qdict))
                expected = repr(op << events)
            except Exception:  # reference itself rejects the shape
                skipped += 1
                return
            f.write(json.dumps({
                "id": n, "query": qyaml,
                "input": [list(e) for e in typed_input],
                "expected": expected}) + "\n")
            n += 1

        for ast in asts():
            for strategy in STRATEGIES:
                qdict = {"type": "Query", "patseq": ast,
                         "context": {"strategy": strategy,
                                     "schema": {"e": ["id", "name", "price"]}}}
                for inp in INPUTS:
                    emit(qdict, [("e", nm, pr) for nm, pr in inp])

        # multi-type schema division: a second event type `f` in the schema
        # (and in the stream) exercises the per-event-type relaxed ignore
        # edges (`for e in schema if e != ev`) that single-type cases never
        # generate. Shapes: the no-gpat combine division.
        lpats = list(lpat_variants())
        multi_input = [("e", 1, 0), ("f", 9, 1), ("e", 2, 5), ("e", 1, 0),
                       ("f", 9, 2), ("e", 2, 2), ("e", 1, 0), ("e", 2, 2),
                       ("e", 3, 0), ("e", 1, 8)]
        multi_asts = itertools.chain(
            ({"type": "combine", "contiguity": theta, "left": SPAT,
              "right": lp}
             for lp, theta in itertools.product(lpats, CONTIGUITIES)),
            # groups too: relaxed other-type ignore edges inside group copies
            ({"child": lp, **g}
             for lp, g in itertools.product(lpats, group_variants())))
        for ast in multi_asts:
            for strategy in STRATEGIES:
                qdict = {"type": "Query", "patseq": ast,
                         "context": {"strategy": strategy,
                                     "schema": {
                                         "e": ["id", "name", "price"],
                                         "f": ["id", "name", "price"]}}}
                emit(qdict, multi_input)
    print(f"wrote {n} cases to {OUT} (skipped {skipped})")


if __name__ == "__main__":
    main()
