#!/usr/bin/env python3
"""Long-stream differential corpus: sample pattern shapes from the same
cross-product families as tools/gen_differential.py, but drive them with
100-1,000-event generated inputs instead of the reference harness's 9-event
toy streams. Covers epsilon-once/skip/until interactions that only appear
when runs survive long noise gaps: relaxed ignore-edge traversal across
hundreds of events, until-scan over long windows, skip-strategy pruning of
large live-run sets.

Inputs are seeded-RNG streams over the same event vocabulary (name 1 =
spat trigger, name 2 = loop body, name 3 = until trigger, name 9 = noise
matching no condition). Two composition modes per stream: SPARSE (relevant
events scattered through noise — exercises relaxed/nd-relaxed run
retention) and BURST (relevant events in contiguous clusters — exercises
strict contiguity on long streams). Match-count explosion is bounded by
the relevant-event budget (10-30 per stream), a per-case wall timeout, and
an expected-repr size cap; skipped cases are counted and reported.

Output: src/test/resources/differential/cases_long.jsonl.gz, the same
JSONL schema as cases.jsonl.gz (consumed by LongStreamDifferentialSpec).

Run:  python3 tools/gen_differential_long.py
"""
import gzip
import json
import random
import signal
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402

from reflinkcep.ast import Query  # noqa: E402
from reflinkcep.event import Event  # noqa: E402
from reflinkcep.operator import CEPOperator  # noqa: E402

from gen_differential import asts, lpat_variants, group_variants, \
    CONTIGUITIES, STRATEGIES  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/differential/cases_long.jsonl.gz"

SEED = 20260814
TIMEOUT_S = 15
MAX_REPR = 200_000
TARGET = 1000

# relevant-event palette: spat trigger, loop bodies at prices that both
# extend and exhaust the register conditions (z1+price<=10, z1+price<=12
# with z2<3), until trigger, and a high-price spat that re-arms runs
RELEVANT = [(1, 0), (2, 5), (2, 2), (2, 1), (2, 8), (3, 2), (1, 8)]


class CaseTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise CaseTimeout()


def gen_stream(rng, multi_type):
    """One 100-1,000-event stream: (type, name, price) triples."""
    length = rng.randint(100, 1000)
    budget = rng.randint(10, 30)
    noise_type = "f" if multi_type else "e"
    stream = [(noise_type, 9, rng.randint(0, 9)) for _ in range(length)]
    if rng.random() < 0.5:
        # BURST: clusters of 3-6 consecutive relevant events
        pos = 0
        placed = 0
        while placed < budget and pos < length - 6:
            pos += rng.randint(5, max(6, length // 6))
            for _ in range(rng.randint(3, 6)):
                if placed >= budget or pos >= length:
                    break
                nm, pr = rng.choice(RELEVANT)
                stream[pos] = ("e", nm, pr)
                pos += 1
                placed += 1
    else:
        # SPARSE: relevant events scattered uniformly
        for pos in rng.sample(range(length), budget):
            nm, pr = rng.choice(RELEVANT)
            stream[pos] = ("e", nm, pr)
    return stream


def main():
    OUT.parent.mkdir(parents=True, exist_ok=True)
    rng = random.Random(SEED)
    shapes = list(asts())
    rng.shuffle(shapes)
    signal.signal(signal.SIGALRM, _alarm)

    n = skipped_reject = skipped_timeout = skipped_big = 0
    with gzip.open(OUT, "wt") as f:
        for ast in shapes:
            if n >= TARGET:
                break
            strategy = rng.choice(STRATEGIES)
            multi_type = rng.random() < 0.2
            schema = {"e": ["id", "name", "price"]}
            if multi_type:
                schema["f"] = ["id", "name", "price"]
            qdict = {"type": "Query", "patseq": ast,
                     "context": {"strategy": strategy, "schema": schema}}
            typed_input = gen_stream(rng, multi_type)
            events = [Event(t, {"id": i + 1, "name": nm, "price": pr})
                      for i, (t, nm, pr) in enumerate(typed_input)]
            try:
                op = CEPOperator.from_query(Query.from_dict(qdict))
            except Exception:
                skipped_reject += 1
                continue
            signal.alarm(TIMEOUT_S)
            try:
                expected = repr(op << events)
            except CaseTimeout:
                skipped_timeout += 1
                continue
            except Exception:
                skipped_reject += 1
                continue
            finally:
                signal.alarm(0)
            if len(expected) > MAX_REPR:
                skipped_big += 1
                continue
            f.write(json.dumps({
                "id": n, "query": yaml.dump(qdict),
                "input": [list(e) for e in typed_input],
                "expected": expected}) + "\n")
            n += 1
            if n % 50 == 0:
                print(f"  {n}/{TARGET} "
                      f"(reject={skipped_reject} timeout={skipped_timeout} "
                      f"big={skipped_big})", flush=True)
    print(f"wrote {n} cases to {OUT} "
          f"(reject={skipped_reject} timeout={skipped_timeout} "
          f"big={skipped_big})")


if __name__ == "__main__":
    main()
