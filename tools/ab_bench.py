"""Interleaved A/B timing harness (guide §1: measure first).

Round 11 established that single short sessions on this host inflate
up to 3x versus a warm bench session and cannot be compared across
time -- the only trustworthy per-change delta comes from ALTERNATING
fresh-JVM processes between the two code states (A/B/A/B...), so the
host's bursty throttling decorrelates from the arm, and taking the
min per arm (throttle only ever inflates).  Round 11 did this with
ad-hoc shell loops; this tool makes the method durable.

Each child process is a cold JVM that warms up once (a3 scan), then
times `--passes` noop-sink materializations per query (clear_scratch
between, same methodology as bench.py).  The parent alternates arms
for `--rounds` rounds and reports min-of-all-passes per arm plus the
patched/base ratio.  A sha256 calibration stamp per child makes a
throttle window visible next to the numbers it inflated.

Usage:
  python tools/ab_bench.py --arms base:/root/wt_base,patched:/root/repo \
      --queries llm_minhash_lsh,llm_minhash_lsh_sharp \
      [--rounds 3] [--passes 2] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_CHILD = r"""
import json, os, sys, time, hashlib
repo, sf_dir, passes = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4].split(",")
sys.path.insert(0, repo)
from graphdb_cia_factbook_spark import registry
from graphdb_cia_factbook_spark.session import clear_scratch, get_spark

_BUF = bytes(range(256)) * 4096
def calibrate(rounds=150):
    t0 = time.perf_counter()
    for _ in range(rounds):
        hashlib.sha256(_BUF).digest()
    return round(time.perf_counter() - t0, 4)

spark = get_spark("ab_bench")
qs = registry.queries()
qs["a3_distinct_values"](spark, sf_dir).write.format("noop").mode("overwrite").save()
clear_scratch(spark)
out = {"repo": repo, "cal": []}
times = {n: [] for n in names}
for _p in range(passes):
    for n in names:
        t0 = time.perf_counter()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[n].append(round(time.perf_counter() - t0, 3))
        clear_scratch(spark)
    out["cal"].append(calibrate())
out["times"] = times
print("AB_RESULT " + json.dumps(out))
"""


def main() -> None:
    arms, queries = [], []
    rounds, passes = 3, 2
    sf = "/root/testdata/sf0.1"
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--arms":
            arms = [tuple(x.split(":", 1)) for x in next(it).split(",")]
        elif a == "--queries":
            queries = next(it).split(",")
        elif a == "--rounds":
            rounds = int(next(it))
        elif a == "--passes":
            passes = int(next(it))
        elif a == "--sf":
            sf = next(it)
    if not arms or not queries:
        print(__doc__)
        sys.exit(2)

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CHILD)
        child = f.name

    results: dict[str, dict[str, list[float]]] = {
        name: {q: [] for q in queries} for name, _ in arms}
    cals: dict[str, list[float]] = {name: [] for name, _ in arms}
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    for r in range(rounds):
        for name, root in arms:
            p = subprocess.run(
                [sys.executable, child, root, sf, str(passes),
                 ",".join(queries)],
                capture_output=True, text=True, env=env, cwd=root)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("AB_RESULT ")]
            if not line:
                print(f"round {r} arm {name}: FAILED\n{p.stderr[-2000:]}")
                sys.exit(1)
            data = json.loads(line[0][len("AB_RESULT "):])
            for q, ts in data["times"].items():
                results[name][q].extend(ts)
            cals[name].extend(data["cal"])
            print(f"round {r} arm {name}: "
                  + " ".join(f"{q}={min(ts):.3f}" for q, ts
                             in data["times"].items())
                  + f"  cal={data['cal']}")
    os.unlink(child)

    print("\n=== mins over all passes ===")
    base = arms[0][0]
    for q in queries:
        row = {name: min(results[name][q]) for name, _ in arms}
        parts = [f"{name}={row[name]:.3f}" for name, _ in arms]
        for name, _ in arms[1:]:
            parts.append(f"[{name}/{base}={row[name] / row[base]:.3f}]")
        print(f"{q}: " + " ".join(parts))
    print("calibration per arm:",
          {n: (min(c), max(c)) for n, c in cals.items()})
    print(json.dumps({"mins": {n: {q: min(results[n][q]) for q in queries}
                               for n, _ in arms}}))


if __name__ == "__main__":
    main()
