"""Committed-sf1-bench pool protocol (round 17, VERDICT r16 order 5).

Rounds 15 and 16 both moved the committed single-window sf1 number by
double-digit percent on what adjudication later called machine band —
the single contaminated window carries no code signal. This tool makes
the committed number a POOL: N alternating bench.py runs of the current
tree and (optionally) the previous round's final tree from a git
worktree, same window, shared warm index root, fresh process per run.
The cross-tree comparison then cancels the window (both trees see the
same machine state), and the committed JSON carries every sample so a
judge can read the spread instead of trusting one draw.

Usage:
  python tools/bench_sf1_pool.py [samples_per_tree] [prev_tree_dir]
  # e.g. git worktree add /tmp/r16tree <r16-final-sha>
  #      python tools/bench_sf1_pool.py 3 /tmp/r16tree > BENCH_sf1_r17.json

Emits ONE JSON object: headline = the current tree's min-pool total
(min is the right statistic: within-process JIT keeps improving runs,
and external noise only ever adds time), plus per-query mins and the
raw pools for both trees.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scale_data", "sf1")


def run_bench(tree: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF1,
        SPARK_GRAFT_INDEX_DIR=os.path.join(REPO, ".ann_index"),
    )
    env.pop("SPARK_GRAFT_CPUS", None)  # committed numbers are local[32]
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    prev = sys.argv[2] if len(sys.argv) > 2 else None
    pools: dict[str, list[dict]] = {"cur": [], "prev": []}
    for i in range(k):
        pools["cur"].append(run_bench(REPO))
        print(
            f"# cur run {i + 1}/{k}: {pools['cur'][-1]['value']}", file=sys.stderr
        )
        if prev:
            pools["prev"].append(run_bench(prev))
            print(
                f"# prev run {i + 1}/{k}: {pools['prev'][-1]['value']}",
                file=sys.stderr,
            )
    cur = pools["cur"]
    qmin = {
        q: min(s["queries"][q] for s in cur) for q in cur[0]["queries"]
    }
    doc = {
        "metric": cur[0]["metric"],
        "value": min(s["value"] for s in cur),
        "unit": "sec",
        "sf": cur[0].get("sf"),
        "protocol": (
            f"min of {k} alternating fresh-process runs"
            + (", interleaved with the previous round's final tree" if prev else "")
        ),
        "queries": qmin,
        "pool": [s["value"] for s in cur],
        "pool_calibration": [s.get("calibration_sec") for s in cur],
    }
    if prev:
        doc["prev_tree_pool"] = [s["value"] for s in pools["prev"]]
        doc["prev_tree_value"] = min(doc["prev_tree_pool"])
        doc["prev_tree_queries_min"] = {
            q: min(s["queries"][q] for s in pools["prev"])
            for q in pools["prev"][0]["queries"]
        }
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
