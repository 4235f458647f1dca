"""Compare per-query gate timings between the uniform-sf1 and sf1skew logs.

Usage: python tools/skew_triage.py GATE_sf1_r10.log GATE_sf1skew_r10.log [ratio]

Prints queries whose skew/uniform single-shot ratio exceeds the threshold
(default 2.0) — the triage candidates for a min-of-2 re-measure (gate
single-shots conflate the DuckDB oracle run and first-execution JIT
warm-up; see SKEW_r5..r7.md, where every naive outlier re-measured at
parity).
"""

from __future__ import annotations

import re
import sys


def parse(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for line in open(path):
        m = re.match(r"(?:PASS|ok\?) (\w+): .*\[([0-9.]+)s\]", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main() -> int:
    uni_path, skew_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    uni, skew = parse(uni_path), parse(skew_path)
    rows = []
    for q in sorted(set(uni) & set(skew)):
        if uni[q] > 0:
            rows.append((skew[q] / uni[q], q, uni[q], skew[q]))
    rows.sort(reverse=True)
    print(f"{'ratio':>6}  {'uniform':>8}  {'skew':>8}  query")
    flagged = 0
    for r, q, u, s in rows:
        if r >= thresh:
            flagged += 1
            print(f"{r:6.2f}  {u:8.1f}  {s:8.1f}  {q}")
    print(f"\n{flagged} of {len(rows)} queries at >= {thresh}x (single-shot, "
          "oracle+JIT conflated — re-measure before concluding)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
