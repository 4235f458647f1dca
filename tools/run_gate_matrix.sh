#!/bin/bash
# Round-14 gate matrix: the FULL registry (91 queries after the two
# size-policy retirements funding ann_append_serving_fixed and the
# adaptive-shortlist head slot) at all five scales, zero exclusions.
# Runs against the WARM shared index root deliberately: same-bytes fit
# reproduction was proven explicitly this round (SCALE_ann_r14.md §2 —
# a fresh fit equals the r13-session artifact bit-for-bit, including
# under -XX:UseAVX=2), and the kmeans rule-1a pins are same-day-only,
# so the matrix must serve the same artifacts the pins were verified
# against.
set -u
cd "$(dirname "$0")/.."
R=14
HDR_TREE="final round-${R} tree: ann_append_serving_fixed (fixed-books append twin — the base+delta union hash-verified, DuckDB-green), per-query adaptive flat-PQ shortlist (covered-gap signal, recall 0.80->1.00 organic sf0.1 / 0.82->1.00 mutated n=20k, ~0% organic wall), pmod near-dup block id (bit-identical on non-negative ids), fit_env provenance sidecars (cross-session kmeans variable NAMED: training-input physical row order), bench calibration key + stream min-of-2. fn_distance and events_daily_by_type retired (size policy; unit/fixture-pinned)"

ALLQ=$(python - <<'EOF'
from mapreduce_hadoop_spark import registry
print(" ".join(registry.queries()))
EOF
)

run_gate() {
  local sfdir="$1" log="$2" label="$3" queries="$4" note="$5"
  echo "# ${label} gate, round ${R} (${note}; ${HDR_TREE})." > "$log"
  SPARK_GRAFT_SF_DIR="$sfdir" python tools/check_oracle.py $queries >> "$log" 2>/tmp/gate_err_${label}.log
  local rc=$?
  tail -2 "$log"
  echo "== ${label} exit ${rc}"
}

run_gate /root/testdata/sf0.001     GATE_sf0.001_r14.log sf0.001 "$ALLQ" "full registry, 91 queries"
run_gate /root/testdata/sf0.01      GATE_sf0.01_r14.log  sf0.01  "$ALLQ" "full registry, 91 queries"
run_gate /root/testdata/sf0.1       GATE_sf0.1_r14.log   sf0.1   "$ALLQ" "full registry, 91 queries"
run_gate /root/repo/.scale_data/sf1     GATE_sf1_r14.log     sf1     "$ALLQ" "full registry, 91 queries; derived 10x via tools/make_scale_data.py"
run_gate /root/repo/.scale_data/sf1skew GATE_sf1skew_r14.log sf1skew "$ALLQ" "full registry, 91 queries, hot-key derivation (--skew: one taxi ~10% of positions, one source ~50% of documents)"
