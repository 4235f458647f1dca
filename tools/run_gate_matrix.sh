#!/bin/bash
# Round-16 gate matrix: the FULL registry (92 queries) at all five
# scales, zero exclusions. Runs against the WARM shared index root
# (deterministic kmeans fits since r15: warm artifacts and fresh fits
# are interchangeable by construction).
set -u
cd "$(dirname "$0")/.."
R=16
HDR_TREE="final round-16 tree: by-list + cost-rule serving hash-verified via the deterministic-books twin similarity_topk_ivfpq_fixed; adaptive probe rule hash-verified via similarity_topk_ivf_adaptive; codes-side cost branch (flat re-layout copy, paths-first lazy open) returns synthetic batch-10 to 163.4 MB and keeps the incompressible floor win at 2.95x; escalating widen dial (deep fires 16x) output-neutral on organic corpora (rule-1a pinned); text_normalize retired (shared normalize_text_col)"

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

run_gate /root/testdata/sf0.001     GATE_sf0.001_r16.log sf0.001 "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.01      GATE_sf0.01_r16.log  sf0.01  "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.1       GATE_sf0.1_r16.log   sf0.1   "$ALLQ" "full registry, 92 queries"
run_gate /root/repo/.scale_data/sf1     GATE_sf1_r16.log     sf1     "$ALLQ" "full registry, 91 queries; derived 10x via tools/make_scale_data.py"
run_gate /root/repo/.scale_data/sf1skew GATE_sf1skew_r16.log sf1skew "$ALLQ" "full registry, 91 queries, hot-key derivation (--skew: one taxi ~10% of positions, one source ~50% of documents)"
