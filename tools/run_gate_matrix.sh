#!/bin/bash
# Round-17 gate matrix: the FULL registry (92 queries) at all five
# scales, zero exclusions. Runs against the WARM shared index root
# (deterministic kmeans fits since r15: warm artifacts and fresh fits
# are interchangeable by construction).
set -u
cd "$(dirname "$0")/.."
R=17
HDR_TREE="final round-17 tree: SPANN replication rule hash-verified via the fixed-centroid window twin similarity_topk_ivf_spann_fixed (nearest-always-kept guard, RMAX tie cut pinned by equi-gap fixture); similarity_topk_filtered retired (plan-identity + pushdown + oracle parity pinned in tests/test_plans.py); lazy flat-codes re-layout (builds on first wide-union cost flip; floor-width lineages commit no flat artifact — rule-1a pins on both by-list codes consumers); ordinary widen 4x->8x on the second-family calibration point (GMM family, covered 0.369 reads 0.8 at 4x / 1.0 at 8x; output-neutral at all five scales vs r16 logs); paths-first single-day partitioned reads"

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

run_gate /root/testdata/sf0.001     GATE_sf0.001_r17.log sf0.001 "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.01      GATE_sf0.01_r17.log  sf0.01  "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.1       GATE_sf0.1_r17.log   sf0.1   "$ALLQ" "full registry, 92 queries"
run_gate /root/repo/.scale_data/sf1     GATE_sf1_r17.log     sf1     "$ALLQ" "full registry, 92 queries; derived 10x via tools/make_scale_data.py"
run_gate /root/repo/.scale_data/sf1skew GATE_sf1skew_r17.log sf1skew "$ALLQ" "full registry, 92 queries, hot-key derivation (--skew: one taxi ~10% of positions, one source ~50% of documents)"
