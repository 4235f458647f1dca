#!/bin/bash
# Round-15 gate matrix: the FULL registry (91 queries) at all five
# scales, zero exclusions. Runs against the WARM shared index root:
# round 15 shipped the DETERMINISTIC kmeans fit (canonicalized sample,
# recipe o1 — fits are now bit-identical across physical row layouts,
# proven at the query level by tests/test_ann_index.py::
# test_fit_is_layout_independent and tools/fit_order_probe.py), so warm
# artifacts and fresh fits are interchangeable by construction, not by
# same-session luck.
set -u
cd "$(dirname "$0")/.."
R=15
HDR_TREE="final round-${R} tree: deterministic kmeans fit shipped (canonicalized sample, recipe o1 — kmeans outputs layout-independent), by-list raw-in-index layout for ivfpq_trained (codes + raw serving copy hive-partitioned by coarse list, cost-based re-rank source, batch-1 parity on synthetic / 2.9x bytes cut on incompressible n=1M), adaptive shortlist threshold 0.35->0.38 from the measured band (losses to covered 0.372 all recovered by 4x widening), ann_append_serving adopts the adaptive dial, append demos share one derivation helper, bench value_calibrated"

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

run_gate /root/testdata/sf0.001     GATE_sf0.001_r15.log sf0.001 "$ALLQ" "full registry, 91 queries"
run_gate /root/testdata/sf0.01      GATE_sf0.01_r15.log  sf0.01  "$ALLQ" "full registry, 91 queries"
run_gate /root/testdata/sf0.1       GATE_sf0.1_r15.log   sf0.1   "$ALLQ" "full registry, 91 queries"
run_gate /root/repo/.scale_data/sf1     GATE_sf1_r15.log     sf1     "$ALLQ" "full registry, 91 queries; derived 10x via tools/make_scale_data.py"
run_gate /root/repo/.scale_data/sf1skew GATE_sf1skew_r15.log sf1skew "$ALLQ" "full registry, 91 queries, hot-key derivation (--skew: one taxi ~10% of positions, one source ~50% of documents)"
