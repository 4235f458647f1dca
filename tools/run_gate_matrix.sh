#!/bin/bash
# Round-13 gate matrix: the FULL registry at all five scales — the first
# round with zero exclusions. The one historical exclusion
# (similarity_near_dup_cosine at sf1/sf1skew: its DuckDB twin needed
# ~n^2 list_reduce evaluations and could not finish in the gate budget)
# ended this round: the Spark side is triangle-blocked (bit-identical)
# and the DuckDB twin measured 276 s at n=20k — long, but inside budget,
# and worth it for a hash-verified exact O(n^2) baseline at gate scale.
set -u
cd "$(dirname "$0")/.."
R=13
HDR_TREE="final round-${R} tree: adaptive IVF-PQ serving dials (SPANN (1+eps) probe widening + squared width/floor shortlist), ann_append_serving driver query over the hardened artifact layer (footer fingerprints, base+watermark delta keys, aside-rename swap), triangle-blocked exact near-dup (bit-identical; sf1 exclusion retired), ANN exact re-rank normalize fold moved above the broadcast join (bit-identical, -36% at n=1M), Arrow simhash signature fold (integer-identical), JPEG DC-only encoder fast path (bit-identical). Fresh .ann_index this run; kmeans fits verified stable across process mixes/cpu counts this session, and the committed rule-1a pre-logs re-verified hash-for-hash today against a fresh worktree of the r12 tree (83e6149)"

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

run_gate /root/testdata/sf0.001     GATE_sf0.001_r13.log sf0.001 "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.01      GATE_sf0.01_r13.log  sf0.01  "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.1       GATE_sf0.1_r13.log   sf0.1   "$ALLQ" "full registry, 92 queries"
run_gate /root/repo/.scale_data/sf1     GATE_sf1_r13.log     sf1     "$ALLQ" "full registry, 92 queries — first round with NO exclusion; derived 10x via tools/make_scale_data.py"
run_gate /root/repo/.scale_data/sf1skew GATE_sf1skew_r13.log sf1skew "$ALLQ" "full registry, 92 queries, hot-key derivation (--skew: one taxi ~10% of positions, one source ~50% of documents); no exclusion"
