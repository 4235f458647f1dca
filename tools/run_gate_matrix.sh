#!/bin/bash
# Round-12 gate matrix: full registry at the three driver scales, and the
# sf1 / sf1skew derivations minus the one LABELED O(n^2) baseline whose
# DuckDB twin cannot finish 50k x 50k in the gate budget
# (similarity_near_dup_cosine — same exclusion as rounds 4-7).
set -u
cd "$(dirname "$0")/.."
R=12
HDR_TREE="final round-${R} tree: PQ warm serving path stage-fused (driver-built query relations from persisted artifacts incl. query vectors; q folded into the shortlist broadcast; the CollapseProject O(d^2) norm-refold fixed via _div_by — outputs bit-identical, rule-1a pinned), index artifacts keyed by training recipe + parquet-footer fingerprint, SPANN promoted to the driver head with fetch-count instrumentation, JPEG DRI/RSTn restart markers in profile"

BIG_EXCL="similarity_near_dup_cosine"
ALLQ=$(python - <<'EOF'
from mapreduce_hadoop_spark import registry
print(" ".join(registry.queries()))
EOF
)
BIGQ=$(python - <<'EOF'
from mapreduce_hadoop_spark import registry
print(" ".join(n for n in registry.queries() if n != "similarity_near_dup_cosine"))
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

run_gate /root/testdata/sf0.001     GATE_sf0.001_r12.log sf0.001 "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.01      GATE_sf0.01_r12.log  sf0.01  "$ALLQ" "full registry, 92 queries"
run_gate /root/testdata/sf0.1       GATE_sf0.1_r12.log   sf0.1   "$ALLQ" "full registry, 92 queries"
run_gate /root/repo/.scale_data/sf1     GATE_sf1_r12.log     sf1     "$BIGQ" "91 queries: full registry minus ${BIG_EXCL} (LABELED O(n^2) baseline; its DuckDB twin cannot finish 50k x 50k in the gate budget); derived 10x via tools/make_scale_data.py"
run_gate /root/repo/.scale_data/sf1skew GATE_sf1skew_r12.log sf1skew "$BIGQ" "91 queries, hot-key derivation (--skew: one taxi ~10% of positions, one source ~50% of documents); same exclusion as sf1"
