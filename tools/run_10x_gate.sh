#!/usr/bin/env bash
# One-command 10x oracle gate (SURVEY 5a: r11 protocol, r12 sampled
# slices). Guards against silent generator drift — the class of failure
# that ate round 10 — by re-running the full correctness surface against
# a corpus 10x the driver's largest gate each round.
#
#   bash tools/run_10x_gate.sh [artifact_out]
#
# Steps:
#  1. build /tmp/graft_sf1 (10x sf0.1: 50k docs / 200k vectors / 1M
#     events) if absent                     [tools/make_scaled_corpus.py]
#  2. graft.Verify all queries against it; DuckDB compare with a 180 s
#     per-query budget                 [tools/oracle_check_timeout.py]
#  3. the O(n^2)-oracle queries that time out at 50k docs get BOTH:
#     a. replication-invariance vs the sf0.1 oracle-checked answers
#        (full-size output check)        [tools/check_replication.py]
#     b. the FULL SQL oracle on a deterministic ~2k-doc sampled slice
#        of the 10x corpus (full-fidelity oracle check on 10x content)
#                                       [tools/make_sampled_slice.py]
# Exit 0 = every step green. Writes a line-per-step artifact.
set -uo pipefail
cd "$(dirname "$0")/.."

TENX=/tmp/graft_sf1
SLICE=/tmp/graft_sf1_slice
VOUT=/tmp/v10x_full
SOUT=/tmp/v10x_slice
ART="${1:-target/TENX_GATE.txt}"
QUAD=dedup_minhash_lsh,dedup_minhash_lsh_stored,stream_dedup_lsh,dedup_components,dedup_resolve,dedup_edit_distance,dedup_containment
mkdir -p "$(dirname "$ART")"
: > "$ART"
fail=0
note() { echo "$@" | tee -a "$ART"; }

# rebuild when absent OR stale (driver regenerated testdata since the
# last build — the silent-drift class that ate round 10)
if [ ! -f "$TENX/documents.parquet" ] || \
   [ /root/testdata/sf0.1/documents.parquet -nt "$TENX/documents.parquet" ]; then
  rm -rf "$TENX"
  python3 tools/make_scaled_corpus.py "$TENX" || { note "FAIL build 10x corpus"; exit 1; }
  rm -rf "$SLICE"
fi
note "corpus: $TENX ($(python3 - "$TENX" <<'EOF'
import sys, pyarrow.parquet as pq
print(pq.read_metadata(sys.argv[1] + '/documents.parquet').num_rows, 'docs')
EOF
))"

note "== step 1: full-suite Verify at 10x =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  sbt -batch "runMain graft.Verify $TENX $VOUT" >/tmp/v10x_verify.log 2>&1
errs=$(python3 -c "import json;d=json.load(open('$VOUT/_errors.json'));print(len(d))" 2>/dev/null || echo "?")
note "verify errors: $errs"
[ "$errs" = "0" ] || fail=1

note "== step 2: DuckDB compare, 180 s/query budget =="
python3 tools/oracle_check_timeout.py "$TENX" "$VOUT" --timeout 180 \
  | tee /tmp/v10x_oracle.log | tail -3 | tee -a "$ART"
grep -q " 0 fail " /tmp/v10x_oracle.log || fail=1

note "== step 3a: replication-invariance for the timed-out set =="
SKIPPED=$(grep '^skipped:' /tmp/v10x_oracle.log | cut -d' ' -f2)
if [ -n "${SKIPPED:-}" ]; then
  # sf0.1 reference outputs for the skipped queries
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v01_ref $SKIPPED" \
    >/tmp/v01_ref.log 2>&1
  python3 tools/check_replication.py /tmp/v01_ref "$VOUT" "$SKIPPED" \
    | tee -a "$ART" | tail -3 || fail=1
else
  note "nothing skipped — replication check not needed"
fi

note "== step 3b: full SQL oracle on the sampled 10x slice =="
python3 tools/make_sampled_slice.py "$TENX" "$SLICE" | tee -a "$ART"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  sbt -batch "runMain graft.Verify $SLICE $SOUT $QUAD" >/tmp/v10x_slice.log 2>&1
python3 tools/oracle_check.py "$SLICE" "$SOUT" | tee /tmp/v10x_slice_oracle.log \
  | tail -3 | tee -a "$ART"
grep -q " 0 fail" /tmp/v10x_slice_oracle.log || fail=1

# Per-addition addenda (auditability — the r17 verdict's ask): name the
# round's touched/added queries' individual 10x verdicts in the artifact
# instead of burying them in the anonymous pass count. Override the set
# with TENX_ADDENDA=q1,q2,...
ADDENDA="${TENX_ADDENDA:-ann_ivfpq_stored,stream_ann_ivfpq,stream_ann_ivfpq_compacted,stream_ann_ivfpq_deleted,stream_knn_graph,stream_knn_graph_deleted,embed_knn_graph_stored,graph_pagerank_stored,graph_components_stored,retrieve_bm25_stored,stream_bm25_postings,stream_bm25_compacted,stream_bm25_deleted,store_delete_ivfpq,store_delete_knn,store_delete_bm25,ann_index_refresh,ann_refresh_delete}"
note "== addenda: per-query 10x verdicts for this round's touched set =="
for q in $(echo "$ADDENDA" | tr ',' ' '); do
  line=$(grep -E "^(PASS|FAIL|SKIP) $q[ :(]" /tmp/v10x_oracle.log | head -1)
  if [ -n "$line" ]; then note "  $line"
  else
    # timed-out quadratic queries surface through step 3a/3b instead
    if echo ",$SKIPPED," | grep -q ",$q,"; then
      note "  $q: quadratic-oracle budget skip -> covered by replication + sampled-slice steps above"
    else note "  $q: NOT FOUND in oracle log"; fail=1; fi
  fi
done

if [ "$fail" = 0 ]; then note "== 10x GATE: ALL GREEN =="; else note "== 10x GATE: FAILURES (see logs) =="; fi
exit $fail
