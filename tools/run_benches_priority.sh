#!/bin/bash
# Priority-ordered variant of run_benches.sh for a time-boxed session:
# the r15 verdict's NEW evidence (1000x index-mutation tier, post-q21
# 100x relational) runs before the re-run tiers, so an out-of-time abort
# costs the least-new artifact, not the most-new one. Same step
# discipline (full logs, loud aborts, artifact checks) as run_benches.sh.
set -u
cd "$(dirname "$0")/.."
R="${ROUND:?set ROUND=<n>}"
RN=$(printf "r%02d" "$R")
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"

if pgrep -x java >/dev/null 2>&1 || pgrep -f 'bin/java' >/dev/null 2>&1; then
  echo "!! a java process is already running — kill it first; benches run solo"
  exit 1
fi

step() { # step <name> <artifact> <cmd...>
  local name="$1" art="$2"; shift 2
  if [ -n "${SKIP_EXISTING:-}" ] && [ -s "$art" ]; then
    echo "== $name skipped (artifact present)"; return 0
  fi
  echo "== $name start $(date +%T)"
  "$@" >"bench_step_${name}.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ] || [ ! -s "$art" ]; then
    echo "!! $name FAILED (rc=$rc, artifact $art $( [ -s "$art" ] && echo present || echo MISSING)) — see bench_step_${name}.log"
    exit 1
  fi
  echo "== $name done $(date +%T)"
}

# 1. builder sf0.1 headline
if [ -n "${SKIP_EXISTING:-}" ] && [ -s "BENCH_${RN}_builder_sf01.json" ]; then
  echo "== builder skipped (artifact present)"
else
echo "== builder start $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch "runMain graft.Bench" >"bench_step_builder.log" 2>&1
rc=$?
grep -m1 '"metric":"total"' bench_step_builder.log | sed 's/^\[info\] //' \
  > "BENCH_${RN}_builder_sf01.json"
if [ $rc -ne 0 ] || [ ! -s "BENCH_${RN}_builder_sf01.json" ]; then
  echo "!! builder FAILED (rc=$rc) — see bench_step_builder.log"; exit 1
fi
echo "== builder done $(date +%T)"
fi

# 2. 100x relational (r15 ask #2: post-q21-rewrite evidence)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_rel \
  SPARK_GRAFT_SCALE_REPS=100 \
  SPARK_GRAFT_SCALE_TABLES=events,customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers,q_session_stats,q_upsert_cdc,q_asof_join,q_range_join,q_topk_per_group \
  step sf10_rel "BENCH_${RN}_sf10_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_relational.json"

# 3. 1000x docs/embeddings incl. index-mutation lifecycle (r15 ask #3)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  SPARK_GRAFT_SCALE_REPS=1000 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_ONLY=dedup_exact,dedup_minhash_lsh,dedup_simhash,text_lang_id,text_quality,pipeline_pack_tokens,ann_ivfpq_adc,emb_kmeans,mm_byte_features,ann_ivfpq_append,ann_ivfpq_upsert,ann_reindex \
  step sf100 "BENCH_${RN}_sf100.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100.json"

# 4. 1000x relational flagships (r15 ask #3)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1000_rel \
  SPARK_GRAFT_SCALE_REPS=1000 \
  SPARK_GRAFT_SCALE_TABLES=customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers \
  step sf100_rel "BENCH_${RN}_sf100_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100_relational.json"

# 5. 10x all-gates tier
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 \
  step sf1 "BENCH_${RN}_sf1.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf1.json"

# 6. 100x documents/embeddings tier
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf10 \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10 "BENCH_${RN}_sf10.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10.json"

# 7. 100x FULL registry
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_full \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10_full "BENCH_${RN}_sf10_full.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_full.json"

# 8-9. BPE production points
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  step bpe "BENCH_${RN}_bpe.json" sbt -batch "runMain graft.BpeBench BENCH_${RN}_bpe.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BPE_MERGES=4096 SPARK_GRAFT_BPE_BATCH_M=128 \
  step bpe2 "BENCH_${RN}_bpe2.json" sbt -batch "runMain graft.BpeBench BENCH_${RN}_bpe2.json"

echo ALL_BENCHES_DONE
