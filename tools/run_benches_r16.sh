#!/bin/bash
# Round-16 bench ladder, priority-ordered for this round's VERDICT asks:
#   1. builder sf0.1 headline (cross-round comparison point)
#   2. sf100 at HEAD, default 2-min periodic GC    — MinHash adjudication A
#   3. sf100 at HEAD, periodic GC effectively OFF  — MinHash adjudication B
#      (VERDICT r15 #1: dedup_minhash_lsh 73.6 -> 120.0 s on identical
#      bytes; prime suspect is the abb561d 2-min ContextCleaner GC landing
#      inside the ~2-min query)
#   4. 1000x relational flagships (VERDICT r15 #2 — synthesis already on
#      disk at /tmp/graft_sf1000_rel from the r15 session)
#   5. 100x FULL registry re-run at r16 HEAD (VERDICT r15 #3)
#   6. 10x tier re-run at r16 HEAD (VERDICT r15 #3)
#   7. 100x relational + 100x docs/embeddings refresh
# Same step discipline as run_benches.sh (full logs, loud aborts,
# clean-artifact resume).
set -u
cd "$(dirname "$0")/.."
R="${ROUND:-16}"
RN=$(printf "r%02d" "$R")
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"

if pgrep -x java >/dev/null 2>&1 || pgrep -f 'bin/java' >/dev/null 2>&1; then
  echo "!! a java process is already running — kill it first; benches run solo"
  exit 1
fi

art_clean() { # art_clean <artifact>
  [ -s "$1" ] && grep -q '"contended":false' "$1" \
    && ! grep -q '"inverted":true' "$1"
}

step() { # step <name> <artifact> <cmd...>
  local name="$1" art="$2"; shift 2
  if [ -n "${SKIP_EXISTING:-}" ] && [ -s "$art" ]; then
    if art_clean "$art"; then
      echo "== $name skipped (clean artifact present)"; return 0
    fi
    echo "== $name: existing artifact is dirty — moved to ${art}.dirty, re-running"
    mv "$art" "${art}.dirty"
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

# 1. builder sf0.1, min-of-3
if [ -n "${SKIP_EXISTING:-}" ] && art_clean "BENCH_${RN}_builder_sf01.json"; then
  echo "== builder skipped (clean artifact present)"
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

SF100_ONLY=dedup_exact,dedup_minhash_lsh,dedup_simhash,text_lang_id,text_quality,pipeline_pack_tokens,ann_ivfpq_adc,emb_kmeans,mm_byte_features,ann_ivfpq_append,ann_ivfpq_upsert,ann_reindex

# 2. 1000x tier at HEAD, default periodic GC (adjudication run A)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  SPARK_GRAFT_SCALE_REPS=1000 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_ONLY="$SF100_ONLY" \
  step sf100 "BENCH_${RN}_sf100.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100.json"

# 3. same tier, periodic GC pushed past the whole run (adjudication run B)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  SPARK_GRAFT_SCALE_REPS=1000 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_ONLY="$SF100_ONLY" SPARK_GRAFT_PERIODIC_GC=120min \
  step sf100_nogc "BENCH_${RN}_sf100_nogc.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100_nogc.json"

# 4. 1000x relational flagships (q21/q9/q1 against ~600M-row lineitem)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1000_rel \
  SPARK_GRAFT_SCALE_REPS=1000 \
  SPARK_GRAFT_SCALE_TABLES=customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers \
  step sf100_rel "BENCH_${RN}_sf100_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100_relational.json"

# 5. 100x FULL registry at r16 HEAD
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_full \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10_full "BENCH_${RN}_sf10_full.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_full.json"

# 6. 10x all-gates tier at r16 HEAD
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 \
  step sf1 "BENCH_${RN}_sf1.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf1.json"

# 7. 100x relational growth points refresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_rel \
  SPARK_GRAFT_SCALE_REPS=100 \
  SPARK_GRAFT_SCALE_TABLES=events,customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers,q_session_stats,q_upsert_cdc,q_asof_join,q_range_join,q_topk_per_group \
  step sf10_rel "BENCH_${RN}_sf10_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_relational.json"

# 8. 100x docs/embeddings refresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf10 \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10 "BENCH_${RN}_sf10.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10.json"

echo ALL_BENCHES_DONE
