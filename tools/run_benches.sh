#!/bin/bash
# Generic solo bench-tier runner (round-agnostic; replaces the per-round
# copies). Usage:  ROUND=12 bash tools/run_benches.sh
#
# Lessons encoded from round 11:
#  - every step tees its FULL sbt output to tools/../bench_step{N}.log —
#    a step that dies (the r11 scripted full-tier run crashed with output
#    at /dev/null) must leave a diagnosable log, not a mystery;
#  - after each step the expected artifact's existence is CHECKED and the
#    script aborts loudly if missing — a silent step failure previously
#    surfaced only when roundcheck ran a round later;
#  - run SOLO and touch NOTHING while it runs: plain Bench (step 1) has no
#    probe-retry gate, and even a pyarrow metadata read on the host dirtied
#    an after-probe past the 0.65 s line in r11.
set -u
cd "$(dirname "$0")/.."
R="${ROUND:?set ROUND=<n>}"
RN=$(printf "r%02d" "$R")
# The scale tiers run up to maxAttempts full timed passes in ONE JVM when
# the contention gate trips; 8g OOM'd the r15 100x tier on attempt 3.
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"

# A stray JVM (e.g. an orphaned forked bench child — killing the sbt
# launcher does NOT kill its fork) turns every probe dirty and the ladder
# into a retry treadmill: two benches each read the other as contention
# and both burn all attempts (r15 lost an hour to exactly this). Refuse
# to start unless the host has zero java processes.
if pgrep -x java >/dev/null 2>&1 || pgrep -f 'bin/java' >/dev/null 2>&1; then
  echo "!! a java process is already running (pgrep: $(pgrep -f 'java' | tr '\n' ' ')) — kill it first; a bench ladder must run solo"
  exit 1
fi

# An artifact is only a completion marker when it is CLEAN: Bench/BenchScale
# still write one when giving up contended or inverted, and a step that died
# after the write leaves one too — resuming past those would silently keep a
# dirty tier (ADVICE r15). Dirty artifacts are moved aside and re-run.
art_clean() { # art_clean <artifact>
  [ -s "$1" ] && grep -q '"contended":false' "$1" \
    && ! grep -q '"inverted":true' "$1"
}

step() { # step <name> <artifact> <cmd...>
  local name="$1" art="$2"; shift 2
  # SKIP_EXISTING=1: resume a ladder that died mid-way without re-paying
  # the completed tiers — but only a CLEAN artifact counts as completed.
  if [ -n "${SKIP_EXISTING:-}" ] && [ -s "$art" ]; then
    if art_clean "$art"; then
      echo "== $name skipped (clean artifact present)"; return 0
    fi
    echo "== $name: existing artifact is dirty (contended/inverted) — moved to ${art}.dirty, re-running"
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

# 1. builder sf0.1, min-of-3 (no retry gate — must be solo). Full output
# goes to the step log FIRST (no grep -m1 on the live pipe — that
# SIGPIPE-kills the JVM before the trailing health line and spark.stop());
# the artifact is extracted from the completed log.
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

# 2. 10x tier, all gates
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 \
  step sf1 "BENCH_${RN}_sf1.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf1.json"

# 3. 100x documents/embeddings tier
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf10 \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10 "BENCH_${RN}_sf10.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10.json"

# 4. 100x FULL registry
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_full \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10_full "BENCH_${RN}_sf10_full.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_full.json"

# 5. 100x relational growth points (r11 ask #8: include the as-of/range/
# top-k-per-group shapes alongside the TPC-H heavies)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_rel \
  SPARK_GRAFT_SCALE_REPS=100 \
  SPARK_GRAFT_SCALE_TABLES=events,customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers,q_session_stats,q_upsert_cdc,q_asof_join,q_range_join,q_topk_per_group \
  step sf10_rel "BENCH_${RN}_sf10_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_relational.json"

# 6. production-vocab BPE training point (r12 VERDICT #5): 1024 merges at
# batchM=64 on sf0.1 documents — commits round count + wall time; the main
# exits non-zero if the V/M round law fails, which step() surfaces.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  step bpe "BENCH_${RN}_bpe.json" sbt -batch "runMain graft.BpeBench BENCH_${RN}_bpe.json"

# 7. second production-vocab BPE point (r13 VERDICT #5): 4096 merges at
# batchM=128 — pins the round law rounds ≤ 2*ceil(V/M)+log2(M)+2 as
# scale-invariant (machine-checked via rounds_ok; BpeSpec ties the two
# points to the same formula at small scale).
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BPE_MERGES=4096 SPARK_GRAFT_BPE_BATCH_M=128 \
  step bpe2 "BENCH_${RN}_bpe2.json" sbt -batch "runMain graft.BpeBench BENCH_${RN}_bpe2.json"

# 8. 1000x documents/embeddings tier (r14 VERDICT #3): the r14 flagship
# set PLUS the index-MUTATION lifecycle ops (appendBatch / upsertBatch /
# reindex against the 5M-vector corpus) — the generation staging +
# two-generation retention copies corpus-scale parts per swap; this
# measures that write amplification at 5M instead of asserting it.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  SPARK_GRAFT_SCALE_REPS=1000 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_ONLY=dedup_exact,dedup_minhash_lsh,dedup_simhash,text_lang_id,text_quality,pipeline_pack_tokens,ann_ivfpq_adc,emb_kmeans,mm_byte_features,ann_ivfpq_append,ann_ivfpq_upsert,ann_reindex \
  step sf100 "BENCH_${RN}_sf100.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100.json"

# 9. 1000x relational flagships (r14 VERDICT #3): q21 (the round-14 fused
# single-fact-pass plan), q9, q1 against a ~600M-row lineitem.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1000_rel \
  SPARK_GRAFT_SCALE_REPS=1000 \
  SPARK_GRAFT_SCALE_TABLES=customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers \
  step sf100_rel "BENCH_${RN}_sf100_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100_relational.json"

echo ALL_BENCHES_DONE
