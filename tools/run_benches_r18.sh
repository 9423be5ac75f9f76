#!/bin/bash
# Round-18 bench ladder, priority-ordered for this round's VERDICT asks:
#   1. builder sf0.1 headline, min-of-3 (cross-round point; first run also
#      writes the byte-pass cache the official driver run will hit —
#      VERDICT r17 #1)
#   2. mutation gates on a FAST-IO window (VERDICT r17 #5): loop until both
#      fsync probes land under the fast line, keep the first io_fast draw
#   3. 1000x docs/embeddings solo (now with in-artifact stage forensics —
#      VERDICT r17 #3 — and the spread cap fix live, #2)
#   4. 100x FULL registry solo
#   5. 10x all-gates tier (growth pairs + inversion ref for next round)
#   6. 100x relational growth points refresh
#   7. streaming ANN ingest at the 1000x tier (regression point; last so its
#      absence costs nothing if wall-clock runs out)
# Same step discipline as run_benches_r17.sh (full logs, loud aborts,
# clean-artifact resume via SKIP_EXISTING=1).
set -u
cd "$(dirname "$0")/.."
R="${ROUND:-18}"
RN=$(printf "r%02d" "$R")
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-24g}"
# Builder-side ladder runs are not under the driver's wall-clock cap: give
# Bench a generous budget so the deadline machinery (default 1020 s, for
# the official driver run) never degrades a ladder artifact. Setting this
# also keeps ladder runs from writing BENCH_official_latest.json — that
# file is the DRIVER run's self-artifact.
export SPARK_GRAFT_BENCH_BUDGET_SEC="${SPARK_GRAFT_BENCH_BUDGET_SEC:-7200}"

if pgrep -x java >/dev/null 2>&1 || pgrep -f 'bin/java' >/dev/null 2>&1; then
  echo "!! a java process is already running — kill it first; benches run solo"
  exit 1
fi

art_clean() { # art_clean <artifact>
  # artifacts without an acceptance loop (UpsertBench/AnnIngestBench/
  # MutationBench emit calibration probes instead of a contended stamp)
  # count as clean when present, a known marker key exists, AND the line
  # parses as JSON (ADVICE r17: a truncated artifact from a killed run used
  # to be accepted and its step skipped); gated artifacts additionally need
  # contended:false and no inversion
  [ -s "$1" ] || return 1
  grep -q '"metric"' "$1" || return 1
  python3 -c "import json,sys; json.load(open(sys.argv[1]))" "$1" 2>/dev/null || return 1
  if grep -q '"contended"' "$1"; then
    grep -q '"contended":false' "$1" && ! grep -q '"inverted":true' "$1"
  else
    ! grep -q '"inverted":true' "$1"
  fi
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

# 2. mutation gates on a fast-IO window (VERDICT r17 #5): the named
#    artifact for the sidecar lifecycle's sf0.1 numbers. Re-draw up to 6
#    times until io_fast:true (both settled fsync probes < 0.1 s); a slow
#    draw is kept as .slowN evidence, never committed as the artifact.
MUT_ART="BENCH_${RN}_mutation_gates.json"
if [ -n "${SKIP_EXISTING:-}" ] && art_clean "$MUT_ART" && grep -q '"io_fast":true' "$MUT_ART"; then
  echo "== mutation_gates skipped (fast-IO artifact present)"
else
  for try in 1 2 3 4 5 6; do
    echo "== mutation_gates draw $try $(date +%T)"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.MutationBench $MUT_ART" \
      >"bench_step_mutation_$try.log" 2>&1
    if art_clean "$MUT_ART" && grep -q '"io_fast":true' "$MUT_ART"; then
      echo "== mutation_gates done (fast-IO draw $try) $(date +%T)"; break
    fi
    [ -s "$MUT_ART" ] && mv "$MUT_ART" "${MUT_ART}.slow$try"
    echo "== mutation_gates draw $try was not io-fast — waiting for a quieter disk"
    [ "$try" -lt 6 ] && sleep 150
  done
  if [ ! -s "$MUT_ART" ]; then
    last=$(ls -t ${MUT_ART}.slow* 2>/dev/null | head -1)
    if [ -n "$last" ]; then
      echo "== mutation_gates: no fast-IO window in 6 draws — keeping the last honest draw"
      cp "$last" "$MUT_ART"
    else
      echo "!! mutation_gates FAILED — see bench_step_mutation_*.log"; exit 1
    fi
  fi
fi

SF100_ONLY=dedup_exact,dedup_minhash_lsh,dedup_simhash,text_lang_id,text_quality,pipeline_pack_tokens,ann_ivfpq_adc,emb_kmeans,mm_byte_features,ann_ivfpq_append,ann_ivfpq_upsert,ann_reindex

# 3. 1000x docs/embeddings, default config, solo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  SPARK_GRAFT_SCALE_REPS=1000 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_ONLY="$SF100_ONLY" \
  step sf100 "BENCH_${RN}_sf100.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf100.json"

# 4. 100x FULL registry solo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_full \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  step sf10_full "BENCH_${RN}_sf10_full.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_full.json"

# 5. 10x all-gates tier
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 \
  step sf1 "BENCH_${RN}_sf1.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf1.json"

# 6. 100x relational growth points refresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_rel \
  SPARK_GRAFT_SCALE_REPS=100 \
  SPARK_GRAFT_SCALE_TABLES=events,customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers,q_session_stats,q_upsert_cdc,q_asof_join,q_range_join,q_topk_per_group \
  step sf10_rel "BENCH_${RN}_sf10_relational.json" sbt -batch "runMain graft.BenchScale BENCH_${RN}_sf10_relational.json"

# 7. streaming ANN ingest 1000x point — reuses the sf100 embeddings the
#    earlier steps synthesized (stamp-validated reuse since r18)
SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  step ann_ingest "BENCH_${RN}_ann_ingest.json" \
  sbt -batch "runMain graft.AnnIngestBench BENCH_${RN}_ann_ingest.json"

echo ALL_BENCHES_DONE
