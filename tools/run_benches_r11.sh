#!/bin/bash
# Round-11 bench tiers — run SOLO (nothing else on the host): the per-run
# calibration gate (BenchScale) retries contended passes, and roundcheck.py
# now FAILS any committed artifact whose probes exceed 0.65s.
set -x
cd /root/repo

# 1. builder sf0.1, min-of-3
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -m1 '"metric":"total"' | sed 's/^\[info\] //' > BENCH_r11_builder_sf01.json
echo "STEP1_DONE $(date +%T)"

# 2. 10x tier, all gates
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 \
  sbt -batch "runMain graft.BenchScale BENCH_r11_sf1.json" >/dev/null 2>&1
echo "STEP2_DONE $(date +%T)"

# 3. 100x documents/embeddings tier
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf10 \
  SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_TABLES=documents,embeddings \
  SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  sbt -batch "runMain graft.BenchScale BENCH_r11_sf10.json" >/dev/null 2>&1
echo "STEP3_DONE $(date +%T)"

# 4. 100x FULL registry (the r10 verdict's ask: clean probes this time)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_full \
  SPARK_GRAFT_SCALE_REPS=100 \
  SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine \
  sbt -batch "runMain graft.BenchScale BENCH_r11_sf10_full.json" >/dev/null 2>&1
echo "STEP4_DONE $(date +%T)"

# 5. 100x relational growth points
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_rel \
  SPARK_GRAFT_SCALE_REPS=100 \
  SPARK_GRAFT_SCALE_TABLES=events,customer,supplier,part,orders,lineitem,nation,region \
  SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers,q_session_stats,q_upsert_cdc \
  sbt -batch "runMain graft.BenchScale BENCH_r11_sf10_relational.json" >/dev/null 2>&1
echo "STEP5_DONE $(date +%T)"
echo ALL_BENCHES_DONE
