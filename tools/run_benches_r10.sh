#!/bin/bash
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 sbt -batch "runMain graft.Bench" 2>/dev/null | grep -m1 '"metric":"total"' | sed 's/^\[info\] //' > BENCH_r10_builder_sf01.json
echo "STEP1_DONE $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 sbt -batch "runMain graft.BenchScale BENCH_r10_sf1.json" >/dev/null 2>&1
echo "STEP2_DONE $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf10 SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_TABLES=documents,embeddings SPARK_GRAFT_SCALE_EXCLUDE=dedup_embedding_cosine sbt -batch "runMain graft.BenchScale BENCH_r10_sf10.json" >/dev/null 2>&1
echo "STEP3_DONE $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100_rel SPARK_GRAFT_SCALE_REPS=100 SPARK_GRAFT_SCALE_TABLES=events,customer,supplier,part,orders,lineitem,nation,region SPARK_GRAFT_SCALE_ONLY=q1_pricing_summary,q9_product_profit,q21_waiting_suppliers,q_session_stats,q_upsert_cdc sbt -batch "runMain graft.BenchScale BENCH_r10_sf10_relational.json" >/dev/null 2>&1
echo "STEP4_DONE $(date +%T)"
echo ALL_BENCHES_DONE
