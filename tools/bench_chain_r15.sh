#!/bin/bash
# Round-15 bench chain: runs every evidence leg sequentially (one JVM at a
# time — the numbers assume sole ownership of the 32 cores). Artifacts land
# in bench/ as they complete, so a truncated chain still commits its prefix.
set -u
cd /root/repo
LOG=/tmp/bench_chain_r15.log
echo "=== bench chain r15 start: $(date) ===" >> "$LOG"

run_leg() {
  local name="$1"; shift
  echo "--- leg $name start: $(date) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- leg $name done rc=$?: $(date) ---" >> "$LOG"
}

# 1. append economics, all 11 kinds + delete leg (VERDICT r14 #5)
run_leg append sbt -batch "runMain graft.AppendBench /tmp/sf10 /root/testdata/sf0.1 bench/append_r15.json"

# 2. streaming latency incl. media screens + scrub/chunk twins (#9)
run_leg stream sbt -batch "runMain graft.StreamBench /tmp/sf1 bench/stream_r15.json"

# 3. isolated re-times for the two sf10 band-edge drifts (#7)
run_leg spot_sf10 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf10 2 q_hybrid_rrf_indexed_fixed q_corpus_diff" | grep "^{" > bench/bench_sf10_r15_spotdrift.json'

# 4. trio (round-close gate)
run_leg trio_sf01 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench/bench_sf0.1_r15.json sbt -batch "runMain graft.Bench"
run_leg trio_sf1 env SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_OUT=bench/bench_sf1_r15.json sbt -batch "runMain graft.Bench"
run_leg trio_sf10 env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_BENCH_OUT=bench/bench_sf10_r15.json sbt -batch "runMain graft.Bench"

# 5. sf100 serving spot (#1/#3: persisted hybref + PQ-leg flip evidence)
run_leg serving_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_ann_ivf_at_rest q_ann_pq_at_rest q_ann_ivfpq_at_rest q_keyword_topk_at_rest q_hybrid_rrf_indexed q_minhash_screen_at_rest q_simhash_screen_at_rest q_semantic_dedup" | grep "^{" > bench/bench_sf100_r15_serving.json'

# 6. clean full sf30 leg on final HEAD (#8)
run_leg full_sf30 env SPARK_GRAFT_SF_DIR=/tmp/sf30 SPARK_GRAFT_BENCH_OUT=bench/bench_sf30_r15_full.json sbt -batch "runMain graft.Bench"

# 7. sf100 heavy spot, 12 heaviest non-serving keys in 3 chunks (#4)
run_leg heavy1_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_video_scenes_avi q_curation_report q_audio_resample q_corpus_curate" | grep "^{" > bench/bench_sf100_r15_heavy1.json'
run_leg heavy2_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_source_overlap q_span_scrub q_span_scrub_l20 q_multimodal_png" | grep "^{" > bench/bench_sf100_r15_heavy2.json'
run_leg heavy3_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_audio_features q_audio_meta q_audio_fingerprint q_video_dedup" | grep "^{" > bench/bench_sf100_r15_heavy3.json'

echo "=== bench chain r15 done: $(date) ===" >> "$LOG"
