#!/bin/bash
# Round-15 bench chain, part 2 (after the StreamBench zero-batch fix):
# everything from the stream leg onward, on the final binary. append_r15
# already landed (AppendBench path untouched by the fix).
set -u
cd /root/repo
LOG=/tmp/bench_chain_r15.log
echo "=== bench chain r15b start: $(date) ===" >> "$LOG"

run_leg() {
  local name="$1"; shift
  echo "--- leg $name start: $(date) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- leg $name done rc=$?: $(date) ---" >> "$LOG"
}

run_leg stream sbt -batch "runMain graft.StreamBench /tmp/sf1 bench/stream_r15.json"

run_leg spot_sf10 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf10 2 q_hybrid_rrf_indexed_fixed q_corpus_diff" | grep "^{" > bench/bench_sf10_r15_spotdrift.json'

run_leg trio_sf01 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench/bench_sf0.1_r15.json sbt -batch "runMain graft.Bench"
run_leg trio_sf1 env SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_OUT=bench/bench_sf1_r15.json sbt -batch "runMain graft.Bench"
run_leg trio_sf10 env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_BENCH_OUT=bench/bench_sf10_r15.json sbt -batch "runMain graft.Bench"

# round-close gate: sf0.1 oracle replay on the final binary
run_leg verify_sf01 bash -c 'rm -rf /tmp/vout01 && sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout01" && python3 tools/local_verify.py /tmp/vout01 /root/testdata/sf0.1 > /tmp/verify_sf01_r15.txt 2>&1; tail -2 /tmp/verify_sf01_r15.txt'

run_leg serving_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_ann_ivf_at_rest q_ann_pq_at_rest q_ann_ivfpq_at_rest q_keyword_topk_at_rest q_hybrid_rrf_indexed q_minhash_screen_at_rest q_simhash_screen_at_rest q_semantic_dedup" | grep "^{" > bench/bench_sf100_r15_serving.json'

run_leg full_sf30 env SPARK_GRAFT_SF_DIR=/tmp/sf30 SPARK_GRAFT_BENCH_OUT=bench/bench_sf30_r15_full.json sbt -batch "runMain graft.Bench"

run_leg heavy1_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_video_scenes_avi q_curation_report q_audio_resample q_corpus_curate" | grep "^{" > bench/bench_sf100_r15_heavy1.json'
run_leg heavy2_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_source_overlap q_span_scrub q_span_scrub_l20 q_multimodal_png" | grep "^{" > bench/bench_sf100_r15_heavy2.json'
run_leg heavy3_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_audio_features q_audio_meta q_audio_fingerprint q_video_dedup" | grep "^{" > bench/bench_sf100_r15_heavy3.json'

echo "=== bench chain r15b done: $(date) ===" >> "$LOG"
