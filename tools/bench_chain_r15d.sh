#!/bin/bash
# Round-15 bench chain, part 4 (the session-2 close): oracle gates on the
# final HEAD (now including the factored/impact serving keys), the trio,
# the sf100 serving re-spot with the factored lexical flip, the remaining
# fourth-decade legs (heavy3 + the audio_resample adjudication + the mid
# 12), and the re-measured append economics on the v2 keyword layout.
# One JVM at a time — the numbers assume sole ownership of the 32 cores.
set -u
cd /root/repo
LOG=/tmp/bench_chain_r15d.log
echo "=== bench chain r15d start: $(date) ===" >> "$LOG"

run_leg() {
  local name="$1"; shift
  echo "--- leg $name start: $(date) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- leg $name done rc=$?: $(date) ---" >> "$LOG"
}

# 1. oracle gate at sf0.01 (the driver's t2 replay, all keys)
run_leg verify_sf001 bash -c 'rm -rf /tmp/verify_sf001 && sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001" && python3 tools/local_verify.py /tmp/verify_sf001 /root/testdata/sf0.01 > /tmp/verify_sf001_r15d.txt 2>&1; tail -3 /tmp/verify_sf001_r15d.txt'

# 2. trio on final HEAD
run_leg trio_sf01 env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench/bench_sf0.1_r15b.json sbt -batch "runMain graft.Bench"
run_leg trio_sf1 env SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_BENCH_OUT=bench/bench_sf1_r15b.json sbt -batch "runMain graft.Bench"
run_leg trio_sf10 env SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_BENCH_OUT=bench/bench_sf10_r15b.json sbt -batch "runMain graft.Bench"

# 3. sf100 serving re-spot: the r15 serving eight + the two new keyword
#    serving modes; cold pass-1 = one-per-vintage builds (warehouse wiped)
run_leg serving_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 2 q_ann_ivf_at_rest q_ann_pq_at_rest q_ann_ivfpq_at_rest q_keyword_topk_at_rest q_keyword_topk_factored q_keyword_topk_impact q_hybrid_rrf_indexed q_minhash_screen_at_rest q_simhash_screen_at_rest q_semantic_dedup" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_serving2.json'

# 4. remaining fourth-decade heavy legs (VERDICT r14 #4)
run_leg heavy3_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 1 q_audio_features q_audio_meta q_audio_fingerprint q_video_dedup" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_heavy3.json'

# 5. isolated q_audio_resample re-time (adjudicates the 4.45x heavy1 row)
run_leg resample_iso bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 1 q_audio_resample" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_resample_iso.json'

# 6. mid leg: the next-12-heaviest keys by sf30 cost
run_leg mid_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 1 q_hybrid_rrf q_html_strip q_video_sample q_video_keyframes q_video_scenes q_video_meta q_perplexity_buckets q_neardup_keep_best q_perplexity_buckets_sampled q_lm_score q_join_skew_salted q_minhash_dedup_reps" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_mid.json'

# 7. append economics re-measured on the v2 keyword layout (champion
#    bands + factored relations make the keyword build/append richer)
run_leg append_v2 sbt -batch "runMain graft.AppendBench /tmp/sf10 /root/testdata/sf0.1 bench/append_r15b.json"

# 8. oracle gate at sf0.1 (the round-close replay)
run_leg verify_sf01 bash -c 'rm -rf /tmp/verify_sf01 && sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01" && python3 tools/local_verify.py /tmp/verify_sf01 /root/testdata/sf0.1 > /tmp/verify_sf01_r15d.txt 2>&1; tail -3 /tmp/verify_sf01_r15d.txt'

echo "=== bench chain r15d done: $(date) ===" >> "$LOG"
