#!/bin/bash
# Round-15 bench chain, part 3: remaining sf100 fourth-decade legs.
# Waits for the in-flight heavy2 leg, then runs heavy3, an isolated
# q_audio_resample re-time (adjudicates the 4.4x heavy1 number), and a
# "mid" leg of the next-12-heaviest keys by sf30 cost.
set -u
cd /root/repo
LOG=/tmp/bench_chain_r15.log
echo "=== bench chain r15c start: $(date) ===" >> "$LOG"

# wait for heavy2 (launched separately) to finish
while pgrep -f "BenchSpot /tmp/sf100 1 q_source_overlap" > /dev/null; do sleep 20; done
echo "--- heavy2 drained: $(date) ---" >> "$LOG"

run_leg() {
  local name="$1"; shift
  echo "--- leg $name start: $(date) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- leg $name done rc=$?: $(date) ---" >> "$LOG"
}

run_leg heavy3_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 1 q_audio_features q_audio_meta q_audio_fingerprint q_video_dedup" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_heavy3.json'

run_leg resample_iso bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 1 q_audio_resample" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_resample_iso.json'

run_leg mid_sf100 bash -c 'sbt -batch "runMain graft.BenchSpot /tmp/sf100 1 q_hybrid_rrf q_html_strip q_video_sample q_video_keyframes q_video_scenes q_video_meta q_perplexity_buckets q_neardup_keep_best q_perplexity_buckets_sampled q_lm_score q_join_skew_salted q_minhash_dedup_reps" 2>/dev/null | grep "^{" > bench/bench_sf100_r15_mid.json'

echo "=== bench chain r15c done: $(date) ===" >> "$LOG"
