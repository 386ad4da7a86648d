#!/bin/bash
# Chain 22 — final-deadline follow-on to chain21.
#
# chain21's HARDEND (15:25 UTC) was computed by the PREVIOUS builder
# session against its own expected end. The current (final) builder
# session started ~08:57 UTC with ~9 h of wall clock, so the true round
# end is ~17:55 UTC. This chain waits for chain21 to exit, then re-runs
# every stage that is still missing its results artifact — the existence
# checks make completed stages no-ops, exactly like chain21 vs chain20.
#
# Safety rails (same as chain21):
#   * /tmp/chain_stop halts before the next stage;
#   * HARDEND 17:00 UTC leaves ~55 min for the driver's round-end bench;
#   * log-staleness watchdog per stage (a dead tunnel is silence).
cd /root/repo
echo $$ > /tmp/chain22.pid
HARDEND=${HARDEND:-1787245200}   # 2026-08-20 17:00 UTC

# Wait for chain21 (and any other chip owner) to drain.
while kill -0 "$(cat /tmp/chain21.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)|python bench\.py" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 60; done

ok() { [ ! -f /tmp/chain_stop ] && [ $(( $(date +%s) + $1 )) -lt "$HARDEND" ]; }

watched() {
  tmo=$1; stale=$2; log=$3; shift 3
  : > "$log"
  timeout -k 60 "$tmo" "$@" >> "$log" 2>&1 &
  P=$!
  while kill -0 $P 2>/dev/null; do
    sleep 30
    now=$(date +%s); mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
    if [ $(( now - mt )) -gt "$stale" ]; then
      echo "WATCHDOG: killing stalled pid $P (log quiet $(( now - mt ))s)" \
        | tee -a "$log"
      C=$(pgrep -P $P)
      kill $P 2>/dev/null
      sleep 45
      kill -9 $C $P 2>/dev/null
    fi
  done
  wait $P
}

S101=exp/pretrain_r5_ctf_s101
PK=data/simu_ds_packed
EP25=exp/pretrain_r4_ctf/checkpoints

run() {  # ckpt task mode chunk budget tmo exp_sub extra...
  ckpt=$1; task=$2; mode=$3; chunk=$4; budget=$5; tmo=$6; sub=$7; shift 7
  out=exp/ds_r5/$sub/${task}_${mode}
  [ -f $out/results.json ] && { echo "HAVE $sub $task $mode"; return; }
  ok "$tmo" || { echo "SKIPPED $sub $task $mode (deadline/stop)"; return; }
  [ -f /tmp/r5_ds_done ] || { echo "SKIPPED $sub $task $mode (no DS corpus)"; return; }
  mkdir -p exp/ds_r5/$sub
  echo "=== $sub $task $mode start $(date) ==="
  watched $tmo 1200 exp/ds_r5/$sub/${task}_${mode}.log \
    python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task $task --ds-trainmode $mode --grid-vmap \
      --grid-chunk $chunk --scan-block 25 --time-budget $budget \
      --trial-set 0 1 2 3 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $ckpt \
      --exp-dir $out "$@" \
    || echo "FAILED $sub $task $mode (rc=$?)"
  echo "=== $sub $task $mode end $(date) ==="
}

FULL=(--train-num 800)
LOW=(--fixed-train-subset --train-num 200)

# ---- Anything chain20/21 skipped, in VERDICT-priority order -------------

# Second-seed T60 finetune — extends the two-seed evidence to T60.
if [ -f $S101/checkpoints/best_model.msgpack ]; then
  run $S101/checkpoints T60 finetune 4 2400 4000 ctf_s101 "${FULL[@]}" --T 4.112
fi

# Cross-generator pretext --test (if chain20's attempt failed).
if [ ! -f exp/pretrain_r4_ctf/test_dumps/metrics.json ] \
   && ok 3300 && [ -f /tmp/r5_preval_done ] && [ -f $EP25/best_model.msgpack ]; then
  echo "=== pretext --test retry (CTF ep25 ckpt, ISM preval) $(date) ==="
  watched 3300 1200 exp/pretrain_r4_ctf/pretext_test_r5.log \
    python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r4_ctf --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
    || echo "FAILED pretext test"
fi

# Lowdata arms.
run $EP25 TDOA finetune 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"
run $EP25 T60  finetune 4 2400 4000 ctf_ep25_lowdata "${LOW[@]}" --T 4.112
# Lineareval arms.
run $EP25 TDOA lineareval 8 3200 5400 ctf_ep25 "${FULL[@]}"
run $EP25 T60  lineareval 4 2400 3300 ctf_ep25 "${FULL[@]}" --T 4.112
run $EP25 TDOA lineareval 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"

# Scanned-grid profile (VERDICT #5).
if grep -q '"scanned_s_per_grid_epoch": null' GRID_VMAP_r4.json \
   && ok 2400 && [ -f /tmp/r5_ds_done ]; then
  echo "=== scanned-grid profile $(date) ==="
  watched 2400 1200 exp/ds_r5/profile_grid_vmap_r5.log \
    python scripts/profile_grid_vmap.py || echo "FAILED grid profile"
fi

# Room-trials from the CTF checkpoint.
if [ ! -f exp/ds_r5/room_ctf/TDOA_finetune/results.json ] \
   && ok 3300 && [ -f /tmp/r5_room_done ]; then
  mkdir -p exp/ds_r5/room_ctf
  echo "=== room-trials TDOA finetune (CTF ep25 ckpt) $(date) ==="
  watched 3300 1200 exp/ds_r5/room_ctf/TDOA_finetune.log \
    python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task TDOA --ds-trainmode finetune --grid-vmap --grid-chunk 8 \
      --scan-block 25 --time-budget 2400 --room-trials --ds-nsimroom 4 \
      --ntrial 4 --train-num 400 \
      --data-dir data/simu_room16_packed/train \
      --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $EP25 \
      --exp-dir exp/ds_r5/room_ctf/TDOA_finetune \
    || echo "FAILED room_ctf grid"
fi

# Grouped-conv profile (VERDICT #6's measurement).
if [ ! -f exp/ds_r5/profile_conv_group.log ] && ok 1500; then
  echo "=== grouped-conv profile $(date) ==="
  watched 1500 1200 exp/ds_r5/profile_conv_group.log \
    python scripts/profile_conv_group.py || echo "FAILED conv-group profile"
fi

# Collects (idempotent).
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25 \
    > /tmp/collect_r5_ep25.log 2>&1 || echo "ep25 collect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25_lowdata \
    > /tmp/collect_r5_lowdata2.log 2>&1 || echo "lowdata collect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_s101 \
    > /tmp/collect_r5_s101.log 2>&1 || echo "s101 collect failed"

# Bench validation — only well clear of the deadline so the chip is
# guaranteed idle for the driver's round-end bench.
if [ ! -s exp/ds_r5/bench_r5.log ] && ok 1500; then
  echo "=== bench validation $(date) ==="
  timeout 1500 python bench.py > exp/ds_r5/bench_r5.log 2>&1 \
    || echo "FAILED bench validation"
  tail -1 exp/ds_r5/bench_r5.log
fi
echo CHAIN22_DONE "$(date)"
