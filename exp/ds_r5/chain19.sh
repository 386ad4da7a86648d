#!/bin/bash
# Chain 19 — round-5 deadline-extension follow-on to chain18.
#
# Why this exists: chain18 was relaunched after the second environment
# reset with HARDEND=1787221800 (10:30 UTC), the deadline of the builder
# session that relaunched it. The round-5 builder session that owns the
# rest of the round ends ~13:30 UTC, so ~2-3 h of chip time exist beyond
# chain18's belief. chain18's ok() guards will therefore skip the tail of
# the CTF mode matrix (VERDICT #3) even though the time exists.
#
# This script waits for chain18 to exit (one chip owner at a time —
# CLAUDE.md), then re-attempts every stage whose artifact is missing,
# with the true deadline. Stage bodies are copied from chain18 verbatim
# so results are comparable; the only changes are the existence guards
# and HARDEND.
cd /root/repo
echo $$ > /tmp/chain19.pid
HARDEND=${HARDEND:-1787229000}   # 2026-08-20 12:30 UTC

# wait for chain18 (and any other chip program) to finish
if [ -f /tmp/chain18.pid ]; then
  while kill -0 "$(cat /tmp/chain18.pid)" 2>/dev/null; do sleep 60; done
fi
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)|python bench\.py" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 60; done

ok() { [ $(( $(date +%s) + $1 )) -lt "$HARDEND" ]; }

S101=exp/pretrain_r5_ctf_s101
PK=data/simu_ds_packed
EP25=exp/pretrain_r4_ctf/checkpoints

run() {  # ckpt task mode chunk budget tmo exp_sub extra...
  ckpt=$1; task=$2; mode=$3; chunk=$4; budget=$5; tmo=$6; sub=$7; shift 7
  out=exp/ds_r5/$sub/${task}_${mode}
  [ -f $out/results.json ] && { echo "HAVE $sub $task $mode"; return; }
  ok "$tmo" || { echo "SKIPPED $sub $task $mode (deadline)"; return; }
  [ -f /tmp/r5_ds_done ] || { echo "SKIPPED $sub $task $mode (no DS corpus)"; return; }
  mkdir -p exp/ds_r5/$sub
  echo "=== $sub $task $mode start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task $task --ds-trainmode $mode --grid-vmap \
      --grid-chunk $chunk --scan-block 25 --time-budget $budget \
      --trial-set 0 1 2 3 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $ckpt \
      --exp-dir $out "$@" \
      > exp/ds_r5/$sub/${task}_${mode}.log 2>&1 \
      || echo "FAILED $sub $task $mode"
  echo "=== $sub $task $mode end $(date) ==="
}

FULL=(--train-num 800)
LOW=(--fixed-train-subset --train-num 200)

# Stage order = value order (same as chain18).
if [ -f $S101/checkpoints/best_model.msgpack ]; then
  run $S101/checkpoints TDOA finetune 8 3200 5400 ctf_s101 "${FULL[@]}"
fi

if [ ! -f exp/pretrain_r4_ctf/test_dumps/metrics.json ] \
   && ok 3300 && [ -f /tmp/r5_preval_done ] && [ -f $EP25/best_model.msgpack ]; then
  echo "=== pretext --test (CTF ep25 ckpt, ISM preval) $(date) ==="
  timeout 3300 python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r4_ctf --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
      > exp/pretrain_r4_ctf/pretext_test_r5.log 2>&1 || echo "FAILED pretext test"
fi

run $EP25 TDOA finetune 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"
run $EP25 T60  finetune 4 2400 4000 ctf_ep25_lowdata "${LOW[@]}" --T 4.112

run $EP25 TDOA lineareval 8 3200 5400 ctf_ep25 "${FULL[@]}"

# scanned-grid profile (VERDICT #5, a named directive with a durable JSON):
# promoted ahead of the remaining lineareval arms. Run only if the third
# column is still null in GRID_VMAP_r4.json.
if grep -q '"scanned_s_per_grid_epoch": null' GRID_VMAP_r4.json \
   && ok 2400 && [ -f /tmp/r5_ds_done ]; then
  echo "=== scanned-grid profile $(date) ==="
  timeout 2400 python scripts/profile_grid_vmap.py \
      > exp/ds_r5/profile_grid_vmap_r5.log 2>&1 || echo "FAILED grid profile"
fi

run $EP25 T60  lineareval 4 2400 3300 ctf_ep25 "${FULL[@]}" --T 4.112
run $EP25 TDOA lineareval 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"

python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25 \
    > /tmp/collect_r5_ep25_c19.log 2>&1 || echo "ep25 collect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25_lowdata \
    > /tmp/collect_r5_lowdata_c19.log 2>&1 || echo "lowdata collect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_s101 \
    > /tmp/collect_r5_s101_c19.log 2>&1 || echo "s101 collect failed"

# room-trials from the CTF checkpoint (vs ISM ckpt's 0.408 +/- 0.050)
if [ ! -f exp/ds_r5/room_ctf/TDOA_finetune/results.json ] \
   && ok 3300 && [ -f /tmp/r5_room_done ]; then
  mkdir -p exp/ds_r5/room_ctf
  echo "=== room-trials TDOA finetune (CTF ep25 ckpt) $(date) ==="
  timeout 3300 python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task TDOA --ds-trainmode finetune --grid-vmap --grid-chunk 8 \
      --scan-block 25 --time-budget 2400 --room-trials --ds-nsimroom 4 \
      --ntrial 4 --train-num 400 \
      --data-dir data/simu_room16_packed/train \
      --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $EP25 \
      --exp-dir exp/ds_r5/room_ctf/TDOA_finetune \
      > exp/ds_r5/room_ctf/TDOA_finetune.log 2>&1 \
      || echo "FAILED room_ctf grid"
fi

echo CHAIN19_DONE "$(date)"
