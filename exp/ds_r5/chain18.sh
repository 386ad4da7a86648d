#!/bin/bash
# Chain 18 — the round-5 chip schedule (recreated: the first write of this
# script was untracked when the environment reset and was lost with the
# rest of the working tree — it is COMMITTED this time).
#
# Reality this version adapts to: the reset destroyed the gitignored
# full-precision checkpoints, so the planned "resume the flagship from
# epoch 25 for epochs 26-30" is impossible (no optimizer state, no
# latest_model). Instead ONE fresh 30-epoch pretrain at seed 101 serves
# both remaining pretrain directives at once:
#   - VERDICT #2: a COMPLETED 30-epoch reference schedule
#     (/root/reference/code/opt.py:31,47-48) in a committed log;
#   - VERDICT #4: a second, independent pretrain seed for the full-label
#     TDOA headline (is SSL-beats-scratch a seed artifact?).
# The surviving ep25 seed-100 checkpoint (committed f16, restored to f32)
# keys the remaining mode-matrix grids (VERDICT #3).
#
# Stage order = value order; every stage start is guarded by ok <tmo>
# (now + timeout must clear HARDEND so the chip is idle before the
# driver's round-end bench) and by the regen_r5.sh corpus markers.
# One chip owner at a time (CLAUDE.md): the busy() gate + strict
# sequencing inside this script.
cd /root/repo
echo $$ > /tmp/chain18.pid
HARDEND=${HARDEND:-1787218200}   # 2026-08-20 09:30 UTC

busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)|python bench\.py" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 60; done

ok() { [ $(( $(date +%s) + $1 )) -lt "$HARDEND" ]; }
# wait (bounded) for a regen marker; returns nonzero if it never appears
need() { n=0; while [ ! -f "$1" ]; do n=$((n+1)); [ $n -gt 60 ] && return 1; sleep 60; done; }

S101=exp/pretrain_r5_ctf_s101
mkdir -p $S101 exp/ds_r5

# ---- Stage P: seed-101 CTF pretrain, full 30-epoch schedule -----------
if ok 18600; then
  echo "=== s101 pretrain start $(date) ==="
  # background f16 snapshotter: the reset proved gitignored checkpoints
  # are volatile — export the running best to the committable f16 path
  # every 30 min so a mid-run death costs at most half an hour.
  (
    while sleep 1800; do
      [ -f $S101/checkpoints/best_model.msgpack ] || continue
      python scripts/export_ckpt_f16.py export \
          $S101/checkpoints/best_model.msgpack $S101/best_model_f16.msgpack \
          >/dev/null 2>&1 || true
    done
  ) & SNAP=$!
  timeout 18600 python -m sarssl_tpu.cli.run_pretrain --pretrain \
      --device-synth --fused-attention --bs 128 --epochs 30 \
      --train-num 204800 --val-num 4096 --seed 101 --exp-dir $S101 \
      > $S101/pretrain.log 2>&1 || echo "s101 pretrain ended by timeout/err"
  kill $SNAP 2>/dev/null
  echo "=== s101 pretrain end $(date) ==="
  if [ -f $S101/checkpoints/best_model.msgpack ]; then
    python scripts/export_ckpt_f16.py export \
        $S101/checkpoints/best_model.msgpack $S101/best_model_f16.msgpack \
        || echo "f16 export failed"
  fi
else
  echo "SKIPPED s101 pretrain (deadline)"
fi

PK=data/simu_ds_packed
EP25=exp/pretrain_r4_ctf/checkpoints   # seed-100 ep25 best, f16-roundtrip restore

run() {  # ckpt task mode chunk budget tmo exp_sub extra...
  ckpt=$1; task=$2; mode=$3; chunk=$4; budget=$5; tmo=$6; sub=$7; shift 7
  ok "$tmo" || { echo "SKIPPED $sub $task $mode (deadline)"; return; }
  need /tmp/r5_ds_done || { echo "SKIPPED $sub $task $mode (no DS corpus)"; return; }
  mkdir -p exp/ds_r5/$sub
  echo "=== $sub $task $mode start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task $task --ds-trainmode $mode --grid-vmap \
      --grid-chunk $chunk --scan-block 25 --time-budget $budget \
      --trial-set 0 1 2 3 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $ckpt \
      --exp-dir exp/ds_r5/$sub/${task}_${mode} "$@" \
      > exp/ds_r5/$sub/${task}_${mode}.log 2>&1 \
      || echo "FAILED $sub $task $mode"
  echo "=== $sub $task $mode end $(date) ==="
}

FULL=(--train-num 800)
LOW=(--fixed-train-subset --train-num 200)

# ---- Stage 1: the second-seed headline grid ---------------------------
if [ -f $S101/checkpoints/best_model.msgpack ]; then
  run $S101/checkpoints TDOA finetune 8 3200 5400 ctf_s101 "${FULL[@]}"
else
  echo "SKIPPED ctf_s101 TDOA finetune (no s101 ckpt)"
fi

# ---- Stage 2: cross-generator pretext --test (VERDICT #3's number) ----
# CTF-pretrained ep25 checkpoint evaluated on the offline-ISM preval
# corpus, vs the ISM-trained ckpt's masked MSE 0.408 / PESQ 2.53
# (exp/pretrain_r3_ism/test_dumps/metrics.json).
if ok 3300 && need /tmp/r5_preval_done && [ -f $EP25/best_model.msgpack ]; then
  echo "=== pretext --test (CTF ep25 ckpt, ISM preval) $(date) ==="
  timeout 3300 python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r4_ctf --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
      > exp/pretrain_r4_ctf/pretext_test_r5.log 2>&1 || echo "FAILED pretext test"
else
  echo "SKIPPED pretext test (deadline or no preval/ckpt)"
fi

# ---- Stages 3-4: the lowdata arms of the CTF mode matrix --------------
run $EP25 TDOA finetune 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"
run $EP25 T60  finetune 4 2400 4000 ctf_ep25_lowdata "${LOW[@]}" --T 4.112
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25_lowdata \
    > /tmp/collect_r5_lowdata.log 2>&1 || echo "lowdata collect failed"

# ---- Stages 5-7: lineareval arms ---------------------------------------
run $EP25 TDOA lineareval 8 3200 5400 ctf_ep25 "${FULL[@]}"
run $EP25 T60  lineareval 4 2400 3300 ctf_ep25 "${FULL[@]}" --T 4.112
run $EP25 TDOA lineareval 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25 \
    > /tmp/collect_r5_ep25.log 2>&1 || echo "ep25 collect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25_lowdata \
    > /tmp/collect_r5_lowdata2.log 2>&1 || echo "lowdata recollect failed"

# ---- Stage 8: the fixed scanned-grid profile (VERDICT #5) --------------
if ok 2400 && [ -f /tmp/r5_ds_done ]; then
  echo "=== scanned-grid profile $(date) ==="
  timeout 2400 python scripts/profile_grid_vmap.py \
      > exp/ds_r5/profile_grid_vmap_r5.log 2>&1 || echo "FAILED grid profile"
else
  echo "SKIPPED grid profile (deadline)"
fi

# ---- Stage 9: room-trials from the CTF checkpoint ----------------------
if ok 3300 && need /tmp/r5_room_done; then
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
else
  echo "SKIPPED room_ctf grid (deadline or no room corpus)"
fi

echo CHAIN18_DONE "$(date)"
