#!/bin/bash
# Chain 15 (round 4) — replaces the sleeping restore_chain12.sh /
# evidence_chain13.sh with one prioritized queue so the highest-value chip
# work lands first if the round runs out of wall clock:
#   1. realmix pretrain dry-run  (restores exp/pretrain_realmix_r3, r3 weak #3)
#   2. --room-trials TDOA finetune grid on the certain-room corpus
#      (closes the last partial component: per-trial room-subset sim trials,
#       reference run_downstream.py:173-181 + opt.py:205-214)
#   3. pretext --test on the ISM checkpoint (recon MSE + PESQ evidence)
#   4. grid-vmap profile (restores the lost r3 measurement as GRID_VMAP_r4.json)
#   5. bench refresh + summary collects
# One chip owner: waits for recovery_chain14.sh (CHAIN11_DONE) to finish.
cd /root/repo
echo $$ > /tmp/chain15.pid

busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
echo "=== waiting for chain14 to release the chip $(date) ==="
while ! grep -q CHAIN11_DONE /tmp/chain11.log 2>/dev/null; do sleep 120; done
while [ "$(busy)" -gt 0 ]; do sleep 120; done

if [ ! -d data/real_corpora_synth/RealMAN ]; then
  echo "=== generating synthetic real-corpus trees $(date) ==="
  python scripts/gen_synthetic_corpora.py --root data/real_corpora_synth \
      > /tmp/gen_synth_corpora.log 2>&1 || echo "FAILED corpora gen"
fi

echo "=== realmix pretrain dry-run start $(date) ==="
timeout 4500 python -m sarssl_tpu.cli.run_pretrain --pretrain \
    --real-corpora RealMAN=data/real_corpora_synth/RealMAN \
                   AMI=data/real_corpora_synth/AMI \
                   LibriCSS=data/real_corpora_synth/LibriCSS \
                   MCWSJ=data/real_corpora_synth/MCWSJ \
    --fused-attention --bs 128 --epochs 3 --train-num 4096 --val-num 512 \
    --lr 1e-4 --exp-dir exp/pretrain_realmix_r3 \
    > exp/pretrain_realmix_r3.log 2>&1 || echo "FAILED realmix"
echo "=== realmix pretrain dry-run end $(date) ==="

echo "=== waiting for the packed certain-room corpus $(date) ==="
while ! grep -q ROOM_PACK_DONE /tmp/gen_room.log 2>/dev/null; do sleep 60; done

echo "=== room-trials TDOA finetune start $(date) ==="
mkdir -p exp/ds_r4
timeout 4500 python -m sarssl_tpu.cli.run_downstream --ds-train \
    --ds-task TDOA --ds-trainmode finetune --grid-vmap --grid-chunk 8 \
    --scan-block 25 --time-budget 2700 --room-trials --ds-nsimroom 4 \
    --ntrial 4 --train-num 400 \
    --data-dir data/simu_room16_packed/train \
    --val-data-dir data/simu_ds_packed/val \
    --test-data-dir data/simu_ds_packed/test \
    --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
    --pretrain-ckpt exp/pretrain_r3_ism/checkpoints \
    --exp-dir exp/ds_r4/room_TDOA_finetune \
    > exp/ds_r4/room_TDOA_finetune.log 2>&1 || echo "FAILED room grid"
echo "=== room-trials TDOA finetune end $(date) ==="

if [ -f exp/pretrain_r3_ism/checkpoints/best_model.msgpack ]; then
  echo "=== pretext --test on the ISM checkpoint $(date) ==="
  timeout 3600 python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r3_ism --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
      > exp/pretrain_r3_ism_test.log 2>&1 || echo "FAILED pretext test"
else
  echo "SKIPPED pretext test: no ISM best checkpoint"
fi

echo "=== grid-vmap profile start $(date) ==="
timeout 5400 python scripts/profile_grid_vmap.py \
    > /tmp/profile_grid_vmap.log 2>&1 || echo "FAILED grid profile"

echo "=== bench refresh $(date) ==="
timeout 2400 python bench.py > /tmp/bench_r4_refresh.json 2>/dev/null \
    || echo "FAILED bench"
cat /tmp/bench_r4_refresh.json

python scripts/collect_flagship.py --base exp/ds_r3/lowdata \
    > /tmp/collect_lowdata.log 2>&1 || echo "lowdata collect failed"
python scripts/collect_flagship.py --base exp/ds_r3/ism \
    > /tmp/collect_ism.log 2>&1 || echo "ism collect failed"
echo CHAIN15_DONE "$(date)"
