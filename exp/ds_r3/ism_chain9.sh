#!/bin/bash
# Chain 9 — generator-gap experiment. The flagship pretrain used the
# on-device synth generator (MTF-approximate tails) while the downstream
# corpus is full ISM; TDOA finetune tied with scratch (README.md). This
# chain pretrains on a full-ISM packed corpus (same generator as
# downstream, --resident staging) and reruns the full-label TDOA/T60
# grids from that checkpoint. If the tie was the generator gap, TDOA
# finetune should now separate from scratchlow (0.2301).
# One chip owner: waits for chain8, then owns the chip.
cd /root/repo
echo $$ > /tmp/ism_chain9.pid

echo "=== chain9 waiting for chain8 $(date) ==="
while [ -f /tmp/flagship_chain8.pid ] \
      && kill -0 $(cat /tmp/flagship_chain8.pid) 2>/dev/null; do sleep 60; done
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do
  echo "chip busy; waiting $(date)"; sleep 120
done
echo "=== chain8 gone; waiting for relay $(date) ==="
while ! ss -tln 2>/dev/null | grep -qE ':8103[[:space:]]'; do sleep 60; done
for i in 1 2 3; do
  timeout 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); print('probe ok', float((x @ x).sum()))" && break
  echo "probe attempt $i failed; retrying in 120s"; sleep 120
done

PKP=data/simu_pre_ism_packed
# a second 12,288-utt tranche (gen_simu --idx0) may still be generating;
# use the doubled corpus when its pack marker exists, else tranche 1
if [ -d $PKP/pretrain2 ] && grep -q PACK_T2_DONE /tmp/gen_ism_t2.log 2>/dev/null; then
  TRAIN_DIR=$PKP/pretrain2; NTRAIN=24576; NEP=60
else
  TRAIN_DIR=$PKP/pretrain; NTRAIN=12288; NEP=80
fi
echo "=== ism pretrain start $(date) dir=$TRAIN_DIR n=$NTRAIN ep=$NEP ==="
# int16 staging: the 24,576-utt corpus is 12.9 GB f32 — over the v5e's
# 16 GB HBM next to the model working set; 6.5 GB quantized (~-90 dB)
timeout 7200 python -m sarssl_tpu.cli.run_pretrain --pretrain --resident \
    --resident-dtype int16 --fused-attention --bs 128 --epochs $NEP \
    --train-num $NTRAIN --val-num 2048 \
    --data-dir $TRAIN_DIR --val-data-dir $PKP/preval \
    --exp-dir exp/pretrain_r3_ism \
    > exp/pretrain_r3_ism.log 2>&1 || echo "FAILED ism pretrain"
echo "=== ism pretrain end $(date) ==="

# HBM fallback: if the full staged corpus OOMed (no checkpoint written),
# retry staging only the first half (--resident-num)
if [ ! -f exp/pretrain_r3_ism/checkpoints/best_model.msgpack ]; then
  echo "=== ism pretrain RETRY half-resident $(date) ==="
  timeout 7200 python -m sarssl_tpu.cli.run_pretrain --pretrain --resident \
      --resident-dtype int16 --resident-num 12288 --fused-attention \
      --bs 128 --epochs 80 --train-num 12288 --val-num 2048 \
      --data-dir $TRAIN_DIR --val-data-dir $PKP/preval \
      --exp-dir exp/pretrain_r3_ism \
      >> exp/pretrain_r3_ism.log 2>&1 || echo "FAILED ism pretrain retry"
fi

PK=data/simu_ds_packed
CKPT=exp/pretrain_r3_ism/checkpoints
run() {  # task mode chunk budget tmo extra...
  task=$1; mode=$2; chunk=$3; budget=$4; tmo=$5; shift 5
  args=(--ds-train --ds-task $task --ds-trainmode $mode --grid-vmap
        --grid-chunk $chunk --scan-block 25 --time-budget $budget
        --trial-set 0 1 2 3
        --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test
        --epochs 200 --train-num 800 --val-num 1000 --test-num 4000
        --workers 0 --pretrain-ckpt $CKPT
        --exp-dir exp/ds_r3/ism/${task}_${mode} "$@")
  echo "=== ism $task $mode start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream "${args[@]}" \
    > exp/ds_r3/ism/${task}_${mode}.log 2>&1 || echo "FAILED $task $mode"
  echo "=== ism $task $mode end $(date) ==="
}
mkdir -p exp/ds_r3/ism
run TDOA finetune   8 3200 5400
run T60  finetune   4 4000 6600 --T 4.112
run TDOA lineareval 8 3200 5400
echo CHAIN9_DONE $(date)
