#!/bin/bash
# Chain 11 — post-reboot recovery campaign. The build box rebooted mid-round:
# the axon relay is back, but the gitignored data/ corpora and the pretrain
# checkpoints were wiped. regen_corpora.sh reproduces the corpora from the
# deterministic per-stage seeds; this chain owns the chip and sequences every
# remaining run:
#   1. low-label scratchlow grids (chain8's no-checkpoint half) once the
#      downstream corpus is packed;
#   2. the ISM ("generator-gap") pretrain once its corpus is packed
#      (chain9's design: pretrain on the same full-ISM generator as the
#      downstream corpus, --resident int16 staging);
#   3. chain9's full-label grids from that checkpoint (TDOA/T60 finetune +
#      TDOA lineareval);
#   4. chain8's low-label finetune grids — from the ISM checkpoint rather
#      than the lost device-synth flagship one (cleaner: no generator gap
#      inside the low-label comparison; recorded in the lowdata README);
#   5. summary collection for all three campaigns.
# One chip owner: this script sequences every chip program.
cd /root/repo
echo $$ > /tmp/recovery_chain11.pid

busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do
  echo "chip busy; waiting $(date)"; sleep 120
done
while ! ss -tln 2>/dev/null | grep -qE ':8103[[:space:]]'; do sleep 60; done
for i in 1 2 3; do
  timeout 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); print('probe ok', float((x @ x).sum()))" && break
  echo "probe attempt $i failed; retrying in 120s"; sleep 120
done

echo "=== waiting for the packed downstream corpus $(date) ==="
while ! grep -q DS_PACK_DONE /tmp/regen_corpora.log 2>/dev/null; do sleep 60; done

PK=data/simu_ds_packed
run() {  # task mode chunk budget tmo exp_sub ckpt extra...
  task=$1; mode=$2; chunk=$3; budget=$4; tmo=$5; sub=$6; ckpt=$7; shift 7
  args=(--ds-train --ds-task $task --ds-trainmode $mode --grid-vmap
        --grid-chunk $chunk --scan-block 25 --time-budget $budget
        --trial-set 0 1 2 3
        --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test
        --epochs 200 --val-num 1000 --test-num 4000
        --workers 0 --exp-dir exp/ds_r3/$sub/${task}_${mode} "$@")
  if [ "$ckpt" != none ]; then args+=(--pretrain-ckpt "$ckpt"); fi
  echo "=== $sub $task $mode start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream "${args[@]}" \
    > exp/ds_r3/$sub/${task}_${mode}.log 2>&1 || echo "FAILED $sub $task $mode"
  echo "=== $sub $task $mode end $(date) ==="
}

mkdir -p exp/ds_r3/lowdata exp/ds_r3/ism
LOW=(--fixed-train-subset --train-num 200)
run TDOA scratchlow 8 1600 2700 lowdata none "${LOW[@]}"
run T60  scratchlow 4 2400 4000 lowdata none "${LOW[@]}" --T 4.112

echo "=== waiting for the packed ISM pretrain corpus $(date) ==="
while ! grep -q ISM_PACK_DONE /tmp/regen_corpora.log 2>/dev/null; do sleep 60; done

PKP=data/simu_pre_ism_packed
echo "=== ism pretrain start $(date) ==="
timeout 7200 python -m sarssl_tpu.cli.run_pretrain --pretrain --resident \
    --resident-dtype int16 --fused-attention --bs 128 --epochs 80 \
    --train-num 12288 --val-num 2048 \
    --data-dir $PKP/pretrain --val-data-dir $PKP/preval \
    --exp-dir exp/pretrain_r3_ism \
    > exp/pretrain_r3_ism.log 2>&1 || echo "FAILED ism pretrain"
echo "=== ism pretrain end $(date) ==="
if [ ! -f exp/pretrain_r3_ism/checkpoints/best_model.msgpack ]; then
  echo "=== ism pretrain RETRY half-resident $(date) ==="
  timeout 7200 python -m sarssl_tpu.cli.run_pretrain --pretrain --resident \
      --resident-dtype int16 --resident-num 6144 --fused-attention \
      --bs 128 --epochs 80 --train-num 12288 --val-num 2048 \
      --data-dir $PKP/pretrain --val-data-dir $PKP/preval \
      --exp-dir exp/pretrain_r3_ism \
      >> exp/pretrain_r3_ism.log 2>&1 || echo "FAILED ism pretrain retry"
fi

CKPT=exp/pretrain_r3_ism/checkpoints
FULL=(--train-num 800)
run TDOA finetune   8 3200 5400 ism $CKPT "${FULL[@]}"
run T60  finetune   4 4000 6600 ism $CKPT "${FULL[@]}" --T 4.112
run TDOA lineareval 8 3200 5400 ism $CKPT "${FULL[@]}"

run TDOA finetune 8 1600 2700 lowdata $CKPT "${LOW[@]}"
run T60  finetune 4 2400 4000 lowdata $CKPT "${LOW[@]}" --T 4.112

python scripts/collect_flagship.py > /tmp/collect_main.log 2>&1 || true
python scripts/collect_flagship.py --base exp/ds_r3/lowdata \
    > /tmp/collect_lowdata.log 2>&1 || echo "lowdata collect failed"
python scripts/collect_flagship.py --base exp/ds_r3/ism \
    > /tmp/collect_ism.log 2>&1 || echo "ism collect failed"
echo CHAIN11_DONE $(date)
