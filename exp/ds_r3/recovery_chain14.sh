#!/bin/bash
# Chain 14 — resume the post-reboot recovery after the SECOND reboot killed
# chains 11-13 before any of their results landed. Identical sequencing to
# recovery_chain11.sh minus the one step that did complete and got committed
# (lowdata TDOA scratchlow, commit 43e4c72 / exp/ds_r3/lowdata/TDOA_scratchlow).
# Emits CHAIN11_DONE so the untouched restore_chain12.sh/evidence_chain13.sh
# unblock off this chain's log at /tmp/chain11.log.
cd /root/repo
echo $$ > /tmp/recovery_chain14.pid

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
# lowdata TDOA scratchlow: already committed (43e4c72) — skipped here.
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
