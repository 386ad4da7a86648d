#!/bin/bash
# Chain 8 — low-label ablation rerun (lost to the axon relay outage).
# Waits for the relay to come back (port 8103), sanity-probes the chip,
# then runs the 200-label fixed-subset grids for BOTH tasks in
# scratchlow + finetune (the reference's nsimroom=2 -> 200 rule).
# One chip owner: this script sequences every run.
cd /root/repo
echo $$ > /tmp/flagship_chain8.pid

# one-owner gate: never start while any chip-owning process is alive
# (--smoke/--cpu runs don't own the chip)
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do
  echo "chip busy; waiting $(date)"; sleep 120
done
echo "=== chain8 waiting for relay $(date) ==="
while ! ss -tln 2>/dev/null | grep -qE ':8103[[:space:]]'; do sleep 60; done
echo "=== relay back $(date) — probing ==="
for i in 1 2 3; do
  timeout 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); print('probe ok', float((x @ x).sum()))" && break
  echo "probe attempt $i failed; retrying in 120s"; sleep 120
done

PK=data/simu_ds_packed
CKPT=exp/pretrain_r3/checkpoints
run() {  # task mode chunk budget tmo extra...
  task=$1; mode=$2; chunk=$3; budget=$4; tmo=$5; shift 5
  args=(--ds-train --ds-task $task --ds-trainmode $mode --grid-vmap
        --grid-chunk $chunk --scan-block 25 --time-budget $budget
        --trial-set 0 1 2 3
        --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test
        --fixed-train-subset --epochs 200 --train-num 200
        --val-num 1000 --test-num 4000
        --workers 0 --exp-dir exp/ds_r3/lowdata/${task}_${mode} "$@")
  if [ $mode != scratchlow ]; then args+=(--pretrain-ckpt $CKPT); fi
  echo "=== lowdata $task $mode start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream "${args[@]}" \
    > exp/ds_r3/lowdata/${task}_${mode}.log 2>&1 || echo "FAILED $task $mode"
  echo "=== lowdata $task $mode end $(date) ==="
}
mkdir -p exp/ds_r3/lowdata
run TDOA scratchlow 8 1600 2700
run TDOA finetune   8 1600 2700
run T60  scratchlow 4 2400 4000 --T 4.112
run T60  finetune   4 2400 4000 --T 4.112
echo CHAIN8_DONE $(date)
