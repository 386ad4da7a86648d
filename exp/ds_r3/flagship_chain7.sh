#!/bin/bash
# Low-label TDOA ablation (reference nsimroom=2 -> 200 train utts):
# does SSL pretraining help TDOA when labels are scarce?
cd /root/repo
while kill -0 $(cat /tmp/flagship_chain6.pid) 2>/dev/null; do sleep 60; done
PK=data/simu_ds_packed
CKPT=exp/pretrain_r3/checkpoints
run() {  # mode
  mode=$1
  args=(--ds-train --ds-task TDOA --ds-trainmode $mode --grid-vmap
        --grid-chunk 8 --scan-block 25 --time-budget 1600
        --trial-set 0 1 2 3
        --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test
        --fixed-train-subset --epochs 200 --train-num 200 --val-num 1000 --test-num 4000
        --workers 0 --exp-dir exp/ds_r3/lowdata/TDOA_${mode})
  if [ $mode != scratchlow ]; then args+=(--pretrain-ckpt $CKPT); fi
  echo "=== lowdata TDOA $mode start $(date) ==="
  timeout 2700 python -m sarssl_tpu.cli.run_downstream "${args[@]}" \
    > exp/ds_r3/lowdata/TDOA_${mode}.log 2>&1 || echo "FAILED $mode"
  echo "=== lowdata TDOA $mode end $(date) ==="
}
run scratchlow
run finetune
echo CHAIN7_DONE $(date)
