#!/bin/bash
# Reordered remainder of the flagship campaign: T60 first (the critical
# evidence), then lineareval grids, then the TDOA finetune t01 rerun.
cd /root/repo
PK=data/simu_ds_packed
CKPT=exp/pretrain_r3/checkpoints
run() {  # task mode trials chunk budget tmo suffix extra...
  task=$1; mode=$2; trials=$3; chunk=$4; budget=$5; tmo=$6; suffix=$7; shift 7
  args=(--ds-train --ds-task $task --ds-trainmode $mode --grid-vmap
        --grid-chunk $chunk --scan-block 25 --time-budget $budget
        --trial-set $trials
        --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test
        --epochs 200 --train-num 800 --val-num 1000 --test-num 4000
        --workers 0 --exp-dir exp/ds_r3/${task}_${mode}_${suffix} "$@")
  if [ $mode != scratchlow ]; then args+=(--pretrain-ckpt $CKPT); fi
  echo "=== $task $mode [$trials] start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream "${args[@]}" \
    > exp/ds_r3/${task}_${mode}_${suffix}.log 2>&1 || echo "FAILED $task $mode $trials"
  echo "=== $task $mode [$trials] end $(date) ==="
}
run T60  scratchlow "0 1 2 3" 4 4000 6600 full --T 4.112
run T60  finetune   "0 1 2 3" 4 4000 6600 full --T 4.112
run T60  lineareval "0 1 2 3" 4 4000 6600 full --T 4.112
run TDOA lineareval "0 1 2 3" 8 3200 5400 full
run TDOA finetune   "0 1"     8 1600 2700 t01r
echo CHAIN6_DONE $(date)
