#!/bin/bash
# Chain 16b — chain16 relaunched to start IMMEDIATELY.
#
# chain16 was queued to wait for the driver's round-end bench (12 h grace)
# because the previous builder session was ending; the round then restarted
# with ~12 h of fresh wall-clock, so that wait would have idled the chip all
# round and raced the pretrain against the NEXT round-end bench when the
# grace expired. This variant is the same pipeline (big pretrain on the new
# CTF device generator, then TDOA/T60 finetune full + 200-label and TDOA
# lineareval grids from that checkpoint — see ctf_chain16.sh's header for
# the science), started now under builder supervision so every result lands
# and is committed inside round 4. Pretrain timeout trimmed 16800 -> 14400 s
# so the worst-case chain end stays clear of the round boundary; per-epoch
# checkpointing means a timeout kill still leaves best_model.
cd /root/repo
echo $$ > /tmp/chain16b.pid

busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)|python bench\.py" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 60; done

echo "=== CTF pretrain start $(date) ==="
timeout 14400 python -m sarssl_tpu.cli.run_pretrain --pretrain \
    --device-synth --fused-attention --bs 128 --epochs 30 \
    --train-num 204800 --val-num 4096 --exp-dir exp/pretrain_r4_ctf \
    > exp/pretrain_r4_ctf.log 2>&1 || echo "pretrain ended by timeout/err"
echo "=== CTF pretrain end $(date) ==="

CKPT=exp/pretrain_r4_ctf/checkpoints
if [ ! -f $CKPT/best_model.msgpack ]; then
  echo "NO CTF CHECKPOINT — aborting chain16b grids"; exit 1
fi
python scripts/export_ckpt_f16.py export $CKPT/best_model.msgpack \
    exp/pretrain_r4_ctf/best_model_f16.msgpack \
    || echo "f16 export failed; commit the raw checkpoint"

PK=data/simu_ds_packed
run() {  # task mode chunk budget tmo exp_sub extra...
  task=$1; mode=$2; chunk=$3; budget=$4; tmo=$5; sub=$6; shift 6
  mkdir -p exp/ds_r4/$sub
  echo "=== $sub $task $mode start $(date) ==="
  timeout $tmo python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task $task --ds-trainmode $mode --grid-vmap \
      --grid-chunk $chunk --scan-block 25 --time-budget $budget \
      --trial-set 0 1 2 3 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $CKPT \
      --exp-dir exp/ds_r4/$sub/${task}_${mode} "$@" \
      > exp/ds_r4/$sub/${task}_${mode}.log 2>&1 \
      || echo "FAILED $sub $task $mode"
  echo "=== $sub $task $mode end $(date) ==="
}

FULL=(--train-num 800)
LOW=(--fixed-train-subset --train-num 200)
run TDOA finetune 8 3200 5400 ctf "${FULL[@]}"
run T60  finetune 4 4000 6600 ctf "${FULL[@]}" --T 4.112
run TDOA finetune 8 1600 2700 ctf_lowdata "${LOW[@]}"
run T60  finetune 4 2400 4000 ctf_lowdata "${LOW[@]}" --T 4.112
run TDOA lineareval 8 3200 5400 ctf "${FULL[@]}"

python scripts/collect_flagship.py --base exp/ds_r4/ctf \
    > /tmp/collect_ctf.log 2>&1 || echo "ctf collect failed"
python scripts/collect_flagship.py --base exp/ds_r4/ctf_lowdata \
    > /tmp/collect_ctf_lowdata.log 2>&1 || echo "ctf lowdata collect failed"
echo CHAIN16B_DONE "$(date)"
