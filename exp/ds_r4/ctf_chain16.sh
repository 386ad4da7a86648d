#!/bin/bash
# Chain 16 — the round-4 flagship follow-up: re-run the big pretrain with
# the NEW higher-order CTF device generator (commit 82e2ce0 replaced the
# order-1 MTF synth), then the downstream grids from that checkpoint.
# This is the experiment neither r3 arm could be: the device-synth flagship
# had big data (6.1M utts) but a generator gap; the ISM arm matched the
# generator but only had 12,288 utts. The CTF generator gives BOTH —
# matched reverberation physics at on-device synthesis throughput. If the
# TDOA finetune-vs-scratch tie (0.2401 vs 0.2301, exp/ds_r3/summary.json)
# was the generator gap + data-budget interaction, this flips it.
#
# Scheduling: waits for chain15 (CHAIN15_DONE), then for the driver's
# end-of-round bench (BENCH_r04*.json appearing, up to a 12 h grace) so the
# recorded bench number is never polluted by a concurrent pretrain
# (one chip owner — CLAUDE.md). The grace was raised from 2 h mid-round:
# the round ran long, and a grace expiry before the driver's bench would
# have started the pretrain underneath the bench run — exactly the
# HBM-thrash case the wait exists to prevent. Designed to run across the
# round boundary; round 5 commits whatever has landed.
# SUPERSEDED by ctf_chain16b.sh (round-4 session 2): the round restarted
# with fresh wall-clock, so the bench wait below would have idled the chip
# all round; the 16b variant runs the identical pipeline immediately. This
# script exits if 16b has ever started, so a stray re-run can never put a
# second program on the chip next to it.
if [ -f /tmp/chain16b.pid ]; then
  echo "superseded by ctf_chain16b.sh — exiting"; exit 0
fi
cd /root/repo
echo $$ > /tmp/chain16.pid

busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)|python bench\.py" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }

echo "=== waiting for chain15 $(date) ==="
while ! grep -q CHAIN15_DONE /tmp/chain15.log 2>/dev/null; do sleep 120; done

echo "=== waiting for the driver's round-end bench $(date) ==="
w=0
while ! ls BENCH_r04*.json >/dev/null 2>&1 && [ "$w" -lt 43200 ]; do
  sleep 120; w=$((w + 120))
done
while [ "$(busy)" -gt 0 ]; do sleep 120; done
sleep 300   # let the driver finish any post-bench device fetches

echo "=== CTF pretrain start $(date) ==="
# Per-epoch checkpointing means a timeout kill still leaves best_model;
# the grids below run from whatever best checkpoint exists.
timeout 16800 python -m sarssl_tpu.cli.run_pretrain --pretrain \
    --device-synth --fused-attention --bs 128 --epochs 30 \
    --train-num 204800 --val-num 4096 --exp-dir exp/pretrain_r4_ctf \
    > exp/pretrain_r4_ctf.log 2>&1 || echo "pretrain ended by timeout/err"
echo "=== CTF pretrain end $(date) ==="

CKPT=exp/pretrain_r4_ctf/checkpoints
if [ ! -f $CKPT/best_model.msgpack ]; then
  echo "NO CTF CHECKPOINT — aborting chain16 grids"; exit 1
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
echo CHAIN16_DONE "$(date)"
