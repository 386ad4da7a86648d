#!/bin/bash
# Chain 17 — follow-ons from the CTF checkpoint, queued behind chain16b.
# Stages, most valuable first:
#   1. pretext --test of the CTF checkpoint on the offline-ISM preval
#      corpus — the apples-to-apples cross-generator recon number against
#      the ISM checkpoint's masked MSE 0.408 / PESQ 2.53
#      (exp/pretrain_r3_ism/test_dumps/metrics.json).
#   2. TDOA lineareval at 200 fixed labels — the missing lowdata mode arm
#      (r3 lowdata has finetune+scratch only).
#   3. room-trials TDOA finetune from the CTF ckpt — ties the new flagship
#      checkpoint to the reference's room-subset protocol (chain15 ran it
#      from the ISM ckpt: 0.408 ± 0.057 mean best-per-trial test MAE).
#   4. T60 lineareval full labels — completes the CTF campaign's mode
#      matrix.
# Every stage start is guarded by a hard deadline (01:10 UTC Aug 20) and
# capped by a timeout so nothing can still own the chip when the driver's
# round-end bench fires (~02:30); stages are independent, later ones are
# the first to be sacrificed.
cd /root/repo
echo $$ > /tmp/chain17.pid
DEADLINE=1787188200

echo "=== waiting for chain16b $(date) ==="
while ! grep -q CHAIN16B_DONE /tmp/chain16b.log 2>/dev/null; do
  # if chain16b died without its marker, bail rather than guess chip state
  kill -0 "$(cat /tmp/chain16b.pid 2>/dev/null)" 2>/dev/null \
    || { grep -q CHAIN16B_DONE /tmp/chain16b.log 2>/dev/null || \
         { echo "chain16b died without finishing — aborting"; exit 1; }; }
  sleep 120
done
sleep 60

CKPT=exp/pretrain_r4_ctf/checkpoints
PK=data/simu_ds_packed

ok() { [ "$(date +%s)" -lt "$DEADLINE" ]; }

if ok && [ -f $CKPT/best_model.msgpack ]; then
  echo "=== pretext --test (CTF ckpt, ISM preval) $(date) ==="
  timeout 3300 python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r4_ctf --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
      > exp/pretrain_r4_ctf_test.log 2>&1 || echo "FAILED pretext test"
else
  echo "SKIPPED pretext test (deadline or no ckpt)"
fi

if ok; then
  echo "=== TDOA lineareval @200 (lowdata arm) $(date) ==="
  timeout 2700 python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task TDOA --ds-trainmode lineareval --grid-vmap \
      --grid-chunk 8 --scan-block 25 --time-budget 1600 \
      --trial-set 0 1 2 3 --fixed-train-subset --train-num 200 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $CKPT \
      --exp-dir exp/ds_r4/ctf_lowdata/TDOA_lineareval \
      > exp/ds_r4/ctf_lowdata/TDOA_lineareval.log 2>&1 \
      || echo "FAILED lowdata lineareval"
  python scripts/collect_flagship.py --base exp/ds_r4/ctf_lowdata \
      > /tmp/collect_ctf_lowdata2.log 2>&1 || echo "lowdata recollect failed"
else
  echo "SKIPPED lowdata lineareval (deadline)"
fi

if ok; then
  echo "=== room-trials TDOA finetune (CTF ckpt) $(date) ==="
  mkdir -p exp/ds_r4/room_ctf
  timeout 3300 python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task TDOA --ds-trainmode finetune --grid-vmap --grid-chunk 8 \
      --scan-block 25 --time-budget 2400 --room-trials --ds-nsimroom 4 \
      --ntrial 4 --train-num 400 \
      --data-dir data/simu_room16_packed/train \
      --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $CKPT \
      --exp-dir exp/ds_r4/room_ctf/TDOA_finetune \
      > exp/ds_r4/room_ctf/TDOA_finetune.log 2>&1 \
      || echo "FAILED room_ctf grid"
else
  echo "SKIPPED room_ctf grid (deadline)"
fi

if ok; then
  echo "=== T60 lineareval full (CTF campaign completeness) $(date) ==="
  timeout 3300 python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task T60 --ds-trainmode lineareval --grid-vmap \
      --grid-chunk 4 --scan-block 25 --time-budget 2400 \
      --trial-set 0 1 2 3 --train-num 800 --T 4.112 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $CKPT \
      --exp-dir exp/ds_r4/ctf/T60_lineareval \
      > exp/ds_r4/ctf/T60_lineareval.log 2>&1 \
      || echo "FAILED T60 lineareval"
  python scripts/collect_flagship.py --base exp/ds_r4/ctf \
      > /tmp/collect_ctf2.log 2>&1 || echo "ctf recollect failed"
else
  echo "SKIPPED T60 lineareval (deadline)"
fi

echo CHAIN17_DONE "$(date)"
