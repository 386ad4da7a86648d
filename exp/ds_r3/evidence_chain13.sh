#!/bin/bash
# Chain 13 — final evidence passes once chain12 releases the chip:
#   1. pretext --test on the full-ISM pretrain checkpoint: recon MSE + PESQ
#      (mean and masked-channel) + per-instance mask/pred/tar/pesq .mat
#      bundles on held-out preval data — the committed on-chip artifact for
#      the reference's `--test --test-mode all/ins` workflow
#      (reference run_pretrain.py:404-483; VERDICT r2 missing #3).
#   2. a bench.py refresh so the round ends with a fresh throughput record.
cd /root/repo
echo $$ > /tmp/chain13.pid

echo "=== waiting for chain12 $(date) ==="
while ! grep -q CHAIN12_DONE /tmp/chain12.log 2>/dev/null; do sleep 120; done
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 120; done

if [ -f exp/pretrain_r3_ism/checkpoints/best_model.msgpack ]; then
  echo "=== pretext --test on the ISM checkpoint $(date) ==="
  timeout 3600 python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r3_ism --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
      > exp/pretrain_r3_ism_test.log 2>&1 || echo "FAILED pretext test"
else
  echo "SKIPPED pretext test: no ISM best checkpoint"
fi

echo "=== bench refresh $(date) ==="
timeout 2400 python bench.py > /tmp/bench_r3_refresh.json 2>/dev/null \
    || echo "FAILED bench"
cat /tmp/bench_r3_refresh.json
echo CHAIN13_DONE $(date)
