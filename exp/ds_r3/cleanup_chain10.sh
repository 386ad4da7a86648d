#!/bin/bash
# Chain 10 — campaign cleanup. After chain9: rerun the TDOA lineareval
# trial-2/3 chunk that the relay outage cost the flagship table (original
# device-synth checkpoint), then refresh every summary
# (scripts/collect_flagship.py --base). One chip owner: waits for chain9.
cd /root/repo
echo $$ > /tmp/cleanup_chain10.pid

echo "=== chain10 waiting for chain9 $(date) ==="
while [ -f /tmp/ism_chain9.pid ] \
      && kill -0 $(cat /tmp/ism_chain9.pid) 2>/dev/null; do sleep 60; done
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do
  echo "chip busy; waiting $(date)"; sleep 120
done
while ! ss -tln 2>/dev/null | grep -qE ':8103[[:space:]]'; do sleep 60; done
timeout 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8)); print('probe ok', float((x @ x).sum()))" || \
  echo "probe failed; proceeding anyway"

PK=data/simu_ds_packed
echo "=== TDOA lineareval t23 start $(date) ==="
timeout 2700 python -m sarssl_tpu.cli.run_downstream \
    --ds-train --ds-task TDOA --ds-trainmode lineareval --grid-vmap \
    --grid-chunk 8 --scan-block 25 --time-budget 1600 --trial-set 2 3 \
    --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
    --epochs 200 --train-num 800 --val-num 1000 --test-num 4000 \
    --workers 0 --pretrain-ckpt exp/pretrain_r3/checkpoints \
    --exp-dir exp/ds_r3/TDOA_lineareval_t23 \
    > exp/ds_r3/TDOA_lineareval_t23.log 2>&1 || echo "FAILED le t23"
echo "=== TDOA lineareval t23 end $(date) ==="

python scripts/collect_flagship.py > /tmp/collect_main.log 2>&1
python scripts/collect_flagship.py --base exp/ds_r3/lowdata \
    > /tmp/collect_lowdata.log 2>&1 || echo "lowdata collect failed"
python scripts/collect_flagship.py --base exp/ds_r3/ism \
    > /tmp/collect_ism.log 2>&1 || echo "ism collect failed"
echo CHAIN10_DONE $(date)
