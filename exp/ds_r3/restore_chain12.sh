#!/bin/bash
# Chain 12 — restore the two round-3 artifacts the reboot orphaned (cited
# by docs/ROUND3_NOTES.md but wiped with the gitignored trees before they
# could be committed):
#   1. exp/pretrain_realmix_r3/ — the --real-corpora prob-mixed pretraining
#      dry-run (VERDICT r2 #8) over the four synthetic corpus layouts from
#      scripts/gen_synthetic_corpora.py;
#   2. GRID_VMAP_r3.json — the sequential vs vmapped vs scanned grid-epoch
#      profile (scripts/profile_grid_vmap.py, needs data/simu_ds_packed).
# Sequencing: host corpus gen waits for regen_corpora.sh to free the single
# core; chip programs wait for chain11 to finish (one chip owner at a time).
cd /root/repo
echo $$ > /tmp/chain12.pid

echo "=== waiting for host regen to finish $(date) ==="
while ! grep -q REGEN_DONE /tmp/regen_corpora.log 2>/dev/null; do sleep 120; done

if [ ! -d data/real_corpora_synth/RealMAN ]; then
  echo "=== generating synthetic real-corpus trees $(date) ==="
  python scripts/gen_synthetic_corpora.py --root data/real_corpora_synth \
      > /tmp/gen_synth_corpora.log 2>&1 || echo "FAILED corpora gen"
fi

echo "=== waiting for chain11 to release the chip $(date) ==="
while ! grep -q CHAIN11_DONE /tmp/chain11.log 2>/dev/null; do sleep 120; done
busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 120; done

echo "=== realmix pretrain dry-run start $(date) ==="
timeout 5400 python -m sarssl_tpu.cli.run_pretrain --pretrain \
    --real-corpora RealMAN=data/real_corpora_synth/RealMAN \
                   AMI=data/real_corpora_synth/AMI \
                   LibriCSS=data/real_corpora_synth/LibriCSS \
                   MCWSJ=data/real_corpora_synth/MCWSJ \
    --fused-attention --bs 128 --epochs 3 --train-num 4096 --val-num 512 \
    --lr 1e-4 --exp-dir exp/pretrain_realmix_r3 \
    > exp/pretrain_realmix_r3.log 2>&1 || echo "FAILED realmix"
echo "=== realmix pretrain dry-run end $(date) ==="

echo "=== grid-vmap profile start $(date) ==="
timeout 7200 python scripts/profile_grid_vmap.py \
    > /tmp/profile_grid_vmap.log 2>&1 || echo "FAILED grid profile"
echo CHAIN12_DONE $(date)
