#!/bin/bash
# Host-side corpus regeneration after the build box rebooted and wiped the
# gitignored data/ tree (plus the compile caches and pretrain checkpoints).
# gen_simu is deterministically seeded per stage+idx (STAGE_SEEDS) with the
# default acoustics, so this reproduces the flagship corpora bit-for-bit;
# verified after packing by recomputing the predict-train-mean floors and
# comparing to the committed exp/ds_r3/wo_info_baselines.json.
# Pure host work (numpy + native ISM kernel) — never touches the chip.
cd /root/repo
echo $$ > /tmp/regen_corpora.pid
set -u
gen() { # stage num outdir
  python -m sarssl_tpu.cli.gen_simu --mode sig --stage "$1" --data-num "$2" \
      --save-dir "$3" --workers 1
}
echo "=== DS corpus $(date) ==="
gen train 2000 data/simu_ds/train
gen val   1000 data/simu_ds/val
gen test  4000 data/simu_ds/test
for s in train val test; do
  python -m sarssl_tpu.cli.pack_data --data-dir data/simu_ds/$s \
      --out data/simu_ds_packed/$s
done
echo "DS_PACK_DONE $(date)"
echo "=== ISM pretrain corpus $(date) ==="
gen pretrain 12288 data/simu_pre_ism/pretrain
gen preval    2048 data/simu_pre_ism/preval
python -m sarssl_tpu.cli.pack_data --data-dir data/simu_pre_ism/pretrain \
    --out data/simu_pre_ism_packed/pretrain --no-anno
python -m sarssl_tpu.cli.pack_data --data-dir data/simu_pre_ism/preval \
    --out data/simu_pre_ism_packed/preval --no-anno
echo "ISM_PACK_DONE $(date)"
echo "REGEN_DONE $(date)"
