#!/bin/bash
# Round 5 — host-side corpus regeneration after the second environment
# reset (the first was r3's: see exp/ds_r3/regen_corpora.sh). The reset
# wiped every gitignored artifact: data/ corpora, full-precision
# checkpoints, compile caches. gen_simu is deterministically seeded per
# stage+idx, so the downstream corpora reproduce bit-for-bit; the ep25
# flagship weights survive as the committed f16 export (restored to f32 by
# scripts/export_ckpt_f16.py — built for exactly this failure in r4).
# Pure host work (numpy + the on-demand-built C++ ISM kernel); never
# touches the chip, safe to run beside the chain18 pretrain.
# Emits /tmp/r5_ds_done, /tmp/r5_preval_done, /tmp/r5_room_done markers
# that gate chain18's grid stages.
cd /root/repo
echo $$ > /tmp/regen_r5.pid
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
touch /tmp/r5_ds_done
echo "DS_PACK_DONE $(date)"

echo "=== ISM preval corpus (pretext --test target) $(date) ==="
gen preval 2048 data/simu_pre_ism/preval
touch /tmp/r5_preval_done
echo "PREVAL_DONE $(date)"

echo "=== certain-room corpus (room-trials protocol) $(date) ==="
if [ ! -f data/simu_room16/R15/49_1_info.npz ]; then
  python -m sarssl_tpu.cli.gen_simu_certain_room --stage train \
      --room-num 16 --rir-per-room 50 --sig-per-rir 2 \
      --save-dir data/simu_room16 --T 4.112 --workers 1 \
      || { echo "FAILED room gen"; exit 1; }
fi
python -m sarssl_tpu.cli.pack_data --data-dir data/simu_room16 \
    --out data/simu_room16_packed/train
touch /tmp/r5_room_done
echo "ROOM_PACK_DONE $(date)"
echo "REGEN_R5_DONE $(date)"
