#!/bin/bash
# Round 4 — host-side generation of the certain-room downstream corpus for
# the --room-trials protocol (reference run_downstream.py:173-181 +
# opt.py:205-214: per-trial disjoint room subsets, nsimroom rooms x 50 RIR
# x 2 src). 16 rooms -> 4 disjoint 4-room trials of 400 train sigs each.
# Pure host work (C++ ISM kernel, 1 core); safe to run beside a chip
# program. Emits ROOM_PACK_DONE for room_chain15.sh.
cd /root/repo
echo $$ > /tmp/gen_room.pid

if [ ! -f data/simu_room16/R15/49_1_info.npz ]; then
  echo "=== certain-room gen start $(date) ==="
  python -m sarssl_tpu.cli.gen_simu_certain_room --stage train \
      --room-num 16 --rir-per-room 50 --sig-per-rir 2 \
      --save-dir data/simu_room16 --T 4.112 --workers 1 \
      || { echo "FAILED room gen"; exit 1; }
fi
echo "=== packing $(date) ==="
python -m sarssl_tpu.cli.pack_data --data-dir data/simu_room16 \
    --out data/simu_room16_packed/train \
    || { echo "FAILED room pack"; exit 1; }
echo ROOM_PACK_DONE "$(date)"
