#!/bin/bash
# Chain 20 — supersedes chain18 (killed hung) + chain19 (never started).
#
# At 04:19 UTC the axon tunnel dropped mid-epoch-8 of the seed-101
# pretrain: the in-flight execute was lost, the client reconnected
# (~04:47, new axon-conn-* threads) but the main thread waited forever on
# the dead result. 37 min of chip time gone before detection. Two fixes
# here vs chain18:
#   * every chip stage runs under a LOG-STALENESS WATCHDOG (kill if the
#     stage log hasn't moved for STALE seconds — compile through the
#     persistent cache is minutes, epochs/scan-blocks are 6-40 s, so
#     20 min of silence means a dead tunnel, not slow work);
#   * the pretrain runs in a RESUME LOOP: each retry restarts from
#     checkpoints/latest_model.msgpack (optimizer state + early-stop
#     high-water restored — cli/run_pretrain.py:208-221), so a drop
#     costs at most one epoch plus detection latency.
# Deadline: this builder session ends ~13:30 UTC; leave margin for the
# driver's round-end bench.
cd /root/repo
echo $$ > /tmp/chain20.pid
HARDEND=${HARDEND:-1787229000}   # 2026-08-20 12:30 UTC

busy() { ps -eo args | grep -E "sarssl_tpu\.cli\.run_(pretrain|downstream)|python bench\.py" \
         | grep -v grep | grep -cvE -- "--smoke|--cpu"; }
while [ "$(busy)" -gt 0 ]; do sleep 60; done

ok() { [ $(( $(date +%s) + $1 )) -lt "$HARDEND" ]; }

# watched TMO STALE LOG cmd... : run cmd (stdout+stderr -> LOG) under
# timeout TMO, kill it if LOG goes untouched for STALE seconds.
# Returns the command's exit code (124 timeout, 143 watchdog/TERM).
watched() {
  tmo=$1; stale=$2; log=$3; shift 3
  : > "$log"
  timeout -k 60 "$tmo" "$@" >> "$log" 2>&1 &
  P=$!
  while kill -0 $P 2>/dev/null; do
    sleep 30
    now=$(date +%s); mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
    if [ $(( now - mt )) -gt "$stale" ]; then
      echo "WATCHDOG: killing stalled pid $P (log quiet $(( now - mt ))s)" \
        | tee -a "$log"
      C=$(pgrep -P $P)              # the python under timeout
      kill $P 2>/dev/null
      sleep 45
      kill -9 $C $P 2>/dev/null     # a hung axon client ignores TERM
    fi
  done
  wait $P
}

S101=exp/pretrain_r5_ctf_s101
PK=data/simu_ds_packed
EP25=exp/pretrain_r4_ctf/checkpoints

# ---- Stage P: resume the seed-101 pretrain to 30/30 epochs -------------
# ~23 epochs x ~380 s ~= 2.5 h. The watchdog + resume loop bound the cost
# of further tunnel drops.
for a in 1 2 3 4 5; do
  [ -f $S101/done ] && break
  ok 3600 || { echo "pretrain resume attempt $a skipped (deadline)"; break; }
  echo "=== s101 pretrain resume attempt $a $(date) ==="
  (
    while sleep 1800; do
      [ -f $S101/checkpoints/best_model.msgpack ] || continue
      python scripts/export_ckpt_f16.py export \
          $S101/checkpoints/best_model.msgpack $S101/best_model_f16.msgpack \
          >/dev/null 2>&1 || true
    done
  ) & SNAP=$!
  # staleness 600: the resume program is warm in the persistent compile
  # cache (restart->epoch costs ~2.5 min) and epochs log every ~6.4 min,
  # so 10 min of log silence is conclusive. Downstream stages keep 1200
  # (their programs compile fresh after the reset: 4-8 min of silence is
  # legitimate there).
  watched 12000 600 $S101/resume_a$a.log \
    python -m sarssl_tpu.cli.run_pretrain --pretrain --resume \
      --device-synth --fused-attention --bs 128 --epochs 30 \
      --train-num 204800 --val-num 4096 --seed 101 --exp-dir $S101
  rc=$?
  kill $SNAP 2>/dev/null
  if [ $rc -eq 0 ]; then
    touch $S101/done
    echo "=== s101 pretrain complete (attempt $a) $(date) ==="
  else
    echo "s101 pretrain attempt $a exited rc=$rc; retrying from latest"
  fi
done
if [ -f $S101/checkpoints/best_model.msgpack ]; then
  python scripts/export_ckpt_f16.py export \
      $S101/checkpoints/best_model.msgpack $S101/best_model_f16.msgpack \
      || echo "f16 export failed"
fi

run() {  # ckpt task mode chunk budget tmo exp_sub extra...
  ckpt=$1; task=$2; mode=$3; chunk=$4; budget=$5; tmo=$6; sub=$7; shift 7
  out=exp/ds_r5/$sub/${task}_${mode}
  [ -f $out/results.json ] && { echo "HAVE $sub $task $mode"; return; }
  ok "$tmo" || { echo "SKIPPED $sub $task $mode (deadline)"; return; }
  [ -f /tmp/r5_ds_done ] || { echo "SKIPPED $sub $task $mode (no DS corpus)"; return; }
  mkdir -p exp/ds_r5/$sub
  echo "=== $sub $task $mode start $(date) ==="
  watched $tmo 1200 exp/ds_r5/$sub/${task}_${mode}.log \
    python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task $task --ds-trainmode $mode --grid-vmap \
      --grid-chunk $chunk --scan-block 25 --time-budget $budget \
      --trial-set 0 1 2 3 \
      --data-dir $PK/train --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $ckpt \
      --exp-dir $out "$@" \
    || echo "FAILED $sub $task $mode (rc=$?)"
  echo "=== $sub $task $mode end $(date) ==="
}

FULL=(--train-num 800)
LOW=(--fixed-train-subset --train-num 200)

# ---- Stage 1: the second-seed headline grid ---------------------------
if [ -f $S101/checkpoints/best_model.msgpack ]; then
  run $S101/checkpoints TDOA finetune 8 3200 5400 ctf_s101 "${FULL[@]}"
fi

# ---- Stage 2: cross-generator pretext --test ---------------------------
if [ ! -f exp/pretrain_r4_ctf/test_dumps/metrics.json ] \
   && ok 3300 && [ -f /tmp/r5_preval_done ] && [ -f $EP25/best_model.msgpack ]; then
  echo "=== pretext --test (CTF ep25 ckpt, ISM preval) $(date) ==="
  watched 3300 1200 exp/pretrain_r4_ctf/pretext_test_r5.log \
    python -m sarssl_tpu.cli.run_pretrain --test \
      --exp-dir exp/pretrain_r4_ctf --data-dir data/simu_pre_ism/preval \
      --val-num 1024 --bs 128 --fused-attention \
    || echo "FAILED pretext test"
fi

# ---- Stages 3-4: the lowdata arms --------------------------------------
run $EP25 TDOA finetune 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"
run $EP25 T60  finetune 4 2400 4000 ctf_ep25_lowdata "${LOW[@]}" --T 4.112
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25_lowdata \
    > /tmp/collect_r5_lowdata.log 2>&1 || echo "lowdata collect failed"

# ---- Stage 5: TDOA lineareval (full labels) ----------------------------
run $EP25 TDOA lineareval 8 3200 5400 ctf_ep25 "${FULL[@]}"

# ---- Stage 6: scanned-grid profile (VERDICT #5) ------------------------
if grep -q '"scanned_s_per_grid_epoch": null' GRID_VMAP_r4.json \
   && ok 2400 && [ -f /tmp/r5_ds_done ]; then
  echo "=== scanned-grid profile $(date) ==="
  watched 2400 1200 exp/ds_r5/profile_grid_vmap_r5.log \
    python scripts/profile_grid_vmap.py || echo "FAILED grid profile"
fi

# ---- Stages 7-8: remaining lineareval arms ------------------------------
run $EP25 T60  lineareval 4 2400 3300 ctf_ep25 "${FULL[@]}" --T 4.112
run $EP25 TDOA lineareval 8 1600 2700 ctf_ep25_lowdata "${LOW[@]}"

python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25 \
    > /tmp/collect_r5_ep25.log 2>&1 || echo "ep25 collect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_ep25_lowdata \
    > /tmp/collect_r5_lowdata2.log 2>&1 || echo "lowdata recollect failed"
python scripts/collect_flagship.py --base exp/ds_r5/ctf_s101 \
    > /tmp/collect_r5_s101.log 2>&1 || echo "s101 collect failed"

# ---- Stage 9: room-trials from the CTF checkpoint -----------------------
if [ ! -f exp/ds_r5/room_ctf/TDOA_finetune/results.json ] \
   && ok 3300 && [ -f /tmp/r5_room_done ]; then
  mkdir -p exp/ds_r5/room_ctf
  echo "=== room-trials TDOA finetune (CTF ep25 ckpt) $(date) ==="
  watched 3300 1200 exp/ds_r5/room_ctf/TDOA_finetune.log \
    python -m sarssl_tpu.cli.run_downstream --ds-train \
      --ds-task TDOA --ds-trainmode finetune --grid-vmap --grid-chunk 8 \
      --scan-block 25 --time-budget 2400 --room-trials --ds-nsimroom 4 \
      --ntrial 4 --train-num 400 \
      --data-dir data/simu_room16_packed/train \
      --val-data-dir $PK/val --test-data-dir $PK/test \
      --epochs 200 --val-num 1000 --test-num 4000 --workers 0 \
      --pretrain-ckpt $EP25 \
      --exp-dir exp/ds_r5/room_ctf/TDOA_finetune \
    || echo "FAILED room_ctf grid"
fi

# ---- Stage 10: grouped-conv profile (VERDICT #6's measurement) ----------
if [ ! -f exp/ds_r5/profile_conv_group.log ] && ok 1500; then
  echo "=== grouped-conv profile $(date) ==="
  watched 1500 1200 exp/ds_r5/profile_conv_group.log \
    python scripts/profile_conv_group.py || echo "FAILED conv-group profile"
fi

echo CHAIN20_DONE "$(date)"

# ---- Stage 11 (appended while running; append-only is offset-safe): ----
# one real-chip bench to validate the bench.py tunnel-drop watchdog on the
# success path and record a fresh r5 throughput number.
if ok 1500; then
  echo "=== bench validation $(date) ==="
  timeout 1500 python bench.py > exp/ds_r5/bench_r5.log 2>&1 \
    || echo "FAILED bench validation"
  tail -1 exp/ds_r5/bench_r5.log
fi
echo CHAIN20_TAIL_DONE "$(date)"
