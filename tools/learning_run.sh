#!/usr/bin/env bash
# Synthetic end-to-end learning validation (VERDICT r2 item 3).
#
# Trains a detector from scratch on the 64-image synthetic dataset in chunks
# of N epochs (warm-restoring the best checkpoint between chunks — exercising
# train -> checkpoint -> restore -> NMS -> mAP as one system), printing the
# test mAP after every chunk.  Reference capability: run.py:115 (trainer.fit)
# followed by run.py:117-118 (trainer.test).
#
# Usage: tools/learning_run.sh MODEL IMG CHUNK_EPOCHS N_CHUNKS [extra --set args...]
#   e.g. tools/learning_run.sh YOLOv5 256 100 3 --set lr_scheduler LambdaLR
#
# NOTE: for runs past ~15 epochs, pass `--set lr_scheduler LambdaLR`
# (constant LR). The config default reproduces the reference's
# ReduceLROnPlateau(mode=max, threshold=0.9) quirk, which decays LR x0.1
# every ~4 epochs and freezes training (BASELINE.md / DIVERGENCES.md).
#
# The trainer's PID is written to /tmp/learning_run.pid so a stuck run can
# be killed by exact PID (never by process-name pattern — CLAUDE.md).
set -u
MODEL=$1; IMG=$2; EPOCHS=$3; CHUNKS=$4; shift 4

cd "$(dirname "$0")/.."
RAW=$(mktemp /tmp/learning_run.XXXXXX.log)
for i in $(seq 1 "$CHUNKS"); do
  echo "=== chunk $i/$CHUNKS: $MODEL@$IMG, $EPOCHS epochs ==="
  # write the raw log synchronously and filter AFTER wait — a >(grep|tail)
  # procsub outlives `wait $PID` and interleaves/loses chunk tails
  python -m objectdetectionpl_tpu.cli.run configs/config.yaml \
    --set model_name "$MODEL" --set img_size "$IMG" \
    --set batch_size 16 --set accumulate_grad_batches 1 \
    --set max_epochs "$EPOCHS" --set synthetic_size 64 \
    --set limit_train_batches 999 --set limit_val_batches 999 \
    --set limit_test_batches 999 --set early_stop_patience 999 \
    "$@" > "$RAW" 2>&1 &
  PID=$!                       # the python trainer itself (not a pipe stage)
  echo "$PID" > /tmp/learning_run.pid
  wait "$PID"
  grep -v -E "WARNING|absl|cudart|oneDNN" "$RAW" | tail -8
done
rm -f "$RAW"
