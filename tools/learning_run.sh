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
#   e.g. tools/learning_run.sh YOLOv5 256 100 3 --set compute_dtype bfloat16
set -u
MODEL=$1; IMG=$2; EPOCHS=$3; CHUNKS=$4; shift 4

cd "$(dirname "$0")/.."
for i in $(seq 1 "$CHUNKS"); do
  echo "=== chunk $i/$CHUNKS: $MODEL@$IMG, $EPOCHS epochs ==="
  python -m objectdetectionpl_tpu.cli.run configs/config.yaml \
    --set model_name "$MODEL" --set img_size "$IMG" \
    --set batch_size 16 --set accumulate_grad_batches 1 \
    --set max_epochs "$EPOCHS" --set synthetic_size 64 \
    --set limit_train_batches 999 --set limit_val_batches 999 \
    --set limit_test_batches 999 --set early_stop_patience 999 \
    "$@" 2>&1 | grep -v -E "WARNING|absl|cudart|oneDNN" | tail -8
done
