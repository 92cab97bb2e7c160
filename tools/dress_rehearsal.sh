#!/bin/bash
# On-chip dress rehearsal of the parity pipeline (PERF.md Round 5):
# train the flagship recipe at dress scale (2k iters, every staged-loss
# phase) on synthetic data ON THE TPU, checkpoint, then run the FULL
# test.py harness (AIU/PSNR/SSIM + device HD bank) and the int8 accuracy
# gate against that checkpoint. This is the exact pipeline the day-one
# real-data parity check (tools/parity_check.py) uses, at scale; numbers
# go to PERF.md "Round 5" and the int8 production gate.
#
# Usage: bash tools/dress_rehearsal.sh            (from the repo root)
# Wall clock: ~25-40 min on the bench chip (warm .jax_cache).
set -euo pipefail

ITER=${ITER:-2000}
OUT=${OUT:-/tmp/dress_out}

echo "=== 1/4 train ${ITER} iters (B=32, full staged pipeline) ==="
python train.py --config_file configs/dress_rehearsal.yaml --synthetic \
    --log_step 100 --save_step "${ITER}" --eval_step "${ITER}" \
    SOLVER.MAX_ITER "${ITER}" OUTPUT_DIR "${OUT}"

echo "=== 2/4 eval fixture ==="
python - <<'EOF'
import numpy as np, os
from PIL import Image
os.makedirs("/tmp/testdata/gt/images", exist_ok=True)
os.makedirs("/tmp/testdata/gt/masks", exist_ok=True)
r = np.random.RandomState(7)
for i in range(3):
    Image.fromarray((r.rand(224, 224, 3) * 255).astype("uint8")).save(
        f"/tmp/testdata/gt/images/im{i}.jpg")
    Image.fromarray(((r.rand(224, 224) > .85) * 255).astype("uint8"), "L").save(
        f"/tmp/testdata/gt/masks/im{i}.jpg")
EOF
python -m csbsr_tpu.data.make_test_blur /tmp/testdata/gt/images \
    /tmp/testdata/test_blured/02_40

echo "=== 3/4 full test.py harness on the checkpoint ==="
python test.py --test_surface_distance "${OUT}" "${ITER}" \
    DATASET.TEST_IMAGE_DIR /tmp/testdata/gt/images \
    DATASET.TEST_MASK_DIR /tmp/testdata/gt/masks \
    DATASET.TEST_BLURED_DIR /tmp/testdata/test_blured/

echo "=== 4/4 int8 serving accuracy gate on the trained checkpoint ==="
python tools/int8_accuracy.py --ckpt "${OUT}" "${ITER}" --batch 32
