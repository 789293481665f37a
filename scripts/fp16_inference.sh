#!/bin/bash
# reference t2v/shell_scripts/fp16_inference.sh
set -e; cd "$(dirname "$0")/.."; . scripts/common.sh
python -m viditq_tpu.cli inference --config $CFG --save_dir $OUTDIR \
    --num_samples ${NUM_SAMPLES:-2} $CKPT_ARGS $EMB_ARGS
