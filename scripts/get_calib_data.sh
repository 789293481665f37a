#!/bin/bash
# reference t2v/shell_scripts/get_calib_data.sh
set -e; cd "$(dirname "$0")/.."; . scripts/common.sh
python -m viditq_tpu.cli get-calib-data --config $CFG --save_dir $OUTDIR \
    --num_samples ${NUM_SAMPLES:-2} $CKPT_ARGS $EMB_ARGS
