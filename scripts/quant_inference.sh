#!/bin/bash
# reference t2v/shell_scripts/quant_inference.sh
set -e; cd "$(dirname "$0")/.."; . scripts/common.sh
EXP_NAME=${1:-w8a8_dynamic}
Q_CFG=${Q_CFG:-configs/opensora/$EXP_NAME.yaml}
python -m viditq_tpu.cli quant-generate --config $CFG --ptq_config $Q_CFG \
    --quant_ckpt ${QUANT_CKPT:-$OUTDIR/quant_ckpt.npz} --save_dir $OUTDIR \
    --num_samples ${NUM_SAMPLES:-2} --backend ${BACKEND:-simulate} \
    $CKPT_ARGS $EMB_ARGS
