#!/bin/bash
# reference t2v/shell_scripts/ptq.sh: EXP_NAME picks the quant plan YAML
set -e; cd "$(dirname "$0")/.."; . scripts/common.sh
EXP_NAME=${1:-w8a8_dynamic}
Q_CFG=${Q_CFG:-configs/opensora/$EXP_NAME.yaml}
CALIB=${CALIB:-$OUTDIR/calib_data.npz}
python -m viditq_tpu.cli ptq --config $CFG --ptq_config $Q_CFG \
    --calib_data $CALIB --save_dir $OUTDIR --part_fp \
    $CKPT_ARGS $EMB_ARGS ${ALPHA:+--smooth_quant_alpha $ALPHA}
