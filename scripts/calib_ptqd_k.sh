#!/bin/bash
# reference t2v/shell_scripts/calib_ptqd_k.sh
set -e; cd "$(dirname "$0")/.."; . scripts/common.sh
python -m viditq_tpu.cli calibrate-ptqd-k \
    --fp_trajectory ${FP_TRAJ:-$OUTDIR/fp_trajectory.npz} \
    --quant_trajectory ${Q_TRAJ:-$OUTDIR/quant_trajectory.npz} \
    --save_dir $OUTDIR
