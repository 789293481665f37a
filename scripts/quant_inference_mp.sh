#!/bin/bash
# reference t2v/shell_scripts/quant_inference_mp.sh: timestep-wise MP
set -e; cd "$(dirname "$0")/.."; . scripts/common.sh
EXP_NAME=${1:-w4a8_timestep_aware_cb}
Q_CFG=${Q_CFG:-configs/opensora/$EXP_NAME.yaml}
MP_W=${MP_W:-configs/opensora/mixed_precision/t20_weight_4_mp.yaml}
MP_A=${MP_A:-configs/opensora/mixed_precision/t20_act_8_mp.yaml}
python -m viditq_tpu.cli quant-generate-mp --config $CFG \
    --ptq_config $Q_CFG --quant_ckpt ${QUANT_CKPT:-$OUTDIR/quant_ckpt.npz} \
    --save_dir $OUTDIR --num_samples ${NUM_SAMPLES:-2} --timestep_wise \
    --time_mp_config_weight $MP_W --time_mp_config_act $MP_A \
    $CKPT_ARGS $EMB_ARGS
