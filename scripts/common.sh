# Shared defaults (reference t2v/shell_scripts layout). Override via env:
#   CFG=configs/workload/opensora_16x512x512.py OUTDIR=logs/my_run ...
# The tiny config is the default so every flow runs without checkpoints.
CFG=${CFG:-configs/workload/opensora_tiny.py}
OUTDIR=${OUTDIR:-outputs/$(basename "$0" .sh)}
CKPT_ARGS=${CKPT_PATH:+--ckpt_path $CKPT_PATH}
EMB_ARGS=${TEXT_EMBEDS:+--text_embeds_path $TEXT_EMBEDS}
