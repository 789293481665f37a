# PixArt-alpha 512x512 t2i workload (reference t2i defaults:
# DPM-Solver 20 steps, t2i/scripts/ptq.py:417).
image_size = 512

model = dict(
    type="PixArt-XL/2",
    model_max_length=120,
)
vae = dict(type="AutoencoderKL")
text_encoder = dict(type="t5", model_max_length=120)
scheduler = dict(
    type="dpm-solver",
    num_sampling_steps=20,
    cfg_scale=4.5,
)
dtype = "bf16"
seed = 42
