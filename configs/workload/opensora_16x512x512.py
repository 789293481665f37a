# OpenSora STDiT-XL/2 16x512x512 workload (reference
# t2v/configs/opensora/inference/16x512x512.py equivalent).
num_frames = 16
fps = 8
image_size = (512, 512)

model = dict(
    type="STDiT-XL/2",
    space_scale=1.0,
    time_scale=1.0,
)
vae = dict(
    type="VideoAutoencoderKL",
    micro_batch_size=128,
)
text_encoder = dict(
    type="t5",
    model_max_length=120,
)
scheduler = dict(
    type="iddpm",
    num_sampling_steps=100,
    cfg_scale=4.0,
)
dtype = "bf16"
batch_size = 1
seed = 42
