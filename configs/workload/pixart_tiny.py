# Tiny PixArt workload for CPU smoke tests.
image_size = 64

model = dict(
    type="PixArt",
    input_size=8,
    hidden_size=64,
    depth=2,
    num_heads=4,
    caption_channels=32,
    model_max_length=8,
)
vae = dict(type="AutoencoderKL")
scheduler = dict(
    type="dpm-solver",
    num_sampling_steps=4,
    cfg_scale=4.5,
)
dtype = "fp32"
seed = 42
