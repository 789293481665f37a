# Tiny STDiT workload for CPU smoke tests of the full CLI flow.
num_frames = 4
fps = 8
image_size = (64, 64)

model = dict(
    type="STDiT",
    hidden_size=64,
    depth=2,
    num_heads=4,
    patch_size=(1, 2, 2),
    caption_channels=32,
    model_max_length=8,
)
vae = dict(type="VideoAutoencoderKL")
scheduler = dict(
    type="iddpm",
    num_sampling_steps=3,
    cfg_scale=4.0,
)
dtype = "fp32"
seed = 42
