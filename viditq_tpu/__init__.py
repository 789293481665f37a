"""viditq_tpu — TPU-native quantized diffusion-transformer stack.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
thu-nics/ViDiT-Q (reference at /root/reference): PTQ for DiT-family video
and image generators (OpenSora STDiT, PixArt-α/Σ, Latte, DiT) with
per-channel weight quant, dynamic per-token activation quant, smooth-quant
channel balancing, timestep-aware mixed precision — plus real int8/int4
Pallas kernels the reference only simulates.
"""

__version__ = "0.1.0"
