"""Analytic FLOP counts for the benchmark rooflines.

XLA's `compiled.cost_analysis()` does not multiply the body cost of a
`lax.scan` by its trip count and ignores Pallas kernels without a
CostEstimate, so e2e sampling programs report ~300x too few flops
(round-5 measurement: 89 GFLOP/step reported vs ~39 TFLOP analytic).
These closed forms count matmul MACs*2 only — elementwise/softmax work
is excluded, so "MFU" derived from them is a slight undercount, which is
the conservative direction for a speed-of-light claim.

Reference workload shapes: STDiT-XL/2 at 16x512x512
(/root/reference/t2v/configs/quant/opensora/16x512x512.py,
stdit.py:456): hidden 1152, depth 28, heads 16, mlp_ratio 4, S=1024
spatial tokens, T=16 frames, 120 text tokens, CFG doubles the batch.
"""


def stdit_step_flops(batch_cfg: int, S: int = 1024, T: int = 16,
                     C: int = 1152, depth: int = 28,
                     mlp_ratio: float = 4.0, y_tokens: int = 120) -> float:
    """Matmul FLOPs of ONE denoise step (one CFG forward) of STDiT.

    batch_cfg: the model-forward batch (prompts x 2 for CFG).
    """
    tokens = batch_cfg * S * T
    # per-token linear weights per block: qkv 3C^2 + attn proj C^2 +
    # cross q C^2 + cross proj C^2 + mlp 2*mlp_ratio*C^2
    lin = (6 + 2 * mlp_ratio) * C * C
    fl = 2.0 * tokens * lin * depth
    # cross-attention k/v projections run on the text tokens only
    fl += 2.0 * (batch_cfg * y_tokens) * 2 * C * C * depth
    # attention QK + PV (2 matmuls, each 2*N*N*C MACs-as-flops... i.e.
    # 2 flops * N_q * N_kv * C per matmul)
    fl += 2.0 * 2 * batch_cfg * T * S * S * C * depth      # spatial
    fl += 2.0 * 2 * batch_cfg * S * T * T * C * depth      # temporal
    fl += 2.0 * 2 * batch_cfg * (S * T) * y_tokens * C * depth  # cross
    # x-embedder (patch conv, 4->C over 2x2x1 patches) + final layer
    fl += 2.0 * tokens * (4 * 4 * C + C * 8)
    return fl


def dit_step_flops(batch_cfg: int, N: int, C: int, depth: int,
                   mlp_ratio: float = 4.0,
                   cross_tokens: int = 0) -> float:
    """Matmul FLOPs of one forward of a PixArt/DiT/Latte-style block
    stack: self-attention (qkv+proj) + optional cross-attention + MLP."""
    tokens = batch_cfg * N
    lin = (4 + 2 * mlp_ratio) * C * C
    if cross_tokens:
        lin += 2 * C * C  # cross q + proj on x tokens
    fl = 2.0 * tokens * lin * depth
    fl += 2.0 * 2 * batch_cfg * N * N * C * depth  # self attn QK+PV
    if cross_tokens:
        fl += 2.0 * (batch_cfg * cross_tokens) * 2 * C * C * depth
        fl += 2.0 * 2 * tokens * cross_tokens * C * depth
    return fl
