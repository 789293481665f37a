"""Head-packing measurement for the QK^T contraction at DiT head dims.

D=72 pads to 128 MXU lanes (44% wasted contraction). The round-2 VERDICT
asked for a head-packed score layout to be evaluated. The algebra says it
cannot win: packing two heads' D into one 144-lane contraction computes
q1k1+q2k2 (wrong); keeping the outputs separate requires block-diagonal
zero-padding of k, which doubles both the contraction tiles (144 -> 2x128)
and the output width — strictly more MXU cycles than the padded per-head
dots. This bench records the on-chip numbers for that analysis.

Variants (q-block 256 rows, kv 1024, H=16, D=72 — the spatial site's
per-grid-step dot set):
  loop16    16x dot [256,72]x[72,1024]           (the kernel's layout)
  batched   dot_general batch-16                  (same math, one op)
  packpair  8x dot [256,144]x[144,2048] w/ block-diagonal k (2 heads)
  pad128    16x dot [256,128]x[128,1024]          (explicit lane pad)
pad128 ~ loop16 confirms D=72 already pays the full 128-lane cost;
packpair ~ 2x loop16 confirms the merge cannot reclaim it.

Usage: python benchmarks/attn_headpack.py  (TPU; slope timing)
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    H, D, BQ, BKV = 16, 72, 256, 1024
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((H, BQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((H, BKV, D)), jnp.bfloat16)

    def loop16(q, k):
        outs = []
        for h in range(H):
            outs.append(jax.lax.dot_general(
                q[h], k[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.stack(outs)

    def batched(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def packpair(q, k):
        outs = []
        zero = jnp.zeros((BKV, D), jnp.bfloat16)
        for h in range(0, H, 2):
            qp = jnp.concatenate([q[h], q[h + 1]], axis=1)       # [BQ, 144]
            k1 = jnp.concatenate([k[h], zero], axis=1)           # [BKV, 144]
            k2 = jnp.concatenate([zero, k[h + 1]], axis=1)
            kp = jnp.concatenate([k1, k2], axis=0)               # [2BKV, 144]
            outs.append(jax.lax.dot_general(
                qp, kp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))             # [BQ, 2BKV]
        return jnp.stack(outs)

    qp128 = jnp.pad(q, ((0, 0), (0, 0), (0, 128 - D)))
    kp128 = jnp.pad(k, ((0, 0), (0, 0), (0, 128 - D)))

    variants = {
        "loop16": (loop16, q, k),
        "batched": (batched, q, k),
        "packpair": (packpair, q, k),
        "pad128": (loop16, qp128, kp128),
    }

    for name, (fn, qa, ka) in variants.items():
        def mk(iters, fn=fn, ka=ka):
            @jax.jit
            def f(qx):
                def body(i, qx):
                    s = fn(qx, ka)
                    # consume the FULL score block via a row reduction —
                    # slicing columns here lets XLA narrow the dot itself
                    # (the first revision read [..., :D] and measured a
                    # partially dead dot)
                    g = H if name != "packpair" else H // 2
                    row = jnp.mean(s.reshape(g, BQ, -1), axis=-1)  # [g, BQ]
                    if name == "packpair":
                        row = jnp.concatenate([row, row], axis=0)
                    upd = (0.001 * row)[..., None].astype(jnp.bfloat16)
                    return qx + upd                      # broadcast over D
                return jax.lax.fori_loop(0, iters, body, qx)
            return f

        def t(fn_, salt):
            float(jnp.sum(fn_(qa + salt)[..., :1].astype(jnp.float32)))
            best = 1e9
            for i in range(5):
                tt = time.perf_counter()
                float(jnp.sum(fn_(qa + salt + i)[..., :1]
                              .astype(jnp.float32)))
                best = min(best, time.perf_counter() - tt)
            return best

        # Iteration spans must be large enough that the hi-lo wall-time
        # delta (~60 ms for loop16) dwarfs the tunnel's per-dispatch RTT
        # jitter; 16/48 spans produced negative slopes on axon.
        lo, hi = 64, 512
        per = (t(mk(hi), 0.5) - t(mk(lo), 0.25)) / (hi - lo)
        print(f"{name:9s} {per*1e6:9.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
