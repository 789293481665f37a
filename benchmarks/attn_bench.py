"""Attention-kernel microbench at STDiT-XL/2 shapes (slope timing).

Arms: bf16 kernel vs int8_pv (softmax int8 + per-channel int8 v) vs
int8_qk+pv (full attention-internal int8). Shapes:
  spatial  [B*T=32, S=1024, H=16, D=72]
  temporal [B=2, N=16384] seg_len=16 (packed block-diagonal)
  cross    [B=2, N=16384] vs M=128 prompt tokens

Usage: python benchmarks/attn_bench.py
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viditq_tpu.kernels.attention import attention_bnhd

    rng = np.random.default_rng(0)
    H, D = 16, 72

    def mk(b, n):
        return jnp.asarray(rng.standard_normal((b, n, H, D)) * 0.5,
                           jnp.bfloat16)

    shapes = {
        "spatial": dict(b=32, n=1024, m=1024, seg=0),
        "temporal": dict(b=2, n=16384, m=16384, seg=16),
        "cross": dict(b=2, n=16384, m=128, seg=0),
    }
    arms = {"bf16": dict(), "int8_pv": dict(int8_pv=True),
            "int8_qk_pv": dict(int8_qk=True, int8_pv=True)}

    def _force(out):
        return float(jnp.sum(out[..., :1, :1, :1].astype(jnp.float32)))

    for sname, sh in shapes.items():
        q = mk(sh["b"], sh["n"])
        k = mk(sh["b"], sh["m"])
        v = mk(sh["b"], sh["m"])
        mask = (jnp.ones((sh["b"], sh["m"]), jnp.int32)
                if sname == "cross" else None)
        res = {}
        for aname, kw in arms.items():
            def mk_fn(iters, kw=kw):
                @jax.jit
                def f(q, k, v):
                    def body(i, q):
                        o = attention_bnhd(q, k, v, scale=D ** -0.5,
                                           seg_len=sh["seg"], kv_mask=mask,
                                           **kw)
                        return (q + 0.001 * o).astype(q.dtype)
                    return jax.lax.fori_loop(0, iters, body, q)
                return f

            def t(fn, salt):
                _force(fn(q + salt, k, v))
                best = 1e9
                for i in range(3):
                    tt = time.perf_counter()
                    _force(fn(q + salt + i + 1, k, v))
                    best = min(best, time.perf_counter() - tt)
                return best

            lo, hi = 8, 32
            per = (t(mk_fn(hi), 50.0) - t(mk_fn(lo), 10.0)) / (hi - lo)
            res[aname] = per * 1e3
            print(f"{sname:9s} {aname:11s} {per*1e3:7.3f} ms", flush=True)
        base = res["bf16"]
        for aname, v_ in res.items():
            if aname != "bf16":
                print(f"{sname:9s} {aname:11s} speedup {base/v_:.3f}x")


if __name__ == "__main__":
    main()
