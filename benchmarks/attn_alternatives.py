"""Per-site attention implementation shootout at STDiT-XL/2 shapes.

Arms per site: our layout-native kernel (bf16 / int8_pv), XLA sdpa on the
transposed [B,H,N,D] layout (incl. the transpose cost), and the stock
Pallas flash kernel where applicable.

Usage: python benchmarks/attn_alternatives.py [site ...]
"""

import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main(sites):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viditq_tpu.kernels.attention import attention_bnhd
    from viditq_tpu.models.layers import sdpa, sdpa_xla

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
    sites = sites or list(shapes)

    def _force(out):
        return float(jnp.sum(out[..., :1, :1, :1].astype(jnp.float32)))

    for sname in sites:
        sh = shapes[sname]
        q = mk(sh["b"], sh["n"])
        k = mk(sh["b"], sh["m"])
        v = mk(sh["b"], sh["m"])
        mask = (jnp.ones((sh["b"], sh["m"]), jnp.int32)
                if sname == "cross" else None)

        def arm_kernel(q, k, v, kw):
            return attention_bnhd(q, k, v, scale=D ** -0.5,
                                  seg_len=sh["seg"], kv_mask=mask, **kw)

        def arm_xla(q, k, v, kw):
            # [B,N,H,D] -> [B,H,N,D] transposes included (that's what the
            # XLA path costs in-model)
            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if sh["seg"] > 0:
                B = q.shape[0]
                G = sh["n"] // sh["seg"]
                def seg_view(t):
                    return t.reshape(B, sh["seg"] * G, H, D).reshape(
                        B * G, sh["seg"], H, D).transpose(0, 2, 1, 3)
                out = sdpa_xla(seg_view(q), seg_view(k), seg_view(v),
                               scale=D ** -0.5)
                return out.transpose(0, 2, 1, 3).reshape(B, sh["n"], H, D)
            bias = None
            if mask is not None:
                bias = jnp.where(mask[:, None, None, :] != 0, 0.0, -jnp.inf)
            out = sdpa_xla(qt, kt, vt, scale=D ** -0.5, bias=bias)
            return out.transpose(0, 2, 1, 3)

        def arm_flash(q, k, v, kw):
            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if mask is not None:
                P = sh["m"]
                P_pad = max(128, -(-P // 128) * 128)
                if P_pad != P:
                    pad = ((0, 0), (0, 0), (0, P_pad - P), (0, 0))
                    kt = jnp.pad(kt, pad)
                    vt = jnp.pad(vt, pad)
                out = sdpa(qt, kt, vt, scale=D ** -0.5,
                           kv_mask=jnp.pad(mask, ((0, 0), (0, P_pad - P)))
                           if P_pad != P else mask)
            else:
                out = sdpa(qt, kt, vt, scale=D ** -0.5)
            return out.transpose(0, 2, 1, 3)

        arms = {
            "kernel-bf16": (arm_kernel, {}),
            "kernel-pv8": (arm_kernel, dict(int8_pv=True)),
            "xla-sdpa": (arm_xla, {}),
            "flash": (arm_flash, {}),
        }
        res = {}
        for aname, (fn, kw) in arms.items():
            def mk_fn(iters, fn=fn, kw=kw):
                # k/v must DEPEND on the loop carry: with loop-constant k/v
                # XLA hoists their [B,H,N,D] transposes out of the loop and
                # the transposed-layout arms (xla-sdpa, flash) measure
                # ~0.5-1 ms/iter too fast — which is exactly what made the
                # first version of this shootout mislead the in-model
                # dispatch (BENCH_NOTES round-2d)
                @jax.jit
                def f(q, k, v):
                    def body(i, q):
                        kk = (k + q[:1, :1, :1, :1]).astype(k.dtype)
                        vv = (v + q[:1, :1, :1, :1]).astype(v.dtype)
                        o = fn(q, kk, vv, kw)
                        return (q + 0.001 * o).astype(q.dtype)
                    return jax.lax.fori_loop(0, iters, body, q)
                return f

            def t(fn_, salt):
                _force(fn_(q + salt, k, v))
                best = 1e9
                for i in range(3):
                    tt = time.perf_counter()
                    _force(fn_(q + salt + i + 1, k, v))
                    best = min(best, time.perf_counter() - tt)
                return best

            try:
                lo, hi = 8, 32
                per = (t(mk_fn(hi), 50.0) - t(mk_fn(lo), 10.0)) / (hi - lo)
            except Exception as e:
                print(f"{sname:9s} {aname:12s} FAILED: {str(e)[:80]}",
                      flush=True)
                continue
            res[aname] = per * 1e3
            print(f"{sname:9s} {aname:12s} {per*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
