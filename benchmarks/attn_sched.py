"""Attention occupancy decomposition + scheduling arms (round-4 VERDICT #4).

Same-run slope timing at STDiT-XL/2 shapes of:
  full        the shipped kernel
  dots_only   QK + PV with the softmax replaced by a cast (MXU-only)
  qk_only     raw scores out (QK MXU only)
  blockb2/4   2/4 batch rows per grid step (amortized bias/mask build,
              fewer grid steps)

The full-vs-dots_only delta is the softmax VPU cost NOT hidden behind the
MXU dots: ~0 means Mosaic already overlaps VPU softmax with the MXU dots
(head-pipelined scheduling has nothing left to win); a large delta means
explicit scheduling/pipelining is worth building.

Usage: python benchmarks/attn_sched.py [spatial temporal cross]
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
    from viditq_tpu.kernels.attention import _attention_bnhd_impl

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
    sel = sys.argv[1:] or list(shapes)
    arms = {
        "full": dict(),
        "dots_only": dict(diag="dots_only"),
        "qk_only": dict(diag="qk_only"),
        "blockb2": dict(block_b=2),
        "blockb4": dict(block_b=4),
        # q-tile sweep: the default 256 is the SPATIAL VMEM optimum; the
        # cross site's kv block is tiny ([128, C]), so much larger q tiles
        # fit and amortize the per-grid-step per-head op overhead (the
        # round-5 profile shows cross at ~15x its MXU-ideal time)
        "bq512": dict(block_q=512),
        "bq1024": dict(block_q=1024),
        "bq2048": dict(block_q=2048),
    }

    def _force(out):
        return float(jnp.sum(out[..., :1, :1, :1].astype(jnp.float32)))

    for sname in sel:
        sh = shapes[sname]
        q = mk(sh["b"], sh["n"])
        k = mk(sh["b"], sh["m"])
        v = mk(sh["b"], sh["m"])
        mask = (jnp.ones((sh["b"], sh["m"]), jnp.int32)
                if sname == "cross" else None)
        res = {}
        for aname, kw in arms.items():
            if kw.get("block_b", 1) > sh["b"]:
                continue
            bq = kw.get("block_q")
            if bq is not None and (sh["n"] % bq
                                   or (sh["seg"] and bq % sh["seg"])):
                continue

            def mk_fn(iters, kw=kw):
                kw = dict(kw)
                bq = kw.pop("block_q", None)

                @jax.jit
                def f(q, k, v):
                    def body(i, carry):
                        q, k, v = carry
                        o = _attention_bnhd_impl(
                            q, k, v, mask, D ** -0.5, sh["seg"], bq,
                            False, False, **kw)
                        q = (q + 0.001 * o).astype(q.dtype)
                        # k/v must depend on the carry or LICM deletes
                        # their per-iteration handling (BENCH_NOTES);
                        # scalar dependency — o and k/v differ in shape at
                        # the cross site (n != m)
                        dep = 0.0 * o[0, 0, 0, 0]
                        k2 = (k + dep).astype(k.dtype)
                        v2 = (v + dep).astype(v.dtype)
                        return (q, k2, v2)
                    return jax.lax.fori_loop(0, iters, body, (q, k, v))[0]
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
            try:
                per = (t(mk_fn(hi), 50.0) - t(mk_fn(lo), 10.0)) / (hi - lo)
            except Exception as e:  # e.g. a bq arm over the VMEM budget
                print(f"{sname:9s} {aname:10s} FAILED: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                continue
            res[aname] = per * 1e3
            print(f"{sname:9s} {aname:10s} {per*1e3:7.3f} ms", flush=True)
        if "full" in res and "dots_only" in res:
            print(f"{sname:9s} softmax-not-hidden "
                  f"{res['full']-res['dots_only']:+.3f} ms; "
                  f"pv {res['dots_only']-res.get('qk_only', 0):.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
