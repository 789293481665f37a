"""kv-streaming attention kernel sweep at PixArt-Σ-1024 / MMDiT shapes.

Round-4: the first on-chip sigma run showed the streaming kernel LOSING to
XLA's materialized softmax (167.9 vs 138.5 ms/fwd model-level). This bench
isolates the attention op and sweeps the block sizes + compares:

  xla         jnp einsum softmax (what attention_ok falls back to)
  stream-BQxBKV  the Pallas kv-streaming kernel at each (block_q, block_kv)

Shapes:
  sigma  [B=2, N=M=4096, H=16, D=72]   (PixArt-Σ 1024, blocks 0-13)
  mmdit  [B=2, N=M=4480, H=16, D=72]   (joint txt+img padded to 256-mult)

Slope timing (outer fori_loop chains iterations through q).
Usage (TPU): python benchmarks/attn_stream_bench.py [shape ...]
"""

import json
import os
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main(only):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viditq_tpu.kernels import attention as A

    rng = np.random.default_rng(0)
    H, D = 16, 72

    def mk(b, n):
        return jnp.asarray(rng.standard_normal((b, n, H, D)) * 0.5,
                           jnp.bfloat16)

    shapes = {
        "sigma": dict(b=2, n=4096),
        "mmdit": dict(b=2, n=4352),  # 77+4096 joint, padded to 256-mult
    }
    if only:
        shapes = {k: v for k, v in shapes.items() if k in only}

    def timeit(f, *a, iters=(4, 16)):
        f(*a, iters[0]).block_until_ready()
        f(*a, iters[1]).block_until_ready()
        def run(it):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                f(*a, it).block_until_ready()
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return (run(iters[1]) - run(iters[0])) / (iters[1] - iters[0]) * 1e3

    for sname, sh in shapes.items():
        n = sh["n"]
        q = mk(sh["b"], n)
        k = mk(sh["b"], n)
        v = mk(sh["b"], n)
        flops = 4 * sh["b"] * H * n * n * D

        def make(fn):
            @jax.jit
            def f(q, k, v, iters):
                def body(i, q):
                    o = fn(q, k, v)
                    return (q + 0.001 * o).astype(q.dtype)
                return jax.lax.fori_loop(0, iters, body, q)
            return f

        f_xla = make(lambda q, k, v: A.attention_bnhd_xla(
            q, k, v, scale=D ** -0.5))
        ms = timeit(f_xla, q, k, v)
        print(json.dumps({"shape": sname, "arm": "xla",
                          "ms": round(ms, 3),
                          "tflops": round(flops / ms / 1e9, 1)}),
              flush=True)

        for bq, bkv in ((512, 1024), (512, 512), (256, 1024), (256, 512),
                        (128, 512), (256, 256)):
            if n % bq or n % bkv:
                continue
            os.environ["VIDITQ_STREAM_BQ"] = str(bq)
            os.environ["VIDITQ_STREAM_BKV"] = str(bkv)

            def sfn(q, k, v, bq=bq, bkv=bkv):
                return A._attention_bnhd_impl(
                    q, k, v, None, D ** -0.5, 0, None, False, False)
            try:
                ms = timeit(make(sfn), q, k, v)
                print(json.dumps({"shape": sname,
                                  "arm": f"stream-{bq}x{bkv}",
                                  "ms": round(ms, 3),
                                  "tflops": round(flops / ms / 1e9, 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"shape": sname,
                                  "arm": f"stream-{bq}x{bkv}",
                                  "error": str(e)[:120]}), flush=True)
        os.environ.pop("VIDITQ_STREAM_BQ", None)
        os.environ.pop("VIDITQ_STREAM_BKV", None)


if __name__ == "__main__":
    main(sys.argv[1:])
