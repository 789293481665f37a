"""Isolate the per-step cost of the timerange slab gather (round-4: the
Latte MP arm costs +178 ms/step over CB while raw HBM bandwidth predicts
~3 ms — find where the 34x goes).

Arms (Latte-XL-like weight set: 28 blocks x [4x 1152x1152 + 1152x4608 +
4608x1152], M=8192 activations):

  gather5      dynamic_index_in_dim over [5, K, N] slabs, force-read
  gather2pk    [2, K/2, N] packed slabs (the CB shape)
  static-mm    int8_consumer_matmul on static slabs (no gather)
  gather-mm    gather by traced i + int8_consumer_matmul
  scan-gather-mm  the real pattern: lax.scan over 20 steps, per-step i,
               gather inside the scan body feeding the matmul

Run on TPU: python benchmarks/gather_probe.py [arm ...]
"""

import json
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main(arms):
    import jax
    import jax.numpy as jnp
    from viditq_tpu.kernels.fused_matmul import int8_consumer_matmul

    rng = np.random.default_rng(0)
    layer_shapes = []
    for _ in range(28):
        layer_shapes += [(1152, 1152)] * 4 + [(1152, 4608), (4608, 1152)]

    def make_slabs(n_tr, pack):
        # content is irrelevant for timing; distinct buffers per layer so
        # HBM traffic is realistic (no aliased reads)
        return [jnp.full((n_tr, k // pack, n), li % 7 - 3, jnp.int8)
                for li, (k, n) in enumerate(layer_shapes)]

    def make_tables(n_tr):
        return [(jnp.full((n_tr, 1, n), 0.01, jnp.float32),
                 jnp.full((n_tr, 1, n), 0.5, jnp.float32))
                for _, n in layer_shapes]

    M = 8192
    xq = {k: jnp.asarray(rng.integers(-127, 127, (M, k)), jnp.int8)
          for k, _ in set(layer_shapes)}
    xs = jnp.asarray(rng.random((M, 1)), jnp.float32)

    def timeit(f, *a):
        f(*a)[0].block_until_ready() if isinstance(f(*a), (tuple, list)) \
            else f(*a).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = f(*a)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    results = {}

    if not arms or "gather5" in arms:
        slabs = make_slabs(5, 1)

        @jax.jit
        def g5(slabs, i):
            outs = [jax.lax.dynamic_index_in_dim(s, i, 0, False)
                    for s in slabs]
            return jnp.stack([o[0, 0].astype(jnp.int32) for o in outs]).sum()

        results["gather5_read_only"] = timeit(g5, slabs, jnp.int32(3))

        @jax.jit
        def g5sum(slabs, i):
            outs = [jax.lax.dynamic_index_in_dim(s, i, 0, False)
                    for s in slabs]
            return sum(o.astype(jnp.int32).sum() for o in outs)

        results["gather5_full_reduce"] = timeit(g5sum, slabs, jnp.int32(3))
        del slabs

    if not arms or "gather2pk" in arms:
        slabs = make_slabs(2, 2)

        @jax.jit
        def g2(slabs, i):
            outs = [jax.lax.dynamic_index_in_dim(s, i, 0, False)
                    for s in slabs]
            return sum(o.astype(jnp.int32).sum() for o in outs)

        results["gather2pk_full_reduce"] = timeit(g2, slabs, jnp.int32(1))
        del slabs

    if not arms or "static-mm" in arms or "gather-mm" in arms \
            or "scan-gather-mm" in arms:
        slabs = make_slabs(5, 1)
        tables = make_tables(5)

        def run_layers(slab_sel, table_sel):
            acc = jnp.zeros((), jnp.float32)
            for li, (k, n) in enumerate(layer_shapes):
                w = slab_sel(li)
                ws, _wz = table_sel(li)
                o = int8_consumer_matmul(xq[k], xs, w, ws.reshape(1, -1),
                                         out_dtype=jnp.bfloat16)
                acc += o[0, 0].astype(jnp.float32)
            return acc

        if not arms or "static-mm" in arms:
            @jax.jit
            def smm(slabs, tables):
                return run_layers(lambda li: slabs[li][0],
                                  lambda li: (tables[li][0][0],
                                              tables[li][1][0]))
            results["static_mm"] = timeit(smm, slabs, tables)

        if not arms or "gather-mm" in arms:
            @jax.jit
            def gmm(slabs, tables, i):
                sel = lambda v: jax.lax.dynamic_index_in_dim(v, i, 0, False)
                return run_layers(lambda li: sel(slabs[li]),
                                  lambda li: (sel(tables[li][0]),
                                              sel(tables[li][1])))
            results["gather_mm"] = timeit(gmm, slabs, tables, jnp.int32(3))

        if not arms or "scan-gather-mm" in arms:
            tr_of_step = jnp.asarray(rng.integers(0, 5, 20), jnp.int32)

            @jax.jit
            def scan_gmm(slabs, tables):
                def body(c, step):
                    i = tr_of_step[step]
                    sel = lambda v: jax.lax.dynamic_index_in_dim(
                        v, i, 0, False)
                    acc = run_layers(lambda li: sel(slabs[li]),
                                     lambda li: (sel(tables[li][0]),
                                                 sel(tables[li][1])))
                    return c + acc, ()
                c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    jnp.arange(20))
                return c
            results["scan_gather_mm_20step_total"] = timeit(
                scan_gmm, slabs, tables)
            results["scan_gather_mm_per_step"] = (
                results["scan_gather_mm_20step_total"] / 20)

    for k, v in results.items():
        print(json.dumps({"probe": k, "ms": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
