"""Profile one latte_decomp arm under jax.profiler and print the top TPU
ops by device time (viditq_tpu.utils.xplane parser — no xprof needed).

Usage (TPU): python benchmarks/profile_arm.py <arm> [top_n]
Arms are latte_decomp's: bf16 fused cb cbshare mp mpshare.

Build + compile + warmup run OUTSIDE the trace; the trace wraps exactly
one steady-state sampler call (a whole-main trace exceeds the 2GB XSpace
protobuf cap and serializes nothing).
"""

import json
import sys
sys.path.insert(0, "/root/repo")
import tempfile


def main(arm, top_n=40):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import time

    from benchmarks import latte_decomp

    ARMS, z, n_steps = latte_decomp.setup()
    t0 = time.time()
    f = ARMS[arm]()
    f(z).block_until_ready()
    print(f"{arm}: built+compiled in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    f(z).block_until_ready()
    wall_ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(json.dumps({"arm": arm, "ms_per_step": round(wall_ms, 3)}),
          flush=True)

    logdir = tempfile.mkdtemp(prefix="viditq_prof_")
    print(f"logdir {logdir}", file=sys.stderr, flush=True)
    with jax.profiler.trace(logdir):
        f(z).block_until_ready()

    from viditq_tpu.utils.xplane import top_ops
    rows = top_ops(logdir, n=int(top_n))
    total = sum(r["ms"] for r in rows)
    print(json.dumps({"arm": arm, "top_total_ms": round(total, 2),
                      "per_step_ms": round(total / n_steps, 3)}))
    for r in rows:
        print(json.dumps({"op": r["op"][:110], "ms": round(r["ms"], 3),
                          "count": r["count"]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
