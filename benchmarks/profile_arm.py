"""Profile one latte_decomp arm under jax.profiler and print the top TPU
ops by device time (viditq_tpu.utils.xplane parser — no xprof needed).

Usage (TPU): python benchmarks/profile_arm.py <arm> [top_n]
Arms are latte_decomp's: bf16 fused cb cbshare mp mpshare.
"""

import json
import sys
sys.path.insert(0, "/root/repo")
import tempfile


def main(arm, top_n=40):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from benchmarks import latte_decomp

    # reuse latte_decomp's arm builders by monkey-running its main with a
    # single-arm build: cheaper to inline the build here
    import dataclasses
    import time
    from viditq_tpu.models import Latte_XL_2
    from viditq_tpu.pipelines.mixed_precision import build_mp_sampler
    from viditq_tpu.quant import QuantCtx, calibrate_weight_tables
    from viditq_tpu.samplers import IDDPM
    from viditq_tpu.utils.config import load_quant_config

    # build via latte_decomp by temporarily shrinking its timing loop is
    # messy; instead just reuse its main() for a single arm under the
    # profiler context
    logdir = tempfile.mkdtemp(prefix="viditq_prof_")
    print(f"logdir {logdir}", file=sys.stderr, flush=True)
    # one pass under the trace: build + compile + 1 warm + 3 timed calls.
    # Calibration ops land in the trace too but the 4 sampler calls (x20
    # steps) dominate the aggregate; compile time is host-side (not in
    # the device plane).
    with jax.profiler.trace(logdir):
        latte_decomp.main([arm])

    from viditq_tpu.utils.xplane import top_ops
    rows = top_ops(logdir, n=int(top_n))
    total = sum(r["ms"] for r in rows)
    print(json.dumps({"arm": arm, "top_total_ms": round(total, 2)}))
    for r in rows:
        print(json.dumps({"op": r["op"][:110], "ms": round(r["ms"], 3),
                          "count": r["count"]}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
