"""AOT export / import of compiled model functions (jax.export).

Production-serving piece with no reference counterpart (the reference
re-traces its torch graph every process): serialize the jitted, shape-
specialized quantized forward (or a whole sampling scan) to a portable
StableHLO artifact once, then serve from the artifact without paying
trace + compile at startup. Artifacts embed the quant tables when
exported with baked_variables=True, so a serving replica needs only the
blob.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
from jax import export as jax_export


def export_fn(fn: Callable, *example_args,
              platforms: Optional[Sequence[str]] = None) -> bytes:
    """Trace + lower `fn` at the example args' shapes/dtypes and serialize.

    platforms: lowering targets (default: the current backend). Pass
    ['tpu'] to build a TPU artifact from any host, or ['cpu', 'tpu'] for
    a multi-platform blob.
    """
    exp = jax_export.export(jax.jit(fn),
                            platforms=platforms)(*example_args)
    return bytes(exp.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an export_fn artifact into a callable. The call
    re-specializes nothing: shapes/dtypes must match the export."""
    exp = jax_export.deserialize(blob)
    return lambda *args: exp.call(*args)


def export_quant_forward(model, variables, *example_args, qctx=None,
                         baked_variables: bool = True,
                         platforms: Optional[Sequence[str]] = None) -> bytes:
    """Export a (quantized) model forward.

    baked_variables=True closes over params + quant tables (constants in
    the artifact — the serving blob is self-contained); False exports
    fn(variables, *args) so one artifact serves many checkpoints.
    """
    if baked_variables:
        def fn(*args):
            return (model.apply(variables, *args, qctx) if qctx is not None
                    else model.apply(variables, *args))
        return export_fn(fn, *example_args, platforms=platforms)

    def fn(vs, *args):
        return (model.apply(vs, *args, qctx) if qctx is not None
                else model.apply(vs, *args))
    return export_fn(fn, variables, *example_args, platforms=platforms)
