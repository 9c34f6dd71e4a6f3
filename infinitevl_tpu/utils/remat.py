"""Sequencing-aware gradient checkpointing.

XLA hoists independent remat recomputes: in a python layer loop, each
layer's backward recompute depends only on that layer's saved boundary
input, so the scheduler is free to run ALL recomputes up front and hold
every layer's internals simultaneously (measured 17.9 GB plateau at 3B/32K
no matter the remat grouping; ROUND3_NOTES "Environment facts"). The
reference never hits this because torch's eager autograd replays
checkpoints strictly in backward order (model_utils/checkpointing.py:77-174
relies on torch.utils.checkpoint semantics).

`barrier_remat` is gradient checkpointing with one extra property: the
backward ties the saved inputs to the incoming cotangent through
`lax.optimization_barrier`, so layer i's recompute CANNOT be scheduled
before layer i+1's backward has produced layer i's output-cotangent.
Python-loop code gets scan-over-layers' peak-memory behavior while keeping
the loop's fully-unrolled (faster) forward.
"""

from __future__ import annotations

import jax


def barrier_remat(fn):
    """Checkpointed `fn` whose backward recompute is sequenced after the
    cotangent producer.

    `fn` must take positional pytree-of-array arguments only (close over
    statics with functools.partial; do NOT close over traced arrays —
    custom_vjp cannot differentiate through closures). Residuals are
    exactly the primal inputs, i.e. per-layer remat.
    """

    @jax.custom_vjp
    def wrapped(*args):
        return fn(*args)

    def fwd(*args):
        return fn(*args), args

    def bwd(res, ct):
        # the barrier makes the recompute's inputs *data-depend* on the
        # cotangent: XLA must finish the downstream layer's backward before
        # this layer's recompute may start, serializing peak memory
        res, ct = jax.lax.optimization_barrier((res, ct))
        _, vjp = jax.vjp(fn, *res)
        return vjp(ct)

    wrapped.defvjp(fwd, bwd)
    return wrapped
