"""Scan-over-layers parameter stacking for long-context training.

With the decoder expressed as a Python loop, XLA's latency-hiding scheduler
may hoist every layer's remat recompute right after the forward pass (each
group's recompute depends only on its saved boundary) — measured as a
~17.9 GB plateau at 3B/32K that no remat_group setting could cut (round-3
notes). A `lax.scan` over layers is a loop in the HLO itself: iteration
k+1 cannot start before iteration k finishes, so the backward holds ONE
scan body's residuals at a time by construction — the canonical TPU
long-context pattern (scan layers + remat) used by every large JAX trainer.

The deployed InfiniteVL config repeats (sliding, linear, linear, linear)
(configuration_infinitevl.py:279-284); the scan iterates over that PERIOD:
each body step runs one sliding layer and three delta layers from
parameter slices of role-stacked trees. `stack_layer_params` restacks a
params (or LoRA) tree host-side — done once before training, so the jitted
step's arguments ARE the stacked layout (stacking in-graph would duplicate
the 6.2 GB of weights).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def detect_period(layer_types: Sequence[str]) -> Optional[int]:
    """Smallest p with layer_types == layer_types[:p] * (L/p), or None."""
    L = len(layer_types)
    for p in range(1, L + 1):
        if L % p == 0 and tuple(layer_types) == tuple(layer_types[:p]) * (L // p):
            return p
    return None


def _stack_trees(trees: List[Any]):
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def _unstack_tree(tree: Any, n: int) -> List[Any]:
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]


def stack_layer_params(params: Params, period: int) -> Params:
    """Replace params["layers"] (list of L per-layer trees) with
    params["layer_stacks"]: a list of `period` trees whose leaves carry a
    leading [L/period] axis. Works on base params and LoRA trees alike
    (any list-of-trees under "layers" with a uniform structure per period
    position)."""
    layers = params["layers"]
    L = len(layers)
    G = L // period
    stacks = []
    for j in range(period):
        stacks.append(_stack_trees([layers[i * period + j] for i in range(G)]))
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layer_stacks"] = stacks
    return out


def unstack_layer_params(params: Params, period: int, num_layers: int) -> Params:
    """Inverse of stack_layer_params (for export / merge paths)."""
    G = num_layers // period
    stacks = params["layer_stacks"]
    layers: List[Any] = [None] * num_layers
    for j in range(period):
        for i, tree in enumerate(_unstack_tree(stacks[j], G)):
            layers[i * period + j] = tree
    out = {k: v for k, v in params.items() if k != "layer_stacks"}
    out["layers"] = layers
    return out


def is_stacked(params: Params) -> bool:
    return "layer_stacks" in params
