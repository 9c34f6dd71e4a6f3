"""Custom optimizers: GaLore, APOLLO, LoRA+, BAdam, Adam-mini.

The reference wires these through HF Trainer plugins
(src/llamafactory/train/trainer_utils.py:250-560: _create_galore_optimizer,
_create_apollo_optimizer, _create_loraplus_optimizer, _create_badam_optimizer).
Here each is an optax gradient transformation, so they compose with the
existing make_optimizer pipeline and stay fully jittable — the projection
refresh (GaLore's SVD / APOLLO's random reprojection) runs inside the update
under lax.cond, no Python-side scheduling.

- GaLore (arXiv:2403.03507): project 2-D gradients onto a rank-r subspace
  from the gradient's top singular vectors, run Adam in the subspace,
  project back; refresh the subspace every `update_proj_gap` steps.
- APOLLO (arXiv:2412.05270): same memory shape but the projection is a
  re-drawn random Gaussian, and the projected optimizer state provides a
  per-channel gradient SCALING of the full-rank gradient.
- LoRA+ (arXiv:2402.12354): the adapter's `b` matrices get lr * ratio.
- BAdam (arXiv:2404.02827): block-coordinate Adam — cycle through layer
  blocks, updating one block per `switch_interval` steps.
- Adam-mini (arXiv:2406.16793): one second-moment scalar per Hessian block
  (per attention head for q/k, per output neuron elsewhere).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..parallel.sharding import _path_str

Params = Dict[str, Any]


# ------------------------------------------------------------------ GaLore


def _project(g, proj, left: bool):
    # left: project rows ([m, n] -> [r, n]); else columns ([m, n] -> [m, r])
    return proj.T @ g if left else g @ proj


def _project_back(gp, proj, left: bool):
    return proj @ gp if left else gp @ proj.T


def galore(
    learning_rate,
    rank: int = 8,
    update_proj_gap: int = 200,
    scale: float = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_dim: int = 2 * 8,
) -> optax.GradientTransformation:
    """GaLore over every 2-D kernel big enough to benefit; other leaves get
    plain Adam. Memory: O(r * max(m, n)) optimizer state per kernel instead
    of O(m * n)."""

    def is_galore(x):
        return x.ndim == 2 and min(x.shape) >= max(rank * 2, min_dim)

    def svd_proj(g, left: bool):
        # top-r singular vectors of the gradient (galore paper algo 2)
        u, s, vt = jnp.linalg.svd(g.astype(jnp.float32), full_matrices=False)
        return u[:, :rank] if left else vt[:rank].T

    def init(params):
        def leaf(x):
            if not is_galore(x):
                # plain-Adam leaf: (m, v)
                return (jnp.zeros_like(x), jnp.zeros_like(x))
            left = x.shape[0] <= x.shape[1]
            d = x.shape[0] if left else x.shape[1]
            shape = (rank, x.shape[1]) if left else (x.shape[0], rank)
            # galore leaf: (proj, m, v) in the subspace
            return (
                jnp.zeros((d, rank), jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
            )

        return {
            "step": jnp.zeros((), jnp.int32),
            "leaves": jax.tree.map(leaf, params),
        }

    def update(grads, state, params=None):
        step = state["step"] + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        flat_g, treedef = jax.tree.flatten(grads)
        flat_s = treedef.flatten_up_to(state["leaves"])
        out_u, out_s = [], []
        for g, st in zip(flat_g, flat_s):
            if is_galore(g):
                proj0, m, v = st
                left = g.shape[0] <= g.shape[1]
                refresh = (step - 1) % update_proj_gap == 0
                proj = jax.lax.cond(
                    refresh, lambda: svd_proj(g, left), lambda: proj0
                )
                gp = _project(g.astype(jnp.float32), proj, left)
                m = b1 * m + (1 - b1) * gp
                v = b2 * v + (1 - b2) * gp * gp
                mh = m / (1 - b1**step)
                vh = v / (1 - b2**step)
                upd = _project_back(mh / (jnp.sqrt(vh) + eps), proj, left)
                out_u.append((-lr * scale * upd).astype(g.dtype))
                out_s.append((proj, m, v))
            else:
                m, v = st
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * g * g
                mh = m / (1 - b1**step)
                vh = v / (1 - b2**step)
                out_u.append((-lr * mh / (jnp.sqrt(vh) + eps)).astype(g.dtype))
                out_s.append((m, v))
        return (
            jax.tree.unflatten(treedef, out_u),
            {"step": step, "leaves": jax.tree.unflatten(treedef, out_s)},
        )

    return optax.GradientTransformation(init, update)


# ------------------------------------------------------------------ APOLLO


def apollo(
    learning_rate,
    rank: int = 8,
    update_proj_gap: int = 200,
    scale: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    seed: int = 0,
) -> optax.GradientTransformation:
    """APOLLO: Adam moments live in a random low-rank projection; the update
    applied to the weights is the FULL-RANK gradient scaled per channel by
    ||adam_update_projected|| / ||g_projected|| (the paper's norm-scaling),
    so memory matches GaLore without any SVD."""

    def is_lowrank(x):
        return x.ndim == 2 and min(x.shape) >= rank * 2

    def draw(step, shape, idx):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), idx)
        key = jax.random.fold_in(key, step // update_proj_gap)
        d = shape[0] if shape[0] <= shape[1] else shape[1]
        return jax.random.normal(key, (d, rank), jnp.float32) / jnp.sqrt(rank)

    def init(params):
        def leaf(x):
            if not is_lowrank(x):
                return (jnp.zeros_like(x), jnp.zeros_like(x))
            left = x.shape[0] <= x.shape[1]
            shape = (rank, x.shape[1]) if left else (x.shape[0], rank)
            return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))

        return {"step": jnp.zeros((), jnp.int32), "mv": jax.tree.map(leaf, params)}

    def update(grads, state, params=None):
        step = state["step"] + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        flat_g, treedef = jax.tree.flatten(grads)
        flat_mv = treedef.flatten_up_to(state["mv"])
        out_u, out_mv = [], []
        for idx, (g, (m, v)) in enumerate(zip(flat_g, flat_mv)):
            if not is_lowrank(g):
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * g * g
                mh = m / (1 - b1**step)
                vh = v / (1 - b2**step)
                out_u.append((-lr * mh / (jnp.sqrt(vh) + eps)).astype(g.dtype))
                out_mv.append((m, v))
                continue
            left = g.shape[0] <= g.shape[1]
            proj = draw(step - 1, g.shape, idx)
            gp = _project(g.astype(jnp.float32), proj, left)
            m = b1 * m + (1 - b1) * gp
            v = b2 * v + (1 - b2) * gp * gp
            mh = m / (1 - b1**step)
            vh = v / (1 - b2**step)
            up = mh / (jnp.sqrt(vh) + eps)
            # per-channel norm scaling (channel = the non-projected dim)
            ax = 0 if left else 1
            s = jnp.linalg.norm(up, axis=ax) / (
                jnp.linalg.norm(gp, axis=ax) + eps
            )
            s = s[None, :] if left else s[:, None]
            out_u.append((-lr * scale * g.astype(jnp.float32) * s).astype(g.dtype))
            out_mv.append((m, v))
        return (
            jax.tree.unflatten(treedef, out_u),
            {"step": step, "mv": jax.tree.unflatten(treedef, out_mv)},
        )

    return optax.GradientTransformation(init, update)


# ------------------------------------------------------------------- LoRA+


def loraplus(
    learning_rate,
    lr_ratio: float = 16.0,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """LoRA+ over an adapter tree: 'b' matrices train lr_ratio times faster
    than 'a' (trainer_utils.py _create_loraplus_optimizer semantics)."""

    def label(params):
        # match the final path COMPONENT 'b' (adapter B matrices), not any
        # leaf whose name merely ends in the letter b (conv_b, conv_q_b, ...)
        return jax.tree_util.tree_map_with_path(
            lambda p, _: (
                "b" if _path_str(p).split("/")[-1] == "b" else "a"
            ),
            params,
        )

    return optax.multi_transform(
        {
            "a": optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay),
            "b": optax.adamw(
                lambda s: (learning_rate(s) if callable(learning_rate) else learning_rate)
                * lr_ratio,
                b1=b1,
                b2=b2,
                weight_decay=weight_decay,
            ),
        },
        label,
    )


# ------------------------------------------------------------------- BAdam


def badam(
    learning_rate,
    num_blocks: int = 4,
    switch_interval: int = 50,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Block-coordinate Adam: parameters are split into `num_blocks` groups
    by layer index (non-layer leaves join the last block); each
    switch_interval steps the active block advances (BAdam's layer-wise
    ascent, trainer_utils.py _create_badam_optimizer)."""

    def block_of(path: str) -> int:
        import re as _re

        m = _re.search(r"layers/(\d+)", path)
        if m is None:
            return num_blocks - 1
        return int(m.group(1)) % num_blocks

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params=None):
        step = state["step"] + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        active = ((step - 1) // switch_interval) % num_blocks

        def leaf(path, g, m, v):
            on = jnp.asarray(block_of(_path_str(path)) == active, g.dtype)
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            # moments only advance for the active block (true block descent)
            m2 = jnp.where(on > 0, m2, m)
            v2 = jnp.where(on > 0, v2, v)
            mh = m2 / (1 - b1**step)
            vh = v2 / (1 - b2**step)
            u = (-lr * mh / (jnp.sqrt(vh) + eps)) * on
            return u.astype(g.dtype), m2, v2

        flat = jax.tree_util.tree_map_with_path(
            lambda p, g, m, v: leaf(p, g, m, v), grads, state["m"], state["v"]
        )
        upd = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        m = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        v = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
        return upd, {"step": step, "m": m, "v": v}

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------- Adam-mini


def adam_mini(
    learning_rate,
    head_dim: int = 128,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam-mini (arXiv:2406.16793; reference wires it through HF Trainer at
    src/llamafactory/train/trainer_utils.py:485 _create_adam_mini_optimizer):
    one second-moment scalar per Hessian block instead of per coordinate.

    Block rule (the paper's partition):
      - embedding / lm_head leaves keep per-coordinate Adam (their Hessian
        is near-diagonal);
      - q_proj / k_proj kernels: one block per attention head (columns are
        grouped in chunks of `head_dim`);
      - every other >=2-D kernel: one block per output neuron (column);
      - 1-D leaves (norm scales, biases): per-coordinate.
    Momentum `m` stays per-coordinate — the memory saving is the v buffer
    (~[n_heads] or ~[d_out] scalars instead of a weight-shaped tensor).
    """

    PER_COORD, PER_HEAD, PER_COL = 0, 1, 2

    def rule_of(path: str, x) -> int:
        parts = path.split("/")
        if "embed" in parts or "lm_head" in parts or x.ndim < 2:
            return PER_COORD
        if len(parts) >= 2 and parts[-1] == "kernel" and parts[-2] in ("q_proj", "k_proj"):
            if x.shape[-1] % head_dim == 0:
                return PER_HEAD
        return PER_COL

    def block_mean(g2, rule):
        # mean of g^2 within each block; returns the small v-shaped tensor
        if rule == PER_COORD:
            return g2
        if rule == PER_HEAD:
            h = g2.shape[-1] // head_dim
            return g2.reshape(-1, h, head_dim).mean(axis=(0, 2))  # [h]
        return g2.reshape(-1, g2.shape[-1]).mean(axis=0)  # [d_out]

    def block_bcast(v, rule, shape):
        if rule == PER_COORD:
            return v
        if rule == PER_HEAD:
            h = v.shape[0]
            return jnp.broadcast_to(
                v[None, :, None], (int(np_prod(shape[:-1])), h, head_dim)
            ).reshape(shape)
        return jnp.broadcast_to(v[None, :], (int(np_prod(shape[:-1])), shape[-1])).reshape(
            shape
        )

    def np_prod(t):
        out = 1
        for s in t:
            out *= int(s)
        return out

    def init(params):
        def v0(path, x):
            r = rule_of(_path_str(path), x)
            return block_mean(jnp.zeros(x.shape, jnp.float32), r)

        return {
            "step": jnp.zeros((), jnp.int32),
            "m": jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), params),
            "v": jax.tree_util.tree_map_with_path(v0, params),
        }

    def update(grads, state, params=None):
        step = state["step"] + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate

        def leaf(path, g, m, v, p):
            r = rule_of(_path_str(path), g)
            gf = g.astype(jnp.float32)
            m2 = b1 * m + (1 - b1) * gf
            v2 = b2 * v + (1 - b2) * block_mean(gf * gf, r)
            mh = m2 / (1 - b1**step)
            vh = block_bcast(v2 / (1 - b2**step), r, g.shape)
            u = -lr * (mh / (jnp.sqrt(vh) + eps) + weight_decay * p.astype(jnp.float32))
            return u.astype(g.dtype), m2, v2

        flat = jax.tree_util.tree_map_with_path(
            leaf, grads, state["m"], state["v"], params if params is not None else grads
        )
        pick = lambda i: jax.tree.map(  # noqa: E731
            lambda t: t[i], flat, is_leaf=lambda t: isinstance(t, tuple)
        )
        return pick(0), {"step": step, "m": pick(1), "v": pick(2)}

    return optax.GradientTransformation(init, update)


def make_custom_optimizer(name: str, learning_rate, **kw) -> optax.GradientTransformation:
    """Registry for FinetuneArgs.use_optimizer."""
    table = {
        "galore": galore,
        "apollo": apollo,
        "loraplus": loraplus,
        "badam": badam,
        "adam_mini": adam_mini,
    }
    if name not in table:
        raise ValueError(f"unknown optimizer {name!r} (one of {sorted(table)})")
    return table[name](learning_rate, **kw)
