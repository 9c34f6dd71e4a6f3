"""Sharding rules: the TPU-native replacement for the reference's
distributed substrate (torchrun DDP / DeepSpeed ZeRO / FSDP / declarative
base_model_tp_plan, SURVEY.md §2.4).

The reference's TP plan (configuration_infinitevl.py:193-201) —
q/k/v/gate/up colwise, o/down rowwise — becomes a PartitionSpec rule table
over the param pytree; the DeltaNet branch shards cleanly over its 16 heads
(q/k/v/a/b/g colwise, o rowwise, per-head decay params on the model axis).
Data parallelism is the batch axis; ZeRO-3/FSDP is the same rule table with
parameters additionally sharded over the data axis (param_mode="fsdp").

All communication is implicit: jit + NamedSharding lets XLA place
all-gathers/psums on ICI. No NCCL-analogue code exists or is needed.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA = "data"
MODEL = "model"

_distributed_initialized = False


def maybe_init_distributed() -> bool:
    """Multi-host bootstrap (SURVEY §5.8): env-driven
    `jax.distributed.initialize()`, a no-op on a single host.

    The reference's multi-node launch is torchrun rendezvous env vars
    (train.sh:13-19; src/llamafactory/cli.py:88-115 spawns torchrun from
    NNODES/NODE_RANK/MASTER_ADDR/MASTER_PORT). The JAX equivalent reads:

    - JAX-native names: COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID
      (all three required together), or
    - torchrun-style names for drop-in launcher compat: MASTER_ADDR
      [+ MASTER_PORT, default 1234], WORLD_SIZE, RANK.

    With neither set (or a world size of 1) nothing happens and the
    process keeps its local devices — the single-chip path is untouched.
    On TPU pods with the cloud metadata server, calling
    `jax.distributed.initialize()` with no args also auto-detects; we only
    do that when JAX_AUTO_DISTRIBUTED=1 opts in, because the blind call
    hangs off-pod. Returns True iff initialize() ran (idempotent).
    Called from `cli train` / `cli bench` / bench.py before backend use.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    import os as _os

    env = _os.environ
    coord = env.get("COORDINATOR_ADDRESS")
    nproc = env.get("NUM_PROCESSES")
    pid = env.get("PROCESS_ID")
    if not coord and env.get("MASTER_ADDR"):
        coord = f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '1234')}"
        nproc = nproc or env.get("WORLD_SIZE")
        pid = pid or env.get("RANK")
    if coord and nproc and pid is not None and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        _distributed_initialized = True
        return True
    if env.get("JAX_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        _distributed_initialized = True
        return True
    return False


def create_mesh(
    data: int = 1, model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, (DATA, MODEL))


def hybrid_device_order(devices, data: int, model: int):
    """Device layout for a multi-slice (DCN-connected) topology.

    Rule (the scaling-book recipe): the model axis — all-gathers/psums on
    every layer — must stay INSIDE a slice (ICI); the data axis — one
    gradient all-reduce per step — is the only one allowed to cross the
    DCN boundary. Devices are grouped by slice_index; each slice
    contributes whole model-groups; the data axis is ordered
    slice-major so rows [i*per_slice:(i+1)*per_slice] of the data axis
    live on slice i.

    Returns a [data, model] object array. Raises if the model axis would
    have to straddle slices.
    """
    devices = list(devices)
    if data * model != len(devices):
        raise ValueError(f"need {data * model} devices, have {len(devices)}")
    slices: dict = {}
    for d in devices:
        slices.setdefault(getattr(d, "slice_index", 0), []).append(d)
    if len(slices) == 1:
        return np.asarray(devices).reshape(data, model)
    rows = []
    for sidx in sorted(slices):
        devs = sorted(slices[sidx], key=lambda d: getattr(d, "id", 0))
        if len(devs) % model:
            raise ValueError(
                f"slice {sidx} has {len(devs)} devices, not a multiple of "
                f"model={model}: the model axis would cross the DCN boundary"
            )
        rows.extend(devs[i : i + model] for i in range(0, len(devs), model))
    if len(rows) != data:
        raise ValueError(
            f"slices supply {len(rows)} data rows, expected data={data}"
        )
    return np.asarray(rows, dtype=object)


def create_hybrid_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """Mesh for single- OR multi-slice topologies: model axis on ICI within
    a slice, data axis across slices on DCN (falls back to create_mesh
    layout when all devices report one slice)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(hybrid_device_order(devices[: data * model], data, model),
                (DATA, MODEL))


# (path regex, spec builder) — first match wins. Specs name logical axes;
# _fit() drops axes whose size doesn't divide the dimension.
_COLWISE = P(None, MODEL)  # kernel [in, out]: shard output features
_ROWWISE = P(MODEL, None)  # kernel [in, out]: shard input features
_RULES: Tuple[Tuple[str, P], ...] = (
    # --- text decoder ---
    # kernel_q variants: int8 weight-only nodes (models/quant.py) shard like
    # their bf16 kernels; the per-output-channel 'scale' follows the output
    # dim, so it shards with colwise kernels and replicates with rowwise.
    (r"text/layers/\d+/(q_proj|k_proj|v_proj|a_proj|b_proj|g_proj)/kernel(_q)?", _COLWISE),
    (r"text/layers/\d+/(q_proj|k_proj|v_proj|a_proj|b_proj|g_proj)/scale", P(MODEL)),
    (r"text/layers/\d+/(q_proj|k_proj|v_proj)/bias", P(MODEL)),
    (r"text/layers/\d+/o_proj/kernel(_q)?", _ROWWISE),
    (r"text/layers/\d+/mlp/(gate|up)/kernel(_q)?", _COLWISE),
    (r"text/layers/\d+/mlp/(gate|up)/scale", P(MODEL)),
    (r"text/layers/\d+/mlp/down/kernel(_q)?", _ROWWISE),
    (r"text/layers/\d+/conv_[qkv]_w", P(None, MODEL)),
    (r"text/layers/\d+/conv_[qkv]_b", P(MODEL)),
    (r"text/layers/\d+/(A_log|dt_bias)", P(MODEL)),
    (r"text/embed", P(None, MODEL)),
    (r"text/lm_head", _ROWWISE),
    # --- vision ---
    (r"visual/blocks/\d+/qkv/kernel(_q)?", _COLWISE),
    (r"visual/blocks/\d+/qkv/(bias|scale)", P(MODEL)),
    (r"visual/blocks/\d+/proj/kernel(_q)?", _ROWWISE),
    (r"visual/blocks/\d+/mlp/(gate|up)/kernel(_q)?", _COLWISE),
    (r"visual/blocks/\d+/mlp/(gate|up)/(bias|scale)", P(MODEL)),
    (r"visual/blocks/\d+/mlp/down/kernel(_q)?", _ROWWISE),
    (r"visual/patch_embed", P(None, MODEL)),
    (r"visual/merger/fc1/kernel", _COLWISE),
    (r"visual/merger/fc1/bias", P(MODEL)),
    (r"visual/merger/fc2/kernel", _ROWWISE),
)

# Decoder state: batch on data, heads on model.
_STATE_RULES: Tuple[Tuple[str, P], ...] = (
    (r"swa_[kv]", P(None, DATA, None, MODEL, None)),
    (r"delta_h", P(None, DATA, MODEL, None, None)),
    (r"conv_[qkv]", P(None, DATA, None, MODEL)),
    (r"cum_len", P()),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _fit(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharded axes that don't divide the array dimension (e.g. 2 KV
    heads on a 4-way model axis fall back to replication)."""
    if len(spec) > len(shape):
        return P()
    out = []
    for dim, ax in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if ax is None:
            out.append(None)
            continue
        size = mesh.shape[ax] if not isinstance(ax, tuple) else int(
            np.prod([mesh.shape[a] for a in ax])
        )
        out.append(ax if dim % size == 0 else None)
    return P(*out)


def _match(rules, path: str) -> Optional[P]:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return None


_FIT_WARNED: set = set()


def param_spec(path: str, shape, mesh: Mesh, param_mode: str = "tp") -> P:
    """PartitionSpec for one parameter. param_mode:
    - "tp": tensor-parallel rules only (inference default)
    - "fsdp": additionally shard the largest replicated dim over data
      (ZeRO-3 / FULL_SHARD equivalent of the reference's DeepSpeed configs)
    - "replicated": everything replicated (pure DP)
    """
    spec = _match(_RULES, path) if param_mode != "replicated" else None
    spec = spec if spec is not None else P()
    fitted = _fit(spec, shape, mesh)
    if fitted != spec and tuple(spec) != ():
        # don't silently read as "TP works" when a dim fell back to
        # replication (e.g. 2 KV heads on a 4-way model axis); warn once per
        # distinct (layer-number-erased) path
        key = (re.sub(r"\d+", "#", path), tuple(spec), shape)
        if key not in _FIT_WARNED:
            _FIT_WARNED.add(key)
            import logging

            logging.getLogger(__name__).warning(
                "sharding rule %s does not divide %s for %s; falling back "
                "to %s (replicated on the dropped axes)",
                tuple(spec), shape, path, tuple(fitted),
            )
    spec = fitted
    if param_mode == "fsdp" and mesh.shape[DATA] > 1 and len(shape) >= 1:
        used = set(a for a in spec if a is not None)
        if DATA not in used:
            dims = list(spec) + [None] * (len(shape) - len(spec))
            order = sorted(range(len(shape)), key=lambda i: -shape[i])
            for i in order:
                if dims[i] is None and shape[i] % mesh.shape[DATA] == 0:
                    dims[i] = DATA
                    break
            spec = P(*dims)
    return spec


def shard_params(params, mesh: Mesh, param_mode: str = "tp"):
    """Device-put the param pytree according to the rules."""

    def place(path, x):
        spec = param_spec(_path_str(path), x.shape, mesh, param_mode)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh, param_mode: str = "tp"):
    """NamedSharding pytree matching params (for jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(
            mesh, param_spec(_path_str(path), x.shape, mesh, param_mode)
        ),
        params,
    )


def state_shardings(state, mesh: Mesh):
    def spec_for(path, x):
        name = _path_str(path)
        spec = _match(_STATE_RULES, name)
        spec = spec if spec is not None else P()
        return NamedSharding(mesh, _fit(spec, x.shape, mesh))

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_state(state, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, state_shardings(state, mesh)
    )


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[batch_axis] = DATA
    return NamedSharding(mesh, P(*spec))
