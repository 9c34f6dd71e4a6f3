"""Normalization primitives.

Semantics match the reference Triton modules:
- rms_norm           <- Qwen2RMSNorm (used as InfiniteVLRMSNorm)
- rms_norm_gated     <- fla/modules/fused_norm_gate.py:735 (FusedRMSNormGated,
                        y = rmsnorm(x) * weight, then y * g * sigmoid(g))
- l2norm             <- fla/modules/l2norm.py:21-42 (x / sqrt(sum(x^2) + eps))

All statistics are computed in float32 and cast back to the input dtype,
matching the reference kernels' accumulation discipline. These are left as
plain jnp so XLA fuses them into neighbouring matmuls; a dedicated Pallas
kernel buys nothing for pure elementwise chains on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def rms_norm_gated(
    x: jax.Array,
    gate: jax.Array,
    weight: jax.Array,
    eps: float = 1e-5,
    activation: str = "silu",
) -> jax.Array:
    """RMSNorm(x) * act(gate); the DeltaNet output norm."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    gf = gate.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if activation in ("silu", "swish"):
        y = y * gf * jax.nn.sigmoid(gf)
    elif activation == "sigmoid":
        y = y * jax.nn.sigmoid(gf)
    else:
        raise ValueError(f"unsupported activation {activation!r}")
    return y.astype(dtype)


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Row-wise L2 normalization over the last axis (fp32 internally)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ssq = jnp.sum(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ssq + eps)).astype(dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)
