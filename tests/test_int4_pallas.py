"""Fused int4 unpack-matmul kernel (ops/int4_pallas.py) vs the XLA
reference path (models/quant.int4_matmul) — exact same dequant algebra,
so the comparison is tight (fp32 accumulation both sides)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu.models.quant import int4_matmul, quantize_kernel_int4
from infinitevl_tpu.ops.int4_pallas import int4_matmul_fused


def _case(d_in, d_out, group_size, m=4, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(k1, (d_in, d_out), jnp.float32) * 0.05
    x = jax.random.normal(k2, (m, d_in), jnp.float32)
    node = quantize_kernel_int4(w, group_size=group_size)
    return x, node


@pytest.mark.parametrize(
    "d_in,d_out,group_size",
    [
        (256, 256, 1 << 30),  # per-column scales (G=1)
        (256, 256, 128),  # grouped: one group per plane-block
        (512, 384, 128),  # grouped: several in-steps per plane
        (512, 256, 256),  # coarser groups (bk_in = 256)
    ],
)
def test_fused_matches_xla_path(d_in, d_out, group_size):
    x, node = _case(d_in, d_out, group_size)
    ref = int4_matmul(x, node)
    got = int4_matmul_fused(x, node, interpret=True)
    assert got.shape == ref.shape
    err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 2e-6, err


def test_fused_leading_dims_and_m1():
    x, node = _case(256, 256, 128, m=1)
    ref = int4_matmul(x, node)
    got = int4_matmul_fused(x, node, interpret=True)
    err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 2e-6, err
    # [B, T, d_in] leading dims flatten through
    x3 = x.reshape(1, 1, -1)
    got3 = int4_matmul_fused(x3, node, interpret=True)
    assert got3.shape == (1, 1, 256)
    np.testing.assert_allclose(np.asarray(got3[0]), np.asarray(got), rtol=1e-6)


def test_widened_unpack_matches_reference_unpack():
    """The kernel's int32-widened mask/shift/sign-fix must reconstruct
    exactly what models/quant.unpack_int4 produces for every byte value."""
    from infinitevl_tpu.models.quant import unpack_int4

    packed = jnp.asarray(
        np.arange(256, dtype=np.uint8).reshape(2, 128)
    )
    lo_ref, hi_ref = unpack_int4(packed, jnp.int32)
    b = packed.astype(jnp.int32)
    lo = b & 15
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = b >> 4
    hi = jnp.where(hi >= 8, hi - 16, hi)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo_ref))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi_ref))


def test_fused_rejects_biased_storage():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32)
    node = quantize_kernel_int4(w, group_size=128, biased=True)
    with pytest.raises(ValueError):
        int4_matmul_fused(jnp.ones((1, 256)), node, interpret=True)
