"""Pallas kernels in interpreter mode (CPU): parity against the XLA paths.
Real-TPU parity and speed are exercised by bench.py / perf scripts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu.ops.delta_pallas import delta_rule_chunk_fused
from infinitevl_tpu.ops.delta_rule import delta_rule_recurrent
from infinitevl_tpu.ops.swa import swa_cached_attention
from infinitevl_tpu.ops.swa_pallas import swa_ring_flash_attention


def err_ratio(x, ref):
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12)


@pytest.mark.parametrize("cum", [0, 100, 511, 5000])
def test_swa_flash_parity(cum):
    B, Hq, Hkv, D, W = 1, 4, 2, 128, 512
    cap, T = W, 37
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, T, Hq, D), jnp.float32)
    kn = jax.random.normal(ks[1], (B, T, Hkv, D), jnp.float32)
    vn = jax.random.normal(ks[2], (B, T, Hkv, D), jnp.float32)
    rk = jax.random.normal(ks[3], (B, Hkv, cap, D), jnp.float32)
    rv = jax.random.normal(ks[4], (B, Hkv, cap, D), jnp.float32)
    c = jnp.asarray(cum, jnp.int32)
    ref, _, _ = swa_cached_attention(q, kn, vn, rk, rv, c, W)
    out = swa_ring_flash_attention(
        q, kn, vn, rk, rv, c, W, block_k=128, interpret=True
    )
    assert err_ratio(out, ref) < 1e-5


def test_swa_flash_decode_shape():
    B, Hq, Hkv, D, W = 1, 4, 2, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
    kn = jax.random.normal(ks[1], (B, 1, Hkv, D), jnp.float32)
    vn = jax.random.normal(ks[2], (B, 1, Hkv, D), jnp.float32)
    rk = jax.random.normal(ks[3], (B, Hkv, W, D), jnp.float32)
    rv = jax.random.normal(ks[4], (B, Hkv, W, D), jnp.float32)
    c = jnp.asarray(600, jnp.int32)
    ref, _, _ = swa_cached_attention(q, kn, vn, rk, rv, c, W)
    out = swa_ring_flash_attention(
        q, kn, vn, rk, rv, c, W, block_k=128, interpret=True
    )
    assert err_ratio(out, ref) < 1e-5


def test_fused_delta_parity():
    B, T, H, K, V = 1, 100, 2, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    q = jax.random.normal(ks[0], (B, T, H, K), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, H, K), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, H, V), jnp.float32)
    g = -3 * jax.random.uniform(ks[3], (B, T, H))
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (B, T, H)))
    s0 = jax.random.normal(ks[5], (B, H, K, V), jnp.float32)
    o_ref, s_ref = delta_rule_recurrent(q, k, v, g, beta, initial_state=s0)
    o, s = delta_rule_chunk_fused(
        q, k, v, g, beta, initial_state=s0, chunk_size=64, interpret=True
    )
    assert err_ratio(o, o_ref) < 1e-5
    assert err_ratio(s, s_ref) < 1e-5


def test_swa_flash_decode_write_first_parity():
    """The T=1 write-then-attend kernel must match the concat reference,
    including the ring updates."""
    from infinitevl_tpu.ops.swa_pallas import swa_ring_flash_decode

    B, Hq, Hkv, D, W = 1, 4, 2, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
    kn = jax.random.normal(ks[1], (B, 1, Hkv, D), jnp.float32)
    vn = jax.random.normal(ks[2], (B, 1, Hkv, D), jnp.float32)
    rk = jax.random.normal(ks[3], (B, Hkv, W, D), jnp.float32)
    rv = jax.random.normal(ks[4], (B, Hkv, W, D), jnp.float32)
    for cum in [0, 511, 512, 9001]:
        c = jnp.asarray(cum, jnp.int32)
        ref, rrk, rrv = swa_cached_attention(q, kn, vn, rk, rv, c, W)
        out, nrk, nrv = swa_ring_flash_decode(
            q, kn, vn, rk, rv, c, W, block_k=128, interpret=True
        )
        assert err_ratio(out, ref) < 1e-5, cum
        np.testing.assert_allclose(np.asarray(nrk), np.asarray(rrk))
        np.testing.assert_allclose(np.asarray(nrv), np.asarray(rrv))


def test_swa_flash_rejects_misaligned_capacity():
    B, Hq, Hkv, D, W = 1, 4, 2, 128, 500
    q = jnp.zeros((B, 1, Hq, D))
    kn = jnp.zeros((B, 1, Hkv, D))
    rk = jnp.zeros((B, Hkv, 500, D))
    with pytest.raises(ValueError, match="multiple"):
        swa_ring_flash_attention(
            q, kn, kn, rk, rk, jnp.int32(0), W, block_k=128, interpret=True
        )


def test_ring_flash_query_blocking_matches_dense():
    """Query-blocked prefill (NQ > 1) equals the dense reference — the
    long-chunk path exercises multiple query blocks."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from infinitevl_tpu.ops.swa import swa_cached_attention
    from infinitevl_tpu.ops.swa_pallas import swa_ring_flash_attention

    rng = np.random.RandomState(0)
    B, T, Hq, Hkv, D, cap, W = 1, 48, 4, 2, 128, 512, 512
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.5, jnp.float32)
    q, nk, nv = mk(B, T, Hq, D), mk(B, T, Hkv, D), mk(B, T, Hkv, D)
    rk, rv = mk(B, Hkv, cap, D), mk(B, Hkv, cap, D)
    cum = jnp.asarray(cap + 3, jnp.int32)
    ref, _, _ = swa_cached_attention(q, nk, nv, rk, rv, cum, W)
    # block_q=32 < R=96 forces 3 query blocks
    out = swa_ring_flash_attention(
        q, nk, nv, rk, rv, cum, W, block_q=32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_swa_flash_decode_stacked_parity():
    """The stacked-ring decode kernel (the model's decode hot path) must
    match the concat reference for every layer slot of a multi-layer stack,
    and write the token into exactly that layer's ring."""
    from infinitevl_tpu.ops.swa_pallas import swa_ring_flash_decode_stacked

    S, B, Hq, Hkv, D, W = 3, 2, 4, 2, 128, 512
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
    kn = jax.random.normal(ks[1], (B, 1, Hkv, D), jnp.float32)
    vn = jax.random.normal(ks[2], (B, 1, Hkv, D), jnp.float32)
    rks = jax.random.normal(ks[3], (S, B, Hkv, W, D), jnp.float32)
    rvs = jax.random.normal(ks[4], (S, B, Hkv, W, D), jnp.float32)
    for cum in [0, 511, 512, 9001]:
        c = jnp.asarray(cum, jnp.int32)
        for layer in range(S):
            ref, rrk, rrv = swa_cached_attention(
                q, kn, vn, rks[layer], rvs[layer], c, W
            )
            out, nrks, nrvs = swa_ring_flash_decode_stacked(
                q, kn, vn, rks, rvs, layer, c, W, block_k=128, interpret=True
            )
            assert err_ratio(out, ref) < 1e-5, (cum, layer)
            np.testing.assert_allclose(np.asarray(nrks[layer]), np.asarray(rrk))
            np.testing.assert_allclose(np.asarray(nrvs[layer]), np.asarray(rrv))
            # other layers untouched
            for other in range(S):
                if other != layer:
                    np.testing.assert_array_equal(
                        np.asarray(nrks[other]), np.asarray(rks[other])
                    )


def test_delta_step_fused_stacked_parity():
    """Fused stacked decode step == delta_rule_step per layer slot; other
    layers' state untouched."""
    from infinitevl_tpu.ops.delta_pallas import delta_step_fused_stacked
    from infinitevl_tpu.ops.delta_rule import delta_rule_step

    L, B, H, K, V = 3, 2, 4, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    q = jax.random.normal(ks[0], (B, H, K), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, K), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, V), jnp.float32)
    g = -jnp.abs(jax.random.normal(ks[3], (B, H))) * 0.2
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (B, H)))
    stack = jax.random.normal(ks[5], (L, B, H, K, V), jnp.float32)
    for layer in range(L):
        o_ref, h_ref = delta_rule_step(q, k, v, g, beta, stack[layer])
        o, new_stack = delta_step_fused_stacked(
            q, k, v, g, beta, stack, layer, interpret=True
        )
        assert err_ratio(o, o_ref) < 1e-5, layer
        assert err_ratio(new_stack[layer], h_ref) < 1e-5, layer
        for other in range(L):
            if other != layer:
                np.testing.assert_array_equal(
                    np.asarray(new_stack[other]), np.asarray(stack[other])
                )


# ---------------------------------------------------------------------------
# ViT segment-aware flash attention (ops/vit_flash.py)
# ---------------------------------------------------------------------------


def _vit_inputs(key, S=640, H=2, D=80, n_seg=3, with_pads=True):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (S, H, D), jnp.float32)
    # contiguous-ish segments with scattered -1 pads (window-order layout)
    bounds = np.sort(
        np.asarray(jax.random.randint(ks[3], (n_seg - 1,), 1, S))
    )
    seg = np.zeros(S, np.int32)
    for b in bounds:
        seg[b:] += 1
    if with_pads:
        rng = np.random.RandomState(0)
        seg[rng.choice(S, S // 10, replace=False)] = -1
    return q, k, v, jnp.asarray(seg)


def _vit_dense_ref(q, k, v, seg):
    from infinitevl_tpu.ops.swa import attention_dense

    mask = (seg[:, None] == seg[None, :])
    return attention_dense(q[None], k[None], v[None], mask[None])[0]


def test_vit_flash_parity_vs_dense():
    from infinitevl_tpu.ops.vit_flash import segment_flash_attention

    q, k, v, seg = _vit_inputs(jax.random.PRNGKey(3))
    ref = _vit_dense_ref(q, k, v, seg)
    out = segment_flash_attention(
        q, k, v, seg, block_q=128, block_k=128, interpret=True
    )
    real = np.asarray(seg) >= 0  # pad rows are garbage-but-finite by design
    assert np.all(np.isfinite(np.asarray(out)))
    assert err_ratio(np.asarray(out)[real], np.asarray(ref)[real]) < 1e-5


def test_vit_chunked_parity_vs_dense():
    from infinitevl_tpu.ops.vit_flash import attention_segment_chunked

    q, k, v, seg = _vit_inputs(jax.random.PRNGKey(4), S=300)
    ref = _vit_dense_ref(q, k, v, seg)
    out = attention_segment_chunked(q, k, v, seg, block_q=64)
    real = np.asarray(seg) >= 0
    assert err_ratio(np.asarray(out)[real], np.asarray(ref)[real]) < 1e-5


def test_vit_full_attention_grads_match_dense():
    """custom_vjp backward (chunked twin) must agree with the dense VJP."""
    from infinitevl_tpu.ops.vit_flash import vit_full_attention

    q, k, v, seg = _vit_inputs(jax.random.PRNGKey(5), S=256, with_pads=False)

    def loss_flash(q, k, v):
        out = vit_full_attention(q, k, v, seg, use_pallas=True, interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_vit_dense_ref(q, k, v, seg)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        assert err_ratio(a, b) < 1e-4


def test_vision_forward_flash_threshold_parity():
    """vision_forward must give identical results whether the full blocks
    route through the flash dispatcher or the dense path (threshold moved)."""
    import infinitevl_tpu.models.vision as vision
    from infinitevl_tpu.config import tiny_config
    from infinitevl_tpu.models.params import init_params

    cfg = tiny_config(vision_depth=2)
    params = init_params(jax.random.PRNGKey(6), cfg)["visual"]
    grid = ((1, 16, 16),)  # 256 patch tokens
    plan = vision.get_vision_plan(grid, cfg.vision)
    px = jax.random.normal(
        jax.random.PRNGKey(7),
        (plan.seq, cfg.vision.in_channels * cfg.vision.temporal_patch_size
         * cfg.vision.patch_size**2),
        jnp.float32,
    )
    ref = vision.vision_forward(params, cfg.vision, px, plan)
    old = vision.FLASH_FULL_ATTN_MIN_SEQ
    try:
        vision.FLASH_FULL_ATTN_MIN_SEQ = 1  # force the flash/chunked route
        out = vision.vision_forward(params, cfg.vision, px, plan)
    finally:
        vision.FLASH_FULL_ATTN_MIN_SEQ = old
    assert err_ratio(out, ref) < 1e-5


def _window_inputs(key, nW=5, L=32, H=2, D=24, n_pad_windows=1):
    """Window-order layout: nW contiguous windows of L tokens; the last
    few tokens of some windows are pads (seg -2-w), like a VisionPlan."""
    ks = jax.random.split(key, 3)
    S = nW * L
    q = jax.random.normal(ks[0], (S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (S, H, D), jnp.float32)
    wi = np.repeat(np.arange(nW, dtype=np.int32), L)
    valid = np.ones(S, bool)
    rng = np.random.RandomState(1)
    for w in rng.choice(nW, n_pad_windows, replace=False):
        valid[w * L + L - rng.randint(1, L // 2) : (w + 1) * L] = False
    seg = np.where(valid, wi, -2 - wi).astype(np.int32)
    return q, k, v, jnp.asarray(seg)


def _window_dense_ref(q, k, v, seg, L):
    """The pre-kernel batched path: valid==valid mask within each window."""
    from infinitevl_tpu.ops.swa import attention_dense

    S, H, D = q.shape
    nW = S // L
    vm = (np.asarray(seg) >= 0).reshape(nW, L)
    mask = jnp.asarray(vm[:, :, None] == vm[:, None, :])
    out = attention_dense(
        q.reshape(nW, L, H, D), k.reshape(nW, L, H, D),
        v.reshape(nW, L, H, D), mask,
    )
    return out.reshape(S, H, D)


def test_window_flash_parity_vs_batched_dense():
    """Diagonal-block kernel == the batched per-window dense path, incl.
    pad slots and an S that needs padding up to the block size."""
    from infinitevl_tpu.ops.vit_flash import (
        window_attention_reference,
        window_flash_attention,
    )

    L = 32
    q, k, v, seg = _window_inputs(jax.random.PRNGKey(8), nW=5, L=L)
    ref = _window_dense_ref(q, k, v, seg, L)
    tw = window_attention_reference(q, k, v, seg, L)
    assert err_ratio(tw, ref) < 1e-6  # twin == old path exactly
    for block in (64, 128):  # 160 % 128 != 0 exercises the Sp pad
        out = window_flash_attention(
            q, k, v, seg, L, block=block, interpret=True
        )
        assert np.all(np.isfinite(np.asarray(out)))
        assert err_ratio(out, ref) < 1e-5, block


def test_vit_window_attention_grads_match_dense():
    from infinitevl_tpu.ops.vit_flash import vit_window_attention

    L = 16
    q, k, v, seg = _window_inputs(
        jax.random.PRNGKey(9), nW=4, L=L, n_pad_windows=0
    )

    def loss_flash(q, k, v):
        out = vit_window_attention(
            q, k, v, seg, L, use_pallas=True, interpret=True
        )
        return jnp.sum(jnp.sin(out))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(_window_dense_ref(q, k, v, seg, L)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        assert err_ratio(a, b) < 1e-4


def test_window_attention_kernel_route_matches_dense():
    """_window_attention's kernel route (threshold forced down) must equal
    its batched-dense route on a real VisionPlan with pad windows."""
    import infinitevl_tpu.models.vision as vision
    from infinitevl_tpu.config import tiny_config
    from infinitevl_tpu.models.params import init_params

    cfg = tiny_config(vision_depth=2)
    # 14x18 grid: not a multiple of the window edge -> real pad slots
    grid = ((1, 14, 18),)
    plan = vision.get_vision_plan(grid, cfg.vision)
    assert not bool(np.all(plan.token_valid))  # pads present
    params = init_params(jax.random.PRNGKey(10), cfg)["visual"]
    px = jax.random.normal(
        jax.random.PRNGKey(11),
        (plan.seq, cfg.vision.in_channels * cfg.vision.temporal_patch_size
         * cfg.vision.patch_size**2),
        jnp.float32,
    )
    ref = vision.vision_forward(params, cfg.vision, px, plan)
    old = (vision.FLASH_FULL_ATTN_MIN_SEQ, vision.WINDOW_FLASH_MIN_SEQ,
           vision.WINDOW_FLASH_MIN_WIN_LEN)
    try:
        vision.FLASH_FULL_ATTN_MIN_SEQ = 1
        vision.WINDOW_FLASH_MIN_SEQ = 1
        vision.WINDOW_FLASH_MIN_WIN_LEN = 1
        out = vision.vision_forward(params, cfg.vision, px, plan)
    finally:
        (vision.FLASH_FULL_ATTN_MIN_SEQ, vision.WINDOW_FLASH_MIN_SEQ,
         vision.WINDOW_FLASH_MIN_WIN_LEN) = old
    assert err_ratio(out, ref) < 1e-5
