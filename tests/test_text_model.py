"""Text decoder: cached prefill+decode must match the stateless forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_text_params, param_count
from infinitevl_tpu.models.state import init_decoder_state, state_bytes
from infinitevl_tpu.models.text import embed_tokens, lm_head, text_forward


def err_ratio(x, ref):
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12)


def setup(T=24, B=1, dtype=jnp.float32):
    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    return cfg, params, ids, pos


def test_cached_prefill_matches_stateless():
    cfg, params, ids, pos = setup(T=24)
    embeds = embed_tokens(params, ids)
    h_ref, _, _ = text_forward(params, cfg, embeds, pos, state=None)
    state = init_decoder_state(cfg, 1, dtype=jnp.float32)
    h_cached, new_state, _ = text_forward(params, cfg, embeds, pos, state=state)
    assert err_ratio(h_cached, h_ref) < 1e-4
    assert int(new_state["cum_len"]) == 24


def test_decode_continues_prefill():
    """prefill(T) + per-token decode == stateless forward over T+n tokens."""
    cfg, params, ids, pos = setup(T=20)
    T = 20
    n_extra = 6
    extra = jax.random.randint(jax.random.PRNGKey(2), (1, n_extra), 0, cfg.vocab_size)
    all_ids = jnp.concatenate([ids, extra], axis=1)
    all_pos = jnp.broadcast_to(
        jnp.arange(T + n_extra)[None, None], (3, 1, T + n_extra)
    )
    h_ref, _, _ = text_forward(
        params, cfg, embed_tokens(params, all_ids), all_pos, state=None
    )

    state = init_decoder_state(cfg, 1, dtype=jnp.float32)
    h_pre, state, _ = text_forward(
        params, cfg, embed_tokens(params, ids), pos, state=state
    )
    outs = [h_pre]
    for t in range(T, T + n_extra):
        step_pos = jnp.full((3, 1, 1), t, dtype=jnp.int32)
        h_t, state, _ = text_forward(
            params,
            cfg,
            embed_tokens(params, all_ids[:, t : t + 1]),
            step_pos,
            state=state,
        )
        outs.append(h_t)
    h_steps = jnp.concatenate(outs, axis=1)
    assert err_ratio(h_steps, h_ref) < 1e-4
    assert int(state["cum_len"]) == T + n_extra


def test_decode_past_window_constant_state():
    """Decode far past the SWA window: state shapes stay fixed, outputs track
    a stateless forward restricted to the window."""
    cfg, params, ids, pos = setup(T=8)
    state = init_decoder_state(cfg, 1, dtype=jnp.float32)
    bytes_before = state_bytes(state)
    _, state, _ = text_forward(params, cfg, embed_tokens(params, ids), pos, state=state)
    total = cfg.sliding_window + 13  # past the 16-token window
    tok = jax.random.randint(jax.random.PRNGKey(3), (1, total), 0, cfg.vocab_size)
    for t in range(8, total):
        step_pos = jnp.full((3, 1, 1), t, dtype=jnp.int32)
        _, state, _ = text_forward(
            params, cfg, embed_tokens(params, tok[:, t : t + 1]), step_pos, state=state
        )
    assert state_bytes(state) == bytes_before
    assert int(state["cum_len"]) == total


def test_branching_state_is_free():
    """Functional state: running a branch does not disturb the original
    (the reference needs clone_inference_cache, demo:111-160)."""
    cfg, params, ids, pos = setup(T=12)
    state = init_decoder_state(cfg, 1, dtype=jnp.float32)
    _, state, _ = text_forward(params, cfg, embed_tokens(params, ids), pos, state=state)
    snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), state)
    # run a QA branch from the same state value
    branch = state
    for t in range(12, 15):
        step_pos = jnp.full((3, 1, 1), t, dtype=jnp.int32)
        _, branch, _ = text_forward(
            params, cfg, embed_tokens(params, ids[:, :1]), step_pos, state=branch
        )
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(snapshot)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_lm_head_tied():
    cfg, params, ids, pos = setup(T=4)
    h, _, _ = text_forward(params, cfg, embed_tokens(params, ids), pos)
    logits = lm_head(params, cfg, h)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert logits.dtype == jnp.float32


def test_remat_matches_dense_gradients():
    """Gradient checkpointing must not change values or gradients."""
    import jax

    from infinitevl_tpu.train.step import sft_loss_fn

    cfg, params, ids, pos = setup(T=16)
    labels = ids

    def loss(p, remat):
        return sft_loss_fn(p, cfg, ids, labels, pos, remat=remat)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_barrier_remat_matches_plain_gradients():
    """remat_barrier sequences backward recomputes with
    lax.optimization_barrier (utils/remat.barrier_remat) — a pure
    scheduling constraint: loss and gradients must be bit-compatible with
    the unbarriered remat path, per-layer AND grouped, with and without
    packing segment ids."""
    import jax

    from infinitevl_tpu.train.step import sft_loss_fn

    cfg, params, ids, pos = setup(T=16)
    labels = ids
    seg = jnp.concatenate(
        [jnp.ones((1, 8), jnp.int32), jnp.full((1, 8), 2, jnp.int32)], axis=1
    )

    for segment_ids in (None, seg):
        def loss(p, barrier, group=1):
            return sft_loss_fn(
                p, cfg, ids, labels, pos, segment_ids,
                remat=True, remat_group=group, remat_barrier=barrier,
            )

        l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
        assert abs(float(l0) - float(l1)) < 1e-6
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # grouped variant: barrier applies at the group boundary
        l2, g2 = jax.value_and_grad(lambda p: loss(p, True, group=3))(params)
        assert abs(float(l0) - float(l2)) < 1e-6
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_param_count_3b_scale():
    """Deployed-config param count lands at ~3B (sanity of dims wiring)."""
    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_params

    cfg = infinitevl_3b()
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 2.5e9 < n < 4.5e9, n


def test_grouped_remat_matches_ungrouped():
    """remat_group > 1 must be a pure memory/compute trade: loss and grads
    identical to the plain forward (and to per-layer remat)."""
    import optax

    from infinitevl_tpu.train.step import sft_loss_fn

    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    T = 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(2), (1, T), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, 1, T)).astype(jnp.int32)

    def loss(p, remat, group):
        return sft_loss_fn(
            p["text"], cfg, ids, labels, pos, remat=remat, remat_group=group
        )

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False, 1))(params)
    for group in (2, 3, 8):
        l1, g1 = jax.value_and_grad(lambda p: loss(p, True, group))(params)
        # remat uses the chunked fused CE; compare against the remat=True
        # per-layer baseline for exactness and the plain loss loosely
        assert abs(float(l1) - float(l0)) < 1e-4, (group, float(l1), float(l0))
    lr, gr = jax.value_and_grad(lambda p: loss(p, True, 1))(params)
    lg, gg = jax.value_and_grad(lambda p: loss(p, True, 3))(params)
    assert abs(float(lg) - float(lr)) < 1e-6
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gr)):
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 1e-5, err


def test_delta_stream_threshold_parity():
    """text_forward with the streamed delta path (low threshold) must match
    the vectorized path exactly (same math, different evaluation order)."""
    import dataclasses

    from infinitevl_tpu import tiny_config

    cfg0 = tiny_config().text
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 40), 0, cfg0.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(40)[None, None], (3, 1, 40))
    params = init_text_params(jax.random.PRNGKey(0), cfg0, dtype=jnp.float32)
    cfg_vec = dataclasses.replace(cfg0, delta_stream_min_chunks=0)
    cfg_st = dataclasses.replace(cfg_vec, delta_stream_min_chunks=2)
    h_vec, _, _ = text_forward(
        params, cfg_vec, embed_tokens(params, ids), pos
    )
    h_st, _, _ = text_forward(params, cfg_st, embed_tokens(params, ids), pos)
    assert err_ratio(h_st, h_vec) < 1e-5


def test_delta_seq_chunked_layer_parity():
    """delta_forward_seq_chunked == delta_forward exactly, including packed
    segments whose boundaries straddle the sequence-chunk edges, non-multiple
    lengths (padding), and gradients."""
    import dataclasses

    from infinitevl_tpu import tiny_config
    from infinitevl_tpu.models.params import init_delta_layer
    from infinitevl_tpu.models.text import (
        delta_forward,
        delta_forward_seq_chunked,
    )

    cfg = dataclasses.replace(
        tiny_config().text, delta_chunk_size=8, delta_seq_chunk_t=0
    )
    p = init_delta_layer(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, T, D = 2, 53, cfg.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32) * 0.3
    # segments: row 0 has a boundary exactly at a chunk edge (16) and one
    # mid-chunk (37); row 1 one segment
    seg = jnp.asarray(
        [[0] * 16 + [1] * 21 + [2] * (T - 37), [0] * T], jnp.int32
    )
    ref, _ = delta_forward(p, cfg, x, None, None, None, None, seg)
    out = delta_forward_seq_chunked(p, cfg, x, seg, seq_chunk=16)
    assert err_ratio(out, ref) < 1e-5
    # no segments given
    ref2, _ = delta_forward(p, cfg, x, None, None, None, None, None)
    out2 = delta_forward_seq_chunked(p, cfg, x, None, seq_chunk=16)
    assert err_ratio(out2, ref2) < 1e-5

    def loss(fn, x):
        return jnp.sum(jnp.sin(fn(x)))

    g_ref = jax.grad(
        lambda x: loss(
            lambda x: delta_forward(p, cfg, x, None, None, None, None, seg)[0],
            x,
        )
    )(x)
    g_out = jax.grad(
        lambda x: loss(
            lambda x: delta_forward_seq_chunked(p, cfg, x, seg, 16), x
        )
    )(x)
    assert err_ratio(g_out, g_ref) < 1e-5


def test_delta_seq_chunked_dispatch():
    """delta_forward auto-dispatches to the seq-chunked path above the
    threshold; results match the direct path."""
    import dataclasses

    from infinitevl_tpu import tiny_config
    from infinitevl_tpu.models.params import init_delta_layer
    from infinitevl_tpu.models.text import delta_forward

    cfg0 = tiny_config().text
    p = init_delta_layer(jax.random.PRNGKey(2), cfg0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 48, cfg0.hidden_size),
                          jnp.float32) * 0.3
    cfg_off = dataclasses.replace(cfg0, delta_seq_chunk_t=0, delta_chunk_size=8)
    cfg_on = dataclasses.replace(cfg0, delta_seq_chunk_t=16, delta_chunk_size=8)
    ref, _ = delta_forward(p, cfg_off, x, None, None, None, None, None)
    out, st = delta_forward(p, cfg_on, x, None, None, None, None, None)
    assert st is None
    assert err_ratio(out, ref) < 1e-5


def test_swa_seq_chunked_layer_parity():
    """swa_forward_seq_chunked == the full-length SWA layer, with packed
    segments crossing the window-chunk edges, ragged tails, and gradients."""
    import dataclasses

    from infinitevl_tpu import tiny_config
    from infinitevl_tpu.models.params import init_swa_layer
    from infinitevl_tpu.models.text import (
        swa_attention_forward,
        swa_forward_seq_chunked,
    )
    from infinitevl_tpu.ops.rope import mrope_cos_sin

    cfg = dataclasses.replace(tiny_config().text, delta_seq_chunk_t=0)
    W = cfg.sliding_window  # 16
    p = init_swa_layer(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, T = 2, 3 * W + 5  # ragged tail
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size),
                          jnp.float32) * 0.3
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    import numpy as np_

    inv_freq = 1.0 / (
        cfg.rope_theta
        ** (np_.arange(0, cfg.head_dim, 2, dtype=np_.float64) / cfg.head_dim)
    )
    cos, sin = mrope_cos_sin(
        pos, jnp.asarray(inv_freq, jnp.float32), cfg.mrope_section, 1.0,
        dtype=jnp.float32,
    )
    seg = jnp.asarray(
        [[0] * W + [1] * (2 * W) + [2] * 5, [0] * T], jnp.int32
    )
    ref, _, _ = swa_attention_forward(
        p, cfg, x, cos, sin, None, None, None, segment_ids=seg, window=W
    )
    out = swa_forward_seq_chunked(p, cfg, x, cos, sin, seg, W)
    assert err_ratio(out, ref) < 1e-5

    def loss(fn, x):
        return jnp.sum(jnp.sin(fn(x)))

    g_ref = jax.grad(
        lambda x: loss(
            lambda x: swa_attention_forward(
                p, cfg, x, cos, sin, None, None, None, segment_ids=seg,
                window=W,
            )[0],
            x,
        )
    )(x)
    g_out = jax.grad(
        lambda x: loss(
            lambda x: swa_forward_seq_chunked(p, cfg, x, cos, sin, seg, W), x
        )
    )(x)
    assert err_ratio(g_out, g_ref) < 1e-5


def test_scan_layers_parity():
    """Scan-over-layers (stacked params) == the per-layer loop, values and
    gradients, with and without remat."""
    import dataclasses

    from infinitevl_tpu import tiny_config
    from infinitevl_tpu.models.stacked import (
        detect_period,
        stack_layer_params,
        unstack_layer_params,
    )

    cfg = tiny_config().text
    period = detect_period(cfg.layer_types)
    assert period == 4
    params = init_text_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    stacked = stack_layer_params(params, period)
    # round trip
    rt = unstack_layer_params(stacked, period, cfg.num_hidden_layers)
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(24)[None, None], (3, 1, 24))
    emb = embed_tokens(params, ids)
    h_ref, _, _ = text_forward(params, cfg, emb, pos)
    h_scan, st, hs = text_forward(stacked, cfg, emb, pos)
    assert st is None and hs is None
    assert err_ratio(h_scan, h_ref) < 1e-5
    h_scan_r, _, _ = text_forward(stacked, cfg, emb, pos, remat=True)
    assert err_ratio(h_scan_r, h_ref) < 1e-5

    def loss(p, stacked_layout):
        h, _, _ = text_forward(p, cfg, emb, pos, remat=True)
        return jnp.sum(h**2)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_scan = jax.grad(lambda p: loss(p, True))(stacked)
    g_scan_un = unstack_layer_params(g_scan, period, cfg.num_hidden_layers)
    for a, b in zip(jax.tree.leaves(g_scan_un), jax.tree.leaves(g_ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 1e-4 * (1.0 + np.abs(b).max())

    # scan_unroll is a scheduling dial: same math, fusion reorder only
    # (measured ~2e-6 abs fp32 drift on this tiny config)
    h_u, _, _ = text_forward(stacked, cfg, emb, pos, remat=True, scan_unroll=3)
    np.testing.assert_allclose(
        np.asarray(h_u), np.asarray(h_scan_r), rtol=1e-4, atol=1e-5
    )
    g_u = jax.grad(
        lambda p: jnp.sum(
            text_forward(p, cfg, emb, pos, remat=True, scan_unroll=3)[0] ** 2
        )
    )(stacked)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_scan)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 1e-4 * (1.0 + np.abs(b).max())


def test_remat_mode_variants():
    """Every remat_mode is a scheduling choice only: values and grads match
    the per-layer-loop reference exactly (models/text.py remat_mode)."""
    from infinitevl_tpu import tiny_config
    from infinitevl_tpu.models.stacked import detect_period, stack_layer_params

    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    stacked = stack_layer_params(params, detect_period(cfg.layer_types))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 24), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(24)[None, None], (3, 1, 24))
    emb = embed_tokens(params, ids)

    def loss(p, **kw):
        h, _, _ = text_forward(p, cfg, emb, pos, **kw)
        return jnp.sum(h**2)

    l_ref, g_ref = jax.value_and_grad(loss)(params)
    for mode in ("nested", "scan", "layer", "none"):
        l_m, g_m = jax.value_and_grad(loss)(
            stacked, remat=True, remat_mode=mode
        )
        assert abs(float(l_m) - float(l_ref)) < 1e-3 * (1.0 + abs(float(l_ref))), mode
        from infinitevl_tpu.models.stacked import unstack_layer_params

        g_un = unstack_layer_params(g_m, 4, cfg.num_hidden_layers)
        for a, b in zip(jax.tree.leaves(g_un), jax.tree.leaves(g_ref)):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a - b).max() < 1e-4 * (1.0 + np.abs(b).max()), mode

    with pytest.raises(ValueError, match="remat_mode"):
        text_forward(stacked, cfg, emb, pos, remat=True, remat_mode="bogus")
