"""Vision encoder: window-batched attention vs a naive in-order reference,
plan bookkeeping, rope-index computation, and multimodal assembly."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import tiny_config
from infinitevl_tpu.config import VisionConfig
from infinitevl_tpu.models.infinitevl import (
    forward,
    get_rope_index,
    scatter_vision_embeds,
)
from infinitevl_tpu.models.params import init_params, init_vision_params
from infinitevl_tpu.models.state import init_decoder_state
from infinitevl_tpu.models.vision import get_vision_plan, vision_forward
from infinitevl_tpu.ops.norms import rms_norm, silu
from infinitevl_tpu.ops.rope import (
    apply_rotary_vision,
    vision_cos_sin,
    vision_rot_pos_ids,
)


def err_ratio(x, ref):
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12)


def tiny_vision_cfg(depth=2):
    return VisionConfig(
        depth=depth,
        hidden_size=32,
        intermediate_size=64,
        num_heads=4,
        patch_size=2,
        spatial_merge_size=2,
        temporal_patch_size=1,
        window_size=8,  # merger_window = 8 / 2 / 2 = 2 merged tokens
        out_hidden_size=48,
        fullatt_block_indexes=(1,),
    )


def naive_vision_reference(params, cfg, pixels, grid_thw):
    """Independent in-original-order ViT with explicit window-id masks."""
    m = cfg.spatial_merge_size
    mw = cfg.merger_window
    unit = cfg.spatial_merge_unit

    # per-patch-token (original merger-aware order) window and frame ids
    win_ids, frame_ids = [], []
    wbase = fbase = 0
    for t, h, w in grid_thw:
        lh, lw = h // m, w // m
        nh, nw = -(-lh // mw), -(-lw // mw)
        for tt in range(t):
            for r in range(lh):
                for c in range(lw):
                    wid = wbase + tt * nh * nw + (r // mw) * nw + (c // mw)
                    win_ids.extend([wid] * unit)
                    frame_ids.extend([fbase + tt] * unit)
        wbase += t * nh * nw
        fbase += t
    win_ids = np.asarray(win_ids)
    frame_ids = np.asarray(frame_ids)

    x = pixels @ params["patch_embed"]
    pos_ids = vision_rot_pos_ids(grid_thw, m)
    cos, sin = vision_cos_sin(pos_ids, cfg.head_dim)
    H, D = cfg.num_heads, cfg.head_dim
    S = x.shape[0]
    for i, bp in enumerate(params["blocks"]):
        h = rms_norm(x, bp["norm1"], 1e-6)
        qkv = (h @ bp["qkv"]["kernel"] + bp["qkv"]["bias"]).reshape(S, 3, H, D)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_rotary_vision(q, k, cos, sin)
        ids = frame_ids if i in cfg.fullatt_block_indexes else win_ids
        mask = ids[:, None] == ids[None, :]
        logits = jnp.einsum("qhd,khd->hqk", q, k) * D**-0.5
        logits = jnp.where(mask[None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", probs, v).reshape(S, H * D)
        x = x + attn @ bp["proj"]["kernel"] + bp["proj"]["bias"]
        h2 = rms_norm(x, bp["norm2"], 1e-6)
        mlp = bp["mlp"]
        h2 = (
            silu(h2 @ mlp["gate"]["kernel"] + mlp["gate"]["bias"])
            * (h2 @ mlp["up"]["kernel"] + mlp["up"]["bias"])
        ) @ mlp["down"]["kernel"] + mlp["down"]["bias"]
        x = x + h2
    mg = params["merger"]
    h = rms_norm(x, mg["ln_q"], 1e-6).reshape(S // unit, unit * x.shape[-1])
    h = h @ mg["fc1"]["kernel"] + mg["fc1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ mg["fc2"]["kernel"] + mg["fc2"]["bias"]


def test_vision_matches_naive_reference():
    """Uneven grid (6x10 patches -> 3x5 merged vs window 2): edge windows
    exercise the padding path."""
    cfg = tiny_vision_cfg()
    grid = ((1, 6, 10),)
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    n_patches = 6 * 10
    in_feat = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    pixels = jax.random.normal(jax.random.PRNGKey(1), (n_patches, in_feat))
    plan = get_vision_plan(grid, cfg)
    out = vision_forward(params, cfg, pixels, plan)
    ref = naive_vision_reference(params, cfg, pixels, grid)
    assert out.shape == ref.shape == (n_patches // 4, cfg.out_hidden_size)
    assert err_ratio(out, ref) < 1e-4
    assert np.all(np.isfinite(np.asarray(out)))


def test_vision_multi_image_and_video():
    """Two inputs incl. a 2-frame video: frame-segmented full attention."""
    cfg = tiny_vision_cfg()
    grid = ((1, 4, 4), (2, 4, 8))
    params = init_vision_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    n_patches = 4 * 4 + 2 * 4 * 8
    in_feat = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    pixels = jax.random.normal(jax.random.PRNGKey(3), (n_patches, in_feat))
    plan = get_vision_plan(grid, cfg)
    out = vision_forward(params, cfg, pixels, plan)
    ref = naive_vision_reference(params, cfg, pixels, grid)
    assert err_ratio(out, ref) < 1e-4


def test_get_rope_index_single_image():
    cfg = tiny_config()
    # prompt: 3 text, vision_start, 4 image tokens (grid 1x4x4 / merge 2), 2 text
    vs, im = cfg.vision_start_token_id, cfg.image_token_id
    ids = np.array([[5, 6, 7, vs, im, im, im, im, 9, 10]])
    pos, deltas = get_rope_index(cfg, ids, image_grid_thw=np.array([[1, 4, 4]]))
    # text 0..3 (incl. vision_start at 3)
    np.testing.assert_array_equal(pos[:, 0, :4], np.tile(np.arange(4), (3, 1)))
    # image grid: t=0, h in {0,1}, w in {0,1}, offset 4
    np.testing.assert_array_equal(pos[0, 0, 4:8], [4, 4, 4, 4])
    np.testing.assert_array_equal(pos[1, 0, 4:8], [4, 4, 5, 5])
    np.testing.assert_array_equal(pos[2, 0, 4:8], [4, 5, 4, 5])
    # trailing text resumes at max+1 = 6
    np.testing.assert_array_equal(pos[:, 0, 8:], np.tile([6, 7], (3, 1)))
    # delta = max_pos + 1 - seq_len = 8 - 10
    assert deltas[0, 0] == 7 + 1 - 10


def test_get_rope_index_video_time_scaling():
    cfg = tiny_config()
    vs, vid = cfg.vision_start_token_id, cfg.video_token_id
    # video grid t=2,h=2,w=2 (merge 2 -> 1x1 per frame): 2 tokens
    ids = np.array([[vs, vid, vid]])
    pos, _ = get_rope_index(
        cfg,
        ids,
        video_grid_thw=np.array([[2, 2, 2]]),
        second_per_grid_ts=[3.0],
    )
    # tokens_per_second=2 (tiny vision default), spg=3 -> t indices 0, 6
    tps = cfg.vision.tokens_per_second
    np.testing.assert_array_equal(pos[0, 0, 1:], [1 + 0, 1 + 3 * tps])


def test_get_rope_index_text_only():
    cfg = tiny_config()
    ids = np.array([[1, 2, 3, 4]])
    pos, deltas = get_rope_index(cfg, ids)
    np.testing.assert_array_equal(pos[1, 0], np.arange(4))
    assert deltas[0, 0] == 0


def test_scatter_vision_embeds():
    embeds = jnp.zeros((1, 6, 4))
    vis = jnp.arange(8, dtype=jnp.float32).reshape(2, 4) + 1
    mask = jnp.array([[False, True, False, True, False, False]])
    out = scatter_vision_embeds(embeds, vis, mask)
    np.testing.assert_array_equal(np.asarray(out[0, 1]), np.asarray(vis[0]))
    np.testing.assert_array_equal(np.asarray(out[0, 3]), np.asarray(vis[1]))
    assert float(jnp.abs(out[0, 0]).sum()) == 0.0


def test_multimodal_forward_end_to_end():
    """Tiny full model: image QA prefill through ViT + decoder + LM head."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    vs, im = cfg.vision_start_token_id, cfg.image_token_id
    # vision grid (1, 4, 4) with tiny vision patch_size=14? tiny_config's
    # vision uses defaults patch 14 / merge 2 -> 4 merged tokens
    ids_np = np.array([[11, vs, im, im, im, im, 13, 17]])
    grid = ((1, 4, 4),)
    in_feat = (
        cfg.vision.in_channels
        * cfg.vision.temporal_patch_size
        * cfg.vision.patch_size**2
    )
    pixels = jax.random.normal(jax.random.PRNGKey(5), (16, in_feat))
    pos, deltas = get_rope_index(cfg, ids_np, image_grid_thw=np.array([grid[0]]))
    state = init_decoder_state(cfg.text, 1, dtype=jnp.float32)
    logits, new_state = forward(
        params,
        cfg,
        jnp.asarray(ids_np),
        jnp.asarray(pos),
        state=state,
        pixel_values=pixels,
        grid_thw=grid,
    )
    assert logits.shape == (1, 8, cfg.text.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert int(new_state["cum_len"]) == 8
