"""Multimodal training path: mm encoding, collator positions, and e2e
sft/dt steps over image batches (reference trains on mllm_demo images,
examples/train_linear/*.yaml; collator contract data/collator.py:124-196)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.data.loader import (
    SimpleTokenizer,
    encode_supervised_mm,
    load_dataset_info,
    load_examples,
)
from infinitevl_tpu.hparams import parse_args
from infinitevl_tpu.models.infinitevl import get_rope_index
from infinitevl_tpu.train.trainer import collate_mm, run_dt, run_exp, run_sft

DATA_DIR = "data"


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def mm_examples(cfg):
    registry = load_dataset_info(f"{DATA_DIR}/dataset_info.json")
    raw = load_examples(registry["mllm_demo"], DATA_DIR)
    return encode_supervised_mm(
        raw, SimpleTokenizer(config=cfg), cfg, cutoff_len=128,
        dataset_dir=DATA_DIR, video_min_pixels=56 * 56, video_max_pixels=64 * 64,
    )


def test_encode_mm_pad_counts(cfg, mm_examples):
    merge2 = cfg.vision.spatial_merge_unit
    for e in mm_examples:
        n_img_pads = int((e["input_ids"] == cfg.image_token_id).sum())
        n_vid_pads = int((e["input_ids"] == cfg.video_token_id).sum())
        want_img = (
            int(np.prod(e["image_grid_thw"], axis=1).sum()) // merge2
            if e["image_grid_thw"] is not None
            else 0
        )
        want_vid = (
            int(np.prod(e["video_grid_thw"], axis=1).sum()) // merge2
            if e["video_grid_thw"] is not None
            else 0
        )
        assert n_img_pads == want_img
        assert n_vid_pads == want_vid
        # patch rows match grid product
        if e["pixel_values"] is not None:
            assert e["pixel_values"].shape[0] == int(
                np.prod(e["image_grid_thw"], axis=1).sum()
            )
        # vision tokens never supervised
        vis = (e["input_ids"] == cfg.image_token_id) | (
            e["input_ids"] == cfg.video_token_id
        )
        assert (e["labels"][vis] == -100).all()


def test_collate_mm_positions(cfg, mm_examples):
    img_only = [e for e in mm_examples if e.get("pixel_values") is not None][:2]
    batch, igrids, vgrids = next(
        collate_mm(img_only, cfg, batch_size=2, cutoff_len=64, seed=0)
    )
    assert vgrids is None
    ids = np.asarray(batch["input_ids"])
    am = (np.asarray(batch["segment_ids"]) > 0).astype(np.int64)
    pos_ref, _ = get_rope_index(
        cfg, ids, image_grid_thw=np.asarray(igrids), attention_mask=am
    )
    np.testing.assert_array_equal(np.asarray(batch["position_ids"]), pos_ref)
    # packed patch rows = sum of grid products over the batch
    assert batch["pixel_values"].shape[0] == sum(
        t * h * w for t, h, w in igrids
    )


def _args(extra):
    base = {
        "config_preset": "tiny",
        "dataset": "mllm_demo",
        "dataset_dir": DATA_DIR,
        "cutoff_len": 128,
        "per_device_train_batch_size": 1,
        "max_steps": 2,
        "logging_steps": 1,
        "save_steps": 1000,
        "bf16": False,
        "learning_rate": 1e-3,
        "video_min_pixels": 56 * 56,
        "video_max_pixels": 64 * 64,
    }
    base.update(extra)
    return parse_args(base)


def test_run_sft_multimodal(tmp_path):
    args = _args({"output_dir": str(tmp_path), "max_samples": 2})
    params = run_sft(args)
    assert "visual" in params  # the visual tree was loaded and trained
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_run_sft_multimodal_video(tmp_path):
    args = _args({"output_dir": str(tmp_path), "max_steps": 1})
    # single video example -> exercises the pixel_values_videos path
    registry = load_dataset_info(f"{DATA_DIR}/dataset_info.json")
    raw = [ex for ex in load_examples(registry["mllm_demo"], DATA_DIR)]
    assert any(ex.get("videos") for ex in raw)
    params = run_sft(args)
    assert "visual" in params


def test_run_dt_stage1_multimodal(tmp_path):
    args = _args(
        {
            "output_dir": str(tmp_path),
            "max_samples": 2,
            "stage": "dt",
            "distill_stage": 1,
            "softmax_attention": [0, 4],
            "max_steps": 2,
        }
    )
    student = run_exp(args)
    for leaf in jax.tree.leaves(student):
        assert np.isfinite(np.asarray(leaf)).all()


def test_run_sft_mm_lora(tmp_path):
    args = _args(
        {
            "output_dir": str(tmp_path),
            "max_samples": 2,
            "finetuning_type": "lora",
            "lora_rank": 2,
            "max_steps": 2,
        }
    )
    merged = run_sft(args)
    assert "visual" in merged


def test_load_video_mp4_container_and_encode(tmp_path):
    """Real video containers decode via OpenCV with the header fps driving
    the sampling (reference PyAV path, mm_plugin.py:1129-1152)."""
    import os

    import cv2

    from infinitevl_tpu.config import tiny_config
    from infinitevl_tpu.data.loader import (
        encode_supervised_mm,
        load_video,
        SimpleTokenizer,
    )

    path = os.path.join(str(tmp_path), "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12.0, (64, 48))
    assert w.isOpened()
    for i in range(12):
        w.write(np.full((48, 64, 3), i * 15, np.uint8))
    w.release()

    frames, fps = load_video(path)
    assert frames.shape == (12, 48, 64, 3) and fps == 12.0
    # fixtures (.npy) keep returning fps=None
    npy = os.path.join(str(tmp_path), "clip.npy")
    np.save(npy, frames[:4])
    arr, nofps = load_video(npy)
    assert arr.shape[0] == 4 and nofps is None

    cfg = tiny_config()
    enc = encode_supervised_mm(
        [
            {
                "messages": [
                    {"role": "user", "content": "<video>what happens?"},
                    {"role": "assistant", "content": "fade"},
                ],
                "videos": ["clip.mp4"],
            }
        ],
        SimpleTokenizer(),
        cfg,
        cutoff_len=512,
        dataset_dir=str(tmp_path),
        video_min_pixels=28 * 28,
        video_max_pixels=56 * 56,
    )
    assert enc and enc[0]["pixel_values_videos"] is not None
    assert enc[0]["video_grid_thw"][0][0] >= 1


def test_mm_encode_rejects_foreign_template(cfg):
    """Vision data + a template whose family has NO mm_plugin here must
    fail loudly: silently emitting Qwen pad ids into a yi_vl/llava recipe
    would be a data bug, not a feature (reference backs each family with
    its own plugin, mm_plugin.py:1378)."""
    import pytest as _pytest

    from infinitevl_tpu.data.loader import load_dataset_info, load_examples

    registry = load_dataset_info(f"{DATA_DIR}/dataset_info.json")
    raw = load_examples(registry["mllm_demo"], DATA_DIR)
    with _pytest.raises(ValueError, match="out of scope"):
        encode_supervised_mm(
            raw, SimpleTokenizer(config=cfg), cfg, template="yi_vl",
            cutoff_len=128, dataset_dir=DATA_DIR,
        )


def _mllm_raw():
    """Image-only slice of mllm_demo (the family plugins are image-only
    like their reference counterparts)."""
    from infinitevl_tpu.data.loader import load_dataset_info, load_examples

    registry = load_dataset_info(f"{DATA_DIR}/dataset_info.json")
    raw = load_examples(registry["mllm_demo"], DATA_DIR)
    return [ex for ex in raw if not ex.get("videos")]


def test_mm_encode_paligemma_plugin(cfg):
    """PaliGemma family plugin (data/mm_plugin.py): placeholders stripped
    from text, image_seq_length=256 <image> tokens PREPENDED with IGNORE
    labels, pixels fixed-resized to 224 SigLIP-normalized [N, 3, S, S]
    (reference PaliGemmaPlugin, mm_plugin.py:913-958)."""
    from infinitevl_tpu.data.template import IGNORE_INDEX

    tok = SimpleTokenizer()
    enc = encode_supervised_mm(
        _mllm_raw(), tok, cfg, template="paligemma", cutoff_len=1024,
        dataset_dir=DATA_DIR,
    )
    img_id = tok.encode("<image>")[0]
    for e in enc:
        n_img = 0 if e["pixel_values"] is None else e["pixel_values"].shape[0]
        if n_img == 0:
            continue
        assert e["pixel_values"].shape == (n_img, 3, 224, 224)
        assert e["pixel_values"].dtype == np.float32
        # SigLIP normalization: uint8/255 rescale then (x-.5)/.5 -> [-1, 1]
        assert -1.0001 <= e["pixel_values"].min() <= e["pixel_values"].max() <= 1.0001
        k = 256 * n_img
        assert (e["input_ids"][:k] == img_id).all()
        assert (e["labels"][:k] == IGNORE_INDEX).all()
        # placeholder stripped: no image token in the body
        assert (e["input_ids"][k:] != img_id).all()
        # supervision still lands on the assistant reply
        assert (e["labels"] != IGNORE_INDEX).any()


def test_mm_encode_gemma3_plugin(cfg):
    """Gemma3 family plugin: each <image> placeholder becomes
    boi + 256 <image_soft_token> + eoi IN PLACE (reference Gemma3Plugin
    full_image_sequence, mm_plugin.py:407-446); pixels resize to 896."""
    tok = SimpleTokenizer()
    enc = encode_supervised_mm(
        _mllm_raw(), tok, cfg, template="gemma3", cutoff_len=1024,
        dataset_dir=DATA_DIR,
    )
    soft = tok.encode("<image_soft_token>")[0]
    boi = tok.encode("<start_of_image>")[0]
    eoi = tok.encode("<end_of_image>")[0]
    for e in enc:
        n_img = 0 if e["pixel_values"] is None else e["pixel_values"].shape[0]
        if n_img == 0:
            continue
        assert e["pixel_values"].shape == (n_img, 3, 896, 896)
        ids = e["input_ids"]
        assert (ids == soft).sum() == 256 * n_img
        assert (ids == boi).sum() == n_img and (ids == eoi).sum() == n_img
        # boi sits immediately before the soft-token run
        (first_soft,) = np.nonzero(ids == soft)[0][:1]
        assert ids[first_soft - 1] == boi


def test_mm_encode_family_plugin_guards(cfg):
    """Family plugins refuse videos and placeholder/image count
    mismatches loudly."""
    import pytest as _pytest

    tok = SimpleTokenizer()
    with _pytest.raises(ValueError, match="video"):
        encode_supervised_mm(
            [{"messages": [{"role": "user", "content": "hi"},
                           {"role": "assistant", "content": "ok"}],
              "videos": ["images/clip0.npy"]}],
            tok, cfg, template="gemma3", cutoff_len=512,
            dataset_dir=DATA_DIR,
        )
    with _pytest.raises(ValueError, match="placeholders"):
        encode_supervised_mm(
            [{"messages": [{"role": "user", "content": "no placeholder"},
                           {"role": "assistant", "content": "ok"}],
              "images": ["images/red_square.png"]}],
            tok, cfg, template="paligemma", cutoff_len=1024,
            dataset_dir=DATA_DIR,
        )
