"""Rope-scaling variants (linear/dynamic/yarn/llama3) parity against the
transformers ROPE_INIT_FUNCTIONS the reference activates
(model_utils/rope.py:35)."""

import dataclasses

import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.ops.rope import rope_init

transformers = pytest.importorskip("transformers")
from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS


class _HFCfg:
    """Duck-typed HF config for ROPE_INIT_FUNCTIONS."""

    def __init__(self, rope_scaling, head_dim=64, theta=10000.0, max_pos=4096):
        self.rope_scaling = rope_scaling
        self.rope_theta = theta
        self.head_dim = head_dim
        self.hidden_size = head_dim * 4
        self.num_attention_heads = 4
        self.partial_rotary_factor = 1.0
        self.max_position_embeddings = max_pos
        self.original_max_position_embeddings = rope_scaling.get(
            "original_max_position_embeddings"
        )

    def get_text_config(self):
        return self


def _my_cfg(**kw):
    t = tiny_config().text
    return dataclasses.replace(
        t, head_dim=64, rope_theta=10000.0, max_position_embeddings=4096, **kw
    )


def _cmp(mine_cfg, hf_scaling, rt):
    inv_mine, scale_mine = rope_init(mine_cfg)
    fn = ROPE_INIT_FUNCTIONS[rt]
    inv_ref, scale_ref = fn(_HFCfg(hf_scaling), device=None)
    inv_ref = inv_ref.numpy() if hasattr(inv_ref, "numpy") else np.asarray(inv_ref)
    np.testing.assert_allclose(inv_mine, inv_ref, rtol=1e-6, atol=1e-9)
    assert abs(scale_mine - float(scale_ref)) < 1e-9


def test_default():
    _cmp(_my_cfg(), {"rope_type": "default"}, "default")


def test_linear():
    _cmp(
        _my_cfg(rope_type="linear", rope_factor=4.0),
        {"rope_type": "linear", "factor": 4.0},
        "linear",
    )


def test_dynamic():
    # at init (seq_len = max_pos) dynamic NTK is identity
    _cmp(
        _my_cfg(rope_type="dynamic", rope_factor=4.0),
        {"rope_type": "dynamic", "factor": 4.0},
        "dynamic",
    )
    # at seq_len > max_pos the base is rescaled
    mine, _ = rope_init(
        _my_cfg(rope_type="dynamic", rope_factor=4.0), seq_len=16384
    )
    ref, _ = ROPE_INIT_FUNCTIONS["dynamic"](
        _HFCfg({"rope_type": "dynamic", "factor": 4.0}), device=None,
        seq_len=16384,
    )
    np.testing.assert_allclose(mine, ref.numpy(), rtol=1e-6, atol=1e-9)


def test_yarn():
    _cmp(
        _my_cfg(
            rope_type="yarn",
            rope_factor=8.0,
            rope_original_max_position_embeddings=512,
        ),
        {
            "rope_type": "yarn",
            "factor": 8.0,
            "original_max_position_embeddings": 512,
        },
        "yarn",
    )


def test_llama3():
    _cmp(
        _my_cfg(
            rope_type="llama3",
            rope_factor=8.0,
            rope_original_max_position_embeddings=8192,
            rope_low_freq_factor=1.0,
            rope_high_freq_factor=4.0,
        ),
        {
            "rope_type": "llama3",
            "factor": 8.0,
            "original_max_position_embeddings": 8192,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
        },
        "llama3",
    )


def test_hf_config_roundtrip():
    """rope_scaling survives from_hf_dict -> config_to_hf_dict."""
    from infinitevl_tpu.config import from_hf_dict
    from infinitevl_tpu.utils.checkpoint import config_to_hf_dict

    cfg = tiny_config()
    hf = config_to_hf_dict(cfg)
    hf["rope_scaling"] = {
        "rope_type": "yarn",
        "factor": 4.0,
        "original_max_position_embeddings": 512,
        "mrope_section": list(cfg.text.mrope_section),
    }
    c2 = from_hf_dict(hf)
    assert c2.text.rope_type == "yarn"
    assert c2.text.rope_factor == 4.0
    assert c2.text.rope_original_max_position_embeddings == 512
    assert abs(c2.text.attention_scaling - (0.1 * np.log(4.0) + 1.0)) < 1e-9
    hf2 = config_to_hf_dict(c2)
    assert hf2["rope_scaling"]["rope_type"] == "yarn"


def test_build_config_configure_rope():
    """ModelArgs.rope_scaling + model_max_length enlarge the window and set
    the factor (configure_rope, model_utils/rope.py:35-69)."""
    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import build_config

    args = parse_args(
        {
            "config_preset": "tiny",
            "rope_scaling": "yarn",
            "model_max_length": 8192,
        }
    )
    cfg = build_config(args)
    assert cfg.text.rope_type == "yarn"
    assert cfg.text.max_position_embeddings == 8192
    assert cfg.text.rope_factor == 4.0  # ceil(8192 / 2048)
    assert cfg.text.rope_original_max_position_embeddings == 2048
