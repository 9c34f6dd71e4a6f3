"""Conversion + distillation stages on a tiny dense teacher."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.config import FULL, LINEAR, SLIDING
from infinitevl_tpu.models.convert import convert_attention, trainable_mask
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.models.text import embed_tokens, text_forward
from infinitevl_tpu.train.distill import (
    apply_trainable_mask,
    make_stage1_step,
    make_stage2_step,
    teacher_layer_io,
)
from infinitevl_tpu.train.step import make_optimizer, make_sft_train_step


def teacher_setup(n_layers=4):
    base = tiny_config().text
    cfg = dataclasses.replace(
        base,
        num_hidden_layers=n_layers,
        layer_types=(FULL,) * n_layers,
        use_sliding_window=False,
        sliding_window=base.sliding_window,
    )
    params = init_text_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_full_attention_teacher_forward():
    cfg, params = teacher_setup()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(10)[None, None], (3, 1, 10))
    h, _, hs = text_forward(
        params, cfg, embed_tokens(params, ids), pos, output_hidden_states=True
    )
    assert h.shape == (1, 10, cfg.hidden_size)
    assert len(hs) == cfg.num_hidden_layers + 2


def test_convert_attention_structure_and_mimic_init():
    cfg, params = teacher_setup(n_layers=4)
    student, scfg = convert_attention(
        params, cfg, jax.random.PRNGKey(2), softmax_attention=(0,)
    )
    assert scfg.layer_types == (SLIDING, LINEAR, LINEAR, LINEAR)
    # preserved layer keeps teacher weights
    np.testing.assert_array_equal(
        np.asarray(student["layers"][0]["q_proj"]["kernel"]),
        np.asarray(params["layers"][0]["q_proj"]["kernel"]),
    )
    # converted layer keeps MLP, gets mixer keys
    lp = student["layers"][1]
    np.testing.assert_array_equal(
        np.asarray(lp["mlp"]["gate"]["kernel"]),
        np.asarray(params["layers"][1]["mlp"]["gate"]["kernel"]),
    )
    assert "A_log" in lp and "conv_q_w" in lp
    # mimic init: conv is an identity tap, a/b zeroed, A = 1
    W = scfg.conv_size
    conv = np.asarray(lp["conv_q_w"])
    assert conv[W - 1].min() == 1.0 and abs(conv[: W - 1]).max() == 0.0
    assert abs(np.asarray(lp["a_proj"]["kernel"])).max() == 0.0
    assert abs(np.asarray(lp["A_log"])).max() == 0.0
    # student forward runs
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, scfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(12)[None, None], (3, 1, 12))
    h, _, _ = text_forward(student, scfg, embed_tokens(student, ids), pos)
    assert np.isfinite(np.asarray(h)).all()


def test_stage1_distillation_reduces_loss():
    cfg, teacher = teacher_setup(n_layers=2)
    student, scfg = convert_attention(
        teacher, cfg, jax.random.PRNGKey(4), softmax_attention=(0,)
    )
    tx = make_optimizer(learning_rate=3e-3, grad_clip=1.0)
    mask = trainable_mask(student, scfg, softmax_attention=(0,))
    tx = apply_trainable_mask(tx, mask)
    opt_state = tx.init(student)
    step = jax.jit(make_stage1_step(scfg, cfg, tx, mse_factor=10.0))
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 16), 0, cfg.vocab_size)
    batch = {
        "input_ids": ids,
        "position_ids": jnp.broadcast_to(jnp.arange(16)[None, None], (3, 2, 16)),
    }
    losses = []
    emb0 = np.asarray(student["embed"]).copy()
    frozen0 = np.asarray(student["layers"][0]["q_proj"]["kernel"]).copy()
    for _ in range(8):
        student, opt_state, loss = step(student, opt_state, teacher, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # frozen things stay frozen
    np.testing.assert_array_equal(np.asarray(student["embed"]), emb0)
    np.testing.assert_array_equal(
        np.asarray(student["layers"][0]["q_proj"]["kernel"]), frozen0
    )


def test_stage2_kl_step_runs():
    cfg, teacher = teacher_setup(n_layers=2)
    student, scfg = convert_attention(
        teacher, cfg, jax.random.PRNGKey(6), softmax_attention=(0,)
    )
    tx = make_optimizer(learning_rate=1e-3)
    opt_state = tx.init(student)
    step = jax.jit(make_stage2_step(scfg, cfg, tx, temperature=2.0))
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 12), 0, cfg.vocab_size)
    labels = ids.at[:, :4].set(-100)
    batch = {
        "input_ids": ids,
        "labels": labels,
        "position_ids": jnp.broadcast_to(jnp.arange(12)[None, None], (3, 1, 12)),
    }
    s0 = float(step(student, opt_state, teacher, batch)[2])
    assert np.isfinite(s0)


def test_sft_step_reduces_loss():
    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    tx = make_optimizer(learning_rate=5e-3)
    opt_state = tx.init(params)
    step = jax.jit(make_sft_train_step(cfg, tx))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    batch = {
        "input_ids": ids,
        "labels": ids,
        "position_ids": jnp.broadcast_to(jnp.arange(12)[None, None], (3, 2, 12)),
    }
    l0 = None
    for i in range(6):
        params, opt_state, loss = step(params, opt_state, batch)
        if i == 0:
            l0 = float(loss)
    assert float(loss) < l0
