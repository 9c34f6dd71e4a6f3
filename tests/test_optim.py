"""Custom optimizers: GaLore / APOLLO / LoRA+ / BAdam (reference
trainer_utils.py:250-560). Each must reduce a toy loss under jit and keep
its documented state-memory shape."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from infinitevl_tpu.train.optim import adam_mini, apollo, badam, galore, loraplus


def _toy_params(key, d_in=64, d_out=48):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "layers": [
            {"w": jax.random.normal(k1, (d_in, d_out)) * 0.1,
             "bias": jnp.zeros((d_out,))},
            {"w": jax.random.normal(k2, (d_out, d_in)) * 0.1,
             "bias": jnp.zeros((d_in,))},
        ],
        "head": jax.random.normal(k3, (d_in, 1)) * 0.1,
    }


def _toy_loss(params, x, y):
    h = jnp.tanh(x @ params["layers"][0]["w"] + params["layers"][0]["bias"])
    h = jnp.tanh(h @ params["layers"][1]["w"] + params["layers"][1]["bias"])
    return jnp.mean((h @ params["head"] - y) ** 2)


def _train(tx, steps=60, seed=0):
    key = jax.random.PRNGKey(seed)
    params = _toy_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (128, 64))
    y = jax.random.normal(jax.random.fold_in(key, 2), (128, 1))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(_toy_loss)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        first = first if first is not None else float(loss)
    return first, float(loss), opt_state


def test_galore_reduces_loss_and_saves_memory():
    first, last, st = _train(galore(1e-2, rank=4, update_proj_gap=10))
    assert last < first * 0.6, (first, last)
    # moments for the [64,48] kernel live in rank-4 subspace
    w_state = st["leaves"]["layers"][0]["w"]
    proj, m, v = w_state
    assert proj.shape == (48, 4)
    assert m.shape in ((4, 64), (64, 4))


def test_apollo_reduces_loss():
    first, last, st = _train(apollo(1e-2, rank=4, update_proj_gap=10))
    assert last < first * 0.6, (first, last)
    m, v = st["mv"]["layers"][0]["w"]
    assert 4 in m.shape  # low-rank moments


def test_badam_cycles_blocks():
    first, last, _ = _train(
        badam(5e-2, num_blocks=2, switch_interval=5), steps=80
    )
    assert last < first * 0.6, (first, last)


def test_loraplus_b_faster_than_a():
    tx = loraplus(1e-2, lr_ratio=8.0)
    lora = {
        "q_proj": {
            "a": jnp.ones((8, 2)) * 0.1,
            "b": jnp.ones((2, 8)) * 0.1,
        }
    }
    grads = jax.tree.map(jnp.ones_like, lora)
    st = tx.init(lora)
    upd, _ = tx.update(grads, st, lora)
    # same gradient magnitude, b moves ~ratio times further
    ra = float(jnp.abs(upd["q_proj"]["a"]).mean())
    rb = float(jnp.abs(upd["q_proj"]["b"]).mean())
    assert rb > ra * 4


def test_adam_mini_reduces_loss_and_saves_memory():
    first, last, st = _train(adam_mini(1e-2))
    assert last < first * 0.6, (first, last)
    # v for the [64,48] kernel is one scalar per output column
    assert st["v"]["layers"][0]["w"].shape == (48,)
    # m stays per-coordinate
    assert st["m"]["layers"][0]["w"].shape == (64, 48)


def test_adam_mini_per_head_blocks_match_adam_on_blockwise_constant_grad():
    # q_proj kernel with head_dim=4: when g^2 is constant within each head
    # block, block-mean v == per-coordinate v, so the update must equal
    # Adam's exactly.
    hd = 4
    params = {"q_proj": {"kernel": jnp.zeros((8, 3 * hd))}}
    g = jnp.concatenate(
        [jnp.full((8, hd), c) for c in (0.5, -1.0, 2.0)], axis=-1
    )
    grads = {"q_proj": {"kernel": g}}

    mini = adam_mini(1e-2, head_dim=hd)
    st = mini.init(params)
    assert st["v"]["q_proj"]["kernel"].shape == (3,)  # one per head
    upd, _ = mini.update(grads, st, params)

    adam = optax.adam(1e-2)
    ast = adam.init(params)
    aupd, _ = adam.update(grads, ast, params)
    np.testing.assert_allclose(
        np.asarray(upd["q_proj"]["kernel"]),
        np.asarray(aupd["q_proj"]["kernel"]),
        rtol=1e-5,
        atol=1e-7,
    )


def test_adam_mini_embed_stays_per_coordinate():
    params = {"embed": jnp.zeros((16, 8)), "final_norm": jnp.ones((8,))}
    st = adam_mini(1e-3).init(params)
    assert st["v"]["embed"].shape == (16, 8)
    assert st["v"]["final_norm"].shape == (8,)


def test_workflow_use_optimizer(tmp_path):
    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_exp

    for name in ("galore", "badam"):
        args = parse_args(
            {
                "config_preset": "tiny",
                "stage": "sft",
                "dataset": "demo",
                "dataset_dir": "data",
                "cutoff_len": 32,
                "per_device_train_batch_size": 1,
                "max_steps": 2,
                "logging_steps": 1,
                "save_steps": 1000,
                "bf16": False,
                "learning_rate": 1e-3,
                "output_dir": str(tmp_path / name),
                "use_optimizer": name,
                "optimizer_rank": 2,
            }
        )
        params = run_exp(args)
        for leaf in jax.tree.leaves(params):
            assert np.isfinite(np.asarray(leaf)).all()
