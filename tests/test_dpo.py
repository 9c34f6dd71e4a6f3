"""DPO / RM preference stages on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.train.dpo import dpo_loss, make_dpo_step, make_rm_step
from infinitevl_tpu.train.step import make_optimizer


def make_batch(cfg, key):
    ks = jax.random.split(key, 2)
    B, T = 2, 10
    chosen = jax.random.randint(ks[0], (B, T), 0, cfg.vocab_size)
    rejected = jax.random.randint(ks[1], (B, T), 0, cfg.vocab_size)
    labels_c = chosen.at[:, :4].set(-100)
    labels_r = rejected.at[:, :4].set(-100)
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    return {
        "chosen_ids": chosen,
        "chosen_labels": labels_c,
        "rejected_ids": rejected,
        "rejected_labels": labels_r,
        "position_ids": pos,
    }


def test_dpo_loss_prefers_chosen():
    pc = jnp.array([2.0, 1.0])
    pr = jnp.array([-1.0, -2.0])
    rc = jnp.zeros(2)
    rr = jnp.zeros(2)
    good = float(dpo_loss(pc, pr, rc, rr, beta=0.1))
    bad = float(dpo_loss(pr, pc, rc, rr, beta=0.1))
    assert good < bad


@pytest.mark.parametrize("loss_type", ["sigmoid", "ipo", "simpo"])
def test_dpo_step_improves_margin(loss_type):
    cfg = tiny_config().text
    policy = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ref = jax.tree.map(lambda x: x, policy)
    tx = make_optimizer(learning_rate=3e-3, weight_decay=0.0)
    opt_state = tx.init(policy)
    step = jax.jit(make_dpo_step(cfg, tx, beta=0.1, loss_type=loss_type))
    batch = make_batch(cfg, jax.random.PRNGKey(1))
    losses = []
    for _ in range(4):
        policy, opt_state, loss = step(policy, opt_state, ref, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_kto_step_runs():
    from infinitevl_tpu.train.dpo import make_kto_step

    cfg = tiny_config().text
    policy = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ref = jax.tree.map(lambda x: x, policy)
    tx = make_optimizer(learning_rate=3e-3, weight_decay=0.0)
    opt_state = tx.init(policy)
    step = jax.jit(make_kto_step(cfg, tx, beta=0.1))
    ids = jax.random.randint(jax.random.PRNGKey(5), (4, 10), 0, cfg.vocab_size)
    labels = ids.at[:, :3].set(-100)
    batch = {
        "input_ids": ids,
        "labels": labels,
        "position_ids": jnp.broadcast_to(jnp.arange(10)[None, None], (3, 4, 10)),
        "is_desirable": jnp.array([True, False, True, False]),
    }
    losses = []
    for _ in range(3):
        policy, opt_state, loss = step(policy, opt_state, ref, batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_rm_step_runs():
    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["value_head"] = {
        "kernel": jax.random.normal(jax.random.PRNGKey(3), (cfg.hidden_size, 1)) * 0.02
    }
    tx = make_optimizer(learning_rate=3e-3, weight_decay=0.0)
    opt_state = tx.init(params)
    step = jax.jit(make_rm_step(cfg, tx))
    batch = make_batch(cfg, jax.random.PRNGKey(4))
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
