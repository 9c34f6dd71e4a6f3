"""Preference-optimization stages: DPO (+ IPO / SimPO / ORPO losses) and a
pairwise reward-model loss.

Reference: src/llamafactory/train/dpo/ (TRL-based trainer with pref_loss
variants) and train/rm/. Functional re-design: the step takes (policy,
frozen reference) params and a batch of chosen/rejected sequences; sequence
log-probs come from one packed forward per side."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TextConfig
from ..models.text import embed_tokens, lm_head, text_forward
from .step import IGNORE_INDEX

Params = Dict[str, Any]


def sequence_logprobs(
    params: Params,
    cfg: TextConfig,
    input_ids: jax.Array,  # [B, T]
    labels: jax.Array,  # [B, T] (-100 on prompt/pad)
    position_ids: jax.Array,
) -> jax.Array:
    """Sum of per-token log-probs over supervised positions. [B]."""
    hidden, _, _ = text_forward(
        params, cfg, embed_tokens(params, input_ids), position_ids, None
    )
    logits = lm_head(params, cfg, hidden)
    mask = labels != IGNORE_INDEX
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (tok * mask).sum(axis=-1)


def dpo_loss(
    policy_chosen: jax.Array,
    policy_rejected: jax.Array,
    ref_chosen: Optional[jax.Array],
    ref_rejected: Optional[jax.Array],
    beta: float = 0.1,
    loss_type: str = "sigmoid",
    label_smoothing: float = 0.0,
    simpo_gamma: float = 0.5,
) -> jax.Array:
    """DPO family losses (dpo/trainer.py variants: sigmoid/IPO/SimPO/ORPO)."""
    if loss_type == "simpo":
        # length-normalization is the caller's job; reference-free
        logits = beta * (policy_chosen - policy_rejected) - simpo_gamma
        return -jax.nn.log_sigmoid(logits).mean()
    if loss_type == "orpo":
        # odds-ratio penalty on top of NLL; here just the OR term
        log_odds = (policy_chosen - policy_rejected) - (
            jnp.log1p(-jnp.exp(jnp.minimum(policy_chosen, -1e-6)))
            - jnp.log1p(-jnp.exp(jnp.minimum(policy_rejected, -1e-6)))
        )
        return -jax.nn.log_sigmoid(beta * log_odds).mean()
    assert ref_chosen is not None and ref_rejected is not None
    logits = beta * (
        (policy_chosen - ref_chosen) - (policy_rejected - ref_rejected)
    )
    if loss_type == "ipo":
        return ((logits - 1.0 / (2 * beta)) ** 2).mean()
    # sigmoid (standard DPO) with optional label smoothing
    return (
        -jax.nn.log_sigmoid(logits) * (1 - label_smoothing)
        - jax.nn.log_sigmoid(-logits) * label_smoothing
    ).mean()


def make_dpo_step(
    cfg: TextConfig,
    tx: optax.GradientTransformation,
    beta: float = 0.1,
    loss_type: str = "sigmoid",
):
    """(policy, opt_state, ref_params, batch) -> (policy, opt_state, loss).
    batch: chosen_ids/chosen_labels/rejected_ids/rejected_labels/position_ids.
    """

    def step(policy, opt_state, ref_params, batch):
        pos = batch["position_ids"]
        need_ref = loss_type in ("sigmoid", "ipo")
        if need_ref:
            ref_c = sequence_logprobs(
                ref_params, cfg, batch["chosen_ids"], batch["chosen_labels"], pos
            )
            ref_r = sequence_logprobs(
                ref_params, cfg, batch["rejected_ids"], batch["rejected_labels"], pos
            )
        else:
            ref_c = ref_r = None

        def loss_fn(p):
            pc = sequence_logprobs(
                p, cfg, batch["chosen_ids"], batch["chosen_labels"], pos
            )
            pr = sequence_logprobs(
                p, cfg, batch["rejected_ids"], batch["rejected_labels"], pos
            )
            return dpo_loss(pc, pr, ref_c, ref_r, beta, loss_type)

        loss, grads = jax.value_and_grad(loss_fn)(policy)
        updates, opt_state = tx.update(grads, opt_state, policy)
        policy = optax.apply_updates(policy, updates)
        return policy, opt_state, loss

    return step


def kto_loss(
    policy_logps: jax.Array,  # [B] sequence log-probs
    ref_logps: jax.Array,  # [B]
    is_desirable: jax.Array,  # [B] bool
    kl_baseline: jax.Array,  # scalar: batch KL estimate E[policy - ref]
    beta: float = 0.1,
    desirable_weight: float = 1.0,
    undesirable_weight: float = 1.0,
) -> jax.Array:
    """Kahneman-Tversky optimization loss (train/kto): unpaired feedback;
    desirable examples push log-ratio above the KL baseline, undesirable
    below."""
    ratio = policy_logps - ref_logps
    d = jax.nn.sigmoid(beta * (ratio - kl_baseline))
    u = jax.nn.sigmoid(beta * (kl_baseline - ratio))
    loss = jnp.where(
        is_desirable,
        desirable_weight * (1.0 - d),
        undesirable_weight * (1.0 - u),
    )
    return loss.mean()


def make_kto_step(
    cfg: TextConfig,
    tx: optax.GradientTransformation,
    beta: float = 0.1,
):
    """(policy, opt_state, ref_params, batch) -> (policy, opt_state, loss).
    batch: input_ids/labels/position_ids/is_desirable [B]."""

    def step(policy, opt_state, ref_params, batch):
        pos = batch["position_ids"]
        ref_lp = sequence_logprobs(
            ref_params, cfg, batch["input_ids"], batch["labels"], pos
        )

        def loss_fn(p):
            lp = sequence_logprobs(
                p, cfg, batch["input_ids"], batch["labels"], pos
            )
            kl = jax.lax.stop_gradient(jnp.clip((lp - ref_lp).mean(), 0.0))
            return kto_loss(lp, ref_lp, batch["is_desirable"], kl, beta)

        loss, grads = jax.value_and_grad(loss_fn)(policy)
        updates, opt_state = tx.update(grads, opt_state, policy)
        policy = optax.apply_updates(policy, updates)
        return policy, opt_state, loss

    return step


def rm_pairwise_loss(
    chosen_rewards: jax.Array, rejected_rewards: jax.Array
) -> jax.Array:
    """Bradley-Terry pairwise reward loss (train/rm)."""
    return -jax.nn.log_sigmoid(chosen_rewards - rejected_rewards).mean()


def make_rm_step(cfg: TextConfig, tx: optax.GradientTransformation):
    """Reward model = decoder + scalar value head ('value_head' in params:
    {'kernel': [D, 1]}). Reward = value at the last supervised position."""

    def reward(params, ids, labels, pos):
        hidden, _, _ = text_forward(
            params, cfg, embed_tokens(params, ids), pos, None
        )
        values = (hidden @ params["value_head"]["kernel"])[..., 0]  # [B, T]
        mask = (labels != IGNORE_INDEX).astype(values.dtype)
        last = jnp.argmax(
            mask * jnp.arange(values.shape[1])[None, :], axis=1
        )
        return jnp.take_along_axis(values, last[:, None], axis=1)[:, 0]

    def step(params, opt_state, batch):
        pos = batch["position_ids"]

        def loss_fn(p):
            rc = reward(p, batch["chosen_ids"], batch["chosen_labels"], pos)
            rr = reward(p, batch["rejected_ids"], batch["rejected_labels"], pos)
            return rm_pairwise_loss(rc, rr)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
