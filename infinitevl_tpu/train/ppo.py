"""PPO stage: jitted rollout, GAE, clipped policy+value losses, KL penalty.

Functional re-design of the reference's TRL-based PPO trainer
(src/llamafactory/train/ppo/trainer.py, 501 LoC: get_inputs/get_rewards
rollout, KL-penalized rewards, clipped surrogate + value losses). TPU
mapping:
- rollout is ONE jitted program: prefill the prompt batch, then a
  `lax.scan` of decode steps with categorical sampling — no per-token host
  sync (the reference re-enters generate() per batch).
- prompts are bucketed by exact token length so every shape is static; one
  compile per (prompt_len, rollout_len) bucket.
- the scoring pass recomputes policy/ref log-probs and values over
  prompt+response in one forward each; GAE and the clipped update run on
  frozen rollout stats for ppo_epochs gradient steps.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TextConfig
from ..models.text import embed_tokens, lm_head, text_forward

Params = Dict[str, Any]


# ---------------------------------------------------------------- prompts


def encode_prompts(
    examples,
    tokenizer,
    template="qwen2_vl",
    cutoff_len: int = 1024,
) -> List[np.ndarray]:
    """Prompt-only encoding: drop trailing assistant turns, render with the
    generation prompt (the reference PPO workflow reuses the SFT dataset's
    prompt half, train/ppo/workflow.py)."""
    from ..data.template import get_template

    if isinstance(template, str):
        template = get_template(template)
    out = []
    for ex in examples:
        msgs = list(ex["messages"])
        while msgs and msgs[-1]["role"] == "assistant":
            msgs.pop()
        text = template.render_prompt(msgs, add_generation_prompt=True)
        ids = tokenizer.encode(text, add_special_tokens=False)
        out.append(np.asarray(ids[:cutoff_len], np.int64))
    return out


def bucket_prompts(
    prompts: List[np.ndarray], batch_size: int
) -> List[np.ndarray]:
    """Group prompts of identical length into [B, T] batches (static shapes:
    the TPU answer to the reference's left-padding + attention_mask)."""
    by_len: Dict[int, List[np.ndarray]] = {}
    for p in prompts:
        by_len.setdefault(len(p), []).append(p)
    batches = []
    for L, group in sorted(by_len.items()):
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            if len(chunk) < batch_size:  # repeat to fill the static batch
                chunk = (chunk * batch_size)[:batch_size]
            batches.append(np.stack(chunk))
    return batches


# ---------------------------------------------------------------- rollout


def make_rollout(cfg, rollout_len: int, temperature: float = 1.0):
    """Jitted (params, input_ids, state, key) -> (tokens [B, R], state).
    cfg: full InfiniteVLConfig (decode_step contract)."""
    from ..generation import _decode_step_impl
    from ..models.infinitevl import forward

    tcfg = cfg.text

    @functools.partial(jax.jit, donate_argnums=(2,))
    def rollout(params, input_ids, state, key):
        B, T = input_ids.shape
        pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
        logits, state = forward(
            params, cfg, input_ids, pos, state=state, logits_to_keep=1
        )
        logits = logits[:, 0]
        rope_delta = jnp.zeros((B, 1), jnp.int32)

        def body(carry, _):
            state, logits, key = carry
            key, sub = jax.random.split(key)
            if temperature > 0:
                tok = jax.random.categorical(sub, logits / temperature)
            else:
                tok = jnp.argmax(logits, axis=-1)
            tok = tok.astype(jnp.int32)
            logits, state = _decode_step_impl(
                params, cfg, tok[:, None], rope_delta, state
            )
            return (state, logits, key), tok

        (state, _, _), toks = jax.lax.scan(
            body, (state, logits, key), None, length=rollout_len
        )
        return toks.T, state  # [B, R]

    return rollout


# ------------------------------------------------------------------ score


def token_logprobs_and_values(
    params: Params,
    cfg: TextConfig,
    full_ids: jax.Array,  # [B, T_p + R]
    prompt_len: int,
    with_values: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Log-probs of each response token and the value estimates at the
    positions that predict them. Returns (logp [B, R], values [B, R])."""
    B, T = full_ids.shape
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    hidden, _, _ = text_forward(
        params, cfg, embed_tokens(params, full_ids), pos, None
    )
    # logits at t predict token t+1: response tokens sit at [T_p, T)
    h = hidden[:, prompt_len - 1 : -1]  # [B, R, D]
    logits = lm_head(params, cfg, h)
    targets = full_ids[:, prompt_len:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    values = None
    if with_values and "value_head" in params:
        values = (h.astype(jnp.float32) @ params["value_head"]["kernel"].astype(jnp.float32))[..., 0]
    return tok_logp, values


def response_mask(tokens: jax.Array, eos_token_id: int) -> jax.Array:
    """1.0 up to and including the first EOS, 0.0 after. [B, R]."""
    is_eos = tokens == eos_token_id
    after = jnp.cumsum(jnp.cumsum(is_eos.astype(jnp.int32), axis=1), axis=1) > 1
    return (~after).astype(jnp.float32)


def gae_advantages(
    rewards: jax.Array,  # [B, R] per-token (KL penalty + terminal reward)
    values: jax.Array,  # [B, R]
    mask: jax.Array,  # [B, R]
    gamma: float = 1.0,
    lam: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Masked generalized advantage estimation (ppo/trainer.py GAE; episode
    terminates at the last real token, bootstrap value 0)."""
    R = rewards.shape[1]
    next_values = jnp.concatenate(
        [values[:, 1:], jnp.zeros_like(values[:, :1])], axis=1
    )
    # next_nonterminal gates the bootstrap: the episode's LAST real token
    # must bootstrap 0, not the value of a post-EOS garbage position
    next_mask = jnp.concatenate(
        [mask[:, 1:], jnp.zeros_like(mask[:, :1])], axis=1
    )
    deltas = (rewards + gamma * next_values * next_mask - values) * mask

    def body(carry, xs):
        delta, nm = xs
        # A_t = delta_t + gamma*lam*next_nonterminal_t*A_{t+1}
        carry = delta + gamma * lam * nm * carry
        return carry, carry

    _, adv_rev = jax.lax.scan(
        body,
        jnp.zeros(rewards.shape[0]),
        (deltas.T[::-1], next_mask.T[::-1]),
    )
    adv = adv_rev[::-1].T * mask
    returns = adv + values * mask
    # normalize advantages over real tokens
    n = jnp.maximum(mask.sum(), 1.0)
    mean = (adv * mask).sum() / n
    var = (((adv - mean) * mask) ** 2).sum() / n
    adv = (adv - mean) / jnp.sqrt(var + 1e-8) * mask
    return adv, returns


# ----------------------------------------------------------------- update


def make_ppo_update(
    cfg: TextConfig,
    tx: optax.GradientTransformation,
    clip_range: float = 0.2,
    vf_coef: float = 0.1,
):
    """One clipped-PPO gradient step on frozen rollout stats."""

    @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=(3,))
    def update(params, opt_state, full_ids, prompt_len, old_logp, old_values,
               advantages, returns, mask):
        def loss_fn(p):
            logp, values = token_logprobs_and_values(
                p, cfg, full_ids, prompt_len
            )
            ratio = jnp.exp(logp - old_logp)
            pg1 = -advantages * ratio
            pg2 = -advantages * jnp.clip(ratio, 1 - clip_range, 1 + clip_range)
            n = jnp.maximum(mask.sum(), 1.0)
            pg_loss = (jnp.maximum(pg1, pg2) * mask).sum() / n
            v_clipped = old_values + jnp.clip(
                values - old_values, -clip_range, clip_range
            )
            v_loss = 0.5 * (
                jnp.maximum(
                    (values - returns) ** 2, (v_clipped - returns) ** 2
                )
                * mask
            ).sum() / n
            return pg_loss + vf_coef * v_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return update


# --------------------------------------------------------------- workflow


@dataclasses.dataclass
class PPOStats:
    step: int
    mean_reward: float
    loss: float
    kl: float


def ppo_train(
    cfg,  # InfiniteVLConfig
    policy: Params,  # text tree + value_head
    ref_params: Params,  # frozen text tree
    prompt_batches: List[np.ndarray],
    reward_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    *,
    rollout_len: int = 32,
    ppo_epochs: int = 1,
    clip_range: float = 0.2,
    kl_coef: float = 0.05,
    vf_coef: float = 0.1,
    gamma: float = 1.0,
    lam: float = 0.95,
    temperature: float = 1.0,
    learning_rate: float = 1e-5,
    max_steps: Optional[int] = None,
    seed: int = 0,
    log=None,
) -> Tuple[Params, List[PPOStats]]:
    """Drive PPO over prompt batches. reward_fn(full_ids [B, T_p+R] numpy,
    resp_mask [B, R]) -> terminal rewards [B] (the reference scores with a
    reward model; run_ppo wires one in, tests may inject a toy)."""
    from ..models.state import init_decoder_state
    from .step import make_optimizer

    tcfg = cfg.text
    tx = make_optimizer(learning_rate=learning_rate, warmup_steps=0)
    opt_state = tx.init(policy)
    update = make_ppo_update(tcfg, tx, clip_range, vf_coef)
    rollouts = {}
    key = jax.random.PRNGKey(seed)
    stats: List[PPOStats] = []

    @functools.partial(jax.jit, static_argnames=("prompt_len",))
    def score(policy, ref, full_ids, prompt_len):
        logp, values = token_logprobs_and_values(policy, tcfg, full_ids, prompt_len)
        ref_logp, _ = token_logprobs_and_values(
            ref, tcfg, full_ids, prompt_len, with_values=False
        )
        return logp, values, ref_logp

    step_i = 0
    for batch in prompt_batches:
        if max_steps is not None and step_i >= max_steps:
            break
        B, T_p = batch.shape
        rkey = (T_p, B)
        if rkey not in rollouts:
            rollouts[rkey] = make_rollout(cfg, rollout_len, temperature)
        key, sub = jax.random.split(key)
        state = init_decoder_state(tcfg, B, dtype=jnp.float32)
        # forward/decode_step expect the full {"text": ...} tree
        toks, _ = rollouts[rkey]({"text": policy}, jnp.asarray(batch), state, sub)
        full_ids = jnp.concatenate([jnp.asarray(batch), toks.astype(jnp.int64)], axis=1)
        mask = response_mask(toks, cfg.eos_token_id)
        logp_old, values_old, ref_logp = score(policy, ref_params, full_ids, T_p)
        logp_old = jax.lax.stop_gradient(logp_old)
        # terminal reward at the last real token + per-token KL penalty
        # (ppo/trainer.py compute_rewards semantics)
        r_term = np.asarray(
            reward_fn(np.asarray(full_ids), np.asarray(mask))
        ).astype(np.float32)
        kl = (logp_old - ref_logp) * mask
        last_idx = jnp.maximum(mask.sum(axis=1) - 1, 0).astype(jnp.int32)
        rewards = -kl_coef * kl
        rewards = rewards.at[jnp.arange(B), last_idx].add(jnp.asarray(r_term))
        adv, returns = gae_advantages(rewards, values_old, mask, gamma, lam)
        loss = jnp.float32(0)
        for _ in range(ppo_epochs):
            policy, opt_state, loss = update(
                policy, opt_state, full_ids, T_p, logp_old, values_old,
                adv, returns, mask,
            )
        step_i += 1
        s = PPOStats(
            step=step_i,
            mean_reward=float(r_term.mean()),
            loss=float(loss),
            kl=float((kl.sum() / jnp.maximum(mask.sum(), 1)).item()),
        )
        stats.append(s)
        if log is not None:
            log.log(step_i, loss=s.loss, reward=s.mean_reward, kl=s.kl)
    return policy, stats


def run_ppo(args, tokenizer=None, reward_fn=None):
    """PPO workflow (reference train/ppo/workflow.py): prompts from the SFT
    dataset, rewards from a trained reward model (reward_model_path) or an
    injected reward_fn."""
    import os

    from ..data.loader import SimpleTokenizer, load_dataset_info, load_examples, resolve_tokenizer
    from ..models.params import init_text_params, load_hf_checkpoint
    from ..utils.checkpoint import restore_train_state
    from ..utils.logging import TrainerLog
    from .trainer import build_config

    cfg = build_config(args)
    tcfg = cfg.text
    dtype = jnp.float32  # PPO ratios want fp32 accuracy
    tokenizer = resolve_tokenizer(args, None, tokenizer)
    info = load_dataset_info(os.path.join(args.data.dataset_dir, "dataset_info.json"))
    examples = load_examples(info[args.data.dataset], args.data.dataset_dir)
    if args.data.max_samples:
        examples = examples[: args.data.max_samples]
    prompts = encode_prompts(
        examples, tokenizer, args.data.template, args.data.cutoff_len
    )
    batches = bucket_prompts(prompts, args.train.per_device_train_batch_size)

    if args.model.model_name_or_path:
        policy = load_hf_checkpoint(args.model.model_name_or_path, cfg, dtype)["text"]
    else:
        policy = init_text_params(jax.random.PRNGKey(args.train.seed), tcfg, dtype)
    ref_params = policy
    policy = dict(policy)
    policy["value_head"] = {
        "kernel": jnp.zeros((tcfg.hidden_size, 1), dtype=jnp.float32)
    }

    if reward_fn is None:
        if not args.finetune.reward_model_path:
            raise ValueError(
                "ppo needs reward_model_path (a checkpoint from the rm stage) "
                "or an injected reward_fn"
            )
        _, rm_state = restore_train_state(args.finetune.reward_model_path)
        rm_params = rm_state["params"]

        # rm params as a jit ARGUMENT: a closure would bake the weights into
        # the executable as constants and double their HBM footprint
        @jax.jit
        def _rm_reward(rp, full_ids):
            pos = jnp.broadcast_to(
                jnp.arange(full_ids.shape[1])[None, None],
                (3,) + full_ids.shape,
            )
            hidden, _, _ = text_forward(
                rp, tcfg, embed_tokens(rp, full_ids), pos, None
            )
            return (hidden @ rp["value_head"]["kernel"])[..., 0]

        def reward_fn(full_ids, resp_mask):
            values = np.asarray(_rm_reward(rm_params, jnp.asarray(full_ids)))
            T_p = full_ids.shape[1] - resp_mask.shape[1]
            last = T_p + np.maximum(resp_mask.sum(axis=1) - 1, 0).astype(int)
            return values[np.arange(full_ids.shape[0]), last]

    log = TrainerLog(args.train.output_dir)
    policy, stats = ppo_train(
        cfg,
        policy,
        ref_params,
        batches,
        reward_fn,
        rollout_len=args.finetune.ppo_rollout_len,
        ppo_epochs=args.finetune.ppo_epochs,
        clip_range=args.finetune.ppo_clip_range,
        kl_coef=args.finetune.ppo_kl_coef,
        vf_coef=args.finetune.ppo_vf_coef,
        gamma=args.finetune.ppo_gamma,
        lam=args.finetune.ppo_lam,
        temperature=args.gen.temperature,
        learning_rate=args.train.learning_rate,
        max_steps=args.train.max_steps,
        seed=args.train.seed,
        log=log,
    )
    return policy, stats
