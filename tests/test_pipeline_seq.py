"""Sequence-axis pipeline (parallel/pipeline_seq.py): the TeraPipe-style
wavefront over sequence chunks must be numerically a NO-OP vs the plain
full-T layer loop — same loss, same gradients — at B=1 (where the
batch-axis schedules cannot microbatch at all), with the per-layer
recurrent carries threaded through the pipeline state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.parallel.pipeline import (
    create_pp_mesh,
    shard_pp_params,
    stack_stage_params,
    unstack_stage_params,
)
from infinitevl_tpu.parallel.pipeline_seq import (
    make_seq_pp_sft_train_step,
    seq_pp_sft_loss_fn,
)
from infinitevl_tpu.train.step import sft_loss_fn


def _batch(cfg, B, T, seed=0, packed=False):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, cfg.text.vocab_size - 8, (B, T)))
    labels = jnp.asarray(rng.randint(0, cfg.text.vocab_size - 8, (B, T)))
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    b = {"input_ids": ids, "labels": labels, "position_ids": pos}
    if packed:
        # a segment boundary that does NOT align with the chunk edges
        cut = T // 2 + 3
        seg = np.where(np.arange(T) < cut, 1, 2)[None].repeat(B, 0)
        b["segment_ids"] = jnp.asarray(seg, jnp.int32)
    return b


def _plain_loss(text_params, cfg, batch):
    return sft_loss_fn(
        text_params, cfg.text, batch["input_ids"], batch["labels"],
        batch["position_ids"], segment_ids=batch.get("segment_ids"),
        remat=True,
    )


@pytest.mark.parametrize("stages,micro,B", [(2, 2, 1), (2, 4, 1), (4, 4, 2)])
def test_seq_pp_loss_matches_plain(stages, micro, B):
    """Wavefront loss == plain full-T loss for several (stages, chunks)
    shapes, including B=1 — the case batch microbatching cannot serve."""
    layers = 8 if stages == 2 else 16
    cfg = tiny_config(num_hidden_layers=layers)
    W = cfg.text.sliding_window
    T = micro * 2 * W  # Tc = 2W per chunk
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _batch(cfg, B, T)
    ref = float(_plain_loss(params["text"], cfg, batch))

    mesh = create_pp_mesh(pipe=stages, data=8 // stages // 2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, stages)
    pp = shard_pp_params({"text": pp_text}, mesh)

    loss = jax.jit(
        lambda p: seq_pp_sft_loss_fn(
            p["text"], cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=micro, mesh=mesh,
        )
    )(pp)
    assert abs(float(loss) - ref) < 1e-5 * max(1.0, abs(ref)), (
        float(loss), ref,
    )


def test_seq_pp_grads_match_plain_packed():
    """d loss / d params through the sequence wavefront == plain-path
    gradients, WITH packed segment_ids crossing chunk boundaries (the
    carry-severing logic must survive the schedule)."""
    cfg = tiny_config()
    W = cfg.text.sliding_window
    B, micro = 1, 4
    T = micro * 2 * W
    params = init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    batch = _batch(cfg, B, T, seed=1, packed=True)

    g_ref = jax.grad(lambda tp: _plain_loss(tp, cfg, batch))(params["text"])

    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)
    g_pp = jax.jit(
        jax.grad(
            lambda p: seq_pp_sft_loss_fn(
                p["text"], cfg.text, batch["input_ids"], batch["labels"],
                batch["position_ids"], n_microbatches=micro,
                segment_ids=batch["segment_ids"], mesh=mesh,
            )
        )
    )(pp)

    g_pp_layers = unstack_stage_params(g_pp["text"])
    for i in (0, 1, 5, 7):
        for key in ("input_norm", "post_norm"):
            a = np.asarray(g_pp_layers["layers"][i][key])
            b = np.asarray(g_ref["layers"][i][key])
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_pp_layers["embed"]), np.asarray(g_ref["embed"]),
        rtol=2e-4, atol=1e-6,
    )


def test_seq_pp_train_step_runs_and_descends():
    """Two optimizer steps through make_seq_pp_sft_train_step reduce the
    loss (end-to-end wiring: loss -> grads -> optax update)."""
    cfg = tiny_config()
    W = cfg.text.sliding_window
    T = 4 * W
    params = init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    batch = _batch(cfg, 1, T, seed=2)

    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)
    import optax

    tx = optax.adamw(1e-3)
    opt = tx.init(pp)
    step = jax.jit(
        make_seq_pp_sft_train_step(cfg.text, tx, n_microbatches=2, mesh=mesh)
    )
    losses = []
    for _ in range(3):
        pp, opt, loss = step(pp, opt, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_seq_pp_chunk_constraints():
    """Loud errors: T not divisible by M; chunk not a multiple of the
    sliding window."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    W = cfg.text.sliding_window
    batch = _batch(cfg, 1, 3 * W + 1)
    with pytest.raises(ValueError, match="divisible"):
        seq_pp_sft_loss_fn(
            pp_text, cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=2,
        )
    batch = _batch(cfg, 1, 2 * W)
    with pytest.raises(ValueError, match="multiple of the sliding"):
        seq_pp_sft_loss_fn(
            pp_text, cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=4,
        )


def test_seq_pp_from_yaml_via_run_exp(tmp_path):
    """The sequence-axis PP surface: pp_microbatch_axis: sequence in the
    yaml trains through run_exp on the 8-device mesh (cutoff 64 / M=2 ->
    32-token chunks = 2 sliding windows of the tiny config)."""
    import json as _json
    import os

    from infinitevl_tpu.hparams import load_yaml_args
    from infinitevl_tpu.train.trainer import run_exp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = load_yaml_args(os.path.join(repo, "examples", "sft_pp_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(repo, "data")
    args.train.max_steps = 2
    args.train.pp_microbatch_axis = "sequence"
    params = run_exp(args)
    assert params is not None
    assert len(params["text"]["layers"]) == tiny_config().text.num_hidden_layers
    log = os.path.join(str(tmp_path), "trainer_log.jsonl")
    recs = [_json.loads(l) for l in open(log)]
    assert any("loss" in r for r in recs)


def test_seq_pp_yaml_validation_errors():
    """Loud surface errors for bad sequence-axis combinations."""
    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_sft

    base = {
        "config_preset": "tiny",
        "stage": "sft",
        "finetuning_type": "full",
        "dataset": "demo",
        "dataset_dir": "data",
        "cutoff_len": 64,
        "max_steps": 1,
        "bf16": False,
        "pipeline_stages": 2,
        "per_device_train_batch_size": 2,
        "pp_microbatch_axis": "sequence",
    }
    with pytest.raises(ValueError, match="gpipe schedule only"):
        run_sft(parse_args({**base, "pipeline_schedule": "1f1b"}))
    with pytest.raises(ValueError, match="multiples of the sliding"):
        run_sft(parse_args({**base, "cutoff_len": 40, "n_microbatches": 2}))
    with pytest.raises(ValueError, match="batch | sequence"):
        run_sft(parse_args({**base, "pp_microbatch_axis": "tokens"}))
