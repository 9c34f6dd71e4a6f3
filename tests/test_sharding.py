"""Sharding rules on the virtual 8-device CPU mesh: TP inference parity and
FSDP+TP training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_text_params
from infinitevl_tpu.models.state import init_decoder_state
from infinitevl_tpu.models.text import embed_tokens, text_forward
from infinitevl_tpu.parallel.sharding import (
    create_mesh,
    param_spec,
    shard_params,
    shard_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def err_ratio(x, ref):
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    return np.abs(x - ref).mean() / (np.abs(ref).mean() + 1e-12)


def test_param_spec_rules():
    mesh = create_mesh(data=2, model=4)
    # colwise q_proj: output dim sharded if divisible
    spec = param_spec("text/layers/1/q_proj/kernel", (64, 64), mesh)
    assert spec == jax.sharding.PartitionSpec(None, "model")
    # 2 KV heads * 16 = 32-dim k output not divisible by 4 -> check fallback
    spec = param_spec("text/layers/0/k_proj/kernel", (64, 30), mesh)
    assert spec == jax.sharding.PartitionSpec(None, None)
    # fsdp overlays data axis onto the largest free dim
    spec = param_spec("text/embed", (512, 64), mesh, param_mode="fsdp")
    assert "data" in str(spec)


def test_tp_inference_matches_single_device():
    """Sharded forward (TP over heads) must equal the unsharded forward."""
    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(12)[None, None], (3, 1, 12))

    h_ref, _, _ = text_forward(
        params["text"], cfg, embed_tokens(params["text"], ids), pos
    )

    mesh = create_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, param_mode="tp")

    @jax.jit
    def fwd(p, ids, pos):
        return text_forward(p["text"], cfg, embed_tokens(p["text"], ids), pos)[0]

    h_tp = fwd(sharded, ids, pos)
    assert err_ratio(h_tp, h_ref) < 1e-5


def test_cached_state_sharding_roundtrip():
    cfg = tiny_config().text
    mesh = create_mesh(data=2, model=4)
    state = init_decoder_state(cfg, batch_size=2, dtype=jnp.float32)
    sstate = shard_state(state, mesh)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(sstate)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # delta_h [L, B, H, K, V]: H=4 divisible by model=4
    sh = sstate["delta_h"].sharding.spec
    assert sh[2] == "model" and sh[1] == "data"


def test_run_sft_on_mesh(tmp_path):
    """run_sft with data_parallel x model_parallel from config: params
    sharded by the rule table, batches sharded over the data axis, finite
    loss on the 8-device CPU mesh (the knobs used to parse and do nothing)."""
    from infinitevl_tpu.hparams import parse_args
    from infinitevl_tpu.train.trainer import run_exp

    args = parse_args(
        {
            "config_preset": "tiny",
            "stage": "sft",
            "dataset": "demo",
            "dataset_dir": "data",
            "cutoff_len": 32,
            "per_device_train_batch_size": 1,
            "data_parallel": 4,
            "model_parallel": 2,
            "param_mode": "fsdp",
            "max_steps": 2,
            "logging_steps": 1,
            "save_steps": 1000,
            "bf16": False,
            "learning_rate": 1e-3,
            "output_dir": str(tmp_path),
        }
    )
    params = run_exp(args)
    import jax as _jax
    import numpy as _np

    for leaf in _jax.tree.leaves(params):
        assert _np.isfinite(_np.asarray(leaf)).all()


class _StubDev:
    """Minimal device stand-in for layout tests (multi-slice attrs)."""

    def __init__(self, id, slice_index):
        self.id = id
        self.slice_index = slice_index

    def __repr__(self):
        return f"d{self.id}s{self.slice_index}"


def test_hybrid_device_order_multislice():
    """Model axis must stay inside a slice; data axis is slice-major."""
    from infinitevl_tpu.parallel.sharding import hybrid_device_order

    # 2 slices x 4 devices, interleaved enumeration order (the failure mode:
    # naive reshape would put a model group across slices)
    devs = [_StubDev(i, i % 2) for i in range(8)]
    arr = hybrid_device_order(devs, data=4, model=2)
    assert arr.shape == (4, 2)
    for row in arr:
        assert len({d.slice_index for d in row}) == 1  # model inside slice
    # data rows slice-major: first per-slice rows from slice 0
    assert [row[0].slice_index for row in arr] == [0, 0, 1, 1]

    # model=4 per slice exactly consumes each slice
    arr = hybrid_device_order(devs, data=2, model=4)
    for row in arr:
        assert len({d.slice_index for d in row}) == 1

    # model=8 cannot fit inside a 4-device slice
    with pytest.raises(ValueError, match="DCN boundary"):
        hybrid_device_order(devs, data=1, model=8)


def test_hybrid_mesh_single_slice_equals_create_mesh():
    """CPU virtual devices report one slice -> same layout as create_mesh."""
    from infinitevl_tpu.parallel.sharding import create_hybrid_mesh

    mesh = create_hybrid_mesh(data=4, model=2)
    ref = create_mesh(data=4, model=2)
    assert (mesh.devices == ref.devices).all()
    assert mesh.axis_names == ref.axis_names


def test_hybrid_mesh_runs_sharded_forward():
    from infinitevl_tpu.parallel.sharding import create_hybrid_mesh

    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(8)[None, None], (3, 4, 8))
    h_ref, _, _ = text_forward(
        params["text"], cfg, embed_tokens(params["text"], ids), pos
    )
    mesh = create_hybrid_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, param_mode="fsdp")

    @jax.jit
    def fwd(p, ids, pos):
        return text_forward(p["text"], cfg, embed_tokens(p["text"], ids), pos)[0]

    h = fwd(sharded, ids, pos)
    assert err_ratio(h, h_ref) < 1e-5


def test_maybe_init_distributed_env_parsing(monkeypatch):
    """Env-driven multi-host bootstrap (SURVEY §5.8): torchrun-style and
    JAX-native env names both resolve to one jax.distributed.initialize
    call; absent/world-size-1 envs are a no-op."""
    import jax

    from infinitevl_tpu.parallel import sharding as sh

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setattr(sh, "_distributed_initialized", False)
    for var in (
        "COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
        "MASTER_ADDR", "MASTER_PORT", "WORLD_SIZE", "RANK",
        "JAX_AUTO_DISTRIBUTED",
    ):
        monkeypatch.delenv(var, raising=False)

    assert sh.maybe_init_distributed() is False and not calls

    # torchrun-style names (the reference's launcher env, train.sh:13-19)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    assert sh.maybe_init_distributed() is True
    assert calls == [
        {
            "coordinator_address": "10.0.0.1:1234",
            "num_processes": 4,
            "process_id": 2,
        }
    ]
    # idempotent: a second call does not re-initialize
    assert sh.maybe_init_distributed() is True
    assert len(calls) == 1

    # JAX-native names win over torchrun-style when both exist
    monkeypatch.setattr(sh, "_distributed_initialized", False)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.9:8476")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "0")
    assert sh.maybe_init_distributed() is True
    assert calls[-1]["coordinator_address"] == "10.0.0.9:8476"

    # world size 1 = single host: no-op
    calls.clear()
    monkeypatch.setattr(sh, "_distributed_initialized", False)
    monkeypatch.setenv("NUM_PROCESSES", "1")
    monkeypatch.delenv("MASTER_ADDR")
    monkeypatch.delenv("WORLD_SIZE")
    monkeypatch.delenv("RANK")
    assert sh.maybe_init_distributed() is False and not calls
