"""The one-command real-weights parity harness must run end-to-end TODAY on
a random-weight fixture so that day-0 of released weights is literally
`python scripts/real_parity.py --checkpoint_dir <dir>` (round-3 verdict
missing #1)."""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import pytest

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.utils.checkpoint import export_hf_safetensors

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "real_parity", os.path.join(REPO, "scripts", "real_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fixture_ckpt(tmp_path_factory):
    cfg = tiny_config(num_hidden_layers=4)
    params = init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    out = str(tmp_path_factory.mktemp("real_parity_ckpt"))
    export_hf_safetensors(params, cfg, out)
    return out


def test_real_parity_passes_on_fixture(fixture_ckpt, capsys):
    mod = _load_script()
    rc = mod.main(["--checkpoint_dir", fixture_ckpt, "--seq", "24"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PARITY OK" in out
    # the per-layer table really ran: one row per decoder layer + logits
    assert out.count("PASS") >= 4 + 2


def test_real_parity_detects_divergence(fixture_ckpt, monkeypatch, capsys):
    """Perturbing OUR loaded weights (not the shared checkpoint file, which
    both sides read) must flip the harness to FAILED — the table is a real
    check, not a formality."""
    from infinitevl_tpu.models import params as params_mod

    orig = params_mod.load_hf_checkpoint

    def corrupted(path, cfg, dtype=jnp.bfloat16, params=None):
        p = orig(path, cfg, dtype, params)
        lp = dict(p["text"]["layers"][2])
        lp["o_proj"] = jax.tree.map(lambda x: x + 0.25, lp["o_proj"])
        layers = list(p["text"]["layers"])
        layers[2] = lp
        return {**p, "text": {**p["text"], "layers": layers}}

    monkeypatch.setattr(params_mod, "load_hf_checkpoint", corrupted)
    mod = _load_script()
    rc = mod.main(["--checkpoint_dir", fixture_ckpt, "--seq", "24"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out and "PARITY FAILED" in out
