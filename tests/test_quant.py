"""Weight-only int8 quantization (models/quant.py): round-trip error,
byte halving, and end-to-end decode parity vs the bf16 model."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import tiny_config
from infinitevl_tpu.models.params import init_params, init_text_params
from infinitevl_tpu.models.quant import (
    dequantize_kernel,
    quantize_kernel,
    quantize_params,
    quantized_bytes,
)
from infinitevl_tpu.models.text import embed_tokens, text_forward


def test_quantize_kernel_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32)
    node = quantize_kernel(w)
    assert node["kernel_q"].dtype == jnp.int8
    assert node["scale"].shape == (512,)
    deq = dequantize_kernel(node, jnp.float32)
    err = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert err < 0.01  # 1/254 per-channel quantization step


def test_quantize_params_halves_projection_bytes():
    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qp = quantize_params(params, min_size=1024)
    assert quantized_bytes(qp) < quantized_bytes(params)
    l0 = qp["layers"][0]
    # swa layer 0: q_proj quantized
    assert "kernel_q" in l0["q_proj"] and "kernel" not in l0["q_proj"]
    assert "bias" in l0["q_proj"]  # bias preserved
    # norms untouched
    assert "kernel_q" not in str(type(l0["input_norm"]))


def test_int8_forward_parity():
    """Full hybrid forward: int8 weights vs fp32, small relative error."""
    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qp = quantize_params(params, min_size=1024)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 1, 16))
    h_ref, _, _ = text_forward(params, cfg, embed_tokens(params, ids), pos)
    h_q, _, _ = text_forward(qp, cfg, embed_tokens(qp, ids), pos)
    err = float(
        jnp.abs(h_q - h_ref).mean() / (jnp.abs(h_ref).mean() + 1e-9)
    )
    assert err < 0.05, err


def test_generator_int8_generates():
    from infinitevl_tpu.generation import Generator

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    gen = Generator(params, cfg, quant="int8")
    out = gen.generate(
        np.array([[7, 11, 13]], dtype=np.int32), max_new_tokens=5
    )
    assert out.shape == (1, 5)


# --- QLoRA: int8 frozen base + rank-r adapters (reference
# model_args.py:191 quantization_bit; here models/quant.py composed with
# train/lora.attach_lora through the same _dense helper) ---


def test_qlora_attach_matches_dequantized_base():
    """attach_lora over a quantized base == attach_lora over the explicitly
    dequantized base, bit-for-bit (the int8 matmul IS dequant-then-matmul)."""
    from infinitevl_tpu.models.quant import dequantize_kernel
    from infinitevl_tpu.train.lora import attach_lora, init_lora

    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    qp = quantize_params(params, min_size=1024)
    lora = init_lora(qp, jax.random.PRNGKey(1), rank=4)
    # non-zero b so the side path actually contributes
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    def deq(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                out = {k: v for k, v in node.items()
                       if k not in ("kernel_q", "scale")}
                out["kernel"] = dequantize_kernel(node, jnp.float32)
                return out
            return {k: deq(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(deq(v) for v in node)
        return node

    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 1, 16))
    a_q = attach_lora(qp, lora, alpha=8, rank=4)
    a_d = attach_lora(deq(qp), lora, alpha=8, rank=4)
    h_q, _, _ = text_forward(a_q["text"], cfg, embed_tokens(a_q["text"], ids), pos)
    h_d, _, _ = text_forward(a_d["text"], cfg, embed_tokens(a_d["text"], ids), pos)
    np.testing.assert_allclose(
        np.asarray(h_q), np.asarray(h_d), rtol=2e-5, atol=2e-5
    )


def test_qlora_training_reduces_loss_and_keeps_base_int8():
    from infinitevl_tpu.train.lora import init_lora, make_lora_sft_step
    from infinitevl_tpu.train.step import make_optimizer

    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    qp = quantize_params(params, min_size=1024)
    lora = init_lora(qp, jax.random.PRNGKey(1), rank=4)
    tx = make_optimizer(learning_rate=5e-3, weight_decay=0.0)
    opt_state = tx.init(lora)
    step = jax.jit(make_lora_sft_step(cfg, tx, qp, alpha=8, rank=4))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size)
    batch = {
        "input_ids": ids,
        "labels": ids,
        "position_ids": jnp.broadcast_to(jnp.arange(12)[None, None], (3, 2, 12)),
    }
    l0 = None
    for i in range(6):
        lora, opt_state, loss = step(lora, opt_state, batch)
        if i == 0:
            l0 = float(loss)
    assert float(loss) < l0
    # base stays int8 throughout; adapter leaves stay rank-r sized
    assert qp["text"]["layers"][0]["q_proj"]["kernel_q"].dtype == jnp.int8
    assert all(
        x.ndim == 2 and min(x.shape) == 4 for x in jax.tree.leaves(lora)
    )


def test_qlora_merge_dequantizes():
    """merge_lora on a quantized base exports full-precision kernels =
    dequant(base) + scaled delta."""
    from infinitevl_tpu.models.quant import dequantize_kernel
    from infinitevl_tpu.train.lora import init_lora, merge_lora

    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    qp = quantize_params(params, min_size=1024)
    lora = init_lora(qp, jax.random.PRNGKey(1), rank=4)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora(qp, lora, alpha=8, rank=4)
    node = merged["text"]["layers"][0]["q_proj"]
    assert "kernel" in node and "kernel_q" not in node and "scale" not in node
    l0 = lora["text"]["layers"][0]["q_proj"]
    want = dequantize_kernel(
        qp["text"]["layers"][0]["q_proj"], jnp.bfloat16
    ) + (l0["a"] @ l0["b"]) * (8 / 4)
    np.testing.assert_allclose(
        np.asarray(node["kernel"], dtype=np.float32),
        np.asarray(want, dtype=np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_int8_batching_engine_matches_int8_generator():
    """BatchingEngine(quant='int8') batched greedy decode == the int8
    Generator row-for-row (same quantized weights, deterministic argmax)."""
    import threading

    from infinitevl_tpu.generation import Generator
    from infinitevl_tpu.serve.batching import BatchingEngine

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, cfg.text.vocab_size - 8, (10,)) for _ in range(2)]
    gen = Generator(params, cfg, dtype=jnp.float32, chunk_size=4, quant="int8")
    singles = []
    for p in prompts:
        out = gen.generate(p[None], max_new_tokens=8, temperature=0.0)[0]
        toks = []
        for t in out:
            if t == cfg.eos_token_id:
                break
            toks.append(int(t))
        singles.append(toks)
    eng = BatchingEngine(
        params, cfg, dtype=jnp.float32, batch_sizes=(2, 1),
        max_wait_ms=3000, chunk_size=4, quant="int8",
    )
    try:
        results = [None, None]

        def worker(i):
            results[i] = eng.generate(prompts[i], max_new_tokens=8)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert results[0] == singles[0] and results[1] == singles[1]
    finally:
        eng.shutdown()


def test_qlora_rejects_dora_and_pissa():
    import pytest

    from infinitevl_tpu.train.lora import init_lora

    cfg = tiny_config().text
    params = {"text": init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)}
    qp = quantize_params(params, min_size=1024)
    with pytest.raises(ValueError, match="full-precision"):
        init_lora(qp, jax.random.PRNGKey(1), rank=4, use_dora=True)
    with pytest.raises(ValueError, match="full-precision"):
        init_lora(qp, jax.random.PRNGKey(1), rank=4, method="pissa")


def test_qlora_run_sft_smoke(tmp_path):
    """run_sft with quantization_bit: 8 end-to-end on the tiny preset."""
    import os

    from infinitevl_tpu.hparams import load_yaml_args
    from infinitevl_tpu.train.trainer import run_sft

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = load_yaml_args(os.path.join(repo, "examples", "sft_tiny.yaml"))
    args.train.output_dir = str(tmp_path)
    args.data.dataset_dir = os.path.join(repo, "data")
    args.train.max_steps = 2
    args.finetune.finetuning_type = "lora"
    args.model.quantization_bit = 8
    merged = run_sft(args)
    node = merged["text"]["layers"][0]["q_proj"]
    assert "kernel" in node and "kernel_q" not in node


def test_int8_mcq_prediction_agreement():
    """Quality delta of int8 weight-only serving, measured on the MCQ
    fixture (VERDICT r2 item 7): choice predictions from the quantized
    model must agree with the bf16-precision model on every fixture
    question — the per-channel quantization error (<1%/channel) must not
    flip any choice-logit argmax at fixture scale."""
    import json
    import os

    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.eval.mcq import MCQEvaluator, format_example
    from infinitevl_tpu.generation import Generator

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    tok = SimpleTokenizer()
    path = os.path.join(os.path.dirname(__file__), "..", "data", "mcq_demo.json")
    with open(path) as f:
        task = json.load(f)
    prompts = [
        format_example(ex, support_set=block["dev"][:1],
                       subject_name=block.get("name", subj))
        for subj, block in task.items()
        for ex in block["test"][:3]
    ]
    assert len(prompts) >= 4

    ev_fp = MCQEvaluator(Generator(params, cfg, dtype=jnp.float32), tok,
                         batch_size=4)
    preds_fp = ev_fp._score_prompts(prompts)
    ev_q = MCQEvaluator(
        Generator(params, cfg, dtype=jnp.float32, quant="int8"), tok,
        batch_size=4,
    )
    preds_q = ev_q._score_prompts(prompts)
    agree = sum(a == b for a, b in zip(preds_fp, preds_q))
    assert agree == len(prompts), (
        f"int8 flipped {len(prompts) - agree}/{len(prompts)} MCQ "
        f"predictions: {list(zip(preds_fp, preds_q))}"
    )


def test_quantize_kernel_int4_roundtrip_groupwise():
    from infinitevl_tpu.models.quant import (
        dequantize_kernel_int4,
        quantize_kernel_int4,
    )

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32)
    node = quantize_kernel_int4(w, group_size=128)
    # nibble-packed by hand: S4 jit arguments recurse in device_put on the
    # TPU PJRT backend (see quantize_kernel_int4)
    assert node["kernel_q4"].dtype == jnp.uint8
    assert node["kernel_q4"].shape == (128, 512)  # two rows per byte
    assert node["scale4"].shape == (2, 512)  # 256 rows / 128-row groups
    deq = dequantize_kernel_int4(node, jnp.float32)
    err = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert err < 0.08, err  # 1/14 quantization step per group
    # rows whose half doesn't divide group_size fall back to one group
    node2 = quantize_kernel_int4(w[:200], group_size=128)
    assert node2["scale4"].shape == (1, 512)


def test_int4_pack_unpack_exact():
    from infinitevl_tpu.models.quant import unpack_int4

    r = np.random.RandomState(0)
    q = r.randint(-7, 8, (64, 96)).astype(np.int32)
    packed = jnp.asarray(
        (q[:32] & 0xF) | ((q[32:] & 0xF) << 4), jnp.uint8
    )
    lo, hi = unpack_int4(packed, jnp.float32)
    np.testing.assert_array_equal(np.asarray(lo), q[:32].astype(np.float32))
    np.testing.assert_array_equal(np.asarray(hi), q[32:].astype(np.float32))


def test_int4_matmul_matches_dequant():
    from infinitevl_tpu.models.quant import (
        dequantize_kernel_int4,
        int4_matmul,
        quantize_kernel_int4,
    )

    w = jax.random.normal(jax.random.PRNGKey(2), (256, 96), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.float32)
    for gs in (64, 128, 999):  # multi-group, half-aligned, one-group
        node = quantize_kernel_int4(w, group_size=gs)
        ref = x @ dequantize_kernel_int4(node, jnp.float32)
        out = int4_matmul(x, node)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_int4_biased_storage_matches_signed():
    """Biased-nibble storage (q+7 in [0,14], no sign-fix selects in the
    unpack) must dequantize and matmul EXACTLY like the signed layout —
    it is the same q, shifted for storage only."""
    from infinitevl_tpu.models.quant import (
        dequantize_kernel_int4,
        int4_matmul,
        quantize_kernel_int4,
    )

    w = jax.random.normal(jax.random.PRNGKey(5), (256, 96), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 256), jnp.float32)
    for gs in (64, 999):
        signed = quantize_kernel_int4(w, group_size=gs)
        biased = quantize_kernel_int4(w, group_size=gs, biased=True)
        assert "kernel_q4b" in biased and "kernel_q4" not in biased
        np.testing.assert_array_equal(
            np.asarray(dequantize_kernel_int4(signed, jnp.float32)),
            np.asarray(dequantize_kernel_int4(biased, jnp.float32)),
        )
        np.testing.assert_allclose(
            np.asarray(int4_matmul(x, signed)),
            np.asarray(int4_matmul(x, biased)),
            rtol=2e-5, atol=2e-5,
        )


def test_int4_biased_end_to_end_forward():
    from infinitevl_tpu.models.quant import quantize_params

    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    q4 = quantize_params(params, min_size=1024, bits=4, group_size=32)
    q4b = quantize_params(
        params, min_size=1024, bits=4, group_size=32, int4_biased=True
    )
    ids = jnp.asarray([[3, 5, 7, 9]], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(4)[None, None], (3, 1, 4))
    a, _, _ = text_forward(q4, cfg, embed_tokens(q4, ids), pos)
    b, _, _ = text_forward(q4b, cfg, embed_tokens(q4b, ids), pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_int4_forward_parity_and_bytes():
    from infinitevl_tpu.models.quant import quantize_params, quantized_bytes

    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    q8 = quantize_params(params, min_size=1024, bits=8)
    q4 = quantize_params(params, min_size=1024, bits=4, group_size=32)
    assert quantized_bytes(q4) < quantized_bytes(q8)
    l0 = q4["layers"][0]
    assert "kernel_q4" in l0["q_proj"] and "kernel" not in l0["q_proj"]
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(16)[None, None], (3, 1, 16))
    h_ref, _, _ = text_forward(params, cfg, embed_tokens(params, ids), pos)
    h_q, _, _ = text_forward(q4, cfg, embed_tokens(q4, ids), pos)
    err = float(jnp.abs(h_q - h_ref).mean() / (jnp.abs(h_ref).mean() + 1e-9))
    assert err < 0.25, err  # int4 is lossier than int8 but must track


def test_generator_int4_generates():
    from infinitevl_tpu.generation import Generator

    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    gen = Generator(params, cfg, quant="int4")
    out = gen.generate(jnp.asarray([[5, 6, 7]], jnp.int32), max_new_tokens=4)
    assert np.asarray(out).shape[1] >= 1


# --- row-wise int8 embed / tied-lm_head table (quantize_embed_rows): the
# tied head reads the FULL vocab x hidden bytes every decoded token, so
# serving quantizes the table too (Generator quant_embed, default on) ---


def test_quantize_embed_rows_roundtrip():
    from infinitevl_tpu.models.quant import quantize_embed_rows

    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64), jnp.float32) * 0.02
    node = quantize_embed_rows(w)
    assert node["embed_q"].dtype == jnp.int8
    assert node["embed_scale"].shape == (128,)
    assert node["embed_scale"].dtype == w.dtype  # carries the model dtype
    deq = node["embed_q"].astype(jnp.float32) * node[
        "embed_scale"
    ].astype(jnp.float32)[:, None]
    # per-row relative error bounded by the int8 step
    rel = jnp.abs(deq - w).max(1) / jnp.abs(w).max(1)
    assert float(rel.max()) < 0.01


def test_quantize_params_embed_replaces_table():
    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    qp = quantize_params(params, min_size=1024, quantize_embed=True)
    assert "embed" not in qp and "embed_q" in qp and "embed_scale" in qp
    assert qp["embed_scale"].dtype == jnp.bfloat16
    # default stays structure-preserving (training paths read params["embed"])
    qp_default = quantize_params(params, min_size=1024)
    assert "embed" in qp_default and "embed_q" not in qp_default


def test_quantized_embed_lm_head_parity():
    """Gather + tied logits through the quantized table track the bf16
    table within the int8 step; argmax choice is preserved on the fixture."""
    from infinitevl_tpu.models.text import lm_head

    cfg = tiny_config().text
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qp = quantize_params(params, min_size=1024, quantize_embed=True)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
    e_ref = embed_tokens(params, ids)
    e_q = embed_tokens(qp, ids)
    assert e_q.dtype == e_ref.dtype
    err = float(jnp.abs(e_q - e_ref).max() / (jnp.abs(e_ref).max() + 1e-9))
    assert err < 0.01, err
    hidden = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.hidden_size))
    lg_ref = lm_head(params, cfg, hidden)
    lg_q = lm_head(qp, cfg, hidden)
    assert lg_q.dtype == jnp.float32
    rel = float(
        jnp.abs(lg_q - lg_ref).max() / (jnp.abs(lg_ref).max() + 1e-9)
    )
    assert rel < 0.02, rel
    assert (jnp.argmax(lg_q, -1) == jnp.argmax(lg_ref, -1)).all()


def test_quantized_untied_lm_head():
    import dataclasses

    from infinitevl_tpu.models.text import lm_head

    cfg = dataclasses.replace(tiny_config().text, tie_word_embeddings=False)
    params = init_text_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    assert "lm_head" in params
    qp = quantize_params(params, min_size=1024, quantize_embed=True)
    assert "lm_head" not in qp and "lm_head_q" in qp
    assert qp["lm_head_q"].shape == (cfg.hidden_size, cfg.vocab_size)
    hidden = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.hidden_size))
    lg_ref = lm_head(params, cfg, hidden)
    lg_q = lm_head(qp, cfg, hidden)
    rel = float(
        jnp.abs(lg_q - lg_ref).max() / (jnp.abs(lg_ref).max() + 1e-9)
    )
    assert rel < 0.02, rel


def test_generator_quant_embed_default_and_dtype_detection():
    """Generator(quant='int8') quantizes the table by default; a generator
    re-built from the already-quantized params must infer bf16 from the
    scale leaf (state dtype must match activations)."""
    from infinitevl_tpu.generation import Generator

    # vocab large enough that the embed table passes the default min_size
    # gate (tiny 512 x 64 = 32K elements sits under 65536 and stays bf16)
    cfg = tiny_config(vocab_size=2048)
    params = init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    gen = Generator(params, cfg, quant="int8")
    assert "embed_q" in gen.params["text"]
    out = gen.generate(np.array([[7, 11, 13]], np.int32), max_new_tokens=5)
    assert out.shape == (1, 5)
    gen2 = Generator(gen.params, cfg)  # dtype=None -> detect from scale
    assert gen2.dtype == jnp.bfloat16
    out2 = gen2.generate(np.array([[7, 11, 13]], np.int32), max_new_tokens=5)
    assert np.array_equal(np.asarray(out), np.asarray(out2))
