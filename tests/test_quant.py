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
