"""ChatModel multimodal chat + processor token expansion."""

import numpy as np

from infinitevl_tpu import tiny_config
from infinitevl_tpu.data.loader import SimpleTokenizer
from infinitevl_tpu.data.processing import InfiniteVLProcessor
from infinitevl_tpu.generation import Generator
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.serve.chat import ChatModel

import jax
import jax.numpy as jnp


def test_processor_expands_image_tokens():
    cfg = tiny_config()
    tok = SimpleTokenizer(config=cfg)
    proc = InfiniteVLProcessor(tok, cfg, min_pixels=1, max_pixels=10**9)
    img = (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
    out = proc("<|vision_start|><|image_pad|><|vision_end|> describe", images=[img])
    t, gh, gw = out.image_grid_thw[0]
    n_expected = t * gh * gw // 4
    pad_id = tok.vocab["<|image_pad|>"]
    n_pads = int((out.input_ids == pad_id).sum())
    assert n_pads == n_expected
    assert out.pixel_values.shape[0] == t * gh * gw


def test_chat_model_text_and_image():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    gen = Generator(params, cfg, dtype=jnp.float32)
    tok = SimpleTokenizer(config=cfg)
    chat = ChatModel(gen, tok)
    ans = chat.chat(
        [{"role": "user", "content": "hello"}], max_new_tokens=3
    )
    assert isinstance(ans, str)
    # multimodal: tiny vision uses patch 14 / merge 2 -> 28px factor
    img = (np.random.RandomState(1).rand(56, 56, 3) * 255).astype(np.uint8)
    chat.processor.min_pixels = 1
    ans2 = chat.chat(
        [{"role": "user", "content": "<image> what is this"}],
        images=[img],
        max_new_tokens=3,
    )
    assert isinstance(ans2, str)
    chunks = list(chat.stream_chat([{"role": "user", "content": "hi"}],
                                   max_new_tokens=3))
    assert "".join(chunks) != ""
