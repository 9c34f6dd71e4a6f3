"""Static-batching serving engine: batched greedy decode must match
unbatched generation row-for-row (rows are independent in every kernel), and
same-length requests must actually share a batch."""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import tiny_config
from infinitevl_tpu.generation import Generator
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.serve.batching import BatchingEngine


def test_batched_matches_unbatched():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, cfg.text.vocab_size - 8, (10,)) for _ in range(4)]

    gen = Generator(params, cfg, dtype=jnp.float32, chunk_size=4)
    singles = []
    for p in prompts:
        out = gen.generate(p[None], max_new_tokens=12, temperature=0.0)[0]
        toks = []
        for t in out:
            if t == cfg.eos_token_id:
                break
            toks.append(int(t))
        singles.append(toks)

    eng = BatchingEngine(
        params, cfg, dtype=jnp.float32, batch_sizes=(4, 2, 1),
        max_wait_ms=3000, chunk_size=4,
    )
    try:
        results = [None] * 4

        def worker(i):
            results[i] = eng.generate(prompts[i], max_new_tokens=12)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert eng.stats["batches"] >= 1
        # all four same-length requests served in one 4-row batch
        assert eng.stats["requests"] == 4
        assert eng.stats["batches"] == 1, eng.stats
        for i in range(4):
            assert results[i] == singles[i], (
                f"row {i}: batched {results[i]} != single {singles[i]}"
            )
    finally:
        eng.shutdown()


def test_mixed_lengths_split_batches():
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    eng = BatchingEngine(
        params, cfg, dtype=jnp.float32, batch_sizes=(2, 1),
        max_wait_ms=300, chunk_size=4,
    )
    try:
        a = eng.generate(rng.randint(10, 100, (6,)), max_new_tokens=4)
        b = eng.generate(rng.randint(10, 100, (9,)), max_new_tokens=4)
        assert isinstance(a, list) and isinstance(b, list)
        assert eng.stats["requests"] == 2
    finally:
        eng.shutdown()
