"""Does the jax persistent compilation cache work through the axon relay?

If XLA executables (and their embedded Mosaic payloads) round-trip through
jax_compilation_cache_dir, the driver's bench run would skip ~300s of
recompiles (the builder's own validation run warms the cache on the same
machine) and the whole section plan fits the driver window with room.
CLAUDE.md records "Mosaic compiles ... not cached across processes" — that
observation predates enabling the jax-level cache; this probe tests it.

Run twice: first run prints compile seconds, second run (fresh process)
prints near-zero if the cache hits.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    print("devices:", jax.devices(), file=sys.stderr)

    # 1) plain XLA program big enough to take >1s to compile
    t0 = time.time()
    f = jax.jit(lambda x, w: jnp.tanh(x @ w) @ w.T + jax.nn.softmax(x, -1))
    x = jnp.ones((2048, 4096), jnp.bfloat16)
    w = jnp.ones((4096, 4096), jnp.bfloat16)
    jax.block_until_ready(f(x, w))
    print(f"xla compile+first-run: {time.time()-t0:.1f}s")

    # 2) a Pallas (Mosaic) kernel program: the expensive relay compiles
    t0 = time.time()
    from infinitevl_tpu.ops.swa_pallas import swa_ring_flash_attention

    B, Hq, Hkv, D, cap, W, T = 1, 16, 2, 128, 8192, 8192, 257
    key = jax.random.PRNGKey(0)
    mk = lambda k, s: (jax.random.normal(k, s) * 0.1).astype(jnp.bfloat16)  # noqa: E731
    ks = jax.random.split(key, 5)
    out = swa_ring_flash_attention(
        mk(ks[0], (B, T, Hq, D)), mk(ks[1], (B, T, Hkv, D)),
        mk(ks[2], (B, T, Hkv, D)), mk(ks[3], (B, Hkv, cap, D)),
        mk(ks[4], (B, Hkv, cap, D)), jnp.asarray(cap + 3, jnp.int32), W,
    )
    jax.block_until_ready(out)
    print(f"pallas compile+first-run: {time.time()-t0:.1f}s")
    print(np.asarray(out)[0, 0, 0, :2])


if __name__ == "__main__":
    main()
