"""Speculation draft_k rationale: acceptance -> throughput across K.

r4 verdict next #5: the serving default draft_k=8 had no empirical support
at realistic acceptance (0.3-0.7). This probe measures, for K in {4,8,16}:
  - the verify-window device cost (K-token forward at 500K ctx), and
  - tokens/forward at controlled acceptance via the draft_fn hook
    (zero weights -> model argmax is 0; a draft of m zeros then ones is
    accepted exactly m tokens per window through the REAL verify+commit
    path),
then projects device tok/s = tok_per_fwd * 1000/ms_verify(K) (commit and
fallback forwards are weight-read-bound like verify). The e2e loop numbers
are relay-floor-dominated here; the projection is the deployment-relevant
ordering. Output feeds the default-K table in ROUND5_NOTES.

Run: python scripts/probe_spec_k.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from infinitevl_tpu import infinitevl_3b
from infinitevl_tpu.generation import Generator, spec_verify
from infinitevl_tpu.models.params import init_params
from infinitevl_tpu.models.state import init_decoder_state
from infinitevl_tpu.speculative import SpecStats, generate_speculative
from infinitevl_tpu.utils.benchlib import device_time_ms_min


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = infinitevl_3b()
    log(f"devices: {jax.devices()}")
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
    )
    params = jax.block_until_ready(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )
    delta = jnp.zeros((1, 1), jnp.int32)
    gen = Generator(params, cfg, dtype=jnp.bfloat16)
    prompt = np.zeros((1, 64), np.int64)

    # acceptance points per K: m accepted of K-1 drafts
    plan = {
        4: (1, 2, 3),
        8: (2, 4, 6, 7),
        16: (4, 9, 13, 15),
    }
    rows = []
    for K, ms_list in plan.items():
        win = jnp.zeros((1, K), jnp.int32)
        sstate = init_decoder_state(cfg.text, 1, dtype=jnp.bfloat16)
        sstate["cum_len"] = jnp.asarray(500_000, jnp.int32)

        def vstep(carry, _w=win):
            (s,) = carry
            spec_verify(params, cfg, _w, delta, s)
            return (s,)

        t0 = time.time()
        ms_v = device_time_ms_min(vstep, (sstate,), n1=3, n2=23)
        log(f"K={K}: verify {ms_v:.2f} ms ({time.time()-t0:.0f}s)")
        del sstate
        for m in ms_list:
            def draft_fn(ctx, k, _m=m):  # noqa: ARG001
                d = np.zeros(k, np.int64)
                d[_m:] = 1
                return d

            generate_speculative(  # warm commit(T=m+1) compile
                gen, prompt, max_new_tokens=10, draft_k=K, eos_token_id=-1,
                draft_fn=draft_fn,
            )
            st = SpecStats()
            t1 = time.time()
            out = generate_speculative(
                gen, prompt, max_new_tokens=96, draft_k=K, eos_token_id=-1,
                stats=st, draft_fn=draft_fn,
            )
            dt = time.time() - t1
            proj = st.tokens_per_forward * 1000.0 / ms_v
            rows.append((K, st.acceptance_rate, st.tokens_per_forward,
                         out.shape[1] / dt, proj))
            log(f"  K={K} m={m} acc={st.acceptance_rate:.2f}: "
                f"{st.tokens_per_forward:.2f} tok/fwd, e2e "
                f"{out.shape[1]/dt:.0f} tok/s, projected {proj:.0f} tok/s")
    print("K,acc,tok_per_fwd,e2e_tok_s,proj_tok_s")
    for r in rows:
        print(f"{r[0]},{r[1]:.3f},{r[2]:.2f},{r[3]:.1f},{r[4]:.1f}")


if __name__ == "__main__":
    main()
