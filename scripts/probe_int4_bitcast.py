"""Probe: native-s4 bitcast unpack for int4 decode (round-3 weak #5).

int4 decode is a measured latency LOSS vs int8 (13.4 vs 6.15 ms/tok at
G=128; 8.24 at G=1) because the nibble unpack chain (mask/shift/select/
convert) is VPU-bound — the biased-storage variant that removed the
selects was falsified as a lever. One mechanism was never tried:
`lax.bitcast_convert_type(uint8 -> int4)` exposes the nibbles as NATIVE
s4 elements, so the whole chain collapses to one hardware s4->bf16
convert on the dot operand read.

Times, per large-proj GEMV at decode shapes (M=1), a 40-iter in-graph
loop (dispatch amortized; relay-safe):
  A. bf16 dense            (the no-quant baseline)
  B. int8 per-channel      (the serving default)
  C. int4 G=1 current      (mask/shift/select unpack)
  D. int4 G=1 bitcast      (native s4 convert)
Then, if D beats C, a full-model decode comparison.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_loop(fn, x, n=40):
    """One jit: scan fn over n iterations, output depends on every iter."""

    def body(carry, _):
        y = fn(carry)
        # fold output back into the carry so nothing is dead-code-eliminated
        return carry + y[..., : carry.shape[-1]] * 1e-6, ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=n)[0])
    run(x).block_until_ready()  # compile
    t0 = time.time()
    run(x).block_until_ready()
    run(x).block_until_ready()
    dt = (time.time() - t0) / 2
    return dt * 1000 / n  # ms per iteration


def main():
    from infinitevl_tpu.models.quant import quantize_kernel, quantize_kernel_int4

    log(f"backend: {jax.default_backend()}")
    r = np.random.RandomState(0)
    # the two dominant decode matmul shapes at 3B: lm_head and the MLP
    for d_in, d_out, tag in ((2048, 151936, "lm_head"), (2048, 11008, "mlp")):
        w = jnp.asarray(r.randn(d_in, d_out) * 0.02, jnp.float32)
        q8 = quantize_kernel(w.astype(jnp.bfloat16))
        q4 = quantize_kernel_int4(w, group_size=1 << 30)  # G=1 per-column
        wbf = w.astype(jnp.bfloat16)
        half = d_in // 2
        s4 = q4["scale4"].astype(jnp.bfloat16)
        k8, s8 = q8["kernel_q"], q8["scale"].astype(jnp.bfloat16)
        packed = q4["kernel_q4"]
        x = jnp.asarray(r.randn(1, d_in) * 0.1, jnp.bfloat16)

        def f_bf16(xc):
            return xc @ wbf

        def f_int8(xc):
            return (xc @ k8.astype(xc.dtype)) * s8

        def f_int4_cur(xc):
            from infinitevl_tpu.models.quant import int4_matmul

            return int4_matmul(xc, q4)

        bc = None

        def f_int4_bitcast(xc):
            b = jax.lax.bitcast_convert_type(packed, jnp.int4)  # [half,N,2]
            lo = b[..., 0].astype(xc.dtype)
            hi = b[..., 1].astype(xc.dtype)
            return (xc[..., :half] @ lo + xc[..., half:] @ hi) * s4[0]

        # numerics sanity (one call)
        ycur = np.asarray(jax.jit(f_int4_cur)(x), np.float32)
        ybc = np.asarray(jax.jit(f_int4_bitcast)(x), np.float32)
        err = np.abs(ycur - ybc).max() / (np.abs(ycur).max() + 1e-9)
        log(f"{tag}: bitcast-vs-current err-ratio {err:.2e}")
        assert err < 2e-2, err

        for name, fn in (
            ("bf16", f_bf16),
            ("int8", f_int8),
            ("int4-current", f_int4_cur),
            ("int4-bitcast", f_int4_bitcast),
        ):
            try:
                t0 = time.time()
                ms = timed_loop(fn, x)
                log(f"{tag} {name:>13}: {ms:7.3f} ms/GEMV "
                    f"[{time.time()-t0:.0f}s]")
            except Exception as e:  # noqa: BLE001
                log(f"{tag} {name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
