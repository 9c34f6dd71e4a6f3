import time
t0 = time.time()
import jax
t1 = time.time()
print(f"import jax: {t1-t0:.1f}s", flush=True)
d = jax.devices()
t2 = time.time()
print(f"jax.devices(): {t2-t1:.1f}s -> {d}", flush=True)
from infinitevl_tpu.utils.benchlib import sync_overhead_ms
t3 = time.time()
print(f"import benchlib (pkg import): {t3-t2:.1f}s", flush=True)
s = sync_overhead_ms()
t4 = time.time()
print(f"sync_overhead_ms(): {t4-t3:.1f}s -> {s:.1f} ms", flush=True)
from infinitevl_tpu import infinitevl_3b
cfg = infinitevl_3b()
t5 = time.time()
print(f"cfg: {t5-t4:.1f}s; total {t5-t0:.1f}s", flush=True)
