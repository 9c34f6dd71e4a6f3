"""Analytic FLOPs / MACs / params for an InfiniteVL config.

TPU-native analogue of the reference's deepspeed-profiler script
(scripts/stat_utils/cal_flops.py): instead of tracing a CUDA model with
the deepspeed flops profiler, this prints the closed-form per-token and
per-pass counts from the config (utils/profiling.decoder_flops_per_token
covers projections, the hybrid attention/delta mix and the MLPs).

Usage:
  python scripts/cal_flops.py                       # deployed 3B
  python scripts/cal_flops.py --config cfg.yaml     # from a train yaml
  python scripts/cal_flops.py --batch_size 4 --seq_length 8192
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="train yaml (model section)")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--seq_length", type=int, default=512)
    ap.add_argument("--include_backward", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from infinitevl_tpu import infinitevl_3b
    from infinitevl_tpu.models.params import init_params
    from infinitevl_tpu.utils.profiling import decoder_flops_per_token

    cfg = infinitevl_3b()
    if args.config:
        from infinitevl_tpu.hparams import load_yaml_args

        aa = load_yaml_args(args.config)
        if aa.model.model_name_or_path:
            import json
            import os

            p = os.path.join(aa.model.model_name_or_path, "config.json")
            if os.path.exists(p):
                from infinitevl_tpu.config import from_hf_dict

                cfg = from_hf_dict(json.load(open(p)))

    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg), jax.random.PRNGKey(0)
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    ft = decoder_flops_per_token(cfg)
    tokens = args.batch_size * args.seq_length
    total = ft * tokens * (3 if args.include_backward else 1)
    print(f"params: {n_params/1e9:.3f} B")
    print(f"decoder FLOPs/token (fwd): {ft/1e9:.3f} GF  "
          f"(MACs {ft/2e9:.3f} G)")
    print(f"pass FLOPs (B={args.batch_size}, T={args.seq_length}"
          f"{', fwd+bwd' if args.include_backward else ', fwd'}): "
          f"{total/1e12:.3f} TF")


if __name__ == "__main__":
    main()
