"""Token-length distribution of a registered dataset
(reference scripts/stat_utils/length_cdf.py).

    python scripts/length_cdf.py examples/sft_tiny.yaml
"""

import sys

sys.path.insert(0, ".")


def main(config_path: str):
    import numpy as np

    from infinitevl_tpu.cli import _tokenizer
    from infinitevl_tpu.hparams import load_yaml_args
    from infinitevl_tpu.train.trainer import build_config, build_dataset

    args = load_yaml_args(config_path)
    args.data.packing = False
    data = build_dataset(args, _tokenizer(args, build_config(args)))
    lens = np.asarray([len(e["input_ids"]) for e in data])
    print(f"n={len(lens)} mean={lens.mean():.1f} max={lens.max()}")
    for q in (50, 75, 90, 95, 99, 100):
        print(f"  p{q:<3d} {np.percentile(lens, q):.0f}")


if __name__ == "__main__":
    main(sys.argv[1])
