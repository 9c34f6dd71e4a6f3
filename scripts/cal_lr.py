"""Suggest a learning rate for a given effective batch size (reference
scripts/stat_utils/cal_lr.py role).

Uses square-root batch-size scaling from a known-good anchor: the
InfiniteVL recipes train at lr 1e-4 with an effective batch of 64 packed
8K sequences (examples/train_linear/*.yaml). lr(b) = anchor_lr *
sqrt(tokens_per_step / anchor_tokens_per_step).

Usage:
  python scripts/cal_lr.py --batch 32 --cutoff 8192 [--anchor-lr 1e-4]
"""

import argparse
import math

ANCHOR_TOKENS = 64 * 8192


def suggest_lr(batch: int, cutoff: int, anchor_lr: float = 1e-4) -> float:
    return anchor_lr * math.sqrt(batch * cutoff / ANCHOR_TOKENS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, required=True,
                    help="effective batch (per_device * data_parallel * accum)")
    ap.add_argument("--cutoff", type=int, default=8192,
                    help="tokens per sequence (packed cutoff_len)")
    ap.add_argument("--anchor-lr", type=float, default=1e-4)
    a = ap.parse_args()
    lr = suggest_lr(a.batch, a.cutoff, a.anchor_lr)
    print(f"tokens/step = {a.batch * a.cutoff:,}")
    print(f"suggested learning_rate = {lr:.3e}")


if __name__ == "__main__":
    main()
