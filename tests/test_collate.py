"""Packed-batch collation: per-segment position restarts and boundary label
masking."""

import numpy as np

from infinitevl_tpu.train.trainer import collate


def test_collate_packed_positions_and_labels():
    ex = [
        {
            "input_ids": np.arange(1, 11),
            "labels": np.arange(1, 11),
            "segment_ids": np.array([1, 1, 1, 1, 2, 2, 2, 3, 3, 3]),
        }
    ]
    batch = next(collate(ex, batch_size=1, cutoff_len=12, epochs=1.0))
    pos = np.asarray(batch["position_ids"])[0, 0]
    seg = np.asarray(batch["segment_ids"])[0]
    labels = np.asarray(batch["labels"])[0]
    # positions restart at each segment (and at padding)
    np.testing.assert_array_equal(pos[:10], [0, 1, 2, 3, 0, 1, 2, 0, 1, 2])
    # boundary tokens (last of each segment) are not supervised
    assert labels[3] == -100 and labels[6] == -100
    # interior labels are next-token shifted
    assert labels[0] == 2 and labels[4] == 6
    # padding region unsupervised
    assert (labels[10:] == -100).all()
    assert (seg[10:] == 0).all()


def test_collate_unpacked_positions_monotone():
    ex = [{"input_ids": np.arange(5), "labels": np.arange(5)}]
    batch = next(collate(ex, batch_size=1, cutoff_len=8, epochs=1.0))
    pos = np.asarray(batch["position_ids"])[0, 0]
    np.testing.assert_array_equal(pos[:5], np.arange(5))
