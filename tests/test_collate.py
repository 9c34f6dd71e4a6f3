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


def test_collate_stream_covers_all_examples_fixed_shapes():
    """Streaming collator: every example appears exactly once, every batch
    is fixed-shape, mid-window tails carry over instead of dropping."""
    import numpy as np

    from infinitevl_tpu.train.trainer import collate_stream

    exs = [
        {"input_ids": np.full(i + 2, 100 + i, np.int64),
         "labels": np.full(i + 2, 100 + i, np.int64)}
        for i in range(11)
    ]
    batches = list(collate_stream(iter(exs), batch_size=2, cutoff_len=16,
                                  buffer_size=3, seed=0))
    assert all(b["input_ids"].shape == (2, 16) for b in batches)
    seen = set()
    for b in batches:
        ids = np.asarray(b["input_ids"])
        seen.update(int(t) for t in ids.ravel() if t >= 100)
    assert seen == {100 + i for i in range(11)}
    # 11 examples / batch 2 -> 5 full + 1 short-final = 6 batches
    assert len(batches) == 6


def test_collate_stream_packing_windows():
    """packing=True knapsack-packs each buffer window: segment ids > 1
    appear and supervision never crosses a boundary."""
    import numpy as np

    from infinitevl_tpu.train.trainer import collate_stream

    exs = [
        {"input_ids": np.arange(1, 5, dtype=np.int64) * (i + 1),
         "labels": np.arange(1, 5, dtype=np.int64) * (i + 1)}
        for i in range(8)
    ]
    batches = list(collate_stream(iter(exs), batch_size=1, cutoff_len=12,
                                  buffer_size=4, seed=0, packing=True))
    segs = np.concatenate([np.asarray(b["segment_ids"]).ravel() for b in batches])
    assert segs.max() >= 2  # multiple examples packed into one row
    for b in batches:
        seg = np.asarray(b["segment_ids"])[0]
        lab = np.asarray(b["labels"])[0]
        cross = np.zeros_like(seg, bool)
        cross[:-1] = seg[1:] != seg[:-1]
        assert (lab[cross] == -100).all()
