"""Streaming video inference demo.

The TPU counterpart of the reference's
inference_examples/demo_streaming_inference.py: frame-by-frame prefill with
time-aware mRoPE offsets and branched QA at chosen frames, printing the same
per-frame latency / FPS summary. Works with a video file (PyAV/PIL when
available) or synthetic frames, with real weights (--model_path) or random
ones (--random, for pipeline smoke runs).

Usage:
  python examples/streaming_demo.py --random --frames 64
  python examples/streaming_demo.py --model_path /path/to/InfiniteVL-3B \
      --video_path demo.mp4 --fps 30
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

DEFAULT_QUERIES = [
    (20, "Describe what is happening in the current scene."),
    (40, "What objects are moving in the video?"),
]


def frame_source(args):
    if args.video_path:
        try:
            import av  # PyAV

            container = av.open(args.video_path)
            for frame in container.decode(video=0):
                img = frame.to_ndarray(format="rgb24")
                yield img
            return
        except ImportError:
            print("PyAV not available; falling back to synthetic frames")
    rng = np.random.RandomState(0)
    for i in range(args.frames):
        # moving gradient so frames differ
        base = np.linspace(0, 255, args.size, dtype=np.float32)
        img = (base[None, :, None] + base[:, None, None] + i * 3) % 256
        img = np.repeat(img, 3, axis=2) + rng.rand(args.size, args.size, 3) * 20
        yield np.clip(img, 0, 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--video_path", type=str, default=None)
    p.add_argument("--random", action="store_true", help="random tiny weights")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--native", action="store_true",
                   help="use the C++ preprocessing pipeline")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from infinitevl_tpu import from_hf_json, infinitevl_3b
    from infinitevl_tpu.data.loader import SimpleTokenizer
    from infinitevl_tpu.models.params import init_params, load_hf_checkpoint
    from infinitevl_tpu.streaming import StreamingEngine

    if args.model_path:
        cfg = from_hf_json(f"{args.model_path}/config.json")
        params = load_hf_checkpoint(args.model_path, cfg, jnp.bfloat16)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    else:
        cfg = infinitevl_3b()
        print("no --model_path: random weights (pipeline smoke run)")
        shapes = jax.eval_shape(
            lambda k: init_params(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0)
        )
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        tokenizer = SimpleTokenizer(config=cfg)

    eng = StreamingEngine(params, cfg, frame_hw=(args.size, args.size))
    queries = dict(DEFAULT_QUERIES)

    pipe = None
    if args.native:
        from infinitevl_tpu import native

        pipe = native.FramePipeline(workers=2)
        pending = []

    print(f"streaming {args.frames} frames at {args.size}x{args.size} ...")
    for idx, frame in enumerate(frame_source(args)):
        if frame.shape[:2] != (args.size, args.size):
            from infinitevl_tpu.data.processing import resize_bicubic

            frame = resize_bicubic(frame, args.size, args.size).astype(np.uint8)

        if idx in queries:
            q = queries[idx]
            print(f"\n--- Query at frame {idx}: {q}")
            q_ids = np.asarray(
                [tokenizer.encode(q, add_special_tokens=False)], np.int64
            )
            t0 = time.perf_counter()
            ans = eng.ask(q_ids, max_new_tokens=args.max_new_tokens)
            dt = time.perf_counter() - t0
            text = tokenizer.decode(ans, skip_special_tokens=True)
            print(f"--- Answer ({len(ans)} tok, {dt:.1f}s): {text}\n")

        if pipe is not None:
            ticket = pipe.submit(frame, (args.size, args.size))
            pending.append(ticket)
            # double buffering: collect the previous frame while this one
            # preprocesses
            if len(pending) > 1:
                eng.push_frame(pipe.collect(pending.pop(0), (args.size, args.size)),
                               fps=args.fps)
        else:
            eng.push_frame_raw(frame, fps=args.fps)

        if (idx + 1) % 20 == 0:
            st = eng.stats()
            print(
                f"[frame {idx + 1:4d}] {st['avg_ms']:.1f} ms/frame "
                f"({st['fps']:.1f} FPS) | tokens: {st['tokens']}"
            )

    if pipe is not None:
        for t in pending:
            eng.push_frame(pipe.collect(t, (args.size, args.size)), fps=args.fps)
        pipe.close()

    st = eng.stats()
    print("\n" + "=" * 60)
    print("Performance Summary:")
    print(f"Average Latency per Frame: {st['avg_ms']:.3f} ms")
    print(f"Average Throughput: {st['fps']:.2f} FPS")
    print(f"Total visual tokens: {st['tokens']}")
    print("=" * 60)


if __name__ == "__main__":
    main()
