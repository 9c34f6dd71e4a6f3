"""One-command real-checkpoint parity harness (round-3 verdict missing #1).

    python scripts/real_parity.py --checkpoint_dir /path/to/InfiniteVL-3B \
        [--prompt "..."] [--image photo.jpg] [--seq 32] [--tol 5e-3]

Given an HF-format checkpoint directory (config.json + model.safetensors or
a sharded model-0000x-of-0000y set, optionally tokenizer files), this:

1. loads the weights into OUR pytree (models/params.load_hf_checkpoint —
   both released layouts) and into the REFERENCE torch modeling
   (/root/reference/infinitevl/infinitevl_standard/modeling_infinitevl.py,
   imported through tests/torch_ref.py with eager fp32 gated-delta stubs);
2. encodes --prompt with the checkpoint's own tokenizer when its files
   exist (transformers AutoTokenizer, local only) — the documented
   tokenizer end-to-end path — else uses deterministic random token ids;
3. with --image, runs the full PROCESSOR path (data/processing.
   InfiniteVLProcessor smart-resize/patchify + token expansion) and
   compares the multimodal forward end-to-end;
4. compares per-layer hidden states and final logits (relative-RMS err
   ratio, the vendored-FLA assert_close methodology) and prints a
   pass/fail table; exit code 0 iff everything passes.

Runs today on the random-weight fixture (tests export one via
export_hf_safetensors — see tests/test_real_parity.py) and needs zero
edits on the day released weights appear: point --checkpoint_dir at them.

Everything runs on CPU fp32 with highest matmul precision: parity is a
numerics question, not a performance one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def err_ratio(a, b):
    import numpy as np

    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = float(np.sqrt((b**2).mean())) + 1e-9
    return float(np.sqrt(((a - b) ** 2).mean())) / denom


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument(
        "--prompt",
        default="Describe what makes linear attention fast.",
        help="encoded with the checkpoint tokenizer when available",
    )
    ap.add_argument("--image", default=None, help="optional image file")
    ap.add_argument(
        "--seq", type=int, default=32,
        help="random-ids fallback length when no tokenizer files exist",
    )
    ap.add_argument("--tol", type=float, default=5e-3)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from infinitevl_tpu.config import from_hf_json
    from infinitevl_tpu.models.infinitevl import forward, get_rope_index
    from infinitevl_tpu.models.params import load_hf_checkpoint
    from infinitevl_tpu.models.text import embed_tokens, text_forward
    from torch_ref import build_torch_model

    d = args.checkpoint_dir
    cfg = from_hf_json(os.path.join(d, "config.json"))
    print(f"config: {cfg.text.num_hidden_layers} layers, "
          f"hidden {cfg.text.hidden_size}, window {cfg.text.sliding_window}")

    params = load_hf_checkpoint(d, cfg, dtype=jnp.float32)
    hf_dict = json.load(open(os.path.join(d, "config.json")))
    model = build_torch_model(hf_dict, d)

    # --- inputs: real tokenizer when the checkpoint ships one ---
    tok_file = os.path.join(d, "tokenizer.json")
    pix = grids = None
    if os.path.exists(tok_file):
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(d, local_files_only=True)
        if args.image:
            from PIL import Image

            from infinitevl_tpu.data.processing import InfiniteVLProcessor

            proc = InfiniteVLProcessor(tok, cfg)
            img = np.asarray(Image.open(args.image).convert("RGB"))
            text = (
                f"<|vision_start|><|image_pad|><|vision_end|>{args.prompt}"
            )
            po = proc(text, images=[img])
            ids = po.input_ids
            pix = po.pixel_values
            grids = tuple(tuple(int(x) for x in g) for g in po.image_grid_thw)
            print(f"processor: image -> grid {grids}, {ids.shape[1]} tokens")
        else:
            ids = np.asarray([tok.encode(args.prompt)], dtype=np.int64)
        print(f"tokenizer: {ids.shape[1]} tokens from checkpoint tokenizer")
    else:
        if args.image:
            raise SystemExit("--image needs tokenizer files in the checkpoint")
        rng = np.random.RandomState(0)
        ids = rng.randint(10, cfg.text.vocab_size - 8, (1, args.seq))
        print(f"tokenizer files absent: random ids [1, {args.seq}]")

    pos, _ = get_rope_index(
        cfg, ids, image_grid_thw=np.asarray(grids) if grids else None
    )

    # --- ours ---
    mine_logits, _ = forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos),
        pixel_values=jnp.asarray(pix) if pix is not None else None,
        grid_thw=grids,
    )
    mine_logits = np.asarray(mine_logits)
    # per-layer trace (text path; collected[i] = layer i's INPUT,
    # [-1] = post-final-norm — matches HF's all_hidden_states convention)
    if pix is None:
        embeds = embed_tokens(params["text"], jnp.asarray(ids))
        _, _, mine_hs = text_forward(
            params["text"], cfg.text, embeds, jnp.asarray(pos),
            output_hidden_states=True,
        )
    else:
        mine_hs = None  # per-layer trace is text-only; e2e covers the ViT

    # --- reference ---
    with torch.no_grad():
        kw = {}
        if pix is not None:
            kw = dict(
                pixel_values=torch.tensor(pix, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grids)),
            )
        T = ids.shape[1]
        W = cfg.text.sliding_window
        if T > W:
            # the reference's eager path drops the sliding window once
            # T > W (SWA "not implemented for eager"); feed the exact
            # banded mask through the dict-mask escape hatch — DeltaNet
            # layers ignore it (modeling_infinitevl.py:1223 hardcodes
            # attention_mask=None), same trick as tests/test_torch_parity
            t = np.arange(T)[:, None]
            s = np.arange(T)[None, :]
            allowed = (s <= t) & (s > t - W)
            mask4d = np.where(allowed, 0.0, -np.inf).astype(np.float32)[
                None, None
            ]
            kw["attention_mask"] = {
                "full_attention": torch.tensor(mask4d)
            }
            kw["position_ids"] = torch.tensor(pos)
        ref = model(
            input_ids=torch.tensor(ids), use_cache=False,
            output_hidden_states=mine_hs is not None, **kw,
        )
    ref_logits = ref.logits.numpy()

    rows = []
    ok = True
    if mine_hs is not None:
        n = cfg.text.num_hidden_layers
        for i in range(n):
            e = err_ratio(mine_hs[i], ref.hidden_states[i].numpy())
            rows.append((f"layer {i:2d} input", e))
        rows.append(
            ("final norm out", err_ratio(mine_hs[-1], ref.hidden_states[n].numpy()))
        )
    rows.append(("logits", err_ratio(mine_logits, ref_logits)))
    top1 = float(
        (mine_logits.argmax(-1) == ref_logits.argmax(-1)).mean()
    )
    print(f"\n{'check':<18}{'err-ratio':>12}  verdict")
    for name, e in rows:
        verdict = "PASS" if e < args.tol else "FAIL"
        ok &= e < args.tol
        print(f"{name:<18}{e:>12.2e}  {verdict}")
    print(f"{'top-1 agreement':<18}{top1:>12.4f}  "
          f"{'PASS' if top1 == 1.0 else 'FAIL'}")
    ok &= top1 == 1.0
    print("\nPARITY " + ("OK" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
