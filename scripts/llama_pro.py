"""LLaMA-Pro block expansion over an HF checkpoint (reference
scripts/llama_pro.py): load, insert identity blocks, re-export.

Usage:
  python scripts/llama_pro.py <checkpoint_dir> <output_dir> <num_expand>
"""

import sys


def main(src: str, dst: str, num_expand: int):
    import jax.numpy as jnp

    from infinitevl_tpu.config import from_hf_json
    import dataclasses
    import os

    from infinitevl_tpu.models.convert import llama_pro_expand
    from infinitevl_tpu.models.params import load_hf_checkpoint
    from infinitevl_tpu.utils.checkpoint import export_hf_safetensors

    cfg = from_hf_json(os.path.join(src, "config.json"))
    params = load_hf_checkpoint(src, cfg, dtype=jnp.bfloat16)
    new_text, new_tcfg = llama_pro_expand(params["text"], cfg.text, num_expand)
    params["text"] = new_text
    new_cfg = dataclasses.replace(cfg, text=new_tcfg)
    export_hf_safetensors(params, new_cfg, dst)
    print(
        f"expanded {cfg.text.num_hidden_layers} -> "
        f"{new_tcfg.num_hidden_layers} layers; wrote {dst}"
    )


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
