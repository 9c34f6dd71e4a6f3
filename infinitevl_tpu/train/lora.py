"""LoRA adapters for stage-3 long-context SFT.

Reference: model/adapter.py:130-247 (PEFT LoRA path; InfiniteVL's stage-3
recipe trains 32K-context with LoRA, README.md:134-138). Functional design:
adapters are a separate pytree {path: {'a': [in, r], 'b': [r, out]}}; the
forward patches dense kernels as W + a @ b * (alpha / r). Training
optimizes only the adapter tree; `merge_lora` folds adapters into the base
weights for export (train/tuner.py export path)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def lora_scale(alpha: float, rank: int, use_rslora: bool = False) -> float:
    """Adapter scaling: alpha/r, or alpha/sqrt(r) with rank-stabilized LoRA
    (the reference's use_rslora peft kwarg, adapter.py:220; rsLoRA paper's
    gamma_r = alpha / sqrt(r) keeps update magnitude rank-independent)."""
    if use_rslora:
        return alpha / float(rank) ** 0.5
    return alpha / rank


def _dora_column_norms(kernel, a, b_scaled):
    """Column L2 norms of (W + a @ b_scaled) WITHOUT materializing the
    [d_in, d_out] product: ||W_j||^2 + 2 (W^T a  b)_jj + (b^T a^T a b)_jj,
    fp32. Cost is two [*, r] matmuls per weight (r = lora rank)."""
    w = kernel.astype(jnp.float32)
    af = a.astype(jnp.float32)
    bf = b_scaled.astype(jnp.float32)
    t1 = jnp.sum(w * w, axis=0)  # [d_out]
    c = w.T @ af  # [d_out, r]
    t2 = jnp.einsum("jr,rj->j", c, bf)
    gram = af.T @ af  # [r, r]
    t3 = jnp.einsum("rj,rs,sj->j", bf, gram, bf)
    return jnp.sqrt(jnp.maximum(t1 + 2.0 * t2 + t3, 1e-12))


def init_lora(
    params: Params,
    key: jax.Array,
    rank: int = 8,
    target: Sequence[str] = ("q_proj", "k_proj", "v_proj", "o_proj"),
    dtype=jnp.float32,
    method: str = "lora",
    use_dora: bool = False,
) -> Params:
    """Adapter tree mirroring params' structure: for every dict node named in
    `target` that holds a 'kernel', create {'a','b'}.

    method:
    - "lora": a ~ N(0, 1/r), b = 0 (standard init)
    - "pissa": principal singular components of the base kernel — a =
      U_r sqrt(S_r), b = sqrt(S_r) V_r^T, the reference's PiSSA option
      (scripts/pissa_init.py / pissa_init in model args). With PiSSA the
      caller must subtract the principal component from the base (see
      pissa_decompose) or train with the adapter ADDED as-is on a base whose
      principal part was removed.

    use_dora adds a learnable magnitude vector 'm' per adapter (DoRA,
    reference adapter.py:221 use_dora peft kwarg): the effective weight is
    m * (W + aB) / ||W + aB||_col. m initializes to ||W||_col, so with
    b = 0 the forward is exactly the base model at init.

    Base nodes quantized by models/quant.quantize_params ('kernel_q' +
    'scale' instead of 'kernel') are matched too — that is the QLoRA
    configuration (int8 frozen base + trainable rank-r side path; reference
    model_args.py:191 quantization_bit with a bnb NF4 base). PiSSA and DoRA
    need the full-precision kernel per step and raise on a quantized base."""
    counter = [0]

    def walk(node, path):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in target
                    and isinstance(v, dict)
                    and ("kernel" in v or "kernel_q" in v)
                    and getattr(v.get("kernel", v.get("kernel_q")), "ndim", 0)
                    == 2
                ):
                    if "kernel" not in v and (method == "pissa" or use_dora):
                        raise ValueError(
                            "PiSSA/DoRA need the full-precision base kernel "
                            "per step; re-load the base unquantized or use "
                            "plain LoRA (the QLoRA configuration)"
                        )
                    d_in, d_out = v.get("kernel", v.get("kernel_q")).shape
                    counter[0] += 1
                    ka = jax.random.fold_in(key, counter[0])
                    if method == "pissa":
                        w = v["kernel"].astype(jnp.float32)
                        u, s, vt = jnp.linalg.svd(w, full_matrices=False)
                        sr = jnp.sqrt(s[:rank])
                        out[k] = {
                            "a": (u[:, :rank] * sr[None, :]).astype(dtype),
                            "b": (sr[:, None] * vt[:rank]).astype(dtype),
                        }
                    else:
                        out[k] = {
                            "a": (
                                jax.random.normal(ka, (d_in, rank)) / jnp.sqrt(rank)
                            ).astype(dtype),
                            "b": jnp.zeros((rank, d_out), dtype=dtype),
                        }
                    if use_dora:
                        out[k]["m"] = jnp.sqrt(
                            jnp.sum(
                                v["kernel"].astype(jnp.float32) ** 2, axis=0
                            )
                        ).astype(dtype)
                else:
                    sub = walk(v, path + (k,))
                    if sub is not None:
                        out[k] = sub
            return out or None
        if isinstance(node, (list, tuple)):
            subs = [walk(v, path + (i,)) for i, v in enumerate(node)]
            return type(node)(s if s is not None else {} for s in subs)
        return None

    return walk(params, ()) or {}


def pissa_decompose(
    params: Params,
    key: jax.Array,
    rank: int = 8,
    alpha: Optional[float] = None,
    target: Sequence[str] = ("q_proj", "k_proj", "v_proj", "o_proj"),
    dtype=jnp.float32,
) -> Tuple[Params, Params]:
    """PiSSA decomposition: returns (residual_base, adapter) such that
    apply_lora(residual_base, adapter, alpha, rank) == params exactly at
    init. Training the adapter over the residual base trains the PRINCIPAL
    directions of each weight (the PiSSA paper's trick; the reference
    exposes it via pissa_init / scripts).

    Because apply_lora scales adapters by alpha/rank, the principal factors
    are pre-divided by sqrt(alpha/rank) so the invariant holds for ANY
    alpha (default: alpha == rank, scale 1)."""
    lora = init_lora(params, key, rank, target, dtype, method="pissa")
    scale = (alpha if alpha is not None else rank) / rank
    inv = 1.0 / jnp.sqrt(scale)
    lora = jax.tree.map(lambda x: (x * inv).astype(x.dtype), lora)

    def walk(p, l):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                if isinstance(l, dict) and k in l and isinstance(l[k], dict) \
                        and "a" in l[k]:
                    new = dict(v)
                    delta = (
                        (l[k]["a"] @ l[k]["b"]) * scale
                    ).astype(v["kernel"].dtype)
                    new["kernel"] = v["kernel"] - delta
                    out[k] = new
                else:
                    out[k] = walk(v, l.get(k) if isinstance(l, dict) else None)
            return out
        if isinstance(p, (list, tuple)):
            ls = l if isinstance(l, (list, tuple)) else [None] * len(p)
            return type(p)(walk(v, lv) for v, lv in zip(p, ls))
        return p

    return walk(params, lora), lora


def loftq_init(
    params: Params,
    rank: int = 8,
    alpha: Optional[float] = None,
    target: Sequence[str] = ("q_proj", "k_proj", "v_proj", "o_proj"),
    iters: int = 4,
    dtype=jnp.float32,
) -> Tuple[Params, Params]:
    """LoftQ initialization for the int8 QLoRA path (reference
    scripts/loftq_init.py -> peft LoftQConfig semantics, loftq_iter=4).

    Alternates residual quantization and rank-r SVD per target kernel:

        A, B = 0
        repeat iters times:
            Q    = int8_quantize(W - scale * A B)   (models/quant.py scheme)
            A, B = SVD_r(W - dequant(Q)) / sqrt(scale)

    Returns (qbase, adapter): qbase holds 'kernel_q'+'scale' on every
    target node (non-target nodes untouched — compose with
    models/quant.quantize_params for full serving quantization), and
    attach/apply_lora(qbase, adapter, alpha, rank) approximates the
    FULL-precision W at init — unlike plain QLoRA init (b=0), where the
    init forward equals the quantized base. scale = alpha/rank is folded
    into the factors like pissa_decompose so the invariant holds for any
    alpha."""
    from ..models.quant import dequantize_kernel, quantize_kernel

    scale = (alpha if alpha is not None else rank) / rank
    inv = 1.0 / jnp.sqrt(scale)

    def walk(node):
        if isinstance(node, dict):
            qb, ad = {}, {}
            for k, v in node.items():
                if (
                    k in target
                    and isinstance(v, dict)
                    and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 2
                ):
                    w = v["kernel"].astype(jnp.float32)
                    a = jnp.zeros((w.shape[0], rank), jnp.float32)
                    b = jnp.zeros((rank, w.shape[1]), jnp.float32)
                    for _ in range(max(iters, 1)):
                        qnode = quantize_kernel(w - scale * (a @ b))
                        resid = w - dequantize_kernel(qnode, jnp.float32)
                        u, s, vt = jnp.linalg.svd(resid, full_matrices=False)
                        sr = jnp.sqrt(s[:rank])
                        a = u[:, :rank] * sr[None, :] * inv
                        b = sr[:, None] * vt[:rank] * inv
                    new = {kk: vv for kk, vv in v.items() if kk != "kernel"}
                    new.update(qnode)
                    qb[k] = new
                    ad[k] = {"a": a.astype(dtype), "b": b.astype(dtype)}
                else:
                    q_sub, a_sub = walk(v)
                    qb[k] = q_sub
                    if a_sub is not None:
                        ad[k] = a_sub
            return qb, (ad or None)
        if isinstance(node, (list, tuple)):
            pairs = [walk(v) for v in node]
            qs = type(node)(p[0] for p in pairs)
            ads = type(node)(
                p[1] if p[1] is not None else {} for p in pairs
            )
            return qs, ads
        return node, None

    qbase, adapter = walk(params)
    return qbase, adapter or {}


def apply_lora(
    params: Params, lora: Params, alpha: float = 16.0, rank: int = 8,
    use_rslora: bool = False,
) -> Params:
    """Return params with LoRA deltas merged on the fly (functional: the
    result references base arrays except patched kernels). Used inside the
    jitted loss so gradients flow to the adapter leaves only when the loss
    is differentiated w.r.t. `lora`. DoRA adapters ('m' present) fold the
    magnitude/direction decomposition into the merged kernel.

    An int8-quantized base node ('kernel_q', QLoRA) is dequantized to
    bfloat16 before the delta is added — the merged export is full-precision
    (peft refuses to merge into a quantized layer; dequant-then-merge is the
    standard QLoRA export)."""
    scale = lora_scale(alpha, rank, use_rslora)

    def walk(p, l):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                if isinstance(l, dict) and k in l and isinstance(l[k], dict) \
                        and "a" in l[k]:
                    new = dict(v)
                    if "kernel" not in v and "kernel_q" in v:
                        from ..models.quant import dequantize_kernel

                        new.pop("kernel_q"), new.pop("scale")
                        new["kernel"] = dequantize_kernel(v)
                        v = new
                    delta = (l[k]["a"] @ l[k]["b"]) * scale
                    merged = v["kernel"] + delta.astype(v["kernel"].dtype)
                    if "m" in l[k]:
                        norms = _dora_column_norms(
                            v["kernel"], l[k]["a"], l[k]["b"] * scale
                        )
                        merged = merged * (
                            l[k]["m"].astype(jnp.float32) / norms
                        ).astype(merged.dtype)[None, :]
                    new["kernel"] = merged
                    out[k] = new
                else:
                    out[k] = walk(v, l.get(k) if isinstance(l, dict) else None)
            return out
        if isinstance(p, (list, tuple)):
            ls = l if isinstance(l, (list, tuple)) else [None] * len(p)
            return type(p)(walk(v, lv) for v, lv in zip(p, ls))
        return p

    return walk(params, lora)


def attach_lora(
    params: Params, lora: Params, alpha: float = 16.0, rank: int = 8,
    use_rslora: bool = False,
) -> Params:
    """Return params with the adapter factors ATTACHED as low-rank side
    paths: matched dicts gain lora_a [d_in, r] and lora_b [r, d_out]
    (pre-scaled by alpha/rank, or alpha/sqrt(rank) with rsLoRA); the matmul
    helpers add (x @ a) @ b to the frozen kernel's output.

    DoRA adapters additionally attach 'dora_scale' [d_out] = m / ||W +
    aB||_col (computed here — per weight, once per step, differentiable to
    a/b/m); the matmul helpers multiply the pre-bias output by it, which is
    exactly y = x @ (m * (W + aB) / ||W + aB||_col) without ever forming
    the decomposed weight.

    Unlike apply_lora's on-the-fly merge, no weight-shaped copies or
    weight-shaped cotangents ever exist — gradients through the attached
    tree are rank-r sized. That is the difference between the 3B 32K
    stage-3 LoRA recipe OOMing (21.5 GB with merged weights) and fitting
    on one 16 GB v5e."""
    scale = lora_scale(alpha, rank, use_rslora)

    def walk(p, l):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                if isinstance(l, dict) and k in l and isinstance(l[k], dict) \
                        and "a" in l[k]:
                    new = dict(v)
                    new["lora_a"] = l[k]["a"]
                    new["lora_b"] = l[k]["b"] * scale
                    if "m" in l[k]:
                        norms = _dora_column_norms(
                            v["kernel"], l[k]["a"], new["lora_b"]
                        )
                        new["dora_scale"] = l[k]["m"].astype(jnp.float32) / norms
                    out[k] = new
                else:
                    out[k] = walk(v, l.get(k) if isinstance(l, dict) else None)
            return out
        if isinstance(p, (list, tuple)):
            ls = l if isinstance(l, (list, tuple)) else [None] * len(p)
            return type(p)(walk(v, lv) for v, lv in zip(p, ls))
        return p

    return walk(params, lora)


def merge_lora(params: Params, lora: Params, alpha: float = 16.0,
               rank: int = 8, use_rslora: bool = False) -> Params:
    """Fold adapters into base weights (export path)."""
    return apply_lora(params, lora, alpha, rank, use_rslora)


def make_lora_sft_step(cfg, tx, base_params=None, alpha: float = 16.0,
                       rank: int = 8, remat: bool = False,
                       remat_group: int = 1, remat_barrier: bool = False,
                       use_rslora: bool = False, scan_unroll: int = 1,
                       remat_mode: str = "auto"):
    """Only the adapter tree is optimized; base weights stay frozen.
    remat=True enables per-layer gradient checkpointing (the stage-3
    32K-context recipe).

    `cfg` may be a TextConfig (text-only SFT) or a full InfiniteVLConfig —
    with the latter, batches carrying pixel_values train multimodally (the
    grid tuples are trailing static args).

    With base_params given at factory time the step is
    (lora, opt_state, batch[, grid_thw, video_grid_thw]); with
    base_params=None it is (lora, opt_state, base_params, batch[, grids...])
    — pass the base as a jit ARGUMENT for big models, otherwise the closure
    bakes the weights into the executable as constants and doubles their HBM
    footprint."""
    import optax

    from .step import mm_sft_loss_fn, sft_loss_fn

    full_cfg = cfg if hasattr(cfg, "text") else None

    def step(lora, opt_state, batch, grid_thw=None, video_grid_thw=None,
             _base=None):
        base = base_params if base_params is not None else _base

        def loss_fn(l):
            merged = attach_lora(base, l, alpha, rank, use_rslora)
            if full_cfg is not None:
                if "text" not in merged:
                    merged = {"text": merged}
                return mm_sft_loss_fn(
                    merged,
                    full_cfg,
                    batch["input_ids"],
                    batch["labels"],
                    batch["position_ids"],
                    pixel_values=batch.get("pixel_values"),
                    grid_thw=grid_thw,
                    pixel_values_videos=batch.get("pixel_values_videos"),
                    video_grid_thw=video_grid_thw,
                    segment_ids=batch.get("segment_ids"),
                    remat=remat,
                    remat_group=remat_group,
                    remat_barrier=remat_barrier,
                    scan_unroll=scan_unroll, remat_mode=remat_mode,
                )
            text = merged["text"] if "text" in merged else merged
            return sft_loss_fn(
                text,
                cfg,
                batch["input_ids"],
                batch["labels"],
                batch["position_ids"],
                batch.get("segment_ids"),
                remat=remat,
                remat_group=remat_group,
                remat_barrier=remat_barrier,
                scan_unroll=scan_unroll, remat_mode=remat_mode,
            )

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    if base_params is not None:
        return step

    def step_with_base(lora, opt_state, base, batch, grid_thw=None,
                       video_grid_thw=None):
        return step(lora, opt_state, batch, grid_thw, video_grid_thw, _base=base)

    return step_with_base


def make_lora_eval_fn(cfg, alpha: float = 16.0, rank: int = 8,
                      use_rslora: bool = False):
    """Loss-only twin of make_lora_sft_step for the val_size split:
    jittable (lora, base, batch) -> scalar mean CE with the adapters
    attached (text-only; the eval split collates through the text path)."""
    from .step import sft_loss_fn

    tcfg = cfg.text if hasattr(cfg, "text") else cfg

    def eval_loss(lora, base, batch):
        merged = attach_lora(base, lora, alpha, rank, use_rslora)
        text = merged["text"] if "text" in merged else merged
        return sft_loss_fn(
            text,
            tcfg,
            batch["input_ids"],
            batch["labels"],
            batch["position_ids"],
            batch.get("segment_ids"),
        )

    return eval_loss
