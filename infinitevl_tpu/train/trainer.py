"""Training driver + stage workflows (run_sft / run_dt / run_pt).

The reference's tuner dispatch (train/tuner.py:53-110) + workflow files
(train/sft/workflow.py, train/dt/workflow.py:44-263), re-shaped around
jitted functional train steps: build config/params -> dataset -> optimizer
-> step loop with JSONL logging and orbax checkpoints."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InfiniteVLConfig, infinitevl_3b, tiny_config
from ..data.loader import (
    SimpleTokenizer,
    resolve_tokenizer,
    encode_kto,
    encode_pairwise,
    encode_supervised,
    encode_supervised_mm,
    encode_supervised_stream,
    load_dataset_info,
    load_mixed_examples,
    load_examples,
    pack_examples,
    shift_labels,
    stream_mixed_examples,
)
from ..hparams import AllArgs
from ..models.convert import convert_attention, trainable_mask
from ..models.params import init_params, init_text_params, load_hf_checkpoint
from ..utils.checkpoint import (
    filter_softmax_layers,
    merge_params,
    restore_train_state,
    save_train_state,
)
from ..utils.logging import TrainerLog, get_logger
from .distill import apply_trainable_mask, make_stage1_step, make_stage2_step
from .step import make_mm_sft_train_step, make_optimizer, make_sft_train_step

logger = get_logger(__name__)

# Optional cooperative abort (set by the web board's runner; checked once per
# step). The reference LlamaBoard aborts via its Runner process handle.
ABORT_EVENT = None


def build_config(args: AllArgs) -> InfiniteVLConfig:
    ckpt_cfg = (
        os.path.join(args.model.model_name_or_path, "config.json")
        if args.model.model_name_or_path
        else None
    )
    if ckpt_cfg and os.path.exists(ckpt_cfg):
        from ..config import from_hf_json

        cfg = from_hf_json(ckpt_cfg)
    elif args.model.config_preset == "tiny":
        cfg = tiny_config()
    else:
        cfg = infinitevl_3b()
    text = dataclasses.replace(
        cfg.text,
        use_pallas_swa=args.model.use_pallas_swa,
        conv_carry=args.model.conv_carry,
    )
    if args.model.rope_scaling:
        # configure_rope semantics (reference model_utils/rope.py:35-69):
        # enlarge the context window and derive the scaling factor from it
        cur = text.max_position_embeddings
        mml = args.model.model_max_length
        kw = {"rope_type": args.model.rope_scaling}
        if mml and mml > cur:
            kw["rope_factor"] = float(int(np.ceil(mml / cur)))
            kw["max_position_embeddings"] = mml
            if args.model.rope_scaling in ("dynamic", "yarn", "llama3"):
                kw["rope_original_max_position_embeddings"] = cur
        else:
            if mml:
                logger.warning(
                    "model_max_length <= max_position_embeddings; "
                    "using rope factor 2.0"
                )
            kw["rope_factor"] = 2.0
        text = dataclasses.replace(text, **kw)
    return dataclasses.replace(cfg, text=text)


def build_dataset_stream(args: AllArgs, tokenizer=None):
    """Lazy dataset pipeline for streaming mode: registry entries are read
    (hub IterableDataset or line-by-line local files), mixed, and encoded
    on the fly; collate_stream adds the shuffle reservoir + windowed
    packing. Mirrors the reference's streaming get_dataset path
    (data/loader.py:286-323) including its constraint set
    (parser.py:232-233, data_args.py:157-158)."""
    if args.finetune.stage not in ("sft", "pt"):
        raise ValueError("streaming is only supported for the sft/pt stages")
    if args.train.max_steps is None:
        raise ValueError(
            "streaming datasets have no length — set `max_steps` to bound "
            "the run"
        )
    if args.data.max_samples:
        raise ValueError(
            "`max_samples` cannot cap a streaming dataset; drop it or "
            "disable `streaming`"
        )
    if 0 < args.data.val_size < 1:
        raise ValueError(
            "fractional `val_size` is incompatible with `streaming` "
            "(reference data_args.py:154-156)"
        )
    info_path = os.path.join(args.data.dataset_dir, "dataset_info.json")
    registry = load_dataset_info(info_path)
    names = [n.strip() for n in args.data.dataset.split(",") if n.strip()]
    examples = stream_mixed_examples(
        names, registry, args.data.dataset_dir,
        mix_strategy=args.data.mix_strategy,
        interleave_probs=(
            list(args.data.interleave_probs)
            if args.data.interleave_probs else None
        ),
        seed=args.train.seed,
    )
    tokenizer = resolve_tokenizer(args, None, tokenizer)
    return encode_supervised_stream(
        examples, tokenizer, args.data.template, args.data.cutoff_len
    )


def build_dataset(
    args: AllArgs, tokenizer=None, cfg: Optional[InfiniteVLConfig] = None
) -> List[Dict[str, np.ndarray]]:
    if args.data.streaming:
        return build_dataset_stream(args, tokenizer)
    info_path = os.path.join(args.data.dataset_dir, "dataset_info.json")
    registry = load_dataset_info(info_path)
    names = [n.strip() for n in args.data.dataset.split(",") if n.strip()]
    examples = load_mixed_examples(
        names, registry, args.data.dataset_dir,
        mix_strategy=args.data.mix_strategy,
        interleave_probs=(
            list(args.data.interleave_probs)
            if args.data.interleave_probs else None
        ),
        seed=args.train.seed,
    )
    if args.data.max_samples:
        examples = examples[: args.data.max_samples]
    has_media = any(ex.get("images") or ex.get("videos") for ex in examples)
    if has_media:
        cfg = cfg or build_config(args)
        tokenizer = resolve_tokenizer(args, cfg, tokenizer)
        if args.data.packing:
            logger.warning("packing is not supported for multimodal datasets; disabled")
        return encode_supervised_mm(
            examples,
            tokenizer,
            cfg,
            args.data.template,
            args.data.cutoff_len,
            dataset_dir=args.data.dataset_dir,
            min_pixels=args.data.image_min_pixels,
            max_pixels=args.data.image_max_pixels,
            video_fps=args.data.video_fps,
            video_min_pixels=args.data.video_min_pixels,
            video_max_pixels=args.data.video_max_pixels,
        )
    tokenizer = resolve_tokenizer(args, None, tokenizer)
    enc = encode_supervised(
        examples, tokenizer, args.data.template, args.data.cutoff_len
    )
    if args.data.packing:
        return pack_examples(enc, args.data.cutoff_len)
    return enc


def is_multimodal(data: List[Dict[str, Any]]) -> bool:
    return any(
        e.get("pixel_values") is not None
        or e.get("pixel_values_videos") is not None
        for e in data
    )


def _rows_to_batch(
    rows: List[Dict[str, np.ndarray]],
    batch_size: int,
    cutoff_len: int,
    pad_id: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Build one fixed-shape [B, cutoff_len] text batch from <= B rows."""
    ids = np.full((batch_size, cutoff_len), pad_id, np.int64)
    labels = np.full((batch_size, cutoff_len), -100, np.int64)
    seg = np.zeros((batch_size, cutoff_len), np.int32)
    for r, e in enumerate(rows):
        L = min(len(e["input_ids"]), cutoff_len)
        ids[r, :L] = e["input_ids"][:L]
        labels[r, :L] = e["labels"][:L]
        seg[r, :L] = e.get(
            "segment_ids", np.ones(len(e["input_ids"]), np.int32)
        )[:L]
    # rope positions restart at every packed-segment boundary (the
    # reference collator computes per-segment mrope positions,
    # data/collator.py:186-196)
    pos = np.zeros((batch_size, cutoff_len), np.int64)
    ar = np.arange(cutoff_len)
    for r in range(batch_size):
        boundary = np.zeros(cutoff_len, bool)
        boundary[0] = True
        boundary[1:] = seg[r, 1:] != seg[r, :-1]
        starts = np.where(boundary, ar, 0)
        last_start = np.maximum.accumulate(starts)
        pos[r] = ar - last_start
    pos3 = np.broadcast_to(pos[None], (3, batch_size, cutoff_len))
    shifted = shift_labels(labels)
    # never supervise across a packed-segment boundary
    cross = np.zeros_like(seg, dtype=bool)
    cross[:, :-1] = seg[:, 1:] != seg[:, :-1]
    shifted[cross] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(shifted),
        "position_ids": jnp.asarray(pos3),
        "segment_ids": jnp.asarray(seg),
        "_n_tokens": np.int64((seg > 0).sum()),
    }


def collate(
    examples: List[Dict[str, np.ndarray]],
    batch_size: int,
    cutoff_len: int,
    pad_id: int = 0,
    seed: int = 0,
    epochs: float = 1.0,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Yield fixed-shape [B, cutoff_len] batches forever up to `epochs`."""
    total, order = _epoch_order(len(examples), batch_size, seed, epochs)
    for b in range(total):
        idxs = order[b * batch_size : (b + 1) * batch_size]
        yield _rows_to_batch(
            [examples[i] for i in idxs], batch_size, cutoff_len, pad_id
        )


def collate_stream(
    encoded: Iterator[Dict[str, np.ndarray]],
    batch_size: int,
    cutoff_len: int,
    pad_id: int = 0,
    seed: int = 0,
    buffer_size: int = 16384,
    packing: bool = False,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Streaming collator: consume a lazy encoded-example iterator, shuffle
    through a `buffer_size` reservoir (the reference's streaming
    dataset.shuffle(buffer_size), data/loader.py:286 + data_args.py:62-65),
    optionally greedy-knapsack-pack each refill window (neat_packing over a
    bounded window instead of the whole map-style dataset), and yield
    fixed-shape batches until the stream is exhausted. The stream restarts
    are the caller's concern (max_steps bounds training in streaming mode).
    """
    from ..data.loader import pack_examples

    rng = np.random.RandomState(seed)
    it = iter(encoded)
    exhausted = False
    carry: List[Dict[str, np.ndarray]] = []  # post-pack tail rows
    while not exhausted:
        window: List[Dict[str, np.ndarray]] = []
        for _ in range(max(buffer_size, batch_size)):
            try:
                window.append(next(it))
            except StopIteration:
                exhausted = True
                break
        if packing and window:
            window = pack_examples(window, cutoff_len, pad_token_id=pad_id)
        rows = carry + window
        if not rows:
            return
        order = rng.permutation(len(rows))
        n_full = len(rows) // batch_size
        for b in range(n_full):
            picked = [rows[i] for i in order[b * batch_size : (b + 1) * batch_size]]
            yield _rows_to_batch(picked, batch_size, cutoff_len, pad_id)
        # tail rows (< batch_size) carry into the next window; the final
        # window's tail rides out as one padded short batch
        carry = [rows[i] for i in order[n_full * batch_size :]]
    if carry:
        yield _rows_to_batch(carry, batch_size, cutoff_len, pad_id)


def _grids_key(grids) -> Optional[tuple]:
    """Hashable static grid signature for jit caching."""
    if grids is None or len(grids) == 0:
        return None
    return tuple(tuple(int(x) for x in g) for g in grids)


def collate_mm(
    examples: List[Dict[str, Any]],
    cfg: InfiniteVLConfig,
    batch_size: int,
    cutoff_len: int,
    pad_id: int = 0,
    seed: int = 0,
    epochs: float = 1.0,
) -> Iterator[tuple]:
    """Multimodal collator: yields (batch, image_grids, video_grids) with the
    batch carrying packed pixel tensors and vision-aware mrope positions from
    get_rope_index — the reference MultiModalDataCollatorForSeq2Seq
    (data/collator.py:124-196). Grids are returned separately because they
    are static jit arguments (one compile per grid signature; keep images
    bucketed to a fixed resolution in training configs)."""
    from ..models.infinitevl import get_rope_index

    total, order = _epoch_order(len(examples), batch_size, seed, epochs)
    for b in range(total):
        idxs = order[b * batch_size : (b + 1) * batch_size]
        ids = np.full((batch_size, cutoff_len), pad_id, np.int64)
        labels = np.full((batch_size, cutoff_len), -100, np.int64)
        am = np.zeros((batch_size, cutoff_len), np.int64)
        pvs, igrids, pvvs, vgrids, spgs = [], [], [], [], []
        for r, i in enumerate(idxs):
            e = examples[i]
            L = min(len(e["input_ids"]), cutoff_len)
            ids[r, :L] = e["input_ids"][:L]
            labels[r, :L] = e["labels"][:L]
            am[r, :L] = 1
            if e.get("pixel_values") is not None:
                pvs.append(e["pixel_values"])
                igrids.extend(map(tuple, e["image_grid_thw"].tolist()))
            if e.get("pixel_values_videos") is not None:
                pvvs.append(e["pixel_values_videos"])
                vgrids.extend(map(tuple, e["video_grid_thw"].tolist()))
                spgs.extend(e["second_per_grid_ts"])
        pos, _ = get_rope_index(
            cfg,
            ids,
            image_grid_thw=np.asarray(igrids) if igrids else None,
            video_grid_thw=np.asarray(vgrids) if vgrids else None,
            second_per_grid_ts=spgs or None,
            attention_mask=am,
        )
        shifted = shift_labels(labels)
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(shifted),
            "position_ids": jnp.asarray(pos),
            # 1 = real token, 0 = padding (masked in attention/delta kernels)
            "segment_ids": jnp.asarray(am.astype(np.int32)),
            "_n_tokens": np.int64(am.sum()),
        }
        if pvs:
            batch["pixel_values"] = jnp.asarray(np.concatenate(pvs))
        if pvvs:
            batch["pixel_values_videos"] = jnp.asarray(np.concatenate(pvvs))
        yield batch, _grids_key(igrids), _grids_key(vgrids)


def build_preference_dataset(
    args: AllArgs, tokenizer=None, kind: str = "pairwise"
) -> List[Dict[str, np.ndarray]]:
    """Pairwise (rm/dpo) or unpaired-feedback (kto) dataset encoding."""
    info_path = os.path.join(args.data.dataset_dir, "dataset_info.json")
    registry = load_dataset_info(info_path)
    names = [n.strip() for n in args.data.dataset.split(",") if n.strip()]
    examples = load_mixed_examples(
        names, registry, args.data.dataset_dir,
        mix_strategy=args.data.mix_strategy,
        interleave_probs=(
            list(args.data.interleave_probs)
            if args.data.interleave_probs else None
        ),
        seed=args.train.seed,
    )
    if args.data.max_samples:
        examples = examples[: args.data.max_samples]
    tokenizer = resolve_tokenizer(args, None, tokenizer)
    if kind == "pairwise":
        return encode_pairwise(
            examples, tokenizer, args.data.template, args.data.cutoff_len
        )
    return encode_kto(
        examples, tokenizer, args.data.template, args.data.cutoff_len
    )


def _pad_rows(rows: List[np.ndarray], cutoff_len: int, fill) -> np.ndarray:
    out = np.full((len(rows), cutoff_len), fill, np.int64)
    for r, row in enumerate(rows):
        L = min(len(row), cutoff_len)
        out[r, :L] = row[:L]
    return out


def _epoch_order(n: int, batch_size: int, seed: int, epochs: float):
    rng = np.random.RandomState(seed)
    total = int(np.ceil(epochs * n / batch_size))
    order: List[int] = []
    for _ in range(int(np.ceil(total * batch_size / n)) + 1):
        order.extend(rng.permutation(n).tolist())
    return total, order


def collate_pairwise(
    examples: List[Dict[str, np.ndarray]],
    batch_size: int,
    cutoff_len: int,
    pad_id: int = 0,
    seed: int = 0,
    epochs: float = 1.0,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Chosen/rejected batches for rm/dpo (reference PairwiseDataCollator,
    data/collator.py:219-253). Labels are next-token shifted; pads stay
    right-aligned so causal attention never sees them from real tokens."""
    total, order = _epoch_order(len(examples), batch_size, seed, epochs)
    ar = np.arange(cutoff_len)
    pos3 = np.broadcast_to(ar[None, None], (3, batch_size, cutoff_len))
    for b in range(total):
        idxs = order[b * batch_size : (b + 1) * batch_size]
        batch = {"position_ids": jnp.asarray(pos3)}
        n_tok = 0
        for side in ("chosen", "rejected"):
            ids = _pad_rows(
                [examples[i][f"{side}_ids"] for i in idxs], cutoff_len, pad_id
            )
            labels = _pad_rows(
                [examples[i][f"{side}_labels"] for i in idxs], cutoff_len, -100
            )
            batch[f"{side}_ids"] = jnp.asarray(ids)
            batch[f"{side}_labels"] = jnp.asarray(shift_labels(labels))
            n_tok += sum(len(examples[i][f"{side}_ids"]) for i in idxs)
        batch["_n_tokens"] = np.int64(n_tok)
        yield batch


def collate_kto(
    examples: List[Dict[str, np.ndarray]],
    batch_size: int,
    cutoff_len: int,
    pad_id: int = 0,
    seed: int = 0,
    epochs: float = 1.0,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Unpaired feedback batches (reference KTODataCollatorWithPadding)."""
    total, order = _epoch_order(len(examples), batch_size, seed, epochs)
    ar = np.arange(cutoff_len)
    pos3 = np.broadcast_to(ar[None, None], (3, batch_size, cutoff_len))
    for b in range(total):
        idxs = order[b * batch_size : (b + 1) * batch_size]
        ids = _pad_rows([examples[i]["input_ids"] for i in idxs], cutoff_len, pad_id)
        labels = _pad_rows([examples[i]["labels"] for i in idxs], cutoff_len, -100)
        yield {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(shift_labels(labels)),
            "position_ids": jnp.asarray(pos3),
            "is_desirable": jnp.asarray(
                np.array([examples[i]["is_desirable"] for i in idxs], bool)
            ),
            "_n_tokens": np.int64(sum(len(examples[i]["input_ids"]) for i in idxs)),
        }


def _maybe_resume(trainer: "Trainer", args: AllArgs) -> None:
    """resume_from_checkpoint: a path, or "auto" to pick up the latest
    checkpoint under output_dir/checkpoints (elastic restart after a
    preemption: relaunching the same yaml continues where it stopped;
    silently starts fresh when none exists yet)."""
    rfc = args.train.resume_from_checkpoint
    if not rfc:
        return
    trainer.resume(None if str(rfc).lower() in ("auto", "true", "1") else rfc)


class Trainer:
    """Step loop with logging + orbax checkpointing + resume."""

    def __init__(
        self,
        step_fn: Callable,  # (params, opt_state, batch) -> (params, opt_state, loss)
        params,
        opt_state,
        output_dir: str,
        logging_steps: int = 10,
        save_steps: int = 5000,
        extra_step_args: tuple = (),
        eval_hook: Optional[Callable] = None,  # (params) -> eval loss
        eval_steps: Optional[int] = None,  # None = once at end of training
        report_to=None,  # tensorboard / wandb / swanlab (ReporterCallback role)
    ):
        self.step_fn = step_fn
        self.params = params
        self.opt_state = opt_state
        self.output_dir = output_dir
        self.logging_steps = logging_steps
        self.save_steps = save_steps
        self.extra = extra_step_args
        self.eval_hook = eval_hook
        self.eval_steps = eval_steps
        self.log = TrainerLog(output_dir)
        from ..utils.logging import make_reporter

        self.reporter = make_reporter(report_to, output_dir)
        self.step = 0

    def evaluate(self):
        """Eval-loss pass over the held-out split (reference
        Seq2SeqTrainer.evaluate + eval_strategy='steps' role)."""
        if self.eval_hook is None or self.step == getattr(self, "_eval_at", -1):
            return None
        self._eval_at = self.step
        el = float(self.eval_hook(self.params))
        self.log.log(self.step, eval_loss=round(el, 6))
        self.reporter.log(self.step, eval_loss=el)
        logger.info(f"step {self.step}: eval_loss={el:.4f}")
        return el

    def resume(self, path: Optional[str] = None):
        ckpt_dir = path or os.path.join(self.output_dir, "checkpoints")
        step, state = restore_train_state(
            ckpt_dir,
            template={"params": self.params, "opt_state": self.opt_state},
        )
        if state is not None:
            self.params = state["params"]
            self.opt_state = state["opt_state"]
            self.step = step
            logger.info(f"resumed from step {step}")

    def save(self):
        save_train_state(
            os.path.join(self.output_dir, "checkpoints"),
            self.step,
            {"params": self.params, "opt_state": self.opt_state},
        )

    def train(self, batches: Iterable, max_steps: Optional[int] = None):
        t0 = time.time()
        tokens = 0
        for item in batches:
            if max_steps is not None and self.step >= max_steps:
                break
            if ABORT_EVENT is not None and ABORT_EVENT.is_set():
                logger.info(f"abort requested at step {self.step}")
                break
            # collators may yield (batch, *static_args) — e.g. grid
            # signatures for the multimodal step's jit cache
            if isinstance(item, tuple):
                batch, statics = item[0], item[1:]
            else:
                batch, statics = item, ()
            # honest tokens/sec: collators report real (non-pad) counts
            ntok = batch.pop("_n_tokens", None)
            if ntok is None:
                ids = batch.get("input_ids")
                ntok = np.prod(ids.shape) if ids is not None else 0
            ntok = int(ntok)
            self.params, self.opt_state, loss = self.step_fn(
                self.params, self.opt_state, *self.extra, batch, *statics
            )
            self.step += 1
            tokens += ntok
            if self.step % self.logging_steps == 0 or self.step == 1:
                lv = float(loss)
                tps = tokens / (time.time() - t0)
                self.log.log(self.step, loss=lv, tokens_per_sec=round(tps, 1))
                self.reporter.log(self.step, loss=lv, tokens_per_sec=tps)
                logger.info(f"step {self.step}: loss={lv:.4f} tps={tps:.0f}")
            if (
                self.eval_hook is not None
                and self.eval_steps
                and self.step % self.eval_steps == 0
            ):
                self.evaluate()
            if self.step % self.save_steps == 0:
                self.save()
        self.evaluate()
        self.save()
        self.log.plot_loss()
        self.reporter.close()
        return self.params


def _make_tx(args: AllArgs, steps: int):
    """Optimizer from TrainArgs, wrapped for gradient accumulation when
    gradient_accumulation_steps > 1 (HF Trainer semantics: one optimizer
    update per k micro-batches). FinetuneArgs.use_optimizer swaps in a
    custom optimizer (galore/apollo/loraplus/badam, trainer_utils.py
    counterparts)."""
    import optax

    if args.finetune.use_optimizer:
        from .optim import make_custom_optimizer

        name = args.finetune.use_optimizer
        kw = {}
        if name in ("galore", "apollo"):
            kw = {
                "rank": args.finetune.optimizer_rank,
                "update_proj_gap": args.finetune.optimizer_update_gap,
            }
        elif name == "loraplus":
            kw = {"lr_ratio": args.finetune.loraplus_lr_ratio,
                  "weight_decay": args.train.weight_decay}
        elif name == "badam":
            kw = {
                "num_blocks": args.finetune.badam_num_blocks,
                "switch_interval": args.finetune.badam_switch_interval,
            }
        tx = optax.chain(
            optax.clip_by_global_norm(args.train.max_grad_norm),
            make_custom_optimizer(name, args.train.learning_rate, **kw),
        )
    else:
        tx = make_optimizer(
            args.train.learning_rate,
            args.train.weight_decay,
            grad_clip=args.train.max_grad_norm,
            warmup_steps=args.train.warmup_steps,
            total_steps=steps,
            schedule=args.train.lr_scheduler_type,
        )
    ga = args.train.gradient_accumulation_steps
    if ga > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=ga)
    return tx


def _maybe_mesh(args: AllArgs):
    """Device mesh from TrainArgs (data_parallel x model_parallel); None for
    the single-chip path. The same rule table the dryrun validates on the
    virtual CPU mesh (parallel/sharding.py)."""
    n = args.train.data_parallel * args.train.model_parallel
    if n <= 1:
        return None
    from ..parallel.sharding import create_mesh

    return create_mesh(
        data=args.train.data_parallel, model=args.train.model_parallel
    )


def _shard_tree(params, mesh, param_mode: str):
    if mesh is None:
        return params
    from ..parallel.sharding import shard_params

    return shard_params(params, mesh, param_mode=param_mode)


def _shard_batches(batches, mesh):
    """Wrap a batch iterator: data tensors shard over the mesh's data axis
    (batch dim), packed pixel tensors replicate (their rows don't align with
    the batch dim), statics pass through."""
    if mesh is None:
        yield from batches
        return
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import DATA

    def place(k, v):
        if k == "_n_tokens" or not hasattr(v, "ndim"):
            return v
        if k == "position_ids":
            spec = P(None, DATA, None)
        elif k in ("pixel_values", "pixel_values_videos"):
            spec = P()  # packed patch rows; replicate
        elif v.ndim >= 1:
            spec = P(DATA, *([None] * (v.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(v, NamedSharding(mesh, spec))

    for item in batches:
        if isinstance(item, tuple):
            batch, rest = item[0], item[1:]
        else:
            batch, rest = item, ()
        batch = {k: place(k, v) for k, v in batch.items()}
        yield (batch, *rest) if rest else batch


def _load_or_init_params(args: AllArgs, cfg, mm: bool, dtype):
    """Full (text+visual) tree for multimodal training, text-only otherwise."""
    if args.model.model_name_or_path:
        full = load_hf_checkpoint(args.model.model_name_or_path, cfg, dtype)
        return full if mm else {"text": full["text"]}
    key = jax.random.PRNGKey(args.train.seed)
    if mm:
        return init_params(key, cfg, dtype)
    return {"text": init_text_params(key, cfg.text, dtype)}


def _batches(args: AllArgs, data, cfg, mm: bool):
    # HF semantics: global batch = per_device * data_parallel replicas
    B = args.train.per_device_train_batch_size * max(args.train.data_parallel, 1)
    if args.data.streaming:
        return collate_stream(
            data,
            B,
            args.data.cutoff_len,
            seed=args.train.seed,
            buffer_size=args.data.buffer_size,
            packing=args.data.packing,
        )
    if mm:
        return collate_mm(
            data,
            cfg,
            B,
            args.data.cutoff_len,
            seed=args.train.seed,
            epochs=args.train.num_train_epochs,
        )
    return collate(
        data,
        B,
        args.data.cutoff_len,
        seed=args.train.seed,
        epochs=args.train.num_train_epochs,
    )


def _split_val(args: AllArgs, data, mm: bool):
    """Carve the val_size held-out split off the training data (reference
    data_args.py:144-156 + get_dataset's train_test_split). Fractional
    val_size samples a seeded permutation; integer val_size >= 1 takes an
    absolute count (for streaming: peeled off the head of the stream, the
    datasets.take/skip pattern). Text-only — multimodal eval batches carry
    static grid args and are skipped with a warning."""
    vs = args.data.val_size
    if not vs:
        return data, None
    if mm:
        logger.warning("val_size eval is text-only; skipped for multimodal data")
        return data, None
    if args.data.streaming:
        import itertools

        it = iter(data)
        eval_data = list(itertools.islice(it, int(vs)))
        return it, eval_data
    n = len(data)
    n_val = int(vs) if vs >= 1 else max(1, int(n * vs))
    n_val = min(n_val, n - 1)
    order = np.random.RandomState(args.train.seed).permutation(n)
    eval_data = [data[i] for i in order[:n_val]]
    train_data = [data[i] for i in order[n_val:]]
    return train_data, eval_data


def _eval_hook_factory(args: AllArgs, eval_data, eval_fn, extra: tuple = ()):
    """Token-weighted mean loss over the held-out split; `eval_fn` is a
    jitted (params, *extra, batch) -> scalar loss."""
    B = (
        args.train.per_device_eval_batch_size
        or args.train.per_device_train_batch_size
    )

    def hook(params):
        tot, n = 0.0, 0
        for batch in collate(eval_data, B, args.data.cutoff_len, seed=0):
            ntok = int(batch.pop("_n_tokens"))
            tot += float(eval_fn(params, *extra, batch)) * ntok
            n += ntok
        return tot / max(n, 1)

    return hook


def predict_and_score(params, cfg, data, tokenizer, args: AllArgs):
    """predict_with_generate analogue (reference train/sft/workflow.py
    predict path + train/sft/metric.py ComputeSimilarity): greedy-generate
    each example's prompt, score BLEU-4/ROUGE vs the gold completion, write
    generated_predictions.jsonl + predict_results.json to output_dir."""
    import json as _json

    from ..eval.text_metrics import compute_similarity
    from ..generation import Generator

    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    gen = Generator(params, cfg, dtype=dtype)
    preds, refs, rows = [], [], []
    for ex in data[: args.train.predict_samples]:
        ids = np.asarray(ex["input_ids"])
        labels = np.asarray(ex["labels"])
        sup = np.where(labels != -100)[0]
        if len(sup) == 0 or sup[0] == 0:
            continue
        cut = int(sup[0])
        # score only the FIRST assistant span: the generation prompt ends
        # before turn 1, so comparing against a concatenation of all later
        # turns would deflate the metrics on multi-turn examples
        after = labels[cut:]
        span_end = np.argmax(after == -100) if (after == -100).any() else len(after)
        gold = [int(t) for t in after[:span_end]]
        out = gen.generate(
            ids[None, :cut],
            max_new_tokens=min(len(gold) + 8, args.gen.max_new_tokens),
            temperature=0.0,
        )
        pred = tokenizer.decode(out[0].tolist(), skip_special_tokens=True)
        ref = tokenizer.decode(gold, skip_special_tokens=True)
        preds.append(pred)
        refs.append(ref)
        rows.append({"predict": pred, "label": ref})
    scores = compute_similarity(preds, refs)
    scores["samples"] = len(rows)
    os.makedirs(args.train.output_dir, exist_ok=True)
    with open(
        os.path.join(args.train.output_dir, "generated_predictions.jsonl"), "w"
    ) as f:
        for row in rows:
            f.write(_json.dumps(row, ensure_ascii=False) + "\n")
    with open(
        os.path.join(args.train.output_dir, "predict_results.json"), "w"
    ) as f:
        _json.dump(scores, f, indent=2)
    return scores


def _run_sft_pipeline(args: AllArgs, cfg, data, tokenizer, mm: bool, dtype):
    """Pipelined SFT/PT: `pipeline_stages` + `n_microbatches` yaml knobs
    drive parallel/pipeline.make_pp_sft_train_step over a
    (pipe, data, model) mesh. The reference exposes every parallelism mode
    through yaml+config (examples/deepspeed/*.json, accelerate fsdp yaml);
    this is the PP entry of that surface. Text-only full finetuning — the
    stage stacker cuts the DECODER at hybrid-period granularity, and
    LoRA/freeze masking is per-layer-indexed, which the stacked layout
    does not expose."""
    from ..parallel.pipeline import (
        create_pp_mesh,
        make_pp_sft_train_step,
        shard_pp_params,
        stack_stage_params,
        unstack_stage_params,
    )

    tcfg = cfg.text
    if mm:
        raise ValueError(
            "pipeline_stages > 1 is text-only (the ViT is not stage-cut); "
            "train multimodal recipes with data/model parallelism instead"
        )
    if args.finetune.finetuning_type != "full":
        raise ValueError(
            "pipeline_stages > 1 requires finetuning_type: full (stage-"
            "stacked params have no per-layer adapter/freeze indexing)"
        )
    if args.model.quantization_bit is not None:
        raise ValueError("pipeline_stages > 1 does not compose with QLoRA")
    S, M = args.train.pipeline_stages, args.train.n_microbatches
    axis = args.train.pp_microbatch_axis
    if axis not in ("batch", "sequence"):
        raise ValueError(
            f"unknown pp_microbatch_axis {axis!r} (batch | sequence)"
        )
    if axis == "sequence":
        if args.train.pipeline_schedule != "gpipe":
            raise ValueError(
                "pp_microbatch_axis: sequence supports the gpipe schedule "
                "only (the 1f1b hand-schedule is batch-axis)"
            )
        T = args.data.cutoff_len
        if T % M or (T // M) % tcfg.sliding_window:
            raise ValueError(
                f"sequence microbatching needs cutoff_len ({T}) divisible "
                f"by n_microbatches ({M}) into chunks that are multiples "
                f"of the sliding window ({tcfg.sliding_window})"
            )
    else:
        B = args.train.per_device_train_batch_size * max(
            args.train.data_parallel, 1
        )
        if B % M:
            raise ValueError(
                f"global batch {B} (= per_device x data_parallel) must be "
                f"divisible by n_microbatches {M}"
            )
    mesh = create_pp_mesh(
        pipe=S,
        data=args.train.data_parallel,
        model=args.train.model_parallel,
    )
    params = _load_or_init_params(args, cfg, mm, dtype)
    pp = {"text": stack_stage_params(params["text"], tcfg, S)}
    pp = shard_pp_params(pp, mesh, param_mode=args.train.param_mode)
    steps = args.train.max_steps or int(
        np.ceil(
            args.train.num_train_epochs
            * len(data)
            / args.train.per_device_train_batch_size
        )
    )
    tx = _make_tx(args, steps)
    opt_state = tx.init(pp)
    if axis == "sequence":
        from ..parallel.pipeline_seq import make_seq_pp_sft_train_step

        raw_step = make_seq_pp_sft_train_step(
            tcfg, tx, n_microbatches=M, mesh=mesh, remat=args.train.remat
        )
    else:
        raw_step = make_pp_sft_train_step(
            tcfg, tx, n_microbatches=M, mesh=mesh, remat=args.train.remat,
            schedule=args.train.pipeline_schedule,
        )
    step_fn = jax.jit(raw_step, donate_argnums=(0, 1))
    trainer = Trainer(
        step_fn, pp, opt_state, args.train.output_dir,
        args.train.logging_steps, args.train.save_steps,
        report_to=args.train.report_to,
    )
    _maybe_resume(trainer, args)
    final = trainer.train(
        _shard_batches(_batches(args, data, cfg, mm), mesh), max_steps=steps
    )
    merged = {"text": unstack_stage_params(final["text"])}
    if args.train.do_predict and not args.data.streaming:
        predict_and_score(merged, cfg, data, tokenizer, args)
    return merged


def run_sft(args: AllArgs, tokenizer=None):
    """SFT / PT workflow: text-only or multimodal, full / freeze / lora
    finetuning (reference train/sft/workflow.py + model/adapter.py)."""
    cfg = build_config(args)
    tcfg = cfg.text
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    # one tokenizer instance for the whole workflow: SimpleTokenizer grows
    # its vocab while encoding, so do_predict must decode with the SAME
    # instance that encoded the dataset (a fresh one maps everything to
    # <unk> and the similarity scores become fiction)
    tokenizer = resolve_tokenizer(args, cfg, tokenizer)
    data = build_dataset(args, tokenizer, cfg=cfg)
    # streaming data is a lazy iterator (text-only by construction) — it
    # must not be consumed before the training loop
    mm = False if args.data.streaming else is_multimodal(data)
    data, eval_data = _split_val(args, data, mm)
    if args.train.pipeline_stages > 1:
        return _run_sft_pipeline(args, cfg, data, tokenizer, mm, dtype)
    mesh = _maybe_mesh(args)
    params = _load_or_init_params(args, cfg, mm, dtype)
    if args.model.quantization_bit is not None:
        # QLoRA: int8 frozen base + rank-r adapters (reference
        # model_args.py:191 quantization_bit / bnb NF4; here per-channel
        # int8, models/quant.py). Halves the frozen base's HBM footprint,
        # which is what lets 64K-context LoRA fit one 16 GB v5e.
        if args.model.quantization_bit != 8:
            raise ValueError(
                "only quantization_bit: 8 is supported for TRAINING "
                "(QLoRA); int4 is a serving-only mode (cli chat/api, "
                "Generator(quant='int4'))"
            )
        if args.finetune.finetuning_type != "lora":
            raise ValueError(
                "quantization_bit requires finetuning_type: lora (the "
                "quantized base is frozen; int8 leaves carry no gradients)"
            )
        from ..models.quant import quantize_params

        params = quantize_params(params)
    params = _shard_tree(params, mesh, args.train.param_mode)
    steps = args.train.max_steps or int(
        np.ceil(args.train.num_train_epochs * len(data) / args.train.per_device_train_batch_size)
    )
    tx = _make_tx(args, steps)
    ft = args.finetune.finetuning_type
    if ft == "lora":
        from .lora import init_lora, make_lora_sft_step, merge_lora

        lora = init_lora(
            params,
            jax.random.PRNGKey(args.train.seed + 1),
            rank=args.finetune.lora_rank,
            target=args.finetune.lora_target,
            use_dora=args.finetune.use_dora,
        )
        # scan-over-layers: restack the text tree host-side so the jitted
        # step's ARGS are the stacked layout (stacking in-graph would copy
        # the weights); DoRA keeps the per-layer loop (its factored norm
        # math is 2D-kernel-shaped)
        scan_period = None
        use_scan = args.train.scan_layers
        if use_scan is None:
            # auto: the python loop holds every layer's hoisted remat
            # recompute at once and OOMs one v5e from 16K with a bf16 base
            # (18.8 GB); below 16K it is ~13-16% faster than the scan.
            # (An earlier int8-base exception — the loop fits 16K again
            # under QLoRA and beat the then-nested scan 3474 vs 2994
            # tok/s — died with remat_mode=auto: the layer-checkpointed
            # scan measures 3495 tok/s at 16K int8, probe_remat_mode.py.)
            use_scan = args.data.cutoff_len >= 16384
        if args.train.remat and use_scan and not args.finetune.use_dora:
            from ..models.stacked import detect_period, stack_layer_params

            scan_period = detect_period(cfg.text.layer_types)
            if scan_period is not None and scan_period < tcfg.num_hidden_layers:

                def _stack(tree):
                    if "text" in tree:
                        return {
                            **tree,
                            "text": stack_layer_params(tree["text"], scan_period),
                        }
                    return stack_layer_params(tree, scan_period)

                params = _stack(params)
                lora = _stack(lora)
            else:
                scan_period = None
        # adapters are small: replicate them over the mesh
        lora = _shard_tree(lora, mesh, "replicated")
        opt_state = tx.init(lora)
        step_fn = jax.jit(
            make_lora_sft_step(
                cfg,
                tx,
                alpha=args.finetune.lora_alpha,
                rank=args.finetune.lora_rank,
                remat=args.train.remat,
                remat_group=args.train.remat_group,
                remat_barrier=args.train.remat_barrier,
                use_rslora=args.finetune.use_rslora,
                scan_unroll=args.train.scan_unroll,
                remat_mode=args.train.remat_mode,
            ),
            static_argnums=(4, 5),
            donate_argnums=(0, 1),
        )
        eval_hook = None
        if eval_data:
            from .lora import make_lora_eval_fn

            eval_fn = jax.jit(make_lora_eval_fn(
                cfg, alpha=args.finetune.lora_alpha,
                rank=args.finetune.lora_rank,
                use_rslora=args.finetune.use_rslora,
            ))
            eval_hook = _eval_hook_factory(
                args, eval_data, lambda l, b, _f=eval_fn: _f(l, params, b)
            )
        trainer = Trainer(
            step_fn, lora, opt_state, args.train.output_dir,
            args.train.logging_steps, args.train.save_steps,
            extra_step_args=(params,),
            eval_hook=eval_hook, eval_steps=args.train.eval_steps,
        report_to=args.train.report_to,
        )
        _maybe_resume(trainer, args)
        lora = trainer.train(
            _shard_batches(_batches(args, data, cfg, mm), mesh), max_steps=steps
        )
        merged = merge_lora(
            params, lora, alpha=args.finetune.lora_alpha,
            rank=args.finetune.lora_rank, use_rslora=args.finetune.use_rslora
        )
        if scan_period is not None:
            from ..models.stacked import unstack_layer_params

            merged = {
                **merged,
                "text": unstack_layer_params(
                    merged["text"], scan_period, tcfg.num_hidden_layers
                ),
            }
        if args.train.do_predict and not mm and not args.data.streaming:
            predict_and_score(merged, cfg, data, tokenizer, args)
        return merged
    if ft == "freeze":
        # train only the last freeze_trainable_layers decoder layers
        # (reference _setup_freeze_tuning, model/adapter.py:60-128)
        n = tcfg.num_hidden_layers
        k = args.finetune.freeze_trainable_layers
        mask = jax.tree.map(lambda _: False, params)
        mask["text"]["layers"] = [
            jax.tree.map(lambda _: i >= n - k, lp)
            for i, lp in enumerate(params["text"]["layers"])
        ]
        tx = apply_trainable_mask(tx, mask)
    elif ft != "full":
        raise ValueError(f"unknown finetuning_type {ft!r} (full | freeze | lora)")
    opt_state = tx.init(params)
    if mm:
        step_fn = jax.jit(
            make_mm_sft_train_step(
                cfg, tx, remat=args.train.remat,
                remat_group=args.train.remat_group,
                remat_barrier=args.train.remat_barrier,
                scan_unroll=args.train.scan_unroll,
                remat_mode=args.train.remat_mode,
            ),
            static_argnums=(3, 4),
            donate_argnums=(0, 1),
        )
    else:
        step_fn = jax.jit(
            make_sft_train_step(
                tcfg, tx, remat=args.train.remat,
                remat_group=args.train.remat_group,
                remat_barrier=args.train.remat_barrier,
                scan_unroll=args.train.scan_unroll,
                remat_mode=args.train.remat_mode,
            ),
            donate_argnums=(0, 1),
        )
    eval_hook = None
    if eval_data:
        from .step import make_sft_eval_fn

        eval_hook = _eval_hook_factory(
            args, eval_data, jax.jit(make_sft_eval_fn(tcfg))
        )
    trainer = Trainer(
        step_fn, params, opt_state, args.train.output_dir,
        args.train.logging_steps, args.train.save_steps,
        eval_hook=eval_hook, eval_steps=args.train.eval_steps,
        report_to=args.train.report_to,
    )
    _maybe_resume(trainer, args)
    final = trainer.train(
        _shard_batches(_batches(args, data, cfg, mm), mesh), max_steps=steps
    )
    if args.train.do_predict and not mm and not args.data.streaming:
        # text-only scoring (the reference's predict path is text decode too)
        predict_and_score(final, cfg, data, tokenizer, args)
    return final


def run_dt(args: AllArgs, tokenizer=None, teacher_params=None, teacher_cfg=None):
    """Distillation-training stage 1 or 2 (train/dt/workflow.py:44-263).

    The teacher is the dense full-attention VLM being converted (Qwen2.5-VL
    in the reference); on multimodal data the ViT is shared between teacher
    and student and stays frozen — only the student's mixers train."""
    cfg = build_config(args)
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    key = jax.random.PRNGKey(args.train.seed)
    data = build_dataset(args, tokenizer, cfg=cfg)
    mm = is_multimodal(data)
    if teacher_params is None:
        # teacher: dense full-attention twin of the text config
        teacher_cfg = dataclasses.replace(
            cfg.text,
            layer_types=("full_attention",) * cfg.text.num_hidden_layers,
        )
        if args.finetune.teacher_model_path:
            full = load_hf_checkpoint(
                args.finetune.teacher_model_path,
                dataclasses.replace(cfg, text=teacher_cfg),
                dtype,
            )
            teacher_params = full if mm else full["text"]
        elif mm:
            teacher_params = init_params(
                key, dataclasses.replace(cfg, text=teacher_cfg), dtype
            )
        else:
            teacher_params = init_text_params(key, teacher_cfg, dtype)
    t_text = (
        teacher_params["text"] if "text" in teacher_params else teacher_params
    )
    if mm and "visual" not in teacher_params:
        raise ValueError(
            "multimodal distillation needs a teacher with a visual tree; "
            "pass a full checkpoint via teacher_model_path"
        )
    student_params, student_cfg = convert_attention(
        t_text,
        teacher_cfg,
        jax.random.fold_in(key, 1),
        softmax_attention=args.finetune.softmax_attention,
        mixer=args.finetune.mixer,
    )
    if args.finetune.checkpoint_path:
        # stage handoff: load previous stage weights, keeping preserved
        # softmax layers pristine (dt/workflow.py:57-75)
        _, prev = restore_train_state(args.finetune.checkpoint_path)
        if prev is not None:
            update = filter_softmax_layers(
                prev["params"], args.finetune.softmax_attention
            )
            student_params = merge_params(student_params, update)

    steps = args.train.max_steps or int(
        np.ceil(args.train.num_train_epochs * len(data) / args.train.per_device_train_batch_size)
    )
    tx = _make_tx(args, steps)
    full_cfg = cfg if mm else None
    if args.finetune.distill_stage == 1:
        mask = trainable_mask(
            student_params,
            student_cfg,
            args.finetune.distill_weights,
            args.finetune.softmax_attention,
        )
        tx = apply_trainable_mask(tx, mask)
        # no donation: preserved layers alias the teacher's arrays
        step_fn = jax.jit(
            make_stage1_step(
                student_cfg, teacher_cfg, tx, args.finetune.mse_factor,
                full_cfg=full_cfg,
            ),
            static_argnums=(4, 5),
        )
    else:
        step_fn = jax.jit(
            make_stage2_step(
                student_cfg, teacher_cfg, tx, args.finetune.distill_temperature,
                full_cfg=full_cfg,
            ),
            static_argnums=(4, 5),
        )
    mesh = _maybe_mesh(args)
    student_params = _shard_tree(student_params, mesh, args.train.param_mode)
    teacher_params = _shard_tree(teacher_params, mesh, args.train.param_mode)
    opt_state = tx.init(student_params)
    trainer = Trainer(
        step_fn,
        student_params,
        opt_state,
        args.train.output_dir,
        args.train.logging_steps,
        args.train.save_steps,
        extra_step_args=(teacher_params,),
    )
    return trainer.train(
        _shard_batches(_batches(args, data, cfg, mm), mesh), max_steps=steps
    )


def _policy_params(args: AllArgs, cfg, dtype):
    if args.model.model_name_or_path:
        return load_hf_checkpoint(args.model.model_name_or_path, cfg, dtype)["text"]
    return init_text_params(jax.random.PRNGKey(args.train.seed), cfg.text, dtype)


def run_rm(args: AllArgs, tokenizer=None):
    """Reward-model training: decoder + scalar value head over pairwise data
    (reference train/rm/workflow.py)."""
    from .dpo import make_rm_step

    cfg = build_config(args)
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    data = build_preference_dataset(args, tokenizer, kind="pairwise")
    params = _policy_params(args, cfg, dtype)
    params["value_head"] = {
        "kernel": (
            jax.random.normal(
                jax.random.PRNGKey(args.train.seed + 2),
                (cfg.text.hidden_size, 1),
            )
            * 0.02
        ).astype(dtype)
    }
    steps = args.train.max_steps or int(
        np.ceil(args.train.num_train_epochs * len(data) / args.train.per_device_train_batch_size)
    )
    tx = _make_tx(args, steps)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_rm_step(cfg.text, tx), donate_argnums=(0, 1))
    trainer = Trainer(
        step_fn, params, opt_state, args.train.output_dir,
        args.train.logging_steps, args.train.save_steps,
        report_to=args.train.report_to,
    )
    _maybe_resume(trainer, args)
    batches = collate_pairwise(
        data, args.train.per_device_train_batch_size, args.data.cutoff_len,
        seed=args.train.seed, epochs=args.train.num_train_epochs,
    )
    return trainer.train(batches, max_steps=steps)


def run_dpo(args: AllArgs, tokenizer=None):
    """DPO-family preference optimization (reference train/dpo/workflow.py).
    The frozen reference model is the initial policy tree — functional
    updates never mutate it, so no copy is needed."""
    from .dpo import make_dpo_step

    cfg = build_config(args)
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    data = build_preference_dataset(args, tokenizer, kind="pairwise")
    policy = _policy_params(args, cfg, dtype)
    ref_params = policy  # frozen snapshot (pytree values are immutable)
    steps = args.train.max_steps or int(
        np.ceil(args.train.num_train_epochs * len(data) / args.train.per_device_train_batch_size)
    )
    tx = _make_tx(args, steps)
    opt_state = tx.init(policy)
    step_fn = jax.jit(
        make_dpo_step(
            cfg.text, tx,
            beta=args.finetune.pref_beta,
            loss_type=args.finetune.pref_loss,
        ),
    )
    trainer = Trainer(
        step_fn, policy, opt_state, args.train.output_dir,
        args.train.logging_steps, args.train.save_steps,
        extra_step_args=(ref_params,),
        report_to=args.train.report_to,
    )
    _maybe_resume(trainer, args)
    batches = collate_pairwise(
        data, args.train.per_device_train_batch_size, args.data.cutoff_len,
        seed=args.train.seed, epochs=args.train.num_train_epochs,
    )
    return trainer.train(batches, max_steps=steps)


def run_kto(args: AllArgs, tokenizer=None):
    """KTO unpaired-feedback stage (reference train/kto/workflow.py)."""
    from .dpo import make_kto_step

    cfg = build_config(args)
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    data = build_preference_dataset(args, tokenizer, kind="kto")
    policy = _policy_params(args, cfg, dtype)
    ref_params = policy
    steps = args.train.max_steps or int(
        np.ceil(args.train.num_train_epochs * len(data) / args.train.per_device_train_batch_size)
    )
    tx = _make_tx(args, steps)
    opt_state = tx.init(policy)
    step_fn = jax.jit(
        make_kto_step(cfg.text, tx, beta=args.finetune.pref_beta)
    )
    trainer = Trainer(
        step_fn, policy, opt_state, args.train.output_dir,
        args.train.logging_steps, args.train.save_steps,
        extra_step_args=(ref_params,),
        report_to=args.train.report_to,
    )
    _maybe_resume(trainer, args)
    batches = collate_kto(
        data, args.train.per_device_train_batch_size, args.data.cutoff_len,
        seed=args.train.seed, epochs=args.train.num_train_epochs,
    )
    return trainer.train(batches, max_steps=steps)


def run_exp(args: AllArgs, tokenizer=None):
    """Stage dispatch (tuner.py:53-110)."""
    stage = args.finetune.stage
    if stage in ("sft", "pt"):
        return run_sft(args, tokenizer)
    if stage == "dt":
        return run_dt(args, tokenizer)
    if stage == "rm":
        return run_rm(args, tokenizer)
    if stage == "dpo":
        return run_dpo(args, tokenizer)
    if stage == "kto":
        return run_kto(args, tokenizer)
    if stage == "ppo":
        return run_ppo(args, tokenizer)
    raise NotImplementedError(
        f"unknown stage {stage!r} (pt | sft | dt | rm | dpo | kto | ppo)"
    )


def run_ppo(args: AllArgs, tokenizer=None):
    from .ppo import run_ppo as _run

    return _run(args, tokenizer)
