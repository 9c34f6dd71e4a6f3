"""Command-line interface.

Reference: src/llamafactory/cli.py:75-127 — subcommands train / chat / api /
eval / export / version. Multi-host launch is `jax.distributed` env-driven
rather than a torchrun respawn."""

from __future__ import annotations

import json
import sys

USAGE = """infinitevl-tpu CLI
  python -m infinitevl_tpu.cli train <config.yaml>   # pt/sft/dt stages
  python -m infinitevl_tpu.cli chat <config.yaml>    # interactive CLI chat
  python -m infinitevl_tpu.cli api <config.yaml>     # OpenAI-compatible server
  python -m infinitevl_tpu.cli eval <config.yaml>    # MCQ evaluator
  python -m infinitevl_tpu.cli export <config.yaml>  # HF safetensors export
  python -m infinitevl_tpu.cli board [port]          # training web board
  python -m infinitevl_tpu.cli bench                 # run bench.py metrics
  python -m infinitevl_tpu.cli version
"""


def _load(config_path: str):
    from .hparams import load_yaml_args

    return load_yaml_args(config_path)


def _build_generator(args):
    import jax
    import jax.numpy as jnp

    from .generation import Generator
    from .models.params import init_params, load_hf_checkpoint
    from .train.trainer import build_config

    cfg = build_config(args)
    dtype = jnp.bfloat16 if args.train.bf16 else jnp.float32
    if args.model.model_name_or_path:
        params = load_hf_checkpoint(args.model.model_name_or_path, cfg, dtype)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg, dtype)
    quant = {8: "int8", 4: "int4"}.get(args.model.quantization_bit)
    return (
        Generator(
            params, cfg, dtype=dtype, quant=quant,
            quant_group_size=args.model.quantization_group_size,
            quant_embed=args.model.quantization_embed,
        ),
        cfg,
    )


def _tokenizer(args, cfg=None):
    """HF tokenizer when checkpoint files exist; SimpleTokenizer otherwise."""
    from .data.loader import resolve_tokenizer

    if cfg is None:
        from .train.trainer import build_config

        cfg = build_config(args)
    return resolve_tokenizer(args, cfg)


def cmd_train(config_path: str):
    from .parallel.sharding import maybe_init_distributed
    from .train.trainer import run_exp

    maybe_init_distributed()  # env-driven multi-host; no-op single-host
    args = _load(config_path)
    run_exp(args, tokenizer=_tokenizer(args))


def cmd_chat(config_path: str):
    from .data.template import get_template

    args = _load(config_path)
    gen, cfg = _build_generator(args)
    tok = _tokenizer(args)
    template = get_template(args.data.template)
    import numpy as np

    history = []
    print("Interactive chat. Type 'exit' to quit, 'clear' to reset history.")
    while True:
        try:
            user = input("\nUser: ").strip()
        except EOFError:
            break
        if user == "exit":
            break
        if user == "clear":
            history = []
            continue
        history.append({"role": "user", "content": user})
        prompt = template.render_prompt(history)
        ids = np.asarray([tok.encode(prompt, add_special_tokens=False)])
        greedy = not args.gen.do_sample or args.gen.temperature == 0.0
        if args.gen.num_beams > 1:
            if not greedy or args.gen.repetition_penalty != 1.0:
                raise ValueError(
                    "num_beams > 1 is greedy beam search; disable "
                    "do_sample / repetition_penalty"
                )
            out = gen.generate_beam(
                ids,
                num_beams=args.gen.num_beams,
                max_new_tokens=args.gen.max_new_tokens,
                length_penalty=args.gen.length_penalty,
            )
        elif args.gen.draft_k > 0 and greedy and args.gen.repetition_penalty == 1.0:
            from .speculative import SpecStats

            spec_stats = SpecStats()
            out = gen.generate_speculative(
                ids,
                max_new_tokens=args.gen.max_new_tokens,
                draft_k=args.gen.draft_k,
                stats=spec_stats,
            )
            if spec_stats.forwards:
                print(f"[{spec_stats.summary()}]")
        else:
            out = gen.generate(
                ids,
                max_new_tokens=args.gen.max_new_tokens,
                temperature=args.gen.temperature if args.gen.do_sample else 0.0,
                top_k=args.gen.top_k,
                top_p=args.gen.top_p,
                repetition_penalty=args.gen.repetition_penalty,
            )
        text = tok.decode(out[0], skip_special_tokens=True)
        history.append({"role": "assistant", "content": text})
        print(f"Assistant: {text}")


def cmd_api(config_path: str, port: int = 8000):
    from .serve.api import ChatBackend, run_api

    args = _load(config_path)
    gen, cfg = _build_generator(args)
    backend = ChatBackend(
        gen, _tokenizer(args), args.data.template, draft_k=args.gen.draft_k
    )
    run_api(backend, port=port)


def cmd_eval(config_path: str):
    from .eval.mcq import MCQEvaluator

    args = _load(config_path)
    gen, cfg = _build_generator(args)
    evaluator = MCQEvaluator(
        gen, _tokenizer(args), batch_size=args.eval.eval_batch_size,
        lang=args.eval.lang,
    )
    import os

    task_path = os.path.join(args.data.dataset_dir, f"{args.data.dataset}.json")
    with open(task_path) as f:
        task = json.load(f)
    if isinstance(task, dict):
        # MMLU-style {subject: {dev, test}} benchmark with few-shot support
        metrics = evaluator.evaluate_task(task, n_shot=args.eval.n_shot)
    else:
        metrics = evaluator.evaluate(task)
    out = json.dumps(metrics, indent=2)
    print(out)
    if args.eval.eval_save_dir:
        os.makedirs(args.eval.eval_save_dir, exist_ok=True)
        with open(os.path.join(args.eval.eval_save_dir, "results.json"), "w") as f:
            f.write(out)


def cmd_export(config_path: str):
    import os

    from .data.template import get_ollama_modelfile, get_template
    from .utils.checkpoint import export_hf_safetensors

    args = _load(config_path)
    gen, cfg = _build_generator(args)
    out = args.train.output_dir
    export_hf_safetensors(gen.params, cfg, out)
    with open(os.path.join(out, "Modelfile"), "w") as f:
        f.write(get_ollama_modelfile(get_template(args.data.template)))
    print(f"exported HF safetensors + ollama Modelfile to {out}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(USAGE)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "version":
        from . import __version__

        print(__version__)
        return 0
    if cmd == "bench":
        import runpy

        from .parallel.sharding import maybe_init_distributed

        maybe_init_distributed()
        runpy.run_path("bench.py", run_name="__main__")
        return 0
    if cmd == "board":
        from .serve.webui import run_board

        run_board(port=int(rest[0]) if rest else 7860)
        return 0
    if cmd in ("train", "chat", "api", "eval", "export"):
        if not rest:
            print(f"error: {cmd} requires a config.yaml path\n{USAGE}")
            return 2
        fn = {
            "train": cmd_train,
            "chat": cmd_chat,
            "api": cmd_api,
            "eval": cmd_eval,
            "export": cmd_export,
        }[cmd]
        fn(*rest[:1])
        return 0
    print(f"unknown command {cmd!r}\n{USAGE}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
