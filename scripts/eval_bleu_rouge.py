"""Score generated predictions with BLEU-4 / ROUGE (reference
scripts/eval_bleu_rouge.py): reads a jsonl with "predict" and "label"
fields (the format written by generation runs) and prints corpus-average
metrics.

Usage: python scripts/eval_bleu_rouge.py predictions.jsonl
"""

import json
import sys


def main(path: str) -> None:
    sys.path.insert(0, ".")
    from infinitevl_tpu.eval.text_metrics import compute_similarity

    preds, refs = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            preds.append(row["predict"])
            refs.append(row["label"])
    scores = compute_similarity(preds, refs)
    scores["samples"] = len(preds)
    print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    main(sys.argv[1])
