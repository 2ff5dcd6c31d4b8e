"""ADM-suite evaluation front-end: FID / sFID / IS / Precision / Recall.

Equivalent of `/root/reference/evaluations/c2i/evaluator.py`:

  python -m llamagen_tpu.cli.evaluate ref_batch.npz sample_batch.npz \
      --inception-weights /path/to/pt_inception-2015-12-05.pt

Reads image npz batches (`arr_0` uint8 [N, H, W, 3]), extracts Inception
pool3 + logits features with the JAX InceptionV3 port
(`llamagen_tpu.eval.inception`), and reports the metric panel. Writes a
`.txt` next to the sample npz like the reference (evaluator.py:65-72).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from llamagen_tpu.eval.fid import (activation_statistics, frechet_distance,
                                   inception_score, precision_recall)


def load_npz(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z["arr_0"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ref_batch")
    p.add_argument("sample_batch")
    p.add_argument("--inception-weights", default=None,
                   help="pytorch-fid InceptionV3 state dict (.pt)")
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args(argv)

    from llamagen_tpu.eval import inception

    extractor = inception.FeatureExtractor(args.inception_weights,
                                           batch_size=args.batch_size)

    print("computing reference batch activations...")
    ref = load_npz(args.ref_batch)
    ref_pool, ref_spatial, _ = extractor.features(ref)
    print("computing sample batch activations...")
    sample = load_npz(args.sample_batch)
    pool, spatial, logits = extractor.features(sample)

    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    is_score = inception_score(probs)

    fid = frechet_distance(*activation_statistics(ref_pool),
                           *activation_statistics(pool))
    sfid = frechet_distance(*activation_statistics(ref_spatial),
                            *activation_statistics(spatial))
    prec, recall = precision_recall(ref_pool, pool)

    lines = [
        f"Inception Score: {is_score:.5f}",
        f"FID: {fid:.5f}",
        f"sFID: {sfid:.5f}",
        f"Precision: {prec:.5f}",
        f"Recall: {recall:.5f}",
    ]
    print("\n".join(lines))
    txt_path = args.sample_batch.replace(".npz", ".txt")
    with open(txt_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {txt_path}")


if __name__ == "__main__":
    main()
