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
import zipfile

import numpy as np

from llamagen_tpu.eval.fid import (activation_statistics, frechet_distance,
                                   inception_score, precision_recall)


def stream_npz(path: str, key: str = "arr_0", batch_size: int = 64):
    """Yield [b, H, W, 3] batches from an npz member without materializing
    the whole (often ~10 GB for 50k samples) array in RAM.

    Reads the zip member as a stream: npy header first, then row-aligned
    chunks (mirrors the reference evaluator's batched reads,
    evaluator.py:445-583). Works for both compressed and stored members.
    Bare `.npy` files (cli.sample_c2i_fid's native output) are memory-
    mapped and sliced.
    """
    if path.endswith(".npy"):
        arr = np.load(path, mmap_mode="r")
        for start in range(0, arr.shape[0], batch_size):
            yield np.asarray(arr[start:start + batch_size])
        return
    with zipfile.ZipFile(path) as zf:
        name = key if key in zf.namelist() else key + ".npy"
        with zf.open(name) as f:
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = np.lib.format.read_array_header_1_0(f)
            else:
                shape, fortran, dtype = np.lib.format.read_array_header_2_0(f)
            assert not fortran, "fortran-order npz not supported"
            n = int(shape[0])
            row_bytes = int(np.prod(shape[1:])) * dtype.itemsize
            for start in range(0, n, batch_size):
                m = min(batch_size, n - start)
                buf = f.read(row_bytes * m)
                yield np.frombuffer(buf, dtype).reshape((m,) + shape[1:])


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
    ref_pool, ref_spatial, _ = extractor.features_from_batches(
        stream_npz(args.ref_batch, batch_size=args.batch_size))
    print("computing sample batch activations...")
    pool, spatial, logits = extractor.features_from_batches(
        stream_npz(args.sample_batch, batch_size=args.batch_size))

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
    # splitext, NOT .replace(".npz", ...): on a .npy sample batch the
    # replace is a no-op and the open('w') would TRUNCATE the 50k-sample
    # dump itself
    txt_path = os.path.splitext(args.sample_batch)[0] + ".txt"
    with open(txt_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {txt_path}")


if __name__ == "__main__":
    main()
