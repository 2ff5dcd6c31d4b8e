"""t2i training data: images paired with precomputed T5 caption features.

Equivalent of `/root/reference/dataset/t2i.py`: items are (image, t5
feature, attention mask, valid flag); unreadable images or missing features
yield dummy data with valid=0 so the loss can mask them
(ref: dataset/t2i.py:88-135, gpt.py:375-378).
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Iterator, Tuple

import numpy as np


class T2IDataset:
    """Pairs a jsonl of {image_path, caption_idx?} with a T5-feature dir.

    Feature files are `{idx}.npz` with `feature` [T, C] f16 and `mask` [T]
    (written by llamagen_tpu.cli.extract_t5_features).
    """

    def __init__(self, jsonl_path: str, feature_dir: str, image_size: int,
                 caption_dim: int = 2048, t5_len: int = 120,
                 left_pad: bool = True, retries: int = 0):
        """retries > 0 enables openimage-style fault tolerance: a bad
        sample is replaced by a RANDOM other sample up to `retries` times
        before falling back to dummy_data/valid=0
        (ref: dataset/openimage.py:24-30 — 20 retries upstream)."""
        self.items = []
        with open(jsonl_path) as f:
            for i, line in enumerate(f):
                row = json.loads(line)
                self.items.append(
                    (row.get("image_path") or row.get("image"),
                     int(row.get("caption_idx", i))))
        self.feature_dir = feature_dir
        self.image_size = image_size
        self.caption_dim = caption_dim
        self.t5_len = t5_len
        self.left_pad = left_pad
        self.retries = retries

    def __len__(self) -> int:
        return len(self.items)

    def _dummy(self):
        """Corrupt-sample placeholder with valid=0 (ref: t2i.py:88-93)."""
        img = np.zeros((self.image_size, self.image_size, 3), np.float32)
        feat = np.zeros((self.t5_len, self.caption_dim), np.float32)
        mask = np.zeros((self.t5_len,), np.int32)
        mask[-1] = 1  # keep one valid position so attention stays sane
        return img, feat, mask, np.float32(0.0)

    def __getitem__(self, idx: int):
        item = self._load(idx)
        rng = None
        for _ in range(self.retries):
            if item is not None:
                break
            # openimage-style retry: random resample (ref openimage.py:24-30)
            rng = rng or np.random.RandomState(idx)
            item = self._load(rng.randint(len(self.items)))
        return item if item is not None else self._dummy()

    def _load(self, idx: int):
        """One sample, or None when unreadable (caller decides retry/dummy)."""
        from PIL import Image

        from llamagen_tpu.cli.extract_codes import center_crop
        from llamagen_tpu.text.t5 import left_pad_embeddings

        path, cap_idx = self.items[idx]
        feat_path = os.path.join(self.feature_dir, f"{cap_idx}.npz")
        try:
            img = Image.open(path).convert("RGB")
            arr = center_crop(img, self.image_size).astype(np.float32)
            arr = arr / 127.5 - 1.0
            with np.load(feat_path) as z:
                feat = z["feature"].astype(np.float32)
                mask = z["mask"].astype(np.int32)
        except (OSError, KeyError, ValueError, zipfile.BadZipFile):
            # OSError covers unreadable files (FileNotFoundError included);
            # BadZipFile/ValueError cover truncated/corrupt .npz members —
            # all must fall to the dummy/retry path (the module contract),
            # not kill a long training run
            return None

        t = self.t5_len
        if feat.shape[0] < t:
            feat = np.pad(feat, ((0, t - feat.shape[0]), (0, 0)))
            mask = np.pad(mask, (0, t - mask.shape[0]))
        feat, mask = feat[:t], mask[:t]
        if self.left_pad:
            feat, mask = left_pad_embeddings(feat[None], mask[None])
            feat, mask = feat[0], mask[0]
        return arr, feat, mask, np.float32(1.0)

    def batches(self, batch_size: int, seed: int = 0, epochs: int = -1,
                num_hosts: int = 1, host_id: int = 0
                ) -> Iterator[Tuple[np.ndarray, ...]]:
        """batch_size is PER-HOST; with num_hosts > 1 every host permutes
        identically (same seed) and takes its host_id stride — disjoint
        global coverage per epoch, the reference's DistributedSampler
        semantics (train_t2i.py's sampler)."""
        n = len(self)
        epoch = 0
        while epochs < 0 or epoch < epochs:
            order = np.random.RandomState(seed + epoch).permutation(n)
            order = order[host_id::num_hosts]
            for start in range(0, len(order) - batch_size + 1, batch_size):
                rows = [self[i] for i in order[start:start + batch_size]]
                imgs, feats, masks, valids = zip(*rows)
                yield (np.stack(imgs), np.stack(feats), np.stack(masks),
                       np.stack(valids))
            epoch += 1
