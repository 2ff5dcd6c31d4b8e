"""Offline VQ tokenization of an image folder into packed code shards.

Equivalent of `/root/reference/autoregressive/train/extract_codes_c2i.py`
(ten-crop or flip augmentation, rank-strided) but writes packed memmap
shards (`llamagen_tpu.data.codes`) instead of 1.28M micro `.npy` files —
sequential IO on TPU-VM storage.

  python -m llamagen_tpu.cli.extract_codes --data-path /data/imagenet/train \
      --vq-ckpt vq_ds16_c2i.pt --image-size 256 --out-dir /data/codes256
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from llamagen_tpu.cli.common import load_vq
from llamagen_tpu.models import vq as vq_lib


def center_crop(img, size):
    """Resize-then-center-crop (ADM-style, ref: extract_codes_c2i.py)."""
    from PIL import Image

    while min(*img.size) >= 2 * size:
        img = img.resize(tuple(x // 2 for x in img.size), Image.BOX)
    scale = size / min(*img.size)
    img = img.resize(tuple(round(x * scale) for x in img.size), Image.BICUBIC)
    arr = np.array(img)
    y = (arr.shape[0] - size) // 2
    x = (arr.shape[1] - size) // 2
    return arr[y:y + size, x:x + size]


def ten_crop(arr, size):
    """torchvision TenCrop semantics: tl/tr/bl/br/center of the image and
    of its horizontal flip (ref: extract_codes_c2i.py:55-62,
    crop_size = image_size * crop_range then TenCrop(image_size))."""
    h, w = arr.shape[:2]
    five = [arr[:size, :size], arr[:size, w - size:],
            arr[h - size:, :size], arr[h - size:, w - size:],
            arr[(h - size) // 2:(h - size) // 2 + size,
                (w - size) // 2:(w - size) // 2 + size]]
    flipped = arr[:, ::-1]
    five += [flipped[:size, :size], flipped[:size, w - size:],
             flipped[h - size:, :size], flipped[h - size:, w - size:],
             flipped[(h - size) // 2:(h - size) // 2 + size,
                     (w - size) // 2:(w - size) // 2 + size]]
    return five


def iter_jsonl(jsonl_path):
    """t2i jsonl rows ({image_path, caption_idx}) -> (path, caption_idx);
    the stored "label" is the caption index so codes re-join their T5
    features downstream (ref: extract_codes_t2i.py:115-119)."""
    import json

    with open(jsonl_path) as f:
        for i, line in enumerate(f):
            row = json.loads(line)
            yield (row.get("image_path") or row.get("image"),
                   int(row.get("caption_idx", i)))


def iter_image_folder(root):
    """ImageFolder layout: root/class_name/img.jpg, labels sorted by name."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    for label, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith((".jpg", ".jpeg", ".png", ".webp")):
                yield os.path.join(cdir, fname), label


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", default=None,
                   help="ImageFolder root (class subdirs)")
    p.add_argument("--jsonl", default=None,
                   help="t2i jsonl of {image_path, caption_idx} rows")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--vq-model", default="VQ-16")
    p.add_argument("--vq-ckpt", default=None)
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-embed-dim", type=int, default=8)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--flip-aug", action="store_true",
                   help="store flipped codes too (ref flip augmentation)")
    p.add_argument("--ten-crop", action="store_true",
                   help="ten-crop augmentation (ref extract_codes_c2i)")
    p.add_argument("--crop-range", type=float, default=1.1,
                   help="pre-crop scale for --ten-crop (ref default 1.1)")
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--host-id", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--shard-size", type=int, default=100_000)
    args = p.parse_args(argv)

    from PIL import Image

    vq_params, vq_cfg = load_vq(args.vq_ckpt, args.vq_model,
                                args.codebook_size, args.codebook_embed_dim)
    latent = args.image_size // vq_cfg.downsample_factor
    seq_len = latent * latent
    assert not (args.flip_aug and args.ten_crop)
    naug = 10 if args.ten_crop else (2 if args.flip_aug else 1)
    num_hosts = args.num_hosts if args.num_hosts is not None \
        else jax.process_count()
    host_id = args.host_id if args.host_id is not None \
        else jax.process_index()

    encode = jax.jit(lambda x: vq_lib.encode(vq_params, x, vq_cfg)[2])

    os.makedirs(args.out_dir, exist_ok=True)
    buf_codes, buf_labels = [], []
    shard_id = total = 0

    def flush():
        nonlocal shard_id, buf_codes, buf_labels
        if not buf_codes:
            return
        stem = os.path.join(
            args.out_dir, f"shard_h{host_id:03d}_{shard_id:05d}")
        np.save(stem + ".codes.npy", np.stack(buf_codes).astype(np.int16))
        np.save(stem + ".labels.npy", np.asarray(buf_labels, np.int16))
        shard_id += 1
        buf_codes, buf_labels = [], []

    batch_imgs, batch_labels = [], []

    def run_batch():
        nonlocal total
        if not batch_imgs:
            return
        x = np.stack(batch_imgs).astype(np.float32) / 127.5 - 1.0
        idx = np.asarray(encode(jnp.asarray(x)))  # [B, h, w]
        idx = idx.reshape(len(batch_imgs), seq_len)
        for j in range(0, len(batch_imgs), naug):
            buf_codes.append(idx[j:j + naug].reshape(naug, seq_len)
                             if naug > 1 else idx[j])
            buf_labels.append(batch_labels[j])
            total += 1
        batch_imgs.clear()
        batch_labels.clear()
        if len(buf_codes) >= args.shard_size:
            flush()

    if args.jsonl:
        items = iter_jsonl(args.jsonl)
    elif args.data_path:
        items = iter_image_folder(args.data_path)
    else:
        raise SystemExit("need --data-path or --jsonl")

    for i, (path, label) in enumerate(items):
        if i % num_hosts != host_id:  # rank striding (ref :107-113)
            continue
        try:
            img = Image.open(path).convert("RGB")
        except OSError:
            continue
        if args.ten_crop:
            big = center_crop(img, int(args.image_size * args.crop_range))
            crops = ten_crop(big, args.image_size)
            batch_imgs.extend(crops)
            batch_labels.extend([label] * 10)
        else:
            arr = center_crop(img, args.image_size)
            batch_imgs.append(arr)
            batch_labels.append(label)
            if args.flip_aug:
                batch_imgs.append(arr[:, ::-1])
                batch_labels.append(label)
        if len(batch_imgs) >= args.batch_size:
            run_batch()
    run_batch()
    flush()
    print(f"extracted {total} samples into {shard_id} shards at {args.out_dir}")


if __name__ == "__main__":
    main()
