"""HuggingFace-Hub persistence for VQ / GPT params.

Equivalent of the reference's PyTorchModelHubMixin wrappers
(`/root/reference/tokenizer/tokenizer_image/vq_model_hf.py:5-6`,
`/root/reference/autoregressive/models/gpt_hf.py:5`): save/load a model as
a hub-layout directory (config.json + model.safetensors) and push/pull it.
Network operations are egress-gated; the local save/load format is fully
functional offline and interoperable with `huggingface_hub.snapshot_download`
directories.

Param pytrees are flattened to `/`-joined safetensors keys; the config
json carries the dataclass fields needed to rebuild the GPTConfig/VQConfig.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CONFIG_NAME = "config.json"
WEIGHTS_NAME = "model.safetensors"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_pretrained(save_dir: str, params, config, *,
                    model_kind: str) -> str:
    """Write a hub-layout directory: config.json + model.safetensors."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    cfg_dict = dataclasses.asdict(config)
    cfg_dict["model_kind"] = model_kind
    flat = _flatten(params)
    # safetensors has no bf16-numpy interop below 2.x numpy: bf16 tensors
    # are stored as f32 and their keys recorded so load_pretrained can
    # restore the original dtype (a silent f32 roundtrip doubles a
    # GPT-3B's HBM footprint)
    bf16_keys = [k for k, v in flat.items() if str(v.dtype) == "bfloat16"]
    cfg_dict["_bf16_keys"] = bf16_keys
    with open(os.path.join(save_dir, CONFIG_NAME), "w") as f:
        json.dump(cfg_dict, f, indent=2, default=str)
    flat = {k: (np.asarray(v, np.float32)
                if str(v.dtype) == "bfloat16" else np.asarray(v))
            for k, v in flat.items()}
    save_file(flat, os.path.join(save_dir, WEIGHTS_NAME))
    return save_dir


def load_pretrained(repo_or_dir: str, *, dtype=None,
                    revision: Optional[str] = None) -> Tuple[Any, Any]:
    """Load (params, config) from a local dir or a hub repo id.

    Hub repos require egress: snapshot_download is attempted and a clear
    error raised when offline.
    """
    from safetensors.numpy import load_file

    path = repo_or_dir
    if not os.path.isdir(path):
        from huggingface_hub import snapshot_download

        path = snapshot_download(repo_or_dir, revision=revision)
    with open(os.path.join(path, CONFIG_NAME)) as f:
        cfg_dict = json.load(f)
    kind = cfg_dict.pop("model_kind")
    bf16_keys = set(cfg_dict.pop("_bf16_keys", []))
    from llamagen_tpu.config import GPTConfig, VQConfig

    cfg_cls = GPTConfig if kind == "gpt" else VQConfig
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    # tuple-typed fields arrive as lists / stringified tuples from json
    clean = {}
    for k, v in cfg_dict.items():
        if k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(v)
        elif isinstance(v, str) and v.startswith("("):
            v = tuple(int(x) for x in v.strip("()").split(",") if x.strip())
        clean[k] = v
    config = cfg_cls(**clean)
    flat = load_file(os.path.join(path, WEIGHTS_NAME))
    if dtype is None and bf16_keys:
        # restore the dtype the tree was SAVED with (bf16 is stored as
        # f32 in the safetensors file; see save_pretrained)
        flat = {k: (jnp.asarray(v, jnp.bfloat16) if k in bf16_keys else v)
                for k, v in flat.items()}
    params = _unflatten(flat)
    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params)
    return params, config


def push_to_hub(save_dir: str, repo_id: str, *, private: bool = True,
                token: Optional[str] = None) -> str:
    """Upload a saved model directory (requires egress + credentials)."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(folder_path=save_dir, repo_id=repo_id)
    return f"https://huggingface.co/{repo_id}"
