"""PartitionSpec rules for model parameter pytrees.

FSDP semantics match the reference's FULL_SHARD wrapping of transformer
blocks (`/root/reference/autoregressive/train/train_c2i_fsdp.py:31-63`):
every large tensor is sharded over the `fsdp` axis and XLA all-gathers it
at use / reduce-scatters gradients. TP shards attention heads and the FFN
hidden dim over `tp` (what vLLM's tensor_parallel_size would have done,
ref serve/llm.py:90 — plumbed but unused upstream; real here).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from llamagen_tpu.config import GPTConfig, VQConfig


def gpt_param_specs(cfg: GPTConfig):
    """Spec tree matching llamagen_tpu.models.gpt.init_params layout.

    Layer weights are [L, in, out]; L is the scan axis and never sharded.
    """
    layers = {
        "attention_norm": P(),
        "ffn_norm": P(),
        # qkv/w1/w3: output features over tp, input features over fsdp
        "wqkv": P(None, "fsdp", "tp"),
        "w1": P(None, "fsdp", "tp"),
        "w3": P(None, "fsdp", "tp"),
        # wo/w2: input features over tp (row-parallel), output over fsdp
        "wo": P(None, "tp", "fsdp"),
        "w2": P(None, "tp", "fsdp"),
    }
    specs = {
        "tok_embeddings": P("fsdp", "tp"),
        "layers": layers,
        "norm": P(),
        "output": P("fsdp", "tp"),
    }
    if cfg.model_type == "c2i":
        # 1001 rows — not divisible by typical axis sizes, and tiny: replicate
        specs["cls_embedding"] = {"embedding_table": P()}
    else:
        specs["cls_embedding"] = {
            "fc1": {"kernel": P("fsdp", "tp")},
            "fc2": {"kernel": P("tp", "fsdp")},
            "uncond_embedding": P(),
        }
    return specs


def vq_param_specs(params):
    """VQ-VAE params are small (~70M); replicate everything."""
    return jax.tree.map(lambda _: P(), params)


def cache_specs(n_layer: int):
    """KV cache (per-layer [B, S, 2F]): batch over dp/fsdp, features over tp."""
    kv = P(("dp", "fsdp"), None, "tp")
    from llamagen_tpu.models.gpt import KVCache
    return KVCache(kv=tuple(kv for _ in range(n_layer)))
