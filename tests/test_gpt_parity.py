"""Golden-parity tests: our GPT + decode loop vs the reference torch model.

Uses a small random-weight reference Transformer as the oracle (dropouts
zeroed so eval/train paths are deterministic); weights converted with our
converter. Checks RoPE tables, prefill/decode logits, full-forward training
logits + loss, and greedy end-to-end CFG generation token parity.
"""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig, find_multiple
from llamagen_tpu.models import gpt
from llamagen_tpu.ops import sampling
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.utils.convert import convert_gpt

CFG = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16, num_classes=10,
                vocab_size=256, cls_token_num=1,
                token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0)


@pytest.fixture(scope="module")
def ref_and_ours():
    from autoregressive.models.gpt import ModelArgs, Transformer

    torch.manual_seed(0)
    ref = Transformer(ModelArgs(
        dim=CFG.dim, n_layer=CFG.n_layer, n_head=CFG.n_head,
        block_size=CFG.block_size, num_classes=CFG.num_classes,
        vocab_size=CFG.vocab_size, cls_token_num=CFG.cls_token_num,
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0))
    # reference zero-inits the output head (gpt.py:305); randomize it so
    # logits are non-degenerate for parity checks
    torch.nn.init.normal_(ref.output.weight, std=0.02)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_gpt(sd, CFG)
    return ref, params


def test_rope_table_matches_reference():
    from autoregressive.models.gpt import precompute_freqs_cis_2d

    ref_tbl = precompute_freqs_cis_2d(
        CFG.grid_size, CFG.head_dim, int(CFG.rope_base), CFG.cls_token_num)
    ours = np.asarray(gpt.freqs_cis_2d(CFG))
    np.testing.assert_allclose(ours, ref_tbl.numpy(), atol=1e-6)


def test_full_forward_logits_and_loss(ref_and_ours):
    ref, params = ref_and_ours
    rng = np.random.RandomState(0)
    b = 2
    labels = rng.randint(0, CFG.num_classes, size=(b,))
    tokens = rng.randint(0, CFG.vocab_size, size=(b, CFG.block_size))

    with torch.no_grad():
        seqlen = CFG.cls_token_num + CFG.block_size - 1
        ref_logits, ref_loss = ref(
            torch.from_numpy(tokens[:, :-1]).long(),
            torch.from_numpy(labels).long(),
            input_pos=torch.arange(seqlen),
            targets=torch.from_numpy(tokens).long())
        # eval mode does not slice logits; slice to the training view
        ref_logits = ref_logits[:, CFG.cls_token_num - 1:]

    logits, loss = gpt.forward_train(
        params, CFG, jnp.asarray(labels), jnp.asarray(tokens[:, :-1]),
        targets=jnp.asarray(tokens), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=2e-4, rtol=1e-3)
    ref_ce = torch.nn.functional.cross_entropy(
        ref_logits.reshape(-1, CFG.vocab_size),
        torch.from_numpy(tokens).long().reshape(-1))
    np.testing.assert_allclose(float(loss), float(ref_ce), atol=1e-5)


def test_prefill_and_decode_logits(ref_and_ours):
    ref, params = ref_and_ours
    b = 2
    labels = np.array([3, 7])
    max_seq = find_multiple(CFG.cls_token_num + CFG.block_size, 8)

    with torch.no_grad():
        ref.setup_caches(max_batch_size=b,
                         max_seq_length=CFG.cls_token_num + CFG.block_size,
                         dtype=torch.float32)
        ref_logits, _ = ref(None, torch.from_numpy(labels).long(),
                            input_pos=torch.arange(CFG.cls_token_num))

    cache = gpt.init_cache(CFG, b, max_seq, dtype=jnp.float32)
    logits, cache = gpt.prefill(params, CFG, jnp.asarray(labels), cache,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits),
                               ref_logits[:, -1].numpy(), atol=2e-4, rtol=1e-3)

    # feed a fixed token sequence through both decode paths
    rng = np.random.RandomState(1)
    toks = rng.randint(0, CFG.vocab_size, size=(5, b))
    for i in range(5):
        pos = CFG.cls_token_num + i
        with torch.no_grad():
            ref_step, _ = ref(torch.from_numpy(toks[i][:, None]).long(), None,
                              input_pos=torch.tensor([pos]))
        ours_step, cache = gpt.decode_step(
            params, CFG, jnp.asarray(toks[i]), pos, cache,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ours_step),
                                   ref_step[:, -1].numpy(), atol=2e-4,
                                   rtol=1e-3, err_msg=f"decode step {i}")


def test_greedy_cfg_generation_token_parity(ref_and_ours):
    """End-to-end: greedy (argmax) CFG sampling must produce identical ids."""
    from autoregressive.models import generate as ref_generate

    ref, params = ref_and_ours
    labels = np.array([1, 4])
    with torch.no_grad():
        ref_seq = ref_generate.generate(
            ref, torch.from_numpy(labels).long(), CFG.block_size,
            cfg_scale=2.0, sample_logits=False)

    seq = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=CFG, max_new_tokens=CFG.block_size, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    match = (np.asarray(seq) == ref_seq.numpy()).mean()
    assert match == 1.0, f"greedy token parity {match} != 1.0"


def test_decode_step_extent_covers_current_position():
    """The XLA decode path writes kv at `pos` then reads [:extent], so any
    extent the sampling loop picks must cover pos+1. Regression for the
    off-by-one where a 128-step segment's last step got extent == pos
    (c2i t=1: every segment boundary) and silently missed its own k/v —
    logit-level, since the greedy flip is seed-dependent."""
    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=144,
                    num_classes=10, vocab_size=256, cls_token_num=1,
                    token_dropout_p=0.0, resid_dropout_p=0.0,
                    ffn_dropout_p=0.0)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(7), params["output"].shape) * 0.02
    rng = np.random.RandomState(0)
    cache = gpt.init_cache(cfg, 2, find_multiple(1 + 144, 8),
                           dtype=jnp.float32)
    for p in range(128):
        _, cache = gpt.decode_step(
            params, cfg, jnp.asarray(rng.randint(0, cfg.vocab_size, (2,))),
            jnp.int32(p), cache, compute_dtype=jnp.float32)
    tok = jnp.asarray(np.array([5, 9]))
    full, _ = gpt.decode_step(params, cfg, tok, jnp.int32(128), cache,
                              compute_dtype=jnp.float32)
    # the loop's bucketed extent for the segment ending at pos=128
    # (t=1, i0=0, n=128): find_multiple(t + i0 + n, 128) = 256
    bucketed, _ = gpt.decode_step(params, cfg, tok, jnp.int32(128), cache,
                                  compute_dtype=jnp.float32, read_extent=256)
    np.testing.assert_array_equal(np.asarray(bucketed), np.asarray(full))
    # the pre-fix formula returned extent == pos == 128: must differ —
    # proves the probe is sensitive to the missing self-attention row
    stale, _ = gpt.decode_step(params, cfg, tok, jnp.int32(128), cache,
                               compute_dtype=jnp.float32, read_extent=128)
    assert float(jnp.max(jnp.abs(stale - full))) > 1e-4


def test_greedy_parity_across_extent_boundary():
    """Greedy parity on a grid LONG enough to cross the XLA fallback's
    128-step read-extent segmentation (c2i t=1: the segment's last step
    sits exactly on the 128 boundary; block_size=16 above never reaches
    it). Token-level is seed-dependent for the extent off-by-one (the
    logit test above is the sharp regression), but this pins the whole
    segmented loop against the reference at a multi-segment length."""
    from autoregressive.models.gpt import ModelArgs, Transformer
    from autoregressive.models import generate as ref_generate

    cfg = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=144,
                    num_classes=10, vocab_size=256, cls_token_num=1,
                    token_dropout_p=0.0, resid_dropout_p=0.0,
                    ffn_dropout_p=0.0)
    torch.manual_seed(3)
    ref = Transformer(ModelArgs(
        dim=cfg.dim, n_layer=cfg.n_layer, n_head=cfg.n_head,
        block_size=cfg.block_size, num_classes=cfg.num_classes,
        vocab_size=cfg.vocab_size, cls_token_num=cfg.cls_token_num,
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0))
    torch.nn.init.normal_(ref.output.weight, std=0.02)
    ref.eval()
    params = convert_gpt(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg)

    labels = np.array([3, 8])
    with torch.no_grad():
        ref_seq = ref_generate.generate(
            ref, torch.from_numpy(labels).long(), cfg.block_size,
            cfg_scale=2.0, sample_logits=False)
    seq = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=cfg, max_new_tokens=cfg.block_size, cfg_scale=2.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32, use_kernel=False)
    match = (np.asarray(seq) == ref_seq.numpy()).mean()
    assert match == 1.0, f"greedy parity across 128 boundary: {match} != 1.0"


def test_greedy_cfg_interval(ref_and_ours):
    from autoregressive.models import generate as ref_generate

    ref, params = ref_and_ours
    labels = np.array([2, 9])
    with torch.no_grad():
        ref_seq = ref_generate.generate(
            ref, torch.from_numpy(labels).long(), CFG.block_size,
            cfg_scale=1.5, cfg_interval=4, sample_logits=False)
    seq = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=CFG, max_new_tokens=CFG.block_size, cfg_scale=1.5,
                   cfg_interval=4, sample_logits=False,
                   compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    assert (np.asarray(seq) == ref_seq.numpy()).all()


def test_no_cfg_generation(ref_and_ours):
    from autoregressive.models import generate as ref_generate

    ref, params = ref_and_ours
    labels = np.array([5])
    with torch.no_grad():
        ref_seq = ref_generate.generate(
            ref, torch.from_numpy(labels).long(), CFG.block_size,
            cfg_scale=1.0, sample_logits=False)
    seq = generate(params, jax.random.PRNGKey(0), jnp.asarray(labels),
                   cfg=CFG, max_new_tokens=CFG.block_size, cfg_scale=1.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    assert (np.asarray(seq) == ref_seq.numpy()).all()


def test_topk_topp_filter_semantics():
    """Filter semantics vs the reference huggingface-style implementation."""
    from autoregressive.models.generate import top_k_top_p_filtering

    rng = np.random.RandomState(0)
    logits = rng.randn(4, 50).astype(np.float32)
    for top_k, top_p in [(10, 1.0), (0, 0.7), (5, 0.9)]:
        ref = top_k_top_p_filtering(
            torch.from_numpy(logits.copy()), top_k=top_k, top_p=top_p).numpy()
        ours = np.asarray(sampling.filter_logits(
            jnp.asarray(logits), top_k=top_k, top_p=top_p))
        ref_mask = np.isfinite(ref)
        ours_mask = ours > -1e29
        np.testing.assert_array_equal(ours_mask, ref_mask,
                                      err_msg=f"top_k={top_k} top_p={top_p}")
        np.testing.assert_allclose(np.where(ours_mask, ours, 0),
                                   np.where(ref_mask, ref, 0), atol=1e-6)


def test_attn_dropout_active_in_training():
    """attn_dropout_p (ref gpt.py:232-236: SDPA's dropout_p while
    training) must actually change the training forward — it was
    previously a silently-ignored config field. Contract: loss with
    attn_dropout_p=0.5 differs across rng keys AND from the p=0 loss;
    eval (rng=None) is unaffected by the setting."""
    base = dict(dim=64, n_layer=2, n_head=4, block_size=16, num_classes=10,
                vocab_size=256, cls_token_num=1, token_dropout_p=0.0,
                resid_dropout_p=0.0, ffn_dropout_p=0.0,
                class_dropout_prob=0.0)
    cfg0 = GPTConfig(**base)
    cfg_d = GPTConfig(**base, attn_dropout_p=0.5)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg0, dtype=jnp.float32)
    params["output"] = jax.random.normal(
        jax.random.PRNGKey(7), params["output"].shape) * 0.02
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, 10, (2,)))
    tokens = jnp.asarray(rng.randint(0, 256, (2, 16)))

    def loss(cfg, key):
        _, l = gpt.forward_train(params, cfg, labels, tokens[:, :-1],
                                 targets=tokens, rng=key, train=True,
                                 compute_dtype=jnp.float32)
        return float(l)

    l0 = loss(cfg0, jax.random.PRNGKey(1))
    ld1 = loss(cfg_d, jax.random.PRNGKey(1))
    ld2 = loss(cfg_d, jax.random.PRNGKey(2))
    assert ld1 != l0, "attn dropout did not change the training loss"
    assert ld1 != ld2, "attn dropout mask did not vary with the rng"
    # the non-attn rng streams are fold_in-derived, so p=0 runs are
    # bit-identical to the pre-attn-dropout implementation
    e0, _ = gpt.forward_train(params, cfg0, labels, tokens[:, :-1],
                              targets=tokens, rng=None, train=False,
                              compute_dtype=jnp.float32)
    e1, _ = gpt.forward_train(params, cfg_d, labels, tokens[:, :-1],
                              targets=tokens, rng=None, train=False,
                              compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
