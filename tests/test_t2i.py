"""t2i path tests: caption conditioning, emb-mask folding, left-padding."""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax
import jax.numpy as jnp

from llamagen_tpu.config import GPTConfig
from llamagen_tpu.models import gpt
from llamagen_tpu.ops.generate import generate
from llamagen_tpu.text.t5 import left_pad_embeddings
from llamagen_tpu.utils.convert import convert_gpt

T = 120  # the reference hardcodes a 120-token caption window (gpt.py:93)
CFG = GPTConfig(dim=64, n_layer=2, n_head=4, block_size=16, vocab_size=128,
                caption_dim=32, cls_token_num=T, model_type="t2i",
                token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0)


@pytest.fixture(scope="module")
def ref_and_ours():
    from autoregressive.models.gpt import ModelArgs, Transformer

    torch.manual_seed(0)
    ref = Transformer(ModelArgs(
        dim=CFG.dim, n_layer=CFG.n_layer, n_head=CFG.n_head,
        block_size=CFG.block_size, vocab_size=CFG.vocab_size,
        caption_dim=CFG.caption_dim, cls_token_num=T, model_type="t2i",
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0))
    torch.nn.init.normal_(ref.output.weight, std=0.02)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    return ref, convert_gpt(sd, CFG)


def _caption(b=2, seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randn(b, T, CFG.caption_dim).astype(np.float32)
    # left-padded mask: first few positions invalid
    mask = np.ones((b, T), np.int32)
    mask[0, :3] = 0
    mask[1, :5] = 0
    emb[0, :3] = 0
    emb[1, :5] = 0
    return emb, mask


def test_caption_embedder_parity(ref_and_ours):
    ref, params = ref_and_ours
    emb, _ = _caption()
    with torch.no_grad():
        ref_emb = ref.cls_embedding(torch.from_numpy(emb), train=False)
    ours = gpt.embed_condition(params, CFG, jnp.asarray(emb), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref_emb.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_t2i_greedy_generation_with_emb_masks(ref_and_ours):
    """End-to-end greedy CFG t2i generation must match token-for-token,
    exercising the emb-mask -> attention-mask folding."""
    from autoregressive.models import generate as ref_generate

    ref, params = ref_and_ours
    emb, mask = _caption()
    with torch.no_grad():
        ref_seq = ref_generate.generate(
            ref, torch.from_numpy(emb), CFG.block_size,
            emb_masks=torch.from_numpy(mask), cfg_scale=3.0,
            sample_logits=False)
    seq = generate(params, jax.random.PRNGKey(0), jnp.asarray(emb),
                   cfg=CFG, max_new_tokens=CFG.block_size,
                   emb_masks=jnp.asarray(mask), cfg_scale=3.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    match = (np.asarray(seq) == ref_seq.numpy()).mean()
    assert match == 1.0, f"t2i greedy parity {match} != 1.0"


def test_t2i_no_cfg(ref_and_ours):
    from autoregressive.models import generate as ref_generate

    ref, params = ref_and_ours
    emb, mask = _caption(seed=3)
    with torch.no_grad():
        ref_seq = ref_generate.generate(
            ref, torch.from_numpy(emb), CFG.block_size,
            emb_masks=torch.from_numpy(mask), cfg_scale=1.0,
            sample_logits=False)
    seq = generate(params, jax.random.PRNGKey(0), jnp.asarray(emb),
                   cfg=CFG, max_new_tokens=CFG.block_size,
                   emb_masks=jnp.asarray(mask), cfg_scale=1.0,
                   sample_logits=False, compute_dtype=jnp.float32,
                   cache_dtype=jnp.float32)
    assert (np.asarray(seq) == ref_seq.numpy()).all()


def test_left_pad_embeddings():
    emb = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], np.int32)
    new_emb, new_mask = left_pad_embeddings(emb, mask)
    np.testing.assert_array_equal(new_mask, [[0, 0, 1, 1], [0, 1, 1, 1]])
    np.testing.assert_array_equal(new_emb[0, 2], emb[0, 0])
    np.testing.assert_array_equal(new_emb[0, 3], emb[0, 1])
    np.testing.assert_array_equal(new_emb[0, 0], 0)
    np.testing.assert_array_equal(new_emb[1, 1], emb[1, 0])


def test_caption_cleaning():
    from llamagen_tpu.text.cleaning import clean_caption, text_preprocessing

    assert clean_caption("Hello <person> WORLD!") == "hello person world!"
    assert "http" not in clean_caption("cat http://foo.com/img.png photo")
    assert clean_caption("a--b--c--d--e") == "a b c d e"
    assert text_preprocessing("  A Cat  ") == "a cat"
    # training-time double application is idempotent here
    assert text_preprocessing("free shipping cat") == "cat"


def test_t2i_train_forward_with_valid_mask(ref_and_ours):
    """Loss masking for corrupt samples (ref: gpt.py:374-378)."""
    _, params = ref_and_ours
    rng = np.random.RandomState(0)
    emb, _ = _caption()
    tokens = rng.randint(0, CFG.vocab_size, size=(2, CFG.block_size))
    valid = jnp.asarray(np.array([1.0, 0.0], np.float32))
    _, loss_masked = gpt.forward_train(
        params, CFG, jnp.asarray(emb), jnp.asarray(tokens[:, :-1]),
        targets=jnp.asarray(tokens), valid=valid, train=False)
    _, loss_first_only = gpt.forward_train(
        params, CFG, jnp.asarray(emb[:1]), jnp.asarray(tokens[:1, :-1]),
        targets=jnp.asarray(tokens[:1]), train=False)
    np.testing.assert_allclose(float(loss_masked), float(loss_first_only),
                               rtol=1e-5)
