"""Gemma2 decoder parity vs transformers (random tiny weights through
models/gemma2.from_hf_state_dict) — pins the 4-norm layer structure, logit
softcapping, query_pre_attn_scalar scaling, and alternating sliding-window
attention that PaliGemma2/SpatialVLA-4B conversion depends on."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from intact_tpu.models import common as cm  # noqa: E402
from intact_tpu.models import gemma2 as g2  # noqa: E402

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
CFG = g2.tiny_test_config()


@pytest.fixture(scope="module")
def hf_gemma2():
    from transformers import Gemma2Config, Gemma2Model

    cfg = Gemma2Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.width,
        intermediate_size=CFG.mlp_dim, num_hidden_layers=CFG.depth,
        num_attention_heads=CFG.num_heads, num_key_value_heads=CFG.num_kv_heads,
        head_dim=CFG.head_dim, rms_norm_eps=CFG.norm_eps,
        rope_theta=CFG.rope_base,
        query_pre_attn_scalar=CFG.query_pre_attn_scalar,
        attn_logit_softcapping=CFG.attn_logit_softcap,
        final_logit_softcapping=CFG.final_logit_softcap,
        sliding_window=CFG.sliding_window,
        attention_bias=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Gemma2Model(cfg).eval().float()


@pytest.fixture(scope="module")
def our_params(hf_gemma2):
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hf_gemma2.state_dict().items()}
    return g2.from_hf_state_dict(sd, CFG, prefix="")


def test_forward_parity(hf_gemma2, our_params):
    """Sequence longer than the sliding window (3) so both attention kinds
    and the window boundary are exercised."""
    ids = np.array([[3, 17, 42, 8, 1, 55, 9], [5, 96, 1, 7, 2, 2, 11]], np.int64)
    with torch.no_grad():
        ref = hf_gemma2(torch.tensor(ids)).last_hidden_state.numpy()

    b, t = ids.shape
    causal = jnp.tril(jnp.ones((t, t), bool))[None].repeat(b, 0)
    pos = jnp.broadcast_to(jnp.arange(t), (b, t))
    out = g2.encode_text(our_params, jnp.asarray(ids.astype(np.int32)),
                         causal, pos, CFG, FP32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-5)


def test_sliding_window_matters(our_params):
    """With window=3 over 7 tokens, disabling the sliding mask changes the
    output — guards against the window silently not being applied."""
    import dataclasses

    ids = jnp.asarray(np.arange(1, 8)[None], jnp.int32)
    t = ids.shape[1]
    causal = jnp.tril(jnp.ones((t, t), bool))[None]
    pos = jnp.arange(t)[None]
    out_window = g2.encode_text(our_params, ids, causal, pos, CFG, FP32)
    wide = dataclasses.replace(CFG, sliding_window=100)
    out_global = g2.encode_text(our_params, ids, causal, pos, wide, FP32)
    assert not np.allclose(np.asarray(out_window), np.asarray(out_global))


def test_greedy_decode_matches_hf_generate(hf_gemma2):
    """KV-cached in-graph greedy decode (g2.greedy_decode) token-for-token
    vs HF Gemma2ForCausalLM.generate (greedy, tied embeddings)."""
    from transformers import Gemma2ForCausalLM

    lm = Gemma2ForCausalLM(hf_gemma2.config).eval().float()
    torch.manual_seed(1)
    for p in lm.parameters():
        p.data.normal_(0, 0.05)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in lm.model.state_dict().items()}
    params = g2.from_hf_state_dict(sd, CFG, prefix="")

    ids = np.array([[3, 17, 42, 8, 1]], np.int64)
    n_new = 6
    with torch.no_grad():
        ref = lm.generate(
            torch.tensor(ids), max_new_tokens=n_new, do_sample=False,
            use_cache=True, pad_token_id=0,
        ).numpy()[:, ids.shape[1]:]

    import jax

    embeds = cm.embed_lookup(params["embed"], jnp.asarray(ids, jnp.int32), FP32)
    embeds = embeds * jnp.asarray(CFG.width**0.5, jnp.float32)
    mask = jnp.ones(ids.shape, bool)
    ours = jax.jit(
        lambda p, e, m: g2.greedy_decode(p, e, m, n_new, CFG, FP32)
    )(params, embeds, mask)
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_greedy_decode_right_padded_prompt(our_params):
    """Right-padded rows decode from the last VALID token; a padded prompt
    must produce the same continuation as its unpadded version."""
    import jax

    ids = jnp.asarray(np.array([[3, 17, 42]]), jnp.int32)
    emb = cm.embed_lookup(our_params["embed"], ids, FP32) * jnp.asarray(
        CFG.width**0.5, jnp.float32)
    out_a = g2.greedy_decode(our_params, emb, jnp.ones((1, 3), bool), 4, CFG, FP32)

    ids_p = jnp.asarray(np.array([[3, 17, 42, 0, 0]]), jnp.int32)
    emb_p = cm.embed_lookup(our_params["embed"], ids_p, FP32) * jnp.asarray(
        CFG.width**0.5, jnp.float32)
    mask_p = jnp.asarray(np.array([[True, True, True, False, False]]))
    out_b = g2.greedy_decode(our_params, emb_p, mask_p, 4, CFG, FP32)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_final_logit_softcap(our_params):
    h = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, CFG.width)) * 50,
                    jnp.float32)
    out = np.asarray(g2.logits(our_params, h, CFG, FP32))
    assert np.abs(out).max() <= CFG.final_logit_softcap + 1e-4
