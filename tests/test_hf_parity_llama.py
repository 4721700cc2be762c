"""LLaMA decoder parity vs transformers (random tiny weights through
models/llama.from_hf_state_dict): full forward to fp32 tolerance and
greedy generation token-for-token — the AR decode Magma-8B serving relies
on (reference policy_wrapper.py:282-293 generate path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from intact_tpu.models import common as cm  # noqa: E402
from intact_tpu.models import llama as llama_mod  # noqa: E402

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
CFG = llama_mod.tiny_test_config()


@pytest.fixture(scope="module")
def hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.width,
        intermediate_size=CFG.mlp_dim, num_hidden_layers=CFG.depth,
        num_attention_heads=CFG.num_heads, num_key_value_heads=CFG.num_kv_heads,
        head_dim=CFG.head_dim, rms_norm_eps=CFG.norm_eps,
        rope_theta=CFG.rope_base, attention_bias=False, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval().float()


@pytest.fixture(scope="module")
def our_params(hf_llama):
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hf_llama.state_dict().items()}
    return llama_mod.from_hf_state_dict(sd, CFG)


def test_forward_parity(hf_llama, our_params):
    ids = np.array([[3, 17, 42, 8, 1], [5, 96, 1, 7, 2]], np.int64)
    with torch.no_grad():
        ref = hf_llama.model(torch.tensor(ids)).last_hidden_state.numpy()

    b, t = ids.shape
    x = cm.embed_lookup(our_params["embed"], jnp.asarray(ids.astype(np.int32)), FP32)
    causal = jnp.tril(jnp.ones((t, t), bool))[None].repeat(b, 0)
    pos = jnp.broadcast_to(jnp.arange(t), (b, t))
    out, _ = llama_mod.forward(our_params, x, causal, pos, CFG, FP32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_greedy_generation_matches_hf(hf_llama, our_params):
    ids = np.array([[3, 17, 42, 8, 1]], np.int64)
    n_new = 8
    with torch.no_grad():
        ref = hf_llama.generate(
            torch.tensor(ids), max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        ).numpy()[:, ids.shape[1]:]

    x = cm.embed_lookup(our_params["embed"], jnp.asarray(ids.astype(np.int32)), FP32)
    mask = jnp.ones(ids.shape, bool)
    ours = np.asarray(llama_mod.greedy_decode(our_params, x, mask, n_new, CFG, FP32))
    np.testing.assert_array_equal(ours, ref)


def test_greedy_generation_right_padded_prompt(hf_llama, our_params):
    """Padded prompt rows decode identically to their unpadded versions."""
    ids = np.array([[3, 17, 42]], np.int64)
    n_new = 5
    x = cm.embed_lookup(our_params["embed"], jnp.asarray(ids.astype(np.int32)), FP32)
    ours_plain = np.asarray(llama_mod.greedy_decode(
        our_params, x, jnp.ones(ids.shape, bool), n_new, CFG, FP32))

    padded = np.array([[3, 17, 42, 0, 0]], np.int64)
    xp = cm.embed_lookup(our_params["embed"], jnp.asarray(padded.astype(np.int32)), FP32)
    mask = jnp.asarray(np.array([[True, True, True, False, False]]))
    ours_padded = np.asarray(llama_mod.greedy_decode(our_params, xp, mask, n_new, CFG, FP32))
    np.testing.assert_array_equal(ours_plain, ours_padded)
