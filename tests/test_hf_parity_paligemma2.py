"""SpatialVLA backbone parity vs transformers PaliGemma2.

Builds a tiny random-weight HF PaliGemmaForConditionalGeneration with a
Gemma2 text trunk (= PaliGemma2, SpatialVLA-4B's backbone), converts its
state dict through models/spatialvla.from_hf_state_dict (Ego3D MLP zeroed —
the HF model has no Ego3D), and pins our whole multimodal greedy decode
(SigLIP encode -> projector -> prefix-LM full attention -> KV-cached
decode) TOKEN-FOR-TOKEN against HF ``generate``.

This covers the conventions no unit test can: the PaliGemma projector
1/sqrt(h) vs Gemma sqrt(h) embed-scale cancellation, the bidirectional
prefix mask interaction with Gemma2's sliding-window layers, and the
positions/cache handoff from prefill to decode.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from intact_tpu.models import common as cm  # noqa: E402
from intact_tpu.models.spatialvla import SpatialVLAConfig  # noqa: E402
from intact_tpu.models.spatialvla import model as svla  # noqa: E402

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
CFG = SpatialVLAConfig.tiny()
IMAGE_TOKEN = CFG.lm.vocab_size - 1  # any in-vocab id works for the HF splice


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (
        Gemma2Config,
        PaliGemmaConfig,
        PaliGemmaForConditionalGeneration,
        SiglipVisionConfig,
    )

    v, g = CFG.vision, CFG.lm
    cfg = PaliGemmaConfig(
        text_config=Gemma2Config(
            vocab_size=g.vocab_size, hidden_size=g.width,
            intermediate_size=g.mlp_dim, num_hidden_layers=g.depth,
            num_attention_heads=g.num_heads, num_key_value_heads=g.num_kv_heads,
            head_dim=g.head_dim, rms_norm_eps=g.norm_eps,
            rope_theta=g.rope_base,
            query_pre_attn_scalar=g.query_pre_attn_scalar,
            attn_logit_softcapping=g.attn_logit_softcap,
            final_logit_softcapping=g.final_logit_softcap,
            sliding_window=g.sliding_window,
            attention_bias=False, model_type="gemma2",
            attn_implementation="eager",
        ).to_dict(),
        vision_config=SiglipVisionConfig(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.width, num_hidden_layers=v.depth,
            num_attention_heads=v.num_heads, intermediate_size=v.mlp_dim,
            layer_norm_eps=v.layernorm_eps,
        ).to_dict(),
        projection_dim=g.width, hidden_size=g.width,
        image_token_index=IMAGE_TOKEN,
    )
    torch.manual_seed(0)
    m = PaliGemmaForConditionalGeneration(cfg).eval().float()
    with torch.no_grad():  # default inits are too flat for decisive argmax
        for p in m.parameters():
            p.data.normal_(0, 0.05)
    return m


@pytest.fixture(scope="module")
def our_params(hf_model):
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hf_model.state_dict().items()}
    # the HF backbone has no Ego3D head: provide a ZERO Ego3D MLP so the
    # position encoding contributes exactly nothing on both sides
    feat = 6 * CFG.ego3d_n_freqs
    rng = np.random.default_rng(0)
    sd["model.position_embedding_3d.linear_1.weight"] = rng.normal(
        size=(CFG.ego3d_hidden, feat)).astype(np.float32)
    sd["model.position_embedding_3d.linear_1.bias"] = np.zeros(
        CFG.ego3d_hidden, np.float32)
    sd["model.position_embedding_3d.linear_2.weight"] = np.zeros(
        (CFG.vision.width, CFG.ego3d_hidden), np.float32)
    sd["model.position_embedding_3d.linear_2.bias"] = np.zeros(
        CFG.vision.width, np.float32)
    return svla.from_hf_state_dict(sd, CFG)


def _inputs(n_text=5):
    rng = np.random.default_rng(3)
    s = CFG.vision.image_size
    images = rng.uniform(-1, 1, (1, s, s, 3)).astype(np.float32)
    text_ids = rng.integers(3, 200, (1, n_text))
    return images, text_ids


def test_greedy_decode_matches_hf_generate(hf_model, our_params):
    images, text_ids = _inputs()
    n_img = CFG.vision.num_patches
    n_new = CFG.tokens_per_action * CFG.n_action_steps

    input_ids = np.concatenate(
        [np.full((1, n_img), IMAGE_TOKEN, np.int64), text_ids], axis=1
    )
    # HF PaliGemma token_type_ids: 0 = prefix (image AND prompt text, fully
    # bidirectional), 1 = suffix/targets (causal). The whole prompt is prefix.
    token_type_ids = np.zeros_like(input_ids)
    pixel_values = torch.tensor(images.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = hf_model.generate(
            input_ids=torch.tensor(input_ids),
            pixel_values=pixel_values,
            attention_mask=torch.ones_like(torch.tensor(input_ids)),
            token_type_ids=torch.tensor(token_type_ids),
            do_sample=False, max_new_tokens=n_new, use_cache=True,
        ).numpy()[:, input_ids.shape[1]:]

    lang = text_ids.astype(np.int32)
    mask = np.ones_like(lang, bool)
    ours = svla.predict_action_tokens(
        our_params, jnp.asarray(images),
        jnp.zeros((1, CFG.vision.grid, CFG.vision.grid), jnp.float32),
        jnp.asarray(lang), jnp.asarray(mask),
        dataclasses.replace(CFG, n_action_steps=n_new // CFG.tokens_per_action),
        FP32,
    )
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_zero_ego3d_really_contributes_nothing(our_params):
    pe = svla.ego3d_position_encoding(
        our_params, jnp.ones((1, CFG.vision.grid, CFG.vision.grid)), CFG, FP32
    )
    np.testing.assert_array_equal(np.asarray(pe), 0.0)
