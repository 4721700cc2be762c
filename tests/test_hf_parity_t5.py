"""T5 encoder parity vs transformers (random tiny weights, converted through
models/t5.from_hf_state_dict) — pins the no-scale attention, T5 RMSNorm,
relative-position bucketing, and ReLU FF conventions Octo's language
conditioning depends on."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from intact_tpu.models import common as cm  # noqa: E402
from intact_tpu.models import t5 as t5_mod  # noqa: E402

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)

CFG = t5_mod.tiny_test_config()


@pytest.fixture(scope="module")
def hf_t5():
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model, d_kv=CFG.d_kv,
        d_ff=CFG.d_ff, num_heads=CFG.num_heads, num_layers=CFG.num_layers,
        relative_attention_num_buckets=CFG.rel_buckets,
        relative_attention_max_distance=CFG.rel_max_distance,
        feed_forward_proj="relu", dropout_rate=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return T5EncoderModel(cfg).eval().float()


def test_full_encoder_parity(hf_t5):
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in hf_t5.state_dict().items()}
    params = t5_mod.from_hf_state_dict(sd, CFG)

    ids = np.array([[3, 17, 42, 8, 1, 0, 0], [5, 5, 96, 1, 0, 0, 0]], np.int64)
    mask = ids > 0
    with torch.no_grad():
        ref = hf_t5(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask.astype(np.int64))
        ).last_hidden_state.numpy()

    ours = np.asarray(t5_mod.encode(
        params, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask), CFG, FP32
    ))
    # padded positions differ (HF zeroes nothing either, but masked keys make
    # them arbitrary); compare real positions only
    for b in range(ids.shape[0]):
        n = int(mask[b].sum())
        np.testing.assert_allclose(ours[b, :n], ref[b, :n], rtol=2e-4, atol=2e-5)


def test_relative_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    rel = np.arange(-40, 40)[None, :] - np.zeros((1, 1), np.int64)
    rel = (np.arange(80) - 40)[None, :]
    ref = T5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    ours = np.asarray(t5_mod.relative_position_bucket(jnp.asarray(rel), 32, 128))
    np.testing.assert_array_equal(ours, ref)


def test_t5_layer_norm_no_shift():
    """T5 norm multiplies by w directly (not 1+w) and skips mean removal."""
    x = np.random.default_rng(0).normal(size=(4, CFG.d_model)).astype(np.float32) + 3.0
    w = np.linspace(0.5, 1.5, CFG.d_model).astype(np.float32)
    ours = np.asarray(t5_mod.t5_layer_norm({"scale": jnp.asarray(w)}, jnp.asarray(x)))
    ref = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
