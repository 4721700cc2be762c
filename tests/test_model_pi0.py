"""Pi0 model-core tests on the tiny CPU config.

The key invariant: the cached prefill+decode inference path must produce the
SAME velocities as the joint training path (same weights, same inputs) —
that's what makes train/serve numerically consistent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models import gemma
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.ops.masks import make_att_2d_masks

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def cfg():
    return Pi0Config.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return pi0.init(jax.random.key(0), cfg)


@pytest.fixture(scope="module")
def batch(cfg):
    k = jax.random.key(1)
    ks = jax.random.split(k, 5)
    b = 2
    s = cfg.vision.image_size
    lang_masks = np.zeros((b, cfg.tokenizer_max_length), bool)
    lang_masks[:, :5] = True  # 5 valid lang tokens, rest padding
    return {
        "images": jax.random.uniform(ks[0], (b, cfg.num_cameras, s, s, 3), minval=-1, maxval=1),
        "img_masks": jnp.ones((b, cfg.num_cameras), bool),
        "lang_tokens": jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 256),
        "lang_masks": jnp.asarray(lang_masks),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.normal(ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
    }


class TestMasks:
    def test_block_mask_semantics(self):
        pad = jnp.ones((1, 6), bool)
        att = jnp.asarray([[0, 0, 0, 1, 1, 0]])  # 3-token prefix | 1 state | 2 actions
        m = make_att_2d_masks(pad, att)[0]
        # prefix can't see state/actions
        assert not m[0, 3] and not m[0, 5]
        # prefix full attention among itself
        assert m[0, 2] and m[2, 0]
        # state sees prefix + itself, not actions
        assert m[3, 0] and m[3, 3] and not m[3, 4]
        # actions see everything before + both action tokens
        assert m[4, 0] and m[4, 3] and m[4, 5] and m[5, 4]

    def test_padding_blocks_keys(self):
        pad = jnp.asarray([[True, False, True]])
        att = jnp.zeros((1, 3), jnp.int32)
        m = make_att_2d_masks(pad, att)[0]
        assert not m[0, 1] and m[0, 2]


class TestForward:
    def test_loss_shape_and_finite(self, cfg, params, batch):
        loss, aux = pi0.compute_loss(params, jax.random.key(2), batch, cfg, FP32)
        assert aux["losses"].shape == (2, cfg.chunk_size, cfg.max_action_dim)
        assert jnp.isfinite(loss)

    def test_action_pad_mask_zeroes_loss(self, cfg, params, batch):
        b = dict(batch)
        b["action_is_pad"] = jnp.asarray([[False] * 2 + [True] * 2] * 2)
        _, aux = pi0.compute_loss(params, jax.random.key(2), b, cfg, FP32)
        assert jnp.all(aux["losses"][:, 2:] == 0)
        assert jnp.any(aux["losses"][:, :2] != 0)

    def test_grads_flow_everywhere(self, cfg, params, batch):
        def loss_fn(p):
            return pi0.compute_loss(p, jax.random.key(2), batch, cfg, FP32)[0]

        grads = jax.grad(loss_fn)(params)
        norms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
        flat = jax.tree.leaves(norms)
        assert all(np.isfinite(v) for v in flat)
        # every major component receives gradient
        for name in ["siglip", "vlm", "expert", "state_proj", "action_out_proj"]:
            assert sum(jax.tree.leaves(jax.tree.map(float, norms[name]))) > 0, name


class TestSampling:
    def test_sample_shape_finite_deterministic(self, cfg, params, batch):
        fn = jax.jit(
            lambda k: pi0.sample_actions(
                params, k, batch["images"], batch["img_masks"], batch["lang_tokens"],
                batch["lang_masks"], batch["state"], cfg, FP32,
            )
        )
        a1 = fn(jax.random.key(3))
        a2 = fn(jax.random.key(3))
        assert a1.shape == (2, cfg.chunk_size, cfg.max_action_dim)
        assert jnp.isfinite(a1).all()
        np.testing.assert_array_equal(a1, a2)
        a3 = fn(jax.random.key(4))
        assert not np.allclose(a1, a3)

    def test_prefill_decode_matches_joint(self, cfg, params, batch):
        """The cached inference path must equal the joint training path."""
        b = batch["state"].shape[0]
        x_t = jax.random.normal(jax.random.key(7), (b, cfg.chunk_size, cfg.max_action_dim))
        time = jnp.full((b,), 0.5)

        # joint (training) velocity
        v_joint = pi0.predict_velocity(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], batch["state"], x_t, time, cfg, FP32,
        )

        # cached (inference) velocity
        pre_embs, pre_pad, pre_att = pi0.embed_prefix(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], cfg, FP32,
        )
        pre_mask = make_att_2d_masks(pre_pad, pre_att)
        pre_pos = jnp.cumsum(pre_pad.astype(jnp.int32), axis=1) - 1
        _, kv = gemma.prefill(params["vlm"], pre_embs, pre_mask, pre_pos, cfg.vlm, FP32)

        suf_embs, suf_pad, suf_att = pi0.embed_suffix(params, batch["state"], x_t, time, cfg, FP32)
        suf_self = make_att_2d_masks(suf_pad, suf_att)
        suf_to_pre = jnp.broadcast_to(pre_pad[:, None, :], (b, suf_pad.shape[1], pre_pad.shape[1]))
        dec_mask = jnp.concatenate([suf_to_pre, suf_self], axis=2)
        suf_pos = pre_pad.sum(1, keepdims=True).astype(jnp.int32) + jnp.cumsum(
            suf_pad.astype(jnp.int32), axis=1) - 1

        out = gemma.decode(params["expert"], kv, suf_embs, dec_mask, suf_pos, cfg.expert, FP32)
        v_cached = cm.dense(params["action_out_proj"], out[:, -cfg.chunk_size:].astype(jnp.float32), FP32)

        np.testing.assert_allclose(np.asarray(v_joint), np.asarray(v_cached), rtol=2e-5, atol=2e-5)

    def test_flow_matching_identity(self, cfg):
        """x_t interpolation and u_t target match the reference math."""
        actions = jnp.ones((1, 2, 3))
        noise = jnp.zeros((1, 2, 3))
        t = jnp.asarray([0.25])
        x_t = t[:, None, None] * noise + (1 - t[:, None, None]) * actions
        u_t = noise - actions
        np.testing.assert_allclose(x_t, 0.75)
        np.testing.assert_allclose(u_t, -1.0)

    def test_time_sampling_range(self, cfg):
        t = pi0.sample_time(jax.random.key(0), 1000, cfg)
        assert float(t.min()) >= cfg.time_offset
        assert float(t.max()) <= cfg.time_scale + cfg.time_offset
        # Beta(1.5, 1) skews toward 1
        assert float(t.mean()) > 0.5


class TestTokenizer:
    def test_hash_tokenizer_shapes(self):
        from intact_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(max_length=8)
        ids, mask = tok(["pick up the carrot", "x"])
        assert ids.shape == (2, 8) and mask.shape == (2, 8)
        assert ids[0, 0] == tok.bos_id
        assert mask[1].sum() == 2  # bos + "x"
        ids2, _ = tok(["pick up the carrot", "x"])
        np.testing.assert_array_equal(ids, ids2)
