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


class TestSuffixOnlyJoint:
    """forward_joint(suffix_only=True) — the joint train path's last-layer
    dead-prefix skip — must match the full joint pass in value AND grads."""

    def test_value_and_grads_match_full_joint(self, cfg, params, batch):
        x_t = jnp.asarray(np.random.default_rng(7).normal(
            size=(2, cfg.chunk_size, cfg.max_action_dim)), jnp.float32)
        time = jnp.asarray([0.4, 0.9], jnp.float32)

        def v_via(suffix_only):
            def fn(p):
                pre_embs, pre_pad, pre_att = pi0.embed_prefix(
                    p, batch["images"], batch["img_masks"],
                    batch["lang_tokens"], batch["lang_masks"], cfg, FP32)
                suf_embs, suf_pad, suf_att = pi0.embed_suffix(
                    p, batch["state"], x_t, time, cfg, FP32)
                pad = jnp.concatenate([pre_pad, suf_pad], axis=1)
                att = jnp.concatenate([pre_att, suf_att], axis=1)
                mask_2d = make_att_2d_masks(pad, att)
                positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1
                _, suf = gemma.forward_joint(
                    p["vlm"], p["expert"], pre_embs, suf_embs, mask_2d,
                    positions, cfg.vlm, cfg.expert, FP32, "xla",
                    suffix_only=suffix_only)
                return jnp.sum(jnp.square(suf[:, -cfg.chunk_size:]))
            return fn

        full, g_full = jax.value_and_grad(v_via(False))(params)
        skip, g_skip = jax.value_and_grad(v_via(True))(params)
        np.testing.assert_allclose(float(skip), float(full), rtol=1e-5)
        flat_f = jax.tree_util.tree_flatten_with_path(g_full)[0]
        flat_s = dict(jax.tree_util.tree_flatten_with_path(g_skip)[0])
        # attention logits/probs are f32 by design (ops/attention.py), so
        # the two graph shapes reassociate f32 ops: tolerance is relative
        # to the GLOBAL gradient scale (leaves whose true grad is ~0, like
        # attention k biases, are pure rounding noise)
        gmax = max(float(jnp.abs(l).max()) for _, l in flat_f)
        for path, leaf in flat_f:
            np.testing.assert_allclose(
                np.asarray(flat_s[path]), np.asarray(leaf),
                rtol=2e-4, atol=1e-4 * gmax,
                err_msg=jax.tree_util.keystr(path),
            )


class TestFrozenPrefixPath:
    """train_expert_only fast path (predict_velocity_frozen_prefix): no
    backward through the frozen VLM, gradients identical to the joint path
    for everything trainable."""

    def test_velocity_matches_joint(self, cfg, params, batch):
        x_t = jnp.asarray(np.random.default_rng(3).normal(
            size=(2, cfg.chunk_size, cfg.max_action_dim)), jnp.float32)
        time = jnp.asarray([0.3, 0.8], jnp.float32)
        args = (params, batch["images"], batch["img_masks"],
                batch["lang_tokens"], batch["lang_masks"], batch["state"],
                x_t, time, cfg, FP32)
        v_joint = pi0.predict_velocity(*args)
        v_frozen = pi0.predict_velocity_frozen_prefix(*args)
        np.testing.assert_allclose(
            np.asarray(v_frozen), np.asarray(v_joint), rtol=1e-5, atol=1e-5
        )

    def test_grads_identical_for_trainable_and_zero_for_frozen(self, cfg, params, batch):
        import dataclasses

        cfg_eo = dataclasses.replace(cfg, train_expert_only=True)
        key = jax.random.key(2)

        def loss_joint(p):
            # joint path regardless of the flag (train=False disables the
            # fast path; grads are still taken)
            return pi0.compute_loss(p, key, batch, cfg, FP32)[0]

        def loss_frozen(p):
            return pi0.compute_loss(p, key, batch, cfg_eo, FP32)[0]

        g_joint = jax.grad(loss_joint)(params)
        g_frozen = jax.grad(loss_frozen)(params)

        for name in ["expert", "state_proj", "action_in_proj", "time_mlp_in",
                     "time_mlp_out", "action_out_proj"]:
            a = jax.tree_util.tree_flatten_with_path(g_joint[name])[0]
            b_ = dict(jax.tree_util.tree_flatten_with_path(g_frozen[name])[0])
            for path, leaf in a:
                np.testing.assert_allclose(
                    np.asarray(b_[path]), np.asarray(leaf),
                    rtol=2e-4, atol=1e-6,
                    err_msg=f"{name}{jax.tree_util.keystr(path)}",
                )
        # the frozen tower's grads are exactly zero (no backward compiled)
        for name in ["siglip", "vlm", "img_proj", "vlm_embed"]:
            total = sum(
                float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_frozen[name])
            )
            assert total == 0.0, name


class TestMaskedTrainStep:
    def test_masked_step_matches_unmasked(self, cfg, params, batch):
        """make_train_step(trainable_mask=...) must produce the same updated
        params as the plain step + optax mask (the stop-gradient only
        removes dL/dW work the optimizer would zero anyway)."""
        from intact_tpu.models.pi0 import model as pi0_model
        from intact_tpu.train.optim import OptimizerConfig, make_optimizer
        from intact_tpu.train.train_step import init_train_state, make_train_step

        trainable = jax.tree.map(lambda _: True, params)
        for name in ["siglip", "vlm", "vlm_embed", "img_proj"]:
            trainable[name] = jax.tree.map(lambda _: False, trainable[name])

        tx, _ = make_optimizer(
            OptimizerConfig(lr=1e-3, warmup_steps=1, first_cycle_steps=100),
            frozen_mask=trainable,
        )

        def loss_fn(p, key, b):
            return pi0_model.compute_loss(p, key, b, cfg, FP32)

        s0 = init_train_state(params, tx, seed=0)
        plain = make_train_step(loss_fn, tx, FP32)
        masked = make_train_step(loss_fn, tx, FP32, trainable_mask=trainable)
        sa, _ = jax.jit(plain)(s0, batch)
        s0b = init_train_state(params, tx, seed=0)
        sb, mb = jax.jit(masked)(s0b, batch)

        flat_a = jax.tree_util.tree_flatten_with_path(sa.params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(sb.params)[0])
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(flat_b[path]), np.asarray(leaf), rtol=1e-6, atol=1e-7,
                err_msg=jax.tree_util.keystr(path),
            )
        # frozen leaves really did not move
        np.testing.assert_array_equal(
            np.asarray(sb.params["vlm"]["final_norm"]["scale"]),
            np.asarray(params["vlm"]["final_norm"]["scale"]),
        )
        assert np.isfinite(float(mb["l2_loss"]))


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

    def test_prefill_kv_only_cache_identical(self, cfg, params, batch):
        """kv_only=True must be a pure dead-code skip: head layers run the
        same scan body (bit-identical); the last layer's KV projection
        compiles outside the scan, so allow float-eps reassociation there."""
        pre_embs, pre_pad, pre_att = pi0.embed_prefix(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], cfg, FP32,
        )
        pre_mask = make_att_2d_masks(pre_pad, pre_att)
        pre_pos = jnp.cumsum(pre_pad.astype(jnp.int32), axis=1) - 1
        x_full, kv_full = gemma.prefill(
            params["vlm"], pre_embs, pre_mask, pre_pos, cfg.vlm, FP32)
        x_kv, kv_only = gemma.prefill(
            params["vlm"], pre_embs, pre_mask, pre_pos, cfg.vlm, FP32,
            kv_only=True)
        assert x_full is not None and x_kv is None
        for full, only in zip(kv_full, kv_only):
            full, only = np.asarray(full), np.asarray(only)
            np.testing.assert_array_equal(full[:-1], only[:-1])
            np.testing.assert_allclose(full[-1], only[-1], rtol=1e-5, atol=1e-5)

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
