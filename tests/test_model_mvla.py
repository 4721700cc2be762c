"""MVLA model tests (tiny config): loss, gradients, sampling, and the
prompt-KV-cache == direct-prompt consistency invariant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models.mvla import MVLAConfig, model as mvla
from intact_tpu.models.mvla import expert as expert_lib

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def cfg():
    return MVLAConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return mvla.init(jax.random.key(0), cfg)


@pytest.fixture(scope="module")
def batch(cfg):
    ks = jax.random.split(jax.random.key(1), 5)
    b, s = 2, cfg.vision.image_size
    return {
        "images": jax.random.uniform(ks[0], (b, 1, s, s, 3), minval=-1, maxval=1),
        "img_masks": jnp.ones((b, 1), bool),
        "lang_tokens": jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 256),
        "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.normal(ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
    }


class TestMVLA:
    def test_prompt_shape(self, cfg, params, batch):
        prompt = mvla.compute_prompt(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], cfg, FP32,
        )
        assert prompt.shape == (2, cfg.num_metaqueries, cfg.proj_width)

    def test_loss_and_grads(self, cfg, params, batch):
        loss, aux = mvla.compute_loss(params, jax.random.key(2), batch, cfg, FP32)
        assert jnp.isfinite(loss)

        grads = jax.grad(
            lambda p: mvla.compute_loss(p, jax.random.key(2), batch, cfg, FP32)[0]
        )(params)
        for name in ["metaquery", "connector", "expert", "vlm", "siglip"]:
            total = sum(
                float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads[name])
            )
            assert np.isfinite(total) and total > 0, name

    def test_sampling_deterministic(self, cfg, params, batch):
        fn = jax.jit(
            lambda k: mvla.sample_actions(
                params, k, batch["images"], batch["img_masks"], batch["lang_tokens"],
                batch["lang_masks"], batch["state"], cfg, FP32,
            )
        )
        a1, a2 = fn(jax.random.key(3)), fn(jax.random.key(3))
        assert a1.shape == (2, cfg.chunk_size, cfg.max_action_dim)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_prompt_kv_cache_consistency(self, cfg, params, batch):
        """Cached cross-attention K/V must reproduce the direct-prompt path."""
        prompt = mvla.compute_prompt(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], cfg, FP32,
        )
        x_t = jax.random.normal(jax.random.key(5), (2, cfg.chunk_size, cfg.max_action_dim))
        time = jnp.full((2,), 0.5)

        v_direct = mvla.predict_velocity(params, prompt, batch["state"], x_t, time, cfg, FP32)
        kv = expert_lib.prefill_prompt_kv(params["expert"], prompt, cfg.expert, FP32)
        v_cached = mvla.predict_velocity(
            params, prompt, batch["state"], x_t, time, cfg, FP32, prompt_kv=kv
        )
        np.testing.assert_allclose(
            np.asarray(v_direct), np.asarray(v_cached), rtol=1e-6, atol=1e-6
        )

    def test_expert_only_keeps_metaquery_gradient(self, cfg, params, batch):
        """Plain train_expert_only matches the reference semantics: the
        metaqueries keep training THROUGH the frozen VLM
        (modeling_mvla.py:490 is a Parameter outside paligemma), so no
        stop-gradient fires and the full loss path is unchanged."""
        import dataclasses

        cfg_eo = dataclasses.replace(cfg, train_expert_only=True)
        key = jax.random.key(2)
        g_full = jax.grad(lambda p: mvla.compute_loss(p, key, batch, cfg, FP32)[0])(params)
        g_eo = jax.grad(lambda p: mvla.compute_loss(p, key, batch, cfg_eo, FP32)[0])(params)
        np.testing.assert_allclose(
            np.asarray(g_eo["metaquery"]), np.asarray(g_full["metaquery"]),
            rtol=1e-6,
        )
        assert float(jnp.abs(g_eo["metaquery"]).sum()) > 0

    def test_freeze_metaqueries_cuts_vlm_backward(self, cfg, params, batch):
        """freeze_metaqueries opt-in: stop-gradient at the VLM boundary —
        connector/expert/head grads identical to the full path; SigLIP/VLM/
        metaquery grads exactly zero (no backward through the 3B tower)."""
        import dataclasses

        cfg_eo = dataclasses.replace(cfg, train_expert_only=True,
                                     freeze_metaqueries=True)
        key = jax.random.key(2)

        g_full = jax.grad(lambda p: mvla.compute_loss(p, key, batch, cfg, FP32)[0])(params)
        g_eo = jax.grad(lambda p: mvla.compute_loss(p, key, batch, cfg_eo, FP32)[0])(params)

        for name in ["connector", "expert", "state_proj", "action_in_proj",
                     "action_out_proj"]:
            a = jax.tree_util.tree_flatten_with_path(g_full[name])[0]
            b_ = dict(jax.tree_util.tree_flatten_with_path(g_eo[name])[0])
            for path, leaf in a:
                np.testing.assert_allclose(
                    np.asarray(b_[path]), np.asarray(leaf), rtol=2e-4, atol=1e-6,
                    err_msg=f"{name}{jax.tree_util.keystr(path)}",
                )
        for name in ["siglip", "vlm", "vlm_embed", "img_proj", "metaquery"]:
            if name not in g_eo:
                continue
            total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_eo[name]))
            assert total == 0.0, name

    def test_odd_depth_rejected(self, cfg):
        from intact_tpu.models.gemma import tiny_test_config

        with pytest.raises(ValueError, match="even layer count"):
            expert_lib.init(jax.random.key(0), tiny_test_config(width=16, depth=3), 16)


class TestMMMVLA:
    """The joint-attention expert variant (MMMVLA)."""

    def test_joint_pattern_loss_and_sampling(self, batch):
        import dataclasses

        cfg = dataclasses.replace(MVLAConfig.tiny(), alternate_pattern="joint")
        params = mvla.init(jax.random.key(0), cfg)
        assert "pairs" not in params["expert"]  # plain gemma blocks

        loss, _ = mvla.compute_loss(params, jax.random.key(2), batch, cfg, FP32)
        assert jnp.isfinite(loss)

        acts = mvla.sample_actions(
            params, jax.random.key(3), batch["images"], batch["img_masks"],
            batch["lang_tokens"], batch["lang_masks"], batch["state"], cfg, FP32,
        )
        assert acts.shape == (2, cfg.chunk_size, cfg.max_action_dim)
        assert jnp.isfinite(acts).all()

    def test_joint_prompt_kv_cache_matches_one_pass(self, batch):
        """The sampling loop caches the prompt block's K/V once; the cached
        suffix-only pass must equal the full [prompt | suffix] pass exactly
        (the prompt never attends the suffix)."""
        import dataclasses

        import numpy as np

        from intact_tpu.models.mvla import expert as expert_lib

        cfg = dataclasses.replace(MVLAConfig.tiny(), alternate_pattern="joint")
        params = mvla.init(jax.random.key(0), cfg)
        prompt = mvla.compute_prompt(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], cfg, FP32,
        )
        x_t = jax.random.normal(
            jax.random.key(7), (2, cfg.chunk_size, cfg.max_action_dim)
        )
        time = jnp.full((2,), 0.5, jnp.float32)
        v_uncached = mvla.predict_velocity(
            params, prompt, batch["state"], x_t, time, cfg, FP32,
        )
        kv = expert_lib.prefill_joint_prompt_kv(
            params["expert"], prompt, cfg.expert, FP32, cfg.attention_impl
        )
        v_cached = mvla.predict_velocity(
            params, prompt, batch["state"], x_t, time, cfg, FP32, prompt_kv=kv,
        )
        np.testing.assert_allclose(
            np.asarray(v_cached), np.asarray(v_uncached), rtol=2e-5, atol=2e-5
        )


class TestDiTActionHead:
    """action_head='dit': DiT diffusion decoder over the connector prompt —
    the reference's ActionModel alternative (configuration_mvla DiT settings,
    present but inactive in its model)."""

    def _cfg(self):
        import dataclasses

        from intact_tpu.models.mvla.config import MVLAConfig

        return dataclasses.replace(
            MVLAConfig.tiny(), action_head="dit",
            dit_width=16, dit_depth=2, dit_heads=2, diffusion_steps=8,
        )

    def _batch(self, cfg, b=2):
        import numpy as np

        rng = np.random.default_rng(0)
        s = cfg.vision.image_size
        return {
            "images": jnp.asarray(rng.uniform(-1, 1, (b, 1, s, s, 3)), jnp.float32),
            "img_masks": jnp.ones((b, 1), bool),
            "lang_tokens": jnp.asarray(rng.integers(0, 30, (b, cfg.tokenizer_max_length)), jnp.int32),
            "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
            "state": jnp.asarray(rng.normal(size=(b, cfg.max_state_dim)), jnp.float32),
            "actions": jnp.asarray(rng.normal(size=(b, cfg.chunk_size, cfg.max_action_dim)), jnp.float32),
        }

    def test_loss_and_sampling(self):
        import numpy as np

        cfg = self._cfg()
        params = mvla.init(jax.random.key(0), cfg)
        assert "dit" in params and "expert" not in params
        batch = self._batch(cfg)
        loss, aux = mvla.compute_loss(params, jax.random.key(1), batch, cfg, FP32)
        assert np.isfinite(float(loss))

        actions = mvla.sample_actions(
            params, jax.random.key(2), batch["images"], batch["img_masks"],
            batch["lang_tokens"], batch["lang_masks"], batch["state"], cfg, FP32,
        )
        assert actions.shape == (2, cfg.chunk_size, cfg.max_action_dim)
        assert np.isfinite(np.asarray(actions)).all()

    def test_conditioning_matters(self):
        import numpy as np

        cfg = self._cfg()
        params = mvla.init(jax.random.key(0), cfg)
        # adaLN-Zero inits modulation to exact zero (blocks start as
        # identity, cond-independent) — perturb so conditioning is live
        leaves, treedef = jax.tree.flatten(params["dit"])
        ks = jax.random.split(jax.random.key(7), len(leaves))
        params["dit"] = jax.tree.unflatten(treedef, [
            leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, ks)
        ])
        batch = self._batch(cfg)
        a1 = mvla.sample_actions(
            params, jax.random.key(2), batch["images"], batch["img_masks"],
            batch["lang_tokens"], batch["lang_masks"], batch["state"], cfg, FP32,
        )
        other = jnp.asarray(
            np.random.default_rng(9).integers(0, 30, batch["lang_tokens"].shape),
            jnp.int32,
        )
        a2 = mvla.sample_actions(
            params, jax.random.key(2), batch["images"], batch["img_masks"],
            other, batch["lang_masks"], batch["state"], cfg, FP32,
        )
        assert not np.allclose(np.asarray(a1), np.asarray(a2))
