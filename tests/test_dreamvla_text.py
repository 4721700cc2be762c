"""DreamVLA scaffold + text-processing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import dreamvla

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


class TestDreamVLA:
    def test_forward_and_losses(self):
        cfg = dreamvla.DreamVLAConfig.tiny()
        params = dreamvla.init(jax.random.key(0), cfg)
        b = 2
        batch = {
            "images": jax.random.uniform(
                jax.random.key(1), (b, cfg.history, cfg.vision.image_size,
                                    cfg.vision.image_size, 3), minval=-1, maxval=1),
            "actions": jax.random.normal(jax.random.key(2), (b, cfg.horizon, cfg.action_dim)),
        }
        loss, aux = dreamvla.compute_loss(params, jax.random.key(3), batch, cfg, FP32)
        assert jnp.isfinite(loss)
        assert float(aux["world_loss"]) > 0

        g = jax.grad(lambda p: dreamvla.compute_loss(p, jax.random.key(3), batch, cfg, FP32)[0])(params)
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(tot) and tot > 0

    def test_single_frame_batch_has_finite_loss(self):
        """T == 1 leaves nothing for the next-frame world loss; the term
        must drop to zero instead of jnp.mean over an empty slice (NaN)."""
        cfg = dreamvla.DreamVLAConfig.tiny()
        params = dreamvla.init(jax.random.key(0), cfg)
        batch = {
            "images": jax.random.uniform(
                jax.random.key(1), (2, 1, cfg.vision.image_size,
                                    cfg.vision.image_size, 3), minval=-1, maxval=1),
            "actions": jax.random.normal(jax.random.key(2), (2, cfg.horizon, cfg.action_dim)),
        }
        loss, aux = dreamvla.compute_loss(params, jax.random.key(3), batch, cfg, FP32)
        assert jnp.isfinite(loss)
        assert float(aux["world_loss"]) == 0.0

    def test_dream_heads_gated_on_targets(self):
        """dynamic/depth/semantic losses fire only when their targets ride
        in the batch, and their gradients reach the matching heads."""
        cfg = dreamvla.DreamVLAConfig.tiny()
        params = dreamvla.init(jax.random.key(0), cfg)
        b, g = 2, cfg.vision.grid
        base = {
            "images": jax.random.uniform(
                jax.random.key(1), (b, cfg.history, cfg.vision.image_size,
                                    cfg.vision.image_size, 3), minval=-1, maxval=1),
            "actions": jax.random.normal(jax.random.key(2), (b, cfg.horizon, cfg.action_dim)),
        }
        _, aux0 = dreamvla.compute_loss(params, jax.random.key(3), base, cfg, FP32)
        assert "dynamic_loss" not in aux0 and "depth_loss" not in aux0

        full = dict(base)
        full["dynamic_mask"] = (jax.random.uniform(jax.random.key(4),
                                                   (b, cfg.history, g, g)) > 0.5)
        full["depth"] = jax.random.uniform(jax.random.key(5), (b, cfg.history, g, g))
        full["semantic"] = jax.random.normal(
            jax.random.key(6), (b, cfg.history, cfg.num_latents, cfg.semantic_dim))
        loss, aux = dreamvla.compute_loss(params, jax.random.key(3), full, cfg, FP32)
        for k in ("dynamic_loss", "depth_loss", "semantic_loss"):
            assert np.isfinite(float(aux[k])) and float(aux[k]) > 0, k
        assert float(loss) > float(aux["action_loss"])

        grads = jax.grad(
            lambda p: dreamvla.compute_loss(p, jax.random.key(3), full, cfg, FP32)[0]
        )(params)
        for head in ("dynamic", "depth", "semantic"):
            tot = sum(float(jnp.abs(l).sum())
                      for l in jax.tree.leaves(grads["heads"][head]))
            assert tot > 0, head

    def test_frame_causality(self):
        """Changing frame 2 must not affect frame 1's world prediction."""
        cfg = dreamvla.DreamVLAConfig.tiny()
        params = dreamvla.init(jax.random.key(0), cfg)
        imgs = jax.random.uniform(
            jax.random.key(1), (1, 2, cfg.vision.image_size, cfg.vision.image_size, 3))
        _, _, pred_a, _ = dreamvla.forward(params, imgs, cfg, FP32)
        imgs2 = imgs.at[:, 1].set(0.0)
        _, _, pred_b, _ = dreamvla.forward(params, imgs2, cfg, FP32)
        np.testing.assert_allclose(
            np.asarray(pred_a[:, 0]), np.asarray(pred_b[:, 0]), atol=1e-5
        )
        assert not np.allclose(np.asarray(pred_a[:, 1]), np.asarray(pred_b[:, 1]))


class TestTextProcessing:
    def test_token_processor(self):
        from intact_tpu.utils.text_processing import TokenProcessor

        tp = TokenProcessor(max_length=8, vocab_size=1000)
        out = tp.encode(["pick the cup", "x"])
        assert out["input_ids"].shape == (2, 8)
        assert out["attention_mask"].shape == (2, 8)
        assert out["input_ids"].max() < 1000

    def test_hash_embedding_deterministic(self):
        from intact_tpu.utils.text_processing import HashEmbedding

        he = HashEmbedding(dim=16)
        a = he.encode(["open the drawer"])["embedding"]
        b = he.encode(["open the drawer"])["embedding"]
        np.testing.assert_array_equal(a, b)
        c = he.encode(["close the drawer"])["embedding"]
        assert not np.allclose(a, c)
        assert a.shape == (1, 16)
