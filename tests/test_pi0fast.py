"""Pi0FAST tests: tokenization round trip, CE loss, greedy decode, and
teacher-forcing/decode consistency (an overfit batch decodes its targets)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models.pi0fast import Pi0FASTConfig, model as fast

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def cfg():
    return Pi0FASTConfig.tiny()


@pytest.fixture(scope="module")
def batch(cfg):
    ks = jax.random.split(jax.random.key(1), 4)
    b, s = 2, cfg.vision.image_size
    return {
        "images": jax.random.uniform(ks[0], (b, 1, s, s, 3), minval=-1, maxval=1),
        "img_masks": jnp.ones((b, 1), bool),
        "lang_tokens": jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 200),
        "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.uniform(
            ks[3], (b, cfg.chunk_size, cfg.max_action_dim), minval=-2, maxval=2
        ),
    }


class TestTokenization:
    def test_roundtrip_within_bin(self, cfg):
        a = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (3, cfg.chunk_size, cfg.max_action_dim)))
        ids = fast.tokenize_actions(a, cfg)
        assert ids.shape == (3, cfg.n_action_tokens)
        assert int(ids.min()) >= cfg.vlm.vocab_size - cfg.n_action_bins
        back = fast.detokenize_actions(ids, cfg)
        bin_w = (cfg.action_high - cfg.action_low) / cfg.n_action_bins
        np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=bin_w)


class TestPi0FAST:
    def test_loss_finite_and_grads(self, cfg, batch):
        params = fast.init(jax.random.key(0), cfg)
        loss, aux = fast.compute_loss(params, jax.random.key(2), batch, cfg, FP32)
        assert jnp.isfinite(loss)
        assert 0 <= float(aux["token_accuracy"]) <= 1
        g = jax.grad(lambda p: fast.compute_loss(p, jax.random.key(2), batch, cfg, FP32)[0])(params)
        for name in ["vlm", "vlm_embed", "action_start", "state_proj"]:
            tot = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g[name]))
            assert np.isfinite(tot) and tot > 0, name

    def test_greedy_decode_shape_deterministic(self, cfg, batch):
        params = fast.init(jax.random.key(0), cfg)
        fn = jax.jit(lambda: fast.sample_actions(
            params, jax.random.key(0), batch["images"], batch["img_masks"],
            batch["lang_tokens"], batch["lang_masks"], batch["state"], cfg, FP32,
        ))
        a1, a2 = fn(), fn()
        assert a1.shape == (2, cfg.chunk_size, cfg.max_action_dim)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert float(jnp.abs(a1).max()) <= cfg.action_high

    def test_overfit_decodes_targets(self, cfg, batch):
        """After overfitting one batch, greedy decode must reproduce the
        teacher-forced target tokens — pins train/decode consistency
        (positions, cache layout, start token)."""
        params = fast.init(jax.random.key(0), cfg)
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(
                lambda pp: fast.compute_loss(pp, jax.random.key(0), batch, cfg, FP32)[0]
            )(p)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, l

        for _ in range(60):
            params, opt, loss = step(params, opt)

        _, aux = fast.compute_loss(params, jax.random.key(0), batch, cfg, FP32)
        assert float(aux["token_accuracy"]) > 0.95, float(aux["token_accuracy"])

        targets = fast.tokenize_actions(batch["actions"], cfg)
        decoded = fast.sample_actions(
            params, jax.random.key(0), batch["images"], batch["img_masks"],
            batch["lang_tokens"], batch["lang_masks"], batch["state"], cfg, FP32,
        )
        expected = fast.detokenize_actions(targets, cfg)
        match = float(jnp.mean((jnp.abs(decoded - expected) < 1e-5).astype(jnp.float32)))
        assert match > 0.9, match


class TestFastTokenTargets:
    def test_loss_with_precomputed_fast_tokens(self):
        """FAST DCT+BPE targets from the host pipeline drive the CE loss
        (in place of the in-graph binning) and respect the token mask."""
        import numpy as np

        from intact_tpu.models.pi0fast.fast_tokenizer import FastTokenizer

        cfg = Pi0FASTConfig.tiny()
        params = fast.init(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        b, s = 2, cfg.vision.image_size
        actions = rng.uniform(-0.8, 0.8, (b, cfg.chunk_size, cfg.max_action_dim)).astype(np.float32)

        tok = FastTokenizer(scale=20.0, max_token=64).fit(
            rng.uniform(-0.8, 0.8, (16, cfg.chunk_size, cfg.max_action_dim)).astype(np.float32)
        )
        n_tok = cfg.chunk_size * cfg.max_action_dim
        ids, mask = tok.encode_batch(actions, max_len=n_tok, vocab_size=cfg.vlm.vocab_size)

        batch = {
            "images": jnp.asarray(rng.uniform(-1, 1, (b, 1, s, s, 3)), jnp.float32),
            "img_masks": jnp.ones((b, 1), bool),
            "lang_tokens": jnp.ones((b, cfg.tokenizer_max_length), jnp.int32),
            "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
            "state": jnp.zeros((b, cfg.max_state_dim), jnp.float32),
            "actions": jnp.asarray(actions),
            "action_tokens": jnp.asarray(ids),
            "action_token_mask": jnp.asarray(mask),
        }
        loss, aux = fast.compute_loss(params, jax.random.key(1), batch, cfg, FP32)
        assert np.isfinite(float(loss))

        # binning path still works without tokens
        batch.pop("action_tokens"); batch.pop("action_token_mask")
        loss2, _ = fast.compute_loss(params, jax.random.key(1), batch, cfg, FP32)
        assert np.isfinite(float(loss2))
        assert not np.isclose(float(loss), float(loss2))


class TestTokenReturn:
    def test_return_tokens_matches_action_path(self):
        """return_tokens exposes the greedy ids the action path detokenizes
        — the hook the FAST host-side decoder consumes."""
        import functools

        import numpy as np

        cfg = Pi0FASTConfig.tiny()
        params = fast.init(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        b, s = 2, cfg.vision.image_size
        args = (
            params, jax.random.key(1),
            jnp.asarray(rng.uniform(-1, 1, (b, 1, s, s, 3)), jnp.float32),
            jnp.ones((b, 1), bool),
            jnp.ones((b, cfg.tokenizer_max_length), jnp.int32),
            jnp.ones((b, cfg.tokenizer_max_length), bool),
            jnp.zeros((b, cfg.max_state_dim), jnp.float32),
        )
        sample = functools.partial(fast.sample_actions, cfg=cfg, policy=FP32)
        tokens = sample(*args, return_tokens=True)
        actions = sample(*args)
        np.testing.assert_allclose(
            np.asarray(actions), np.asarray(fast.detokenize_actions(tokens, cfg)),
            rtol=1e-6,
        )
        # ids live in the vocab tail
        assert int(tokens.min()) >= cfg.vlm.vocab_size - cfg.n_action_bins

    def test_fast_vocab_window_widens_decode(self):
        """action_vocab_size (the FAST tokenizer's max_token) widens the
        decode window past n_action_bins so BPE merge tokens are emittable
        — without it a FAST-trained model could never produce them."""
        import dataclasses
        import functools

        import numpy as np

        cfg = dataclasses.replace(Pi0FASTConfig.tiny(), action_vocab_size=64)
        assert cfg.action_vocab_size > cfg.n_action_bins
        params = fast.init(jax.random.key(0), cfg)
        rng = np.random.default_rng(0)
        b, s = 2, cfg.vision.image_size
        sample = functools.partial(fast.sample_actions, cfg=cfg, policy=FP32)
        tokens = sample(
            params, jax.random.key(1),
            jnp.asarray(rng.uniform(-1, 1, (b, 1, s, s, 3)), jnp.float32),
            jnp.ones((b, 1), bool),
            jnp.ones((b, cfg.tokenizer_max_length), jnp.int32),
            jnp.ones((b, cfg.tokenizer_max_length), bool),
            jnp.zeros((b, cfg.max_state_dim), jnp.float32),
            return_tokens=True,
        )
        lo = cfg.vlm.vocab_size - cfg.action_vocab_size
        assert int(tokens.min()) >= lo and int(tokens.max()) < cfg.vlm.vocab_size
