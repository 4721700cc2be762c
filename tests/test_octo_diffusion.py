"""Octo + diffusion + DiT tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models import diffusion as diff

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


class TestDiffusion:
    def test_schedule_monotone(self):
        s = diff.make_schedule(50)
        acp = np.asarray(s.alphas_cumprod)
        assert acp[0] > acp[-1] and (np.diff(acp) < 0).all()
        assert 0 < acp[-1] < acp[0] < 1

    def test_q_sample_endpoints(self):
        s = diff.make_schedule(100)
        x0 = jnp.ones((2, 3))
        noise = jnp.zeros((2, 3))
        # t=0: nearly x0
        np.testing.assert_allclose(
            np.asarray(diff.q_sample(s, x0, jnp.zeros(2, jnp.int32), noise)),
            np.asarray(x0) * float(jnp.sqrt(s.alphas_cumprod[0])),
        )

    def test_ddpm_recovers_simple_distribution(self):
        """With a perfect denoiser for x0=0, sampling must contract to ~0."""
        s = diff.make_schedule(50)

        def eps_fn(x_t, t_int, cond):
            # exact eps for x0 = 0: x_t = sqrt(1-acp) * eps
            acp = s.alphas_cumprod[t_int][:, None]
            return x_t / jnp.sqrt(1 - acp)

        out = diff.ddpm_sample(s, eps_fn, jax.random.key(0), (8, 4))
        assert float(jnp.abs(out).mean()) < 0.2

    def test_ddim_deterministic(self):
        s = diff.make_schedule(40)

        def eps_fn(x_t, t_int, cond):
            return x_t * 0.1

        a = diff.ddim_sample(s, eps_fn, jax.random.key(1), (2, 3), num_steps=8)
        b = diff.ddim_sample(s, eps_fn, jax.random.key(1), (2, 3), num_steps=8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ddim_eta_injects_noise(self):
        """eta > 0 must produce the stochastic DDIM update (it used to be
        silently ignored): different from eta=0, still finite, and
        deterministic under a fixed key."""
        s = diff.make_schedule(40)

        def eps_fn(x_t, t_int, cond):
            return x_t * 0.1

        det = diff.ddim_sample(s, eps_fn, jax.random.key(1), (2, 3), num_steps=8)
        sto = diff.ddim_sample(
            s, eps_fn, jax.random.key(1), (2, 3), num_steps=8, eta=1.0
        )
        sto2 = diff.ddim_sample(
            s, eps_fn, jax.random.key(1), (2, 3), num_steps=8, eta=1.0
        )
        assert np.isfinite(np.asarray(sto)).all()
        assert not np.allclose(np.asarray(det), np.asarray(sto))
        np.testing.assert_array_equal(np.asarray(sto), np.asarray(sto2))


class TestDiT:
    def test_dit_zero_init_identity_and_grads(self):
        from intact_tpu.models import dit

        cfg = dit.tiny_test_config()
        params = dit.init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (2, cfg.horizon, cfg.action_dim))
        t = jnp.asarray([3, 7])
        cond = jax.random.normal(jax.random.key(2), (2, cfg.cond_dim))
        out = dit.apply(params, x, t, cond, cfg, FP32)
        # adaLN-zero + zero-init output proj -> exact zero at init
        np.testing.assert_array_equal(np.asarray(out), 0.0)

        def loss(p):
            return jnp.square(dit.apply(p, x, t, cond, cfg, FP32) - 1.0).mean()

        g = jax.grad(loss)(params)
        assert np.isfinite(sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g)))


class TestOcto:
    @pytest.fixture(scope="class")
    def setup(self):
        from intact_tpu.models.octo import OctoConfig, model as octo

        cfg = OctoConfig.tiny()
        params = octo.init(jax.random.key(0), cfg)
        ks = jax.random.split(jax.random.key(1), 4)
        b = 2
        batch = {
            "images": jax.random.uniform(
                ks[0], (b, cfg.history, cfg.image_size, cfg.image_size, 3),
                minval=-1, maxval=1,
            ),
            "img_masks": jnp.asarray([[False, True], [True, True]]),  # padded history
            "lang_tokens": jax.random.randint(ks[1], (b, cfg.max_lang_tokens), 0, 256),
            "lang_masks": jnp.ones((b, cfg.max_lang_tokens), bool),
            "state": jnp.zeros((b, cfg.proprio_dim)),
            "actions": jax.random.normal(ks[2], (b, cfg.horizon, cfg.action_dim)),
        }
        return cfg, params, batch, octo

    def test_mask_template_rules(self):
        from intact_tpu.models.octo.model import _mask_template

        m = _mask_template(lt=2, per_frame=3, history=2)
        lt, pf = 2, 3
        r1 = lt + pf          # readout_1 index
        o2 = lt + pf + 1      # first obs_2 index
        # task only attends task
        assert m[0, :lt].all() and not m[0, lt:].any()
        # obs_2 attends obs_1 but NOT readout_1
        assert m[o2, lt] and not m[o2, r1]
        # readout_1 attends obs_1 + itself, not obs_2
        assert m[r1, lt] and m[r1, r1] and not m[r1, o2]
        # obs_1 does not attend obs_2 (causality over history)
        assert not m[lt, o2]

    def test_loss_and_grads(self, setup):
        cfg, params, batch, octo = setup
        loss, _ = octo.compute_loss(params, jax.random.key(3), batch, cfg, FP32)
        assert jnp.isfinite(loss)
        g = jax.grad(lambda p: octo.compute_loss(p, jax.random.key(3), batch, cfg, FP32)[0])(params)
        for name in ["patch_embed", "lang_embed", "readout_embed", "head"]:
            tot = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g[name]))
            assert np.isfinite(tot) and tot > 0, name

    def test_proprio_conditions_the_model(self, setup):
        """use_proprio=True must actually feed the state through
        proprio_proj: different states -> different actions, and the
        projection receives gradient (it was a dead, checkpointed-but-
        unused parameter before)."""
        import dataclasses

        cfg, _, batch, octo = setup
        pcfg = dataclasses.replace(cfg, use_proprio=True)
        params = octo.init(jax.random.key(0), pcfg)
        b = dict(batch)
        a0 = octo.sample_actions(
            params, jax.random.key(5), b["images"], b["img_masks"],
            b["lang_tokens"], b["lang_masks"],
            jnp.zeros((2, pcfg.proprio_dim)), pcfg, FP32,
        )
        a1 = octo.sample_actions(
            params, jax.random.key(5), b["images"], b["img_masks"],
            b["lang_tokens"], b["lang_masks"],
            jnp.full((2, pcfg.proprio_dim), 3.0), pcfg, FP32,
        )
        assert not np.allclose(np.asarray(a0), np.asarray(a1))
        g = jax.grad(lambda p: octo.compute_loss(
            p, jax.random.key(3), {**b, "state": jnp.ones((2, pcfg.proprio_dim))},
            pcfg, FP32)[0])(params)
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g["proprio_proj"]))
        assert np.isfinite(tot) and tot > 0

    def test_sample_shape_and_determinism(self, setup):
        cfg, params, batch, octo = setup
        fn = jax.jit(lambda k: octo.sample_actions(
            params, k, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], batch["state"], cfg, FP32,
        ))
        a1, a2 = fn(jax.random.key(5)), fn(jax.random.key(5))
        assert a1.shape == (2, cfg.horizon, cfg.action_dim)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert jnp.isfinite(a1).all()

    def test_trains_through_generic_trainer_interface(self, setup):
        cfg, params, batch, octo = setup
        import optax

        tx = optax.adam(1e-3)
        opt = tx.init(params)

        def loss_fn(p, key):
            return octo.compute_loss(p, key, batch, cfg, FP32)[0]

        @jax.jit
        def step(p, o, k):
            l, g = jax.value_and_grad(loss_fn)(p, k)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, l

        l0 = None
        for i in range(10):
            params, opt, l = step(params, opt, jax.random.key(i))
            l0 = l0 if l0 is not None else float(l)
        # fixed-key eval decreased
        assert float(loss_fn(params, jax.random.key(0))) < float(
            loss_fn(setup[1], jax.random.key(0))
        )
