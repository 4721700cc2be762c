"""Fused joint train step (train/fused_joint.py) — the hand-rolled
reverse-scan backward with in-layer 8-bit Adam updates — pinned against
standard autodiff + optax on the tiny pi0 config.

The key gate VERDICT r3 asked for: with quantization disabled (fp32
moments), no clipping active, and round-to-nearest updates, the fused step
must reproduce the standard jax.grad + optax step to float tolerance —
i.e. the manual VJP chain IS the same math, just scheduled so the full
gradient tree never exists.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.train.fused_joint import (
    FusedTrainState,
    init_fused_state,
    make_fused_joint_step,
)
from intact_tpu.train.optim import OptimizerConfig, make_optimizer
from intact_tpu.train.train_step import init_train_state, make_train_step

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def cfg():
    return Pi0Config.tiny()


def _batch(cfg, b=2, seed=1):
    ks = jax.random.split(jax.random.key(seed), 5)
    s = cfg.vision.image_size
    lang_masks = np.zeros((b, cfg.tokenizer_max_length), bool)
    lang_masks[:, :5] = True
    return {
        "images": jax.random.uniform(ks[0], (b, cfg.num_cameras, s, s, 3),
                                     minval=-1, maxval=1),
        "img_masks": jnp.ones((b, cfg.num_cameras), bool),
        "lang_tokens": jax.random.randint(
            ks[1], (b, cfg.tokenizer_max_length), 0, 256),
        "lang_masks": jnp.asarray(lang_masks),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.normal(
            ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
    }


def _trainable_mask(params):
    mask = jax.tree.map(lambda _: True, params)
    mask["vlm_embed"] = jax.tree.map(lambda _: False, mask["vlm_embed"])
    return mask


OPT = OptimizerConfig(lr=1e-3, weight_decay=1e-4, warmup_steps=2,
                      first_cycle_steps=100, max_grad_norm=1e9)


class TestFusedMatchesStandard:
    def test_three_steps_match_autodiff(self, cfg):
        params = pi0.init(jax.random.key(0), cfg)
        mask = _trainable_mask(params)
        batch = _batch(cfg)

        # standard: jax.grad + clip + 8bit-adamw (fp32-moment path) + SR off
        opt = dataclasses.replace(OPT, quantize_moments=True)
        tx, _ = make_optimizer(opt, frozen_mask=mask)
        std_state = init_train_state(params, tx, seed=7)
        std_step = jax.jit(make_train_step(
            lambda p, k, b: pi0.compute_loss(p, k, b, cfg, FP32),
            tx, FP32, remat=False, trainable_mask=mask,
            stochastic_rounding=False,
        ))

        # fused: manual reverse-scan backward, quantization disabled via a
        # min_quant threshold above every tiny-config leaf
        fused_step = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, min_quant_elems=1 << 30,
            stochastic_rounding=False, clip_mode="delayed",
        ))
        fused_state = init_fused_state(params, seed=7,
                                       min_quant_elems=1 << 30)

        losses_std, losses_fused = [], []
        for _ in range(3):
            std_state, m_std = std_step(std_state, batch)
            fused_state, m_fused = fused_step(fused_state, batch)
            losses_std.append(float(m_std["l2_loss"]))
            losses_fused.append(float(m_fused["l2_loss"]))

        np.testing.assert_allclose(losses_fused, losses_std, rtol=1e-5)
        # grad norms agree (fused computes it during the reverse scan;
        # frozen vlm_embed contributes zero in both)
        np.testing.assert_allclose(
            float(m_fused["grad_norm"]), float(m_std["grad_norm"]),
            rtol=1e-4)

        # Leaves with mathematically-zero gradient (attention K biases:
        # softmax is invariant to a per-key constant) carry pure float-noise
        # gradients which Adam normalizes into O(lr) updates — the two
        # implementations produce DIFFERENT noise there by reassociation.
        # Compare only leaves with a real gradient signal.
        grads = jax.grad(
            lambda p: pi0.compute_loss(p, jax.random.key(9), batch, cfg,
                                       FP32)[0])(params)
        gflat = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
        grad_scale = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))

        flat_std = jax.tree_util.tree_flatten_with_path(std_state.params)[0]
        flat_fused = dict(
            jax.tree_util.tree_flatten_with_path(fused_state.params)[0])
        gmax = max(float(jnp.abs(l).max()) for _, l in flat_std)
        compared = 0
        for path, leaf in flat_std:
            if float(jnp.abs(gflat[path]).max()) < 1e-6 * grad_scale:
                continue  # zero-gradient leaf: adam-amplified noise only
            compared += 1
            np.testing.assert_allclose(
                np.asarray(flat_fused[path]), np.asarray(leaf),
                rtol=2e-4, atol=1e-5 * gmax,
                err_msg=jax.tree_util.keystr(path),
            )
        assert compared > 20  # the comparison actually covered the model

    def test_frozen_embed_untouched(self, cfg):
        params = pi0.init(jax.random.key(0), cfg)
        fused_step = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, min_quant_elems=1 << 30,
            stochastic_rounding=False))
        state = init_fused_state(params, seed=7, min_quant_elems=1 << 30)
        state, _ = fused_step(state, _batch(cfg))
        np.testing.assert_array_equal(
            np.asarray(state.params["vlm_embed"]["embedding"]),
            np.asarray(params["vlm_embed"]["embedding"]))
        assert "vlm_embed" not in state.mu


class TestQuantizedFused:
    @pytest.mark.parametrize("moment_dtype", ["fp8", "int8"])
    def test_quantized_step_tracks_exact(self, cfg, moment_dtype):
        """With 8-bit moments ON (tiny threshold) the trajectory stays close
        to the exact one — both storage modes (fp8 native converts and the
        int8 dynamic codebook)."""
        params = pi0.init(jax.random.key(0), cfg)
        batch = _batch(cfg)
        exact = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, min_quant_elems=1 << 30,
            stochastic_rounding=False))
        quant = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, min_quant_elems=64, block_size=256,
            stochastic_rounding=False))
        s_e = init_fused_state(params, seed=7, min_quant_elems=1 << 30)
        s_q = init_fused_state(params, seed=7, min_quant_elems=64,
                               block_size=256, moment_dtype=moment_dtype)
        for _ in range(3):
            s_e, _ = exact.__call__(s_e, batch)
            s_q, _ = quant.__call__(s_q, batch)
        moved = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).mean(),
                             s_e.params, params)
        drift = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).mean(),
                             s_q.params, s_e.params)
        total_moved = sum(jax.tree.leaves(moved))
        total_drift = sum(jax.tree.leaves(drift))
        assert total_moved > 0
        assert total_drift < 0.05 * total_moved

    def test_moment_state_is_packed_8bit_rows(self, cfg):
        params = pi0.init(jax.random.key(0), cfg)
        state = init_fused_state(params, seed=0, min_quant_elems=64,
                                 block_size=256)  # default: fp8
        q = state.mu["vlm"]["blocks"]["q"]  # ONE packed array per trunk
        assert q.dtype == jnp.float8_e4m3fn and q.dtype.itemsize == 1
        assert state.nu["vlm"]["blocks"]["q"].dtype == jnp.float8_e5m2
        assert q.ndim == 3  # [L, NB, block] packed row layout
        assert q.shape[0] == cfg.vlm.depth
        from intact_tpu.train.fused_joint import TrunkPack

        pack = TrunkPack(params["vlm"]["blocks"], 256)
        assert q.shape[1] == pack.nb

        state8 = init_fused_state(params, seed=0, min_quant_elems=64,
                                  block_size=256, moment_dtype="int8")
        assert state8.mu["vlm"]["blocks"]["q"].dtype == jnp.int8

    def test_trunk_pack_roundtrip(self, cfg):
        from intact_tpu.train.fused_joint import TrunkPack

        params = pi0.init(jax.random.key(0), cfg)
        blocks = params["vlm"]["blocks"]
        pack = TrunkPack(blocks, 256)
        rows = jax.tree.map(lambda a: a[1], blocks)
        flat = pack.pack(rows)
        assert flat.shape == (pack.nb, 256)
        back = pack.unpack(flat)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-6),
            rows, back)


class TestFusedTrainerEndToEnd:
    def test_trainer_runs_sharded_and_checkpoints(self, tmp_path, monkeypatch):
        """fused_update through the full Trainer on the 8-device CPU mesh:
        steps run, loss is finite, checkpoints save and resume (the
        FusedTrainState rides the TrainState view, train/checkpoint.py
        unchanged)."""
        from intact_tpu.config import pipeline as cp
        from intact_tpu.config.pipeline import TrainPipelineConfig

        monkeypatch.setattr(
            cp, "pi0_config_from_json", lambda d: Pi0Config.tiny())
        from intact_tpu.train.trainer import Trainer

        cfg = TrainPipelineConfig(
            name="fused_e2e",
            model_cfg={"type": "pi0"},
            global_batch_size=8,
            per_device_batch_size=1,
            n_updates=2,
            save_model_freq=2,
            log_freq=1,
            eval_freq=100,
            eval_size=4,
            use_bf16=False,
            fused_update=True,
        )
        cfg.log_dir = tmp_path
        trainer = Trainer(cfg)
        trainer.train()
        assert trainer.cnt_update == 2
        import numpy as _np

        assert _np.isfinite(float(trainer.state.step))
        # optimizer state is the fused layout (mu/nu/prev_gnorm view)
        assert set(trainer.state.opt_state) == {"mu", "nu", "prev_gnorm"}

        # resume restores counters + moments through the view
        ckpts = list((tmp_path / "fused_e2e" / "checkpoint").glob("step_*"))
        assert ckpts
        cfg2 = TrainPipelineConfig(
            name="fused_e2e",
            model_cfg={"type": "pi0"},
            global_batch_size=8,
            per_device_batch_size=1,
            n_updates=2,
            save_model_freq=100,
            log_freq=1,
            eval_freq=100,
            eval_size=4,
            use_bf16=False,
            fused_update=True,
            load_from_checkpoint=str(tmp_path / "fused_e2e" / "checkpoint"),
            resume_run=True,
        )
        cfg2.log_dir = tmp_path / "resume"
        t2 = Trainer(cfg2)
        assert t2.cnt_update == 2
        np.testing.assert_array_equal(
            np.asarray(t2.state.opt_state["prev_gnorm"]),
            np.asarray(trainer.state.opt_state["prev_gnorm"]))

    def test_accumulation_rejected(self, tmp_path, monkeypatch):
        from intact_tpu.config import pipeline as cp
        from intact_tpu.config.pipeline import TrainPipelineConfig

        monkeypatch.setattr(
            cp, "pi0_config_from_json", lambda d: Pi0Config.tiny())
        from intact_tpu.train.trainer import Trainer

        cfg = TrainPipelineConfig(
            name="fused_accum",
            model_cfg={"type": "pi0"},
            global_batch_size=16,  # needs accumulation 2 on 8 devices
            per_device_batch_size=1,
            n_updates=1,
            use_bf16=False,
            fused_update=True,
        )
        cfg.log_dir = tmp_path
        with pytest.raises(ValueError, match="accumulation"):
            Trainer(cfg)


class TestDelayedClip:
    def test_clip_factor_uses_previous_norm(self, cfg):
        params = pi0.init(jax.random.key(0), cfg)
        opt = dataclasses.replace(OPT, max_grad_norm=1e-3)  # always binds
        step = jax.jit(make_fused_joint_step(
            cfg, opt, FP32, min_quant_elems=1 << 30,
            stochastic_rounding=False, clip_mode="delayed"))
        state = init_fused_state(params, seed=7, min_quant_elems=1 << 30)
        batch = _batch(cfg)
        state, m1 = step(state, batch)
        assert float(m1["clip_factor"]) == 1.0  # step 1: no previous norm
        n1 = float(m1["grad_norm"])
        state, m2 = step(state, batch)
        np.testing.assert_allclose(
            float(m2["clip_factor"]), 1e-3 / n1, rtol=1e-5)


class TestDelayedClipTrajectory:
    def test_delayed_clip_tracks_exact_clip(self, cfg):
        """VERDICT r4 item 7: empirical evidence that the fused step's
        delayed clipping (clip with the PREVIOUS step's global norm,
        fused_joint.py docstring) tracks exact optax clip-then-adam when
        the clip BINDS every step.

        MEASURED (this test's scenario, recorded 2026-08-20): in an
        ADVERSARIAL regime — max_grad_norm 10x below the typical norm so
        the clip binds every step, on a tiny random-init model whose norm
        fluctuates strongly step to step — the 10-step-smoothed loss gap
        peaks at ~18% mid-run and decays to ~3.5% at the 60-step plateau,
        while an infinitesimal (1e-4) param perturbation of the exact run
        stays within 1e-4 (no chaos amplification at this horizon): the
        transient IS a real delayed-clipping effect, not noise, and it is
        bounded and convergent. In the production regime (bridge
        fine-tune: norms near max_norm, drifting slowly) the per-step
        factor error is correspondingly tiny. Pinned here: bounded
        transient (<25%) + plateau agreement (<6%) + both runs train."""
        params = pi0.init(jax.random.key(0), cfg)
        mask = _trainable_mask(params)
        # tiny-config grad norms are O(10): 1.0 binds from step 1
        opt = dataclasses.replace(OPT, max_grad_norm=1.0, lr=3e-3)

        tx, _ = make_optimizer(
            dataclasses.replace(opt, quantize_moments=True),
            frozen_mask=mask)
        std_step = jax.jit(make_train_step(
            lambda p, k, b: pi0.compute_loss(p, k, b, cfg, FP32),
            tx, FP32, remat=False, trainable_mask=mask,
            stochastic_rounding=False,
        ))
        fused_step = jax.jit(make_fused_joint_step(
            cfg, opt, FP32, min_quant_elems=1 << 30,
            stochastic_rounding=False, clip_mode="delayed",
        ))

        eps = 1e-4
        pert = jax.tree.map(lambda x: x, params)
        pert["vlm"] = jax.tree.map(
            lambda x: x * (1 + eps * np.sign(np.sum(np.asarray(x)))),
            pert["vlm"])

        std_state = init_train_state(params, tx, seed=7)
        pert_state = init_train_state(pert, tx, seed=7)
        fused_state = init_fused_state(params, seed=7,
                                       min_quant_elems=1 << 30)

        n_steps = 60
        ls, lf, lp, clip_bound = [], [], [], []
        for i in range(n_steps):
            batch = _batch(cfg, b=2, seed=100 + i)
            std_state, m_s = std_step(std_state, batch)
            pert_state, m_p = std_step(pert_state, batch)
            fused_state, m_f = fused_step(fused_state, batch)
            ls.append(float(m_s["l2_loss"]))
            lp.append(float(m_p["l2_loss"]))
            lf.append(float(m_f["l2_loss"]))
            clip_bound.append(float(m_f["clip_factor"]) < 1.0)

        # the scenario is real: clipping bound on (almost) every step
        assert np.mean(clip_bound[1:]) > 0.9, np.mean(clip_bound)
        k = 10
        win = np.ones(k) / k
        s_s = np.convolve(np.asarray(ls), win, mode="valid")
        f_s = np.convolve(np.asarray(lf), win, mode="valid")
        p_s = np.convolve(np.asarray(lp), win, mode="valid")
        gap_fused = np.abs(f_s - s_s) / np.maximum(np.abs(s_s), 1e-6)
        gap_chaos = np.abs(p_s - s_s) / np.maximum(np.abs(s_s), 1e-6)
        # the control pins that plain SGD here is NOT chaotic: any
        # fused-vs-exact gap is attributable to delayed clipping itself
        assert gap_chaos.max() < 1e-2, gap_chaos.max()
        # delayed clipping: bounded transient, convergent plateau
        assert gap_fused.max() < 0.25, gap_fused.max()
        assert gap_fused[-1] < 0.06, gap_fused[-1]
        # both actually trained (smoothed loss moved down vs start)
        assert f_s[-1] < f_s[0] and s_s[-1] < s_s[0]


class TestHashSR:
    """The hash-based stochastic-rounding noise (fused_joint._hash_noise_u16)
    replaces threefry in the hot per-layer update (~6 int ops/elem vs
    ~100+; threefry SR measured ~2.5 ms/layer on the bridge step). SR only
    needs unbiased uniform bits uncorrelated with the data — pin exactly
    that."""

    def test_noise_uniform_and_salt_decorrelated(self):
        from intact_tpu.train.fused_joint import _hash_noise_u16

        n1 = np.asarray(_hash_noise_u16((256, 512), jnp.uint32(12345)))
        n2 = np.asarray(_hash_noise_u16((256, 512), jnp.uint32(54321)))
        for n in (n1, n2):
            assert n.min() >= 0 and n.max() < (1 << 16)
            # uniform mean 32767.5, std 18918; mean of 131k samples has
            # se ~52 — allow 6 sigma
            assert abs(n.mean() - 32767.5) < 320, n.mean()
            # every one of 16 coarse buckets populated within 5%
            hist, _ = np.histogram(n, bins=16, range=(0, 1 << 16))
            assert np.all(np.abs(hist / n.size - 1 / 16) < 0.05 / 16 + 5e-3)
        # distinct salts decorrelate
        a = (n1.astype(np.float64) - 32767.5).ravel()
        b = (n2.astype(np.float64) - 32767.5).ravel()
        corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(corr) < 0.02, corr

    def test_sr_add_unbiased_over_salts(self):
        from intact_tpu.train.fused_joint import _sr_add

        p = jnp.full((4, 256), 1.0, jnp.bfloat16)
        upd = jnp.full((4, 256), 3e-4, jnp.float32)  # sub-bf16-ulp at 1.0
        acc = np.zeros((4, 256), np.float64)
        n = 64
        for s in range(n):
            acc += np.asarray(
                _sr_add(p, upd, jnp.uint32(1000 + s), True), np.float64)
        mean = acc / n
        exact = 1.0 + 3e-4
        # per-element SR is Bernoulli between the two bf16 neighbors
        # (1.0, 1.0078); the mean over 64 salts must bracket the exact
        # value far better than deterministic rounding (which would sit
        # at 1.0 exactly: a 3e-4 bias)
        err = abs(mean.mean() - exact)
        assert err < 1.2e-4, (mean.mean(), exact)

    def test_hash_sr_step_trains(self, cfg):
        params = pi0.init(jax.random.key(0), cfg)
        step = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, min_quant_elems=1 << 30,
            stochastic_rounding=True, sr_rng="hash"))
        state = init_fused_state(params, seed=7, min_quant_elems=1 << 30)
        batch = _batch(cfg)
        losses = []
        for _ in range(4):
            state, m = step(state, batch)
            losses.append(float(m["l2_loss"]))
        assert losses[-1] < losses[0]
