"""ops/pallas_adam.py — the fused in-place AdamW row kernel — pinned
against the XLA chunked decode->adam->encode chain it replaces
(train/fused_joint._chunked_quant_update), in Pallas interpret mode on
the CPU test mesh. On-chip behavior is exercised by
scripts/profile_joint_phases.py / bench.py --recipe joint.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import common as cm
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.ops import pallas_adam
from intact_tpu.train.fused_joint import (
    _chunked_quant_update,
    init_fused_state,
    make_fused_joint_step,
)
from intact_tpu.train.optim import OptimizerConfig

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
OPT = OptimizerConfig(lr=1e-3, weight_decay=1e-4, warmup_steps=2,
                      first_cycle_steps=100, max_grad_norm=1e9)


def _moment_rows(key, shape, dtype):
    """-> (q rows, scales) — scales are 2-D/1-D [..., NB] (no trailing 1)."""
    x = jax.random.normal(key, shape, jnp.float32) * 0.1
    if dtype == jnp.float32:
        return x, jnp.zeros(shape[:-1], jnp.float32)
    cap = 448.0 if dtype == jnp.float8_e4m3fn else 57344.0
    if dtype == jnp.float8_e5m2:
        x = jnp.abs(x)  # nu is non-negative
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / cap
    scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    return (x / scale).astype(dtype), jnp.squeeze(scale, -1)


class TestKernelParity:
    @pytest.mark.parametrize("mode", ["fp8", "exact"])
    def test_matches_xla_chain(self, mode):
        L, r, B, NB, off = 3, 128, 256, 512, 128
        layer = 1
        ks = jax.random.split(jax.random.key(0), 8)
        p = jax.random.normal(ks[0], (L, r, B), jnp.float32)
        g = jax.random.normal(ks[1], (r, B), jnp.float32) * 0.01
        mdt = jnp.float8_e4m3fn if mode == "fp8" else jnp.float32
        ndt = jnp.float8_e5m2 if mode == "fp8" else jnp.float32
        qm, sm = _moment_rows(ks[2], (L, NB, B), mdt)
        qn, sn = _moment_rows(ks[3], (L, NB, B), ndt)
        qn = jnp.abs(qn) if mode == "exact" else qn

        c1, c2 = jnp.float32(0.5), jnp.float32(0.75)
        lr, clip = jnp.float32(1e-3), jnp.float32(0.8)

        p2, qm2, sm2, qn2, sn2, ss = pallas_adam.fused_adam_rows(
            p, g, qm, sm, qn, sn, layer=layer, seed=7, c1=c1, c2=c2,
            lr=lr, clip_factor=clip, hp=OPT, row_offset=off,
            stochastic=False, interpret=True)

        # reference: the XLA chain on the same rows
        rp, rqm, rsm, rqn, rsn = _chunked_quant_update(
            p[layer], g, qm[layer, off:off + r],
            sm[layer, off:off + r][:, None],
            qn[layer, off:off + r], sn[layer, off:off + r][:, None],
            c1=c1, c2=c2, lr=lr, clip_factor=clip, hp=OPT,
            key=jax.random.key(1), stochastic=False, block_size=B)

        np.testing.assert_allclose(np.asarray(p2[layer]), np.asarray(rp),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(qm2[layer, off:off + r].astype(jnp.float32)),
            np.asarray(rqm.astype(jnp.float32)))
        np.testing.assert_allclose(np.asarray(sm2[layer, off:off + r]),
                                   np.asarray(rsm[:, 0]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(qn2[layer, off:off + r].astype(jnp.float32)),
            np.asarray(rqn.astype(jnp.float32)))
        # ss = sum of squared RAW grads
        np.testing.assert_allclose(
            float(ss), float(jnp.sum(g.astype(jnp.float32) ** 2)),
            rtol=1e-5)

        # in-place semantics: rows outside [off, off+r) of `layer` and all
        # other layers untouched
        for other in (0, 2):
            np.testing.assert_array_equal(
                np.asarray(p2[other]), np.asarray(p[other]))
            np.testing.assert_array_equal(
                np.asarray(qm2[other].astype(jnp.float32)),
                np.asarray(qm[other].astype(jnp.float32)))
        np.testing.assert_array_equal(
            np.asarray(qm2[layer, :off].astype(jnp.float32)),
            np.asarray(qm[layer, :off].astype(jnp.float32)))
        np.testing.assert_array_equal(
            np.asarray(qm2[layer, off + r:].astype(jnp.float32)),
            np.asarray(qm[layer, off + r:].astype(jnp.float32)))

    def test_bf16_stochastic_rounding_brackets_exact(self):
        """SR path: bf16 params land on one of the two bf16 values
        bracketing the deterministic (round-to-nearest) update."""
        L, r, B = 1, 128, 256
        p = jax.random.normal(jax.random.key(5), (L, r, B)) \
            .astype(jnp.bfloat16)
        g = jax.random.normal(jax.random.key(6), (r, B), jnp.float32) * 0.1
        qm, sm = _moment_rows(jax.random.key(2), (L, r, B), jnp.float32)
        qn, sn = jnp.abs(qm), sm
        kw = dict(layer=0, seed=3, c1=jnp.float32(0.1),
                  c2=jnp.float32(0.001), lr=jnp.float32(1e-2),
                  clip_factor=jnp.float32(1.0), hp=OPT, row_offset=0,
                  interpret=True)
        p_sr, *_ = pallas_adam.fused_adam_rows(
            p, g, qm, sm, qn, sn, stochastic=True, **kw)
        p_rn, *_ = pallas_adam.fused_adam_rows(
            p, g, qm, sm, qn, sn, stochastic=False, **kw)
        assert p_sr.dtype == jnp.bfloat16
        sr = np.asarray(p_sr, np.float32)
        rn = np.asarray(p_rn, np.float32)
        # within one bf16 ulp of the round-to-nearest result, and not
        # identical everywhere (the noise actually did something)
        ulp = np.maximum(np.abs(rn) * 2.0 ** -7, 2.0 ** -133)
        assert np.all(np.abs(sr - rn) <= ulp)
        assert np.any(sr != rn)

    def test_eligibility(self):
        assert pallas_adam.eligible(128 * 2048, 2048)
        assert not pallas_adam.eligible(2048, 2048)          # 1 row
        assert not pallas_adam.eligible(2047 * 128, 2048)    # ragged
        assert pallas_adam.eligible(16384 * 2048, 2048)


class TestStepWithPallasInterpret:
    def test_step_parity_interpret_vs_off(self):
        """Full fused step: the Pallas(interpret) path == the XLA path on
        a config whose trunk leaves are row-aligned (block 8 makes the
        tiny config's matrices eligible)."""
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        blk = 8
        kw = dict(block_size=blk, min_quant_elems=64,
                  stochastic_rounding=False)
        n_elig = sum(
            pallas_adam.eligible(int(np.prod(l.shape[1:])), blk)
            for l in jax.tree.leaves(params["vlm"]["blocks"]))
        assert n_elig > 0  # the test actually exercises the kernel

        s_a = init_fused_state(params, seed=7, min_quant_elems=64,
                               block_size=blk)
        s_b = init_fused_state(params, seed=7, min_quant_elems=64,
                               block_size=blk)
        step_a = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, pallas_mode="interpret", **kw))
        step_b = jax.jit(make_fused_joint_step(
            cfg, OPT, FP32, pallas_mode="off", **kw))

        ks = jax.random.split(jax.random.key(1), 5)
        s = cfg.vision.image_size
        b = 2
        batch = {
            "images": jax.random.uniform(
                ks[0], (b, cfg.num_cameras, s, s, 3), minval=-1, maxval=1),
            "img_masks": jnp.ones((b, cfg.num_cameras), bool),
            "lang_tokens": jax.random.randint(
                ks[1], (b, cfg.tokenizer_max_length), 0, 256),
            "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
            "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
            "actions": jax.random.normal(
                ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
        }
        for _ in range(2):
            s_a, m_a = step_a(s_a, batch)
            s_b, m_b = step_b(s_b, batch)
        np.testing.assert_allclose(float(m_a["l2_loss"]),
                                   float(m_b["l2_loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_a["grad_norm"]),
                                   float(m_b["grad_norm"]), rtol=1e-4)
        flat_a = jax.tree_util.tree_flatten_with_path(s_a.params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(s_b.params)[0])
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_b[path]),
                rtol=2e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))
