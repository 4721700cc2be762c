"""Pallas fused attention vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.ops.attention import xla_attention
from intact_tpu.ops.pallas_attention import flash_attention


def rand_qkv(key, b, t, s, h, kvh, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, t, h, d), dtype)
    k = jax.random.normal(ks[1], (b, s, kvh, d), dtype)
    v = jax.random.normal(ks[2], (b, s, kvh, d), dtype)
    return q, k, v


class TestPallasAttention:
    @pytest.mark.parametrize("t,s,h,kvh,d", [
        (128, 128, 2, 1, 128),   # aligned, GQA
        (200, 330, 4, 4, 128),   # unaligned seq lens (pi0 prefix-ish), MHA
        (51, 384, 8, 1, 256),    # pi0 decode-ish: suffix q over prefix+suffix kv
    ])
    def test_matches_xla(self, t, s, h, kvh, d):
        q, k, v = rand_qkv(jax.random.key(0), 2, t, s, h, kvh, d)
        # block mask: padding + lower-block structure
        mask = np.ones((2, t, s), bool)
        mask[:, :, s - 7:] = False  # kv padding
        mask[0, : t // 2, : s // 3] = False  # arbitrary block
        mask = jnp.asarray(mask)

        ref = xla_attention(q, k, v, mask)
        out = flash_attention(q, k, v, mask, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_fully_masked_rows_are_zero(self):
        q, k, v = rand_qkv(jax.random.key(1), 1, 8, 16, 2, 1, 128)
        mask = np.ones((1, 8, 16), bool)
        mask[0, 3] = False  # query row 3 attends nothing
        out = flash_attention(q, k, v, jnp.asarray(mask), interpret=True)
        np.testing.assert_array_equal(np.asarray(out[0, 3]), 0.0)
        assert np.isfinite(np.asarray(out)).all()

    def test_bf16_inputs(self):
        q, k, v = rand_qkv(jax.random.key(2), 1, 64, 64, 2, 1, 128, jnp.bfloat16)
        ref = xla_attention(q, k, v, None)
        out = flash_attention(q, k, v, None, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
        )

    def test_dispatcher_fallback(self):
        """impl='pallas' off-TPU must still produce correct results."""
        from intact_tpu.ops.attention import multi_head_attention

        q, k, v = rand_qkv(jax.random.key(3), 1, 32, 32, 2, 1, 64)
        ref = xla_attention(q, k, v, None)
        out = multi_head_attention(q, k, v, None, impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestSplitCacheAttention:
    @pytest.mark.parametrize("h,kvh", [(8, 1), (4, 4), (8, 2)])
    def test_matches_concat(self, h, kvh):
        """xla_attention_cached(q, cache, fresh) == xla_attention over the
        concatenated K/V — the decode path must be a pure bandwidth
        optimization, never a numerics change."""
        from intact_tpu.ops.attention import xla_attention_cached

        b, t, s1, s2, d = 2, 5, 37, 5, 64
        key = jax.random.key(3)
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (b, t, h, d))
        kc = jax.random.normal(ks[1], (b, s1, kvh, d))
        vc = jax.random.normal(ks[2], (b, s1, kvh, d))
        kn = jax.random.normal(ks[3], (b, s2, kvh, d))
        vn = jax.random.normal(ks[4], (b, s2, kvh, d))
        mask = np.ones((b, t, s1 + s2), bool)
        mask[:, :, s1 - 3:s1] = False   # cache padding
        mask[0, :2, s1 + 1:] = False    # block structure in the fresh part
        mask = jnp.asarray(mask)

        ref = xla_attention(
            q, jnp.concatenate([kc, kn], axis=1),
            jnp.concatenate([vc, vn], axis=1), mask,
        )
        out = xla_attention_cached(
            q, kc, vc, kn, vn, mask[:, :, :s1], mask[:, :, s1:],
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-6, rtol=2e-6,
        )


class TestPallasVJP:
    def test_grad_matches_xla(self):
        """pallas_attention_diff (flash fwd, XLA-math bwd) produces the same
        gradients as differentiating the einsum path directly."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from intact_tpu.ops.attention import pallas_attention_diff, xla_attention

        rng = np.random.default_rng(0)
        b, t, h, kvh, d = 2, 5, 4, 2, 8
        q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, t, kvh, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, t, kvh, d)), jnp.float32)
        mask = jnp.asarray(rng.random((b, t, t)) > 0.3)
        scale = d**-0.5

        def loss_pallas(q_, k_, v_):
            return pallas_attention_diff(q_, k_, v_, mask, scale, True).sum()

        def loss_xla(q_, k_, v_):
            return xla_attention(q_, k_, v_, mask, scale).sum()

        out_p = pallas_attention_diff(q, k, v, mask, scale, True)
        out_x = xla_attention(q, k, v, mask, scale)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   rtol=1e-4, atol=1e-5)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)
