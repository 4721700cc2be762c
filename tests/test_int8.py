"""int8 W8A8 serving path: quantized dense correctness and end-to-end
closeness of quantized Pi0 sampling to the fp path."""

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.pi0 import Pi0Config, model as pi0

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


class TestInt8Dense:
    def test_quantized_dense_close_to_fp(self):
        k = jax.random.key(0)
        p = cm.dense_init(k, 64, 32)
        x = jax.random.normal(jax.random.key(1), (4, 64))
        ref = cm.dense(p, x, FP32)
        q = cm.quantize_dense(p)
        out = cm.dense(q, x, FP32)
        err = float(jnp.abs(out - ref).max()) / (float(jnp.abs(ref).max()) + 1e-9)
        assert err < 0.05, err
        assert q["kernel_q"].dtype == jnp.int8

    def test_stacked_kernel_scales(self):
        p = {"kernel": jax.random.normal(jax.random.key(0), (3, 16, 8))}
        q = cm.quantize_dense(p)
        assert q["kernel_q"].shape == (3, 16, 8)
        assert q["kernel_scale"].shape == (3, 8)

    def test_quantize_params_selects_blocks_only(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        qp = cm.quantize_params(params)
        # block matmuls quantized
        assert "kernel_q" in qp["vlm"]["blocks"]["attn"]["q"]
        assert "kernel_q" in qp["siglip"]["blocks"]["mlp"]["fc1"]
        assert "kernel_q" in qp["img_proj"]
        # heads / embeddings / patch embed stay fp
        assert "kernel" in qp["action_out_proj"]
        assert "kernel" in qp["state_proj"]
        assert "embedding" in qp["vlm_embed"]
        assert "kernel" in qp["siglip"]["patch_embed"]

    def test_int8_sampling_close_to_fp(self):
        cfg = Pi0Config.tiny()
        params = pi0.init(jax.random.key(0), cfg)
        qp = cm.quantize_params(params)

        ks = jax.random.split(jax.random.key(1), 4)
        s = cfg.vision.image_size
        args = dict(
            images=jax.random.uniform(ks[0], (2, 1, s, s, 3), minval=-1, maxval=1),
            img_masks=jnp.ones((2, 1), bool),
            lang_tokens=jax.random.randint(ks[1], (2, cfg.tokenizer_max_length), 0, 255),
            lang_masks=jnp.ones((2, cfg.tokenizer_max_length), bool),
            state=jax.random.normal(ks[2], (2, cfg.max_state_dim)),
        )
        noise = jax.random.normal(ks[3], (2, cfg.chunk_size, cfg.max_action_dim))
        a_fp = pi0.sample_actions(params, jax.random.key(9), **args, cfg=cfg,
                                  policy=FP32, noise=noise)
        a_q = pi0.sample_actions(qp, jax.random.key(9), **args, cfg=cfg,
                                 policy=FP32, noise=noise)
        # quantization noise accumulates over layers + 3 Euler steps; demand
        # closeness, not equality
        err = float(jnp.abs(a_fp - a_q).max())
        assert err < 0.35, err
        assert jnp.isfinite(a_q).all()


class TestPallasW8A8:
    def test_matches_fp_and_xla_reference(self):
        """Interpret-mode kernel vs fp32 matmul (quant tolerance) and vs an
        exact numpy emulation of the per-(row, K-chunk) quantization."""
        import jax.numpy as jnp
        import numpy as np

        from intact_tpu.models import common as cm
        from intact_tpu.ops import pallas_int8

        rng = np.random.default_rng(0)
        m, k, n = 24, 160, 96  # deliberately non-multiples of the blocks
        x = rng.normal(size=(m, k)).astype(np.float32)
        w = rng.normal(size=(k, n)).astype(np.float32)
        q = cm.quantize_dense({"kernel": jnp.asarray(w)})
        wq = np.asarray(q["kernel_q"])
        ws = np.asarray(q["kernel_scale"])

        out = np.asarray(pallas_int8.w8a8_matmul(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws), interpret=True
        ))
        ref = x @ w
        rel = np.abs(out - ref).mean() / np.abs(ref).mean()
        assert rel < 0.02, rel

        # exact emulation: single K chunk here (k < BLOCK_K), per-row scales
        amax = np.abs(x).max(-1, keepdims=True)
        xs = np.maximum(amax, 1e-6) / 127.0
        xq = np.round(x / xs).astype(np.int8)
        exact = (xq.astype(np.int32) @ wq.astype(np.int32)).astype(np.float32) * xs * ws
        np.testing.assert_allclose(out, exact, rtol=1e-5, atol=1e-4)

    def test_k_chunk_accumulation(self):
        """K larger than one chunk: per-chunk scales accumulate correctly."""
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from intact_tpu.models import common as cm
        from intact_tpu.ops import pallas_int8

        # shrink the K block so chunking kicks in at test size
        orig = pallas_int8.BLOCK_K
        pallas_int8.BLOCK_K = 128
        try:
            rng = np.random.default_rng(1)
            m, k, n = 16, 384, 128  # 3 K-chunks
            x = rng.normal(size=(m, k)).astype(np.float32)
            w = rng.normal(size=(k, n)).astype(np.float32)
            q = cm.quantize_dense({"kernel": jnp.asarray(w)})
            out = np.asarray(pallas_int8.w8a8_matmul(
                jnp.asarray(x), q["kernel_q"], q["kernel_scale"], interpret=True
            ))
            ref = x @ w
            rel = np.abs(out - ref).mean() / np.abs(ref).mean()
            assert rel < 0.02, rel
        finally:
            pallas_int8.BLOCK_K = orig
