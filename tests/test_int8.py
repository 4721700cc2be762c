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


class TestNativeWrapperInt8:
    """Config-level int8 (`eval_cfg.quantize_int8`) for the native AR
    serving wrappers — the single-chip mode for Magma-8B, whose bf16
    weights exceed one v5e's HBM (policy_wrapper._init_native_serving).
    Runs on the virtual 8-device mesh, so the sharded-int8-tree path
    (kernel(_q)? rules in parallel/sharding.py) is exercised too."""

    def _cfg(self, mtype: str, image_size: int):
        from pathlib import Path

        from intact_tpu.config.pipeline import (
            EnvConfig,
            EvalConfig,
            TrainPipelineConfig,
        )

        repo = Path(__file__).resolve().parent.parent
        return TrainPipelineConfig(
            name=f"{mtype}_int8_test",
            model_cfg={"type": mtype},
            use_bf16=False,
            tokenizer_path="hash",
            eval_cfg=EvalConfig(
                simulator_name="simpler",
                env_adapter="BridgeSimplerAdapter",
                task_list=["widowx_carrot_on_plate"],
                n_eval_episode=1, n_video=0, recording=False,
                role="server", host="127.0.0.1", port=0, action_step=1,
                quantize_int8=True,
            ),
            env=EnvConfig(
                dataset_statistics_path=str(
                    repo / "config/dataset/bridge_statistics.json"),
                image_size=(image_size, image_size),
            ),
        )

    @staticmethod
    def _quantized_kernel_dtypes(params) -> list:
        found = []

        def walk(node):
            if isinstance(node, dict):
                if "kernel_q" in node:
                    found.append(node["kernel_q"].dtype)
                for v in node.values():
                    walk(v)

        walk(params)
        return found

    def test_spatialvla_native_int8_serves(self, monkeypatch, tmp_path):
        from intact_tpu.serve.policy_wrapper import SpatialVLANativePolicyWrapper

        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        w = SpatialVLANativePolicyWrapper(self._cfg("spatialvla_native_tiny", 28))
        dtypes = self._quantized_kernel_dtypes(w.params)
        assert dtypes and all(d == jnp.int8 for d in dtypes)
        out = w.infer_batch([(w.warmup_inputs(), w.new_session())])
        assert not isinstance(out[0], Exception), out[0]
        assert np.isfinite(np.asarray(out[0])).all()

    def test_magma_native_int8_serves_and_orbax_switch(self, monkeypatch, tmp_path):
        """Wrapper init in int8 form, then hot-swap an fp Orbax checkpoint:
        restore-to-HOST + streamed re-quantization (the fp tree never
        materializes on device — checkpoint.restore_params_host)."""
        import orbax.checkpoint as ocp

        from intact_tpu.models.magma import model as magma_mod
        from intact_tpu.serve.policy_wrapper import MagmaNativePolicyWrapper

        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        w = MagmaNativePolicyWrapper(self._cfg("magma_native_tiny", 32))
        dtypes = self._quantized_kernel_dtypes(w.params)
        assert dtypes and all(d == jnp.int8 for d in dtypes)
        out = w.infer_batch([(w.warmup_inputs(), w.new_session())])
        assert not isinstance(out[0], Exception), out[0]

        fp = jax.jit(lambda k: magma_mod.init(k, w.model_cfg))(jax.random.key(7))
        step = tmp_path / "step_5"
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(step / "params", jax.tree.map(lambda x: x, fp))
        w.switch_model(str(step))
        dtypes = self._quantized_kernel_dtypes(w.params)
        assert dtypes and all(d == jnp.int8 for d in dtypes)
        out = w.infer_batch([(w.warmup_inputs(), w.new_session())])
        assert not isinstance(out[0], Exception), out[0]
        assert np.isfinite(np.asarray(out[0])).all()


class TestQuantizedEmbed:
    """int8 tied-embed serving form (cm.quantize_embed): lookup and the
    unembed logits matmul — the per-decode-step table stream halves."""

    def test_lookup_and_unembed_close_to_fp(self):
        key = jax.random.key(0)
        emb = {"embedding": jax.random.normal(key, (64, 32))}
        q = cm.quantize_embed(emb)
        assert q["embedding_q"].dtype == jnp.int8
        assert q["embed_scale"].shape == (64,)

        ids = jnp.array([[0, 5, 63], [7, 1, 2]])
        fp = cm.embed_lookup(emb, ids, FP32)
        qq = cm.embed_lookup(q, ids, FP32)
        rel = float(jnp.abs(fp - qq).max() / jnp.abs(fp).max())
        assert rel < 1e-2, rel

        h = jax.random.normal(jax.random.key(1), (3, 32))
        lf = cm.unembed_logits(emb, h, FP32)
        lq = cm.unembed_logits(q, h, FP32)
        rel = float(jnp.abs(lf - lq).max() / jnp.abs(lf).max())
        assert rel < 3e-2, rel
        # greedy argmax agreement on well-separated logits
        agree = float(jnp.mean(jnp.argmax(lf, -1) == jnp.argmax(lq, -1)))
        assert agree >= 2 / 3, agree

    def test_quantize_params_covers_lm_embed_and_lm_head(self):
        from intact_tpu.models import llama

        cfg = llama.tiny_test_config()
        lm = llama.init(jax.random.key(0), cfg)
        tree = {"lm": lm, "other_embed": {"embedding": jnp.ones((4, 8))}}
        qp = cm.quantize_params(tree)
        assert "embedding_q" in qp["lm"]["embed"]
        if "lm_head" in lm:
            assert "kernel_q" in qp["lm"]["lm_head"]
        # non-LM embeddings stay fp
        assert "embedding" in qp["other_embed"]

    def test_gemma2_decode_int8_tracks_fp(self):
        from intact_tpu.models import gemma2

        cfg = gemma2.tiny_test_config()
        params = gemma2.init(jax.random.key(0), cfg)
        qp = cm.quantize_params({"lm": params})["lm"]
        b, p_len = 2, 5
        emb = jax.random.normal(jax.random.key(1), (b, p_len, cfg.width)) * 0.3
        mask = jnp.ones((b, p_len), bool)
        t_fp = gemma2.greedy_decode(params, emb, mask, 6, cfg, FP32,
                                    prefix_full_attention=True)
        t_q = gemma2.greedy_decode(qp, emb, mask, 6, cfg, FP32,
                                   prefix_full_attention=True)
        # random tiny logits are near-ties; demand majority agreement and
        # identical shapes/finiteness rather than token-for-token equality
        assert t_q.shape == t_fp.shape
        agree = float(jnp.mean(t_q == t_fp))
        assert agree >= 0.5, agree
