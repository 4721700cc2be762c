"""Released-Octo import path tests: a synthetic checkpoint tree in the
upstream flax naming converts onto the native module, values land in the
right slots, and the imported model runs end to end (encode + DDPM
sampling). Real-weight validation needs the checkpoint asset (zero-egress
here); these pin the structural mapping and fail on any layout drift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models.octo import upstream as up

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
CFG = up.tiny_test_config()


def synthetic_checkpoint(cfg: up.OctoUpstreamConfig, seed=0) -> dict:
    """Build an upstream-naming param tree with the released layout:
    octo_transformer/{observation_tokenizers_primary, task_tokenizers_language,
    *_projection, *_pos_embedding, BlockTransformer_0/Transformer_0/
    encoderblock_i/...} + heads_action/ScoreActor diffusion net."""
    rng = np.random.default_rng(seed)
    d, h = cfg.width, cfg.num_heads
    hd = d // h

    def arr(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    tree: dict = {"octo_transformer": {}, "heads_action": {}}
    ot = tree["octo_transformer"]

    # SmallStem
    stem = {}
    in_ch = 3
    for i, feat in enumerate(cfg.stem_features):
        stem[f"Conv_{i}"] = {"kernel": arr(3, 3, in_ch, feat), "bias": arr(feat)}
        stem[f"GroupNorm_{i}"] = {"scale": np.ones(feat, np.float32),
                                  "bias": arr(feat)}
        in_ch = feat
    stem["embedding"] = {"kernel": arr(1, 1, in_ch, cfg.stem_embed_features),
                         "bias": arr(cfg.stem_embed_features)}
    ot["observation_tokenizers_primary"] = {"SmallStem16_0": stem}

    # T5 (flax param layout: kernels [in, out], string layer indices)
    t5c = cfg.t5
    inner = t5c.num_heads * t5c.d_kv
    blocks = {}
    for i in range(t5c.num_layers):
        layer0 = {
            "SelfAttention": {
                "q": {"kernel": arr(t5c.d_model, inner)},
                "k": {"kernel": arr(t5c.d_model, inner)},
                "v": {"kernel": arr(t5c.d_model, inner)},
                "o": {"kernel": arr(inner, t5c.d_model)},
            },
            "layer_norm": {"weight": np.ones(t5c.d_model, np.float32)},
        }
        if i == 0:
            layer0["SelfAttention"]["relative_attention_bias"] = {
                "embedding": arr(t5c.rel_buckets, t5c.num_heads)
            }
        blocks[str(i)] = {"layer": {
            "0": layer0,
            "1": {
                "DenseReluDense": {
                    "wi": {"kernel": arr(t5c.d_model, t5c.d_ff)},
                    "wo": {"kernel": arr(t5c.d_ff, t5c.d_model)},
                },
                "layer_norm": {"weight": np.ones(t5c.d_model, np.float32)},
            },
        }}
    ot["task_tokenizers_language"] = {"hf_model": {
        "shared": {"embedding": arr(t5c.vocab_size, t5c.d_model)},
        "encoder": {"block": blocks,
                    "final_layer_norm": {"weight": np.ones(t5c.d_model, np.float32)}},
    }}

    ot["obs_primary_projection"] = {"kernel": arr(cfg.stem_embed_features, d),
                                    "bias": arr(d)}
    ot["task_language_projection"] = {"kernel": arr(t5c.d_model, d), "bias": arr(d)}
    ot["obs_primary_pos_embedding"] = arr(1, cfg.history, cfg.n_patches, d)
    ot["task_language_pos_embedding"] = arr(1, cfg.max_lang_tokens, d)
    ot["readout_action_pos_embedding"] = arr(1, cfg.history, 1, d)

    enc = {}
    for i in range(cfg.depth):
        enc[f"encoderblock_{i}"] = {
            "LayerNorm_0": {"scale": np.ones(d, np.float32), "bias": arr(d)},
            "MultiHeadDotProductAttention_0": {
                "query": {"kernel": arr(d, h, hd), "bias": arr(h, hd)},
                "key": {"kernel": arr(d, h, hd), "bias": arr(h, hd)},
                "value": {"kernel": arr(d, h, hd), "bias": arr(h, hd)},
                "out": {"kernel": arr(h, hd, d), "bias": arr(d)},
            },
            "LayerNorm_1": {"scale": np.ones(d, np.float32), "bias": arr(d)},
            "MlpBlock_0": {"Dense_0": {"kernel": arr(d, cfg.mlp_dim),
                                       "bias": arr(cfg.mlp_dim)},
                           "Dense_1": {"kernel": arr(cfg.mlp_dim, d),
                                       "bias": arr(d)}},
        }
    enc["encoder_norm"] = {"scale": np.ones(d, np.float32), "bias": arr(d)}
    ot["BlockTransformer_0"] = {"Transformer_0": enc}

    adim = cfg.horizon * cfg.action_dim
    tree["heads_action"] = {"diffusion_model": {"ScoreActor_0": {
        "FourierFeatures_0": {"kernel": arr(cfg.time_dim // 2, 1)},  # upstream [out//2, in]
        "cond_encoder": {
            "Dense_0": {"kernel": arr(cfg.time_dim, 2 * cfg.time_dim),
                        "bias": arr(2 * cfg.time_dim)},
            "Dense_1": {"kernel": arr(2 * cfg.time_dim, cfg.time_dim),
                        "bias": arr(cfg.time_dim)},
        },
        "reverse_network": {
            "Dense_0": {"kernel": arr(cfg.time_dim + d + adim, cfg.head_hidden),
                        "bias": arr(cfg.head_hidden)},
            **{f"MLPResNetBlock_{i}": {
                "LayerNorm_0": {"scale": np.ones(cfg.head_hidden, np.float32),
                                "bias": arr(cfg.head_hidden)},
                "Dense_0": {"kernel": arr(cfg.head_hidden, cfg.head_hidden * 4),
                            "bias": arr(cfg.head_hidden * 4)},
                "Dense_1": {"kernel": arr(cfg.head_hidden * 4, cfg.head_hidden),
                            "bias": arr(cfg.head_hidden)},
            } for i in range(cfg.head_blocks)},
            "Dense_1": {"kernel": arr(cfg.head_hidden, adim), "bias": arr(adim)},
        },
    }}}
    return tree


class TestConvert:
    def test_strict_conversion_succeeds(self):
        params = up.convert_octo_params(synthetic_checkpoint(CFG), CFG, strict=True)
        assert params["blocks"]["attn"]["q"]["kernel"].shape == (
            CFG.depth, CFG.width, CFG.width
        )

    def test_values_land_in_right_slots(self):
        ckpt = synthetic_checkpoint(CFG)
        params = up.convert_octo_params(ckpt, CFG, strict=True)
        # layer-1 query kernel: [d, h, hd] reshaped to [d, d]
        src = ckpt["octo_transformer"]["BlockTransformer_0"]["Transformer_0"][
            "encoderblock_1"]["MultiHeadDotProductAttention_0"]["query"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(params["blocks"]["attn"]["q"]["kernel"][1]),
            src.reshape(CFG.width, CFG.width),
        )
        # t5 layer-0 wi kernel (flax layout, no transpose)
        src = ckpt["octo_transformer"]["task_tokenizers_language"]["hf_model"][
            "encoder"]["block"]["0"]["layer"]["1"]["DenseReluDense"]["wi"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(params["t5"]["blocks"]["mlp"]["wi"]["kernel"][0]), src
        )
        # stem conv 2
        src = ckpt["octo_transformer"]["observation_tokenizers_primary"][
            "SmallStem16_0"]["Conv_2"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(params["stem_primary"]["conv_2"]["kernel"]), src
        )
        # head resnet block 1 fc1
        src = ckpt["heads_action"]["diffusion_model"]["ScoreActor_0"][
            "reverse_network"]["MLPResNetBlock_1"]["Dense_0"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(params["head"]["reverse"]["block_1"]["fc1"]["kernel"]), src
        )

    def test_missing_keys_raise_with_report(self):
        ckpt = synthetic_checkpoint(CFG)
        del ckpt["octo_transformer"]["BlockTransformer_0"]["Transformer_0"][
            "encoderblock_0"]["MlpBlock_0"]
        with pytest.raises(ValueError, match="did not match"):
            up.convert_octo_params(ckpt, CFG, strict=True)

    def test_shape_mismatch_raises(self):
        ckpt = synthetic_checkpoint(CFG)
        ckpt["octo_transformer"]["obs_primary_projection"]["kernel"] = (
            np.zeros((3, 3), np.float32)
        )
        with pytest.raises(ValueError, match="shape mismatch"):
            up.convert_octo_params(ckpt, CFG, strict=True)


class TestForward:
    def test_imported_model_runs_end_to_end(self):
        params = up.convert_octo_params(synthetic_checkpoint(CFG), CFG, strict=True)
        b, t, s = 2, CFG.history, CFG.image_size
        images = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (b, t, s, s, 3), np.uint8)
        )
        img_masks = jnp.array([[True, True], [False, True]])
        lang = jnp.asarray(np.random.default_rng(1).integers(
            1, CFG.t5.vocab_size, (b, CFG.max_lang_tokens)), jnp.int32)
        lang_masks = jnp.ones((b, CFG.max_lang_tokens), bool)

        actions = up.sample_actions(
            params, jax.random.key(0), images, img_masks, lang, lang_masks,
            None, CFG, FP32,
        )
        assert actions.shape == (b, CFG.horizon, CFG.action_dim)
        assert np.isfinite(np.asarray(actions)).all()
        assert np.abs(np.asarray(actions)).max() <= CFG.max_action

    def test_stem_token_count(self):
        params = jax.tree.map(np.asarray, up.init(jax.random.key(0), CFG))
        img = jnp.zeros((1, CFG.image_size, CFG.image_size, 3), jnp.uint8)
        toks = up.small_stem_encode(params["stem_primary"], img, CFG, FP32)
        assert toks.shape == (1, CFG.n_patches, CFG.stem_embed_features)

    def test_loss_runs(self):
        params = up.convert_octo_params(synthetic_checkpoint(CFG), CFG, strict=True)
        b = 2
        batch = {
            "images": jnp.zeros((b, CFG.history, CFG.image_size, CFG.image_size, 3), jnp.uint8),
            "img_masks": jnp.ones((b, CFG.history), bool),
            "lang_tokens": jnp.ones((b, CFG.max_lang_tokens), jnp.int32),
            "lang_masks": jnp.ones((b, CFG.max_lang_tokens), bool),
            "actions": jnp.zeros((b, CFG.horizon, CFG.action_dim)),
        }
        loss, aux = up.compute_loss(params, jax.random.key(0), batch, CFG, FP32)
        assert np.isfinite(float(loss))


class TestServingIntegration:
    def test_wrapper_switch_model_accepts_released_snapshot(self, tmp_path):
        """OctoPolicyWrapper imports a released-layout Octo checkpoint
        (msgpack flax tree) via switch_model and serves actions from it."""
        from flax import serialization

        from intact_tpu.config.pipeline import (
            EnvConfig,
            EvalConfig,
            TrainPipelineConfig,
        )
        from intact_tpu.serve.policy_wrapper import OctoPolicyWrapper

        import dataclasses

        scfg = dataclasses.replace(CFG, action_dim=7)  # bridge adapter is 7-dof
        snap = tmp_path / "octo-small"
        snap.mkdir()
        (snap / "params.msgpack").write_bytes(
            serialization.msgpack_serialize(synthetic_checkpoint(scfg))
        )

        from pathlib import Path

        stats = str(Path(__file__).parent.parent / "config/dataset/bridge_statistics.json")
        cfg = TrainPipelineConfig(
            name="octo_upstream_test",
            model_cfg={"type": "octo_small_upstream"},
            use_bf16=False,
            eval_cfg=EvalConfig(
                simulator_name="simpler",
                env_adapter="OctoBridgeSimplerAdapter",
                task_list=["widowx_carrot_on_plate"],
                recording=False,
                port=0,
                action_step=2,
            ),
            env=EnvConfig(dataset_statistics_path=stats,
                          image_size=(CFG.image_size, CFG.image_size)),
        )
        wrapper = OctoPolicyWrapper(cfg, model_cfg=scfg)
        wrapper.switch_model(str(snap))

        obs = {
            "observation.images.top": np.zeros((64, 64, 3), np.uint8),
            "observation.state": {
                "agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0, 0.8])}
            },
            "task": "put the carrot on the plate",
        }
        action = wrapper.select_action(obs)
        assert np.asarray(action).shape == (2, 7)
        assert np.isfinite(np.asarray(action)).all()
