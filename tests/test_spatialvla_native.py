"""Native SpatialVLA: spatial action grids, Ego3D PE, decode, HF import.

The reference serves SpatialVLA via HF trust_remote_code
(policy_wrapper.py:194-223); here the stack (SigLIP + Ego3D position
encoding + Gemma2 spatial-token decode) is one XLA program. These tests pin
the grid tokenizer round trip, the Ego3D geometry, the prefix-LM decode,
and the checkpoint-importer conventions at a tiny operating point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models.spatialvla import SpatialVLAConfig
from intact_tpu.models.spatialvla import model as svla
from intact_tpu.models.tokenizer import HashTokenizer
from intact_tpu.serve.decoding import SpatialActionTokenizer


@pytest.fixture(scope="module")
def cfg():
    return SpatialVLAConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return svla.init(jax.random.key(0), cfg)


def _inputs(cfg, b=1):
    rng = np.random.default_rng(2)
    s = cfg.vision.image_size
    images = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    depth = svla.flat_depth(b, cfg)
    tok = HashTokenizer(vocab_size=cfg.spatial_offset,
                        max_length=cfg.tokenizer_max_length)
    lang, mask = tok(["put the carrot on the plate"] * b,
                     cfg.tokenizer_max_length)
    return images, depth, lang, mask


class TestSpatialGrids:
    def test_token_roundtrip_all_cells(self, cfg):
        """Every legal (translation, rotation, gripper) token triple decodes
        to an action that re-encodes to the SAME triple (grid cells are
        fixed points)."""
        t = svla.make_action_tokenizer(cfg)
        rng = np.random.default_rng(0)
        trans = rng.integers(0, t.n_translation, 50)
        rot = t.n_translation + rng.integers(0, t.n_rotation, 50)
        grip = t.n_translation + t.n_rotation + rng.integers(0, 2, 50)
        tokens = np.stack([trans, rot, grip], 1) + t.spatial_offset
        actions = t.decode(tokens)
        np.testing.assert_array_equal(t.encode(actions), tokens)

    def test_encode_within_cell_error(self, cfg):
        """decode(encode(a)) is within the grid resolution of a for small
        normalized actions."""
        t = svla.make_action_tokenizer(cfg)
        rng = np.random.default_rng(1)
        a = np.concatenate([
            rng.normal(0, 0.5, (64, 6)), rng.integers(0, 2, (64, 1))
        ], axis=1)
        back = t.decode(t.encode(a))
        # translation magnitude is preserved within the half-normal grid span
        r_in = np.linalg.norm(a[:, :3], axis=1)
        r_out = np.linalg.norm(back[:, :3], axis=1)
        assert np.median(np.abs(r_in - r_out)) < 0.5
        np.testing.assert_array_equal(back[:, 6], a[:, 6])

    def test_token_ranges(self, cfg):
        t = svla.make_action_tokenizer(cfg)
        assert t.n_spatial_tokens == cfg.n_spatial_tokens
        tokens = t.encode(np.array([[0.1, -0.2, 0.05, 0.3, -0.1, 0.2, 1.0]]))
        assert tokens.min() >= cfg.spatial_offset
        assert tokens.max() < cfg.lm.vocab_size


class TestEgo3D:
    def test_depth_changes_encoding(self, cfg, params):
        pe1 = svla.ego3d_position_encoding(
            params, jnp.asarray(svla.flat_depth(1, cfg, z=1.0)), cfg)
        pe2 = svla.ego3d_position_encoding(
            params, jnp.asarray(svla.flat_depth(1, cfg, z=2.0)), cfg)
        assert pe1.shape == (1, cfg.vision.num_patches, cfg.vision.width)
        assert not np.allclose(np.asarray(pe1), np.asarray(pe2))

    def test_spatially_distinct(self, cfg, params):
        """Different patches get different 3D encodings (the rays differ)."""
        pe = np.asarray(svla.ego3d_position_encoding(
            params, jnp.asarray(svla.flat_depth(1, cfg)), cfg))[0]
        assert not np.allclose(pe[0], pe[-1])


class TestForward:
    def test_predict_tokens_shape(self, cfg, params):
        images, depth, lang, mask = _inputs(cfg, b=2)
        ids = jax.jit(
            lambda p, i, d, t, m: svla.predict_action_tokens(p, i, d, t, m, cfg)
        )(params, images, depth, lang, mask)
        assert ids.shape == (2, cfg.tokens_per_action * cfg.n_action_steps)
        assert int(ids.min()) >= 0 and int(ids.max()) < cfg.lm.vocab_size

    def test_prefix_full_attention_differs_from_causal(self, cfg, params):
        """The PaliGemma2 prefix-LM convention (bidirectional prompt) must
        actually change the computation vs a causal prompt."""
        from intact_tpu.models import gemma2

        images, depth, lang, mask = _inputs(cfg)
        embeds, m = svla.embed_prefix(params, images, depth, lang, mask, cfg)
        n = cfg.tokens_per_action * cfg.n_action_steps
        full = gemma2.greedy_decode(params["lm"], embeds, m, n, cfg.lm,
                                    prefix_full_attention=True)
        causal = gemma2.greedy_decode(params["lm"], embeds, m, n, cfg.lm,
                                      prefix_full_attention=False)
        # random weights: outputs must at least be well-formed; structural
        # difference shows through the prefill hidden states
        h_full, _ = gemma2.forward(
            params["lm"], embeds,
            jnp.ones((1, embeds.shape[1], embeds.shape[1]), bool) & m[:, None, :],
            jnp.cumsum(m.astype(jnp.int32), axis=1) - 1, cfg.lm)
        h_causal, _ = gemma2.forward(
            params["lm"], embeds,
            jnp.tril(jnp.ones((embeds.shape[1], embeds.shape[1]), bool))[None]
            & m[:, None, :],
            jnp.cumsum(m.astype(jnp.int32), axis=1) - 1, cfg.lm)
        assert not np.allclose(np.asarray(h_full), np.asarray(h_causal))
        assert full.shape == causal.shape


def _fake_spatialvla_sd(params, cfg):
    """Native params -> HF-layout state dict (inverse of the importer)."""
    sd = {}
    pre = "vision_tower.vision_model"
    v = params["siglip"]
    conv = np.asarray(v["patch_embed"]["kernel"])  # [P,P,3,D] -> [D,3,P,P]
    sd[pre + ".embeddings.patch_embedding.weight"] = conv.transpose(3, 2, 0, 1)
    sd[pre + ".embeddings.patch_embedding.bias"] = np.asarray(v["patch_embed"]["bias"])
    sd[pre + ".embeddings.position_embedding.weight"] = np.asarray(v["pos_embed"])[0]
    sd[pre + ".post_layernorm.weight"] = np.asarray(v["ln_post"]["scale"])
    sd[pre + ".post_layernorm.bias"] = np.asarray(v["ln_post"]["bias"])
    blocks = v["blocks"]
    for i in range(cfg.vision.depth):
        base = f"{pre}.encoder.layers.{i}"
        sd[base + ".layer_norm1.weight"] = np.asarray(blocks["ln1"]["scale"][i])
        sd[base + ".layer_norm1.bias"] = np.asarray(blocks["ln1"]["bias"][i])
        sd[base + ".layer_norm2.weight"] = np.asarray(blocks["ln2"]["scale"][i])
        sd[base + ".layer_norm2.bias"] = np.asarray(blocks["ln2"]["bias"][i])
        for hf, ours in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                         ("out_proj", "o")):
            sd[base + f".self_attn.{hf}.weight"] = np.asarray(
                blocks["attn"][ours]["kernel"][i]).T
            sd[base + f".self_attn.{hf}.bias"] = np.asarray(
                blocks["attn"][ours]["bias"][i])
        for hf, ours in (("fc1", "fc1"), ("fc2", "fc2")):
            sd[base + f".mlp.{hf}.weight"] = np.asarray(
                blocks["mlp"][ours]["kernel"][i]).T
            sd[base + f".mlp.{hf}.bias"] = np.asarray(blocks["mlp"][ours]["bias"][i])

    sd["multi_modal_projector.linear.weight"] = np.asarray(
        params["img_proj"]["kernel"]).T
    sd["multi_modal_projector.linear.bias"] = np.asarray(params["img_proj"]["bias"])

    for nm in ("linear_1", "linear_2"):
        sd[f"position_embedding_3d.{nm}.weight"] = np.asarray(
            params["ego3d"][nm]["kernel"]).T
        sd[f"position_embedding_3d.{nm}.bias"] = np.asarray(
            params["ego3d"][nm]["bias"])

    lm = params["lm"]
    pre = "language_model.model"
    sd[pre + ".embed_tokens.weight"] = np.asarray(lm["embed"]["embedding"])
    sd[pre + ".norm.weight"] = np.asarray(lm["final_norm"]["scale"])
    b = lm["blocks"]
    for i in range(cfg.lm.depth):
        base = f"{pre}.layers.{i}"
        sd[base + ".input_layernorm.weight"] = np.asarray(b["ln1"]["scale"][i])
        sd[base + ".post_attention_layernorm.weight"] = np.asarray(
            b["post_attn_norm"]["scale"][i])
        sd[base + ".pre_feedforward_layernorm.weight"] = np.asarray(
            b["pre_ffw_norm"]["scale"][i])
        sd[base + ".post_feedforward_layernorm.weight"] = np.asarray(
            b["post_ffw_norm"]["scale"][i])
        for hf, ours in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                         ("o_proj", "o")):
            sd[base + f".self_attn.{hf}.weight"] = np.asarray(
                b["attn"][ours]["kernel"][i]).T
        for hf, ours in (("gate_proj", "gate"), ("up_proj", "up"),
                         ("down_proj", "down")):
            sd[base + f".mlp.{hf}.weight"] = np.asarray(
                b["mlp"][ours]["kernel"][i]).T
    return sd


class TestImport:
    def test_hf_roundtrip_exact(self, cfg, params):
        imported = svla.from_hf_state_dict(_fake_spatialvla_sd(params, cfg), cfg)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=jax.tree_util.keystr(path),
            )

    def test_predict_matches_after_import(self, cfg, params):
        imported = svla.from_hf_state_dict(_fake_spatialvla_sd(params, cfg), cfg)
        images, depth, lang, mask = _inputs(cfg)
        np.testing.assert_array_equal(
            np.asarray(svla.predict_action_tokens(params, images, depth, lang, mask, cfg)),
            np.asarray(svla.predict_action_tokens(imported, images, depth, lang, mask, cfg)),
        )

    def test_model_nested_layout(self, cfg, params):
        """A checkpoint serialized with every component under a `model.`
        prefix imports identically (the nesting is applied to ALL component
        prefixes, not just the probed vision tower)."""
        sd = {f"model.{k}": v for k, v in _fake_spatialvla_sd(params, cfg).items()}
        imported = svla.from_hf_state_dict(sd, cfg)
        images, depth, lang, mask = _inputs(cfg)
        np.testing.assert_array_equal(
            np.asarray(svla.predict_action_tokens(params, images, depth, lang, mask, cfg)),
            np.asarray(svla.predict_action_tokens(imported, images, depth, lang, mask, cfg)),
        )

    def test_shape_mismatch_is_loud(self, cfg, params):
        sd = _fake_spatialvla_sd(params, cfg)
        sd["multi_modal_projector.linear.weight"] = np.zeros((3, 5), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            svla.from_hf_state_dict(sd, cfg)

    def test_safetensors_snapshot(self, cfg, params, tmp_path):
        from safetensors.numpy import save_file

        sd = {k: np.ascontiguousarray(v, np.float32)
              for k, v in _fake_spatialvla_sd(params, cfg).items()}
        save_file(sd, str(tmp_path / "model.safetensors"))
        imported = svla.load_spatialvla_checkpoint(str(tmp_path), cfg)
        images, depth, lang, mask = _inputs(cfg)
        np.testing.assert_array_equal(
            np.asarray(svla.predict_action_tokens(params, images, depth, lang, mask, cfg)),
            np.asarray(svla.predict_action_tokens(imported, images, depth, lang, mask, cfg)),
        )


class TestServing:
    def test_native_wrapper_over_websocket(self, tmp_path, monkeypatch):
        """Full native SpatialVLA serving slice: wrapper -> websocket ->
        client infer/reset, ensembled 7-dof env action out."""
        import threading
        import time
        from pathlib import Path

        from intact_tpu.config.pipeline import (
            EnvConfig,
            EvalConfig,
            TrainPipelineConfig,
        )
        from intact_tpu.protocol.websocket_policy_client import (
            WebsocketPolicyClient,
        )
        from intact_tpu.protocol.websocket_policy_server import (
            WebsocketPolicyServer,
        )
        from intact_tpu.serve.policy_wrapper import SpatialVLANativePolicyWrapper

        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        repo = Path(__file__).resolve().parent.parent
        cfg_pipe = TrainPipelineConfig(
            name="spatialvla_native_serve_test",
            model_cfg={"type": "spatialvla_native_tiny"},
            use_bf16=False,
            tokenizer_path="hash",
            eval_cfg=EvalConfig(
                simulator_name="simpler",
                env_adapter="BridgeSimplerAdapter",
                task_list=["widowx_carrot_on_plate"],
                n_eval_episode=1, n_video=0, recording=False,
                role="server", host="127.0.0.1", port=18642, action_step=1,
            ),
            env=EnvConfig(
                dataset_statistics_path=str(repo / "config/dataset/bridge_statistics.json"),
                image_size=(28, 28),
            ),
        )
        wrapper = SpatialVLANativePolicyWrapper(cfg_pipe)
        server = WebsocketPolicyServer(
            wrapper, host="127.0.0.1", port=18642,
            metadata={"model": "spatialvla_native_tiny"},
        )
        threading.Thread(target=server.serve_forever, daemon=True).start()
        time.sleep(0.3)

        obs = {
            "observation.images.top": np.zeros((64, 64, 3), np.uint8),
            "observation.state": {
                "agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1.0, 0, 0, 0, 0.8])}
            },
            "task": "put the carrot on the plate",
        }
        client = WebsocketPolicyClient("127.0.0.1", 18642, retry_interval_s=0.2)
        a1 = np.asarray(client.infer(obs))  # [1, 7] ensembled
        a2 = np.asarray(client.infer(obs))
        assert a1.shape == (1, 7) and np.isfinite(a1).all()
        assert a2.shape == (1, 7) and np.isfinite(a2).all()
        assert client.reset() == {"status": "reset"}
