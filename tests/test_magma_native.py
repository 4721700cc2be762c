"""Native Magma assembly: prompt splice, in-graph decode, HF-layout import.

The reference serves Magma-8B via HF trust_remote_code + torch generate
(policy_wrapper.py:226-303); here the full stack (ConvNeXt vision ->
projector -> LLaMA-3 greedy decode) is one XLA program. These tests pin
the multimodal glue and the checkpoint-importer conventions at a tiny
operating point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intact_tpu.models import convnext, llama
from intact_tpu.models.common import DEFAULT_POLICY
from intact_tpu.models.magma import MagmaConfig
from intact_tpu.models.magma import model as magma
from intact_tpu.models.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def cfg():
    return MagmaConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return magma.init(jax.random.key(0), cfg)


def _prompt(cfg, tasks=("pick up the carrot",)):
    # bounded below image_token_id so hash text ids can never collide with
    # the placeholder (mirrors MagmaNativePolicyWrapper)
    tok = HashTokenizer(vocab_size=cfg.image_token_id, max_length=cfg.max_prompt_tokens)
    return magma.build_prompt(tok, list(tasks), cfg)


def _images(cfg, b):
    rng = np.random.default_rng(1)
    return rng.normal(size=(b, cfg.image_size, cfg.image_size, 3)).astype(np.float32)


class TestForward:
    def test_generate_shape_and_range(self, cfg, params):
        tokens, masks = _prompt(cfg, ["pick up the carrot", "close the drawer"])
        ids = jax.jit(lambda p, i, t, m: magma.generate(p, i, t, m, cfg))(
            params, _images(cfg, 2), tokens, masks
        )
        assert ids.shape == (2, cfg.n_action_tokens + 1)
        assert int(ids.min()) >= 0 and int(ids.max()) < cfg.lm.vocab_size

    def test_prompt_splice_positions(self, cfg, params):
        """Placeholder positions carry the projected vision tokens in order;
        non-placeholder positions carry the text embedding."""
        tokens, masks = _prompt(cfg)
        embeds, _ = magma.embed_prompt(
            params, jnp.asarray(_images(cfg, 1)), jnp.asarray(tokens),
            jnp.asarray(masks), cfg,
        )
        vis = magma.encode_images(params, jnp.asarray(_images(cfg, 1)), cfg)
        is_img = tokens[0] == cfg.image_token_id
        assert is_img.sum() == cfg.n_image_tokens
        np.testing.assert_allclose(
            np.asarray(embeds[0][is_img]), np.asarray(vis[0]), rtol=1e-6
        )
        from intact_tpu.models import common as cm

        text = cm.embed_lookup(params["lm"]["embed"], jnp.asarray(tokens), DEFAULT_POLICY)
        np.testing.assert_allclose(
            np.asarray(embeds[0][~is_img]), np.asarray(text[0][~is_img]), rtol=1e-6
        )

    def test_chat_template_framing(self, cfg, params):
        """use_chat_template wraps the instruction in the LLaMA-3-instruct
        turn markers around the image block (reference serves through
        apply_chat_template, policy_wrapper.py:275-280)."""
        import dataclasses

        cfg_t = dataclasses.replace(cfg, use_chat_template=True)
        tok = HashTokenizer(vocab_size=cfg.image_token_id,
                            max_length=cfg.max_prompt_tokens)
        tokens, masks = magma.build_prompt(tok, ["pick up the carrot"], cfg_t)
        plain, _ = magma.build_prompt(tok, ["pick up the carrot"], cfg)
        n_pre = len(magma._encode_segment(tok, magma._CHAT_PRE))
        assert n_pre > 0
        # pre segment, then the image block, then the templated suffix
        assert (tokens[0, n_pre:n_pre + cfg.n_image_tokens]
                == cfg.image_token_id).all()
        assert tokens.shape[1] == n_pre + cfg.n_image_tokens + cfg.max_prompt_tokens
        assert not np.array_equal(tokens[0, -4:], plain[0, -4:])
        ids = magma.generate(params, _images(cfg_t, 1), tokens, masks, cfg_t)
        assert ids.shape == (1, cfg.n_action_tokens + 1)

    def test_truncation_preserves_chat_suffix(self, cfg):
        """An over-long instruction loses its own tail, never the
        assistant-header suffix — decoding from a user-turn context would
        break the LLaMA-3-instruct framing (ADVICE round-2 #2)."""
        import dataclasses

        cfg_t = dataclasses.replace(cfg, use_chat_template=True)
        tok = HashTokenizer(vocab_size=cfg.image_token_id,
                            max_length=cfg.max_prompt_tokens)
        long_task = " ".join(["word"] * (cfg.max_prompt_tokens * 3))
        tokens, masks = magma.build_prompt(tok, [long_task], cfg_t)
        suffix = magma._encode_segment(tok, magma._CHAT_POST)
        assert suffix, "chat suffix must tokenize to something"
        # the LAST masked tokens of the prompt are exactly the chat suffix
        last = tokens[0][masks[0]][-len(suffix):]
        np.testing.assert_array_equal(last, suffix)
        # and the budget is fully used (truncation happened)
        n_pre = len(magma._encode_segment(tok, magma._CHAT_PRE))
        assert masks[0].sum() == n_pre + cfg.n_image_tokens + cfg.max_prompt_tokens

    def test_image_sensitivity(self, cfg, params):
        """Different images must be able to change the decoded tokens' logits
        path — check the prefill embeds differ."""
        tokens, masks = _prompt(cfg)
        e1, _ = magma.embed_prompt(params, jnp.asarray(_images(cfg, 1)),
                                   jnp.asarray(tokens), jnp.asarray(masks), cfg)
        e2, _ = magma.embed_prompt(params, jnp.zeros_like(jnp.asarray(_images(cfg, 1))),
                                   jnp.asarray(tokens), jnp.asarray(masks), cfg)
        assert not np.allclose(np.asarray(e1), np.asarray(e2))


def _vision_to_timm(vp, cfg, prefix):
    """Inverse of the importer's vision mapping (native tree -> timm names)."""
    sd = {}
    conv = lambda k: np.asarray(k).transpose(3, 2, 0, 1)
    sd[f"{prefix}.stem.0.weight"] = conv(vp["stem"]["kernel"])
    sd[f"{prefix}.stem.0.bias"] = np.asarray(vp["stem"]["bias"])
    sd[f"{prefix}.stem.1.weight"] = np.asarray(vp["stem_ln"]["scale"])
    sd[f"{prefix}.stem.1.bias"] = np.asarray(vp["stem_ln"]["bias"])
    sd[f"{prefix}.head.norm.weight"] = np.asarray(vp["final_ln"]["scale"])
    sd[f"{prefix}.head.norm.bias"] = np.asarray(vp["final_ln"]["bias"])
    for s, depth in enumerate(cfg.vision.depths):
        st = vp[f"stage_{s}"]
        for i in range(depth):
            base = f"{prefix}.stages.{s}.blocks.{i}"
            sd[base + ".conv_dw.weight"] = conv(st["dwconv"]["kernel"][i])
            sd[base + ".conv_dw.bias"] = np.asarray(st["dwconv"]["bias"][i])
            sd[base + ".norm.weight"] = np.asarray(st["ln"]["scale"][i])
            sd[base + ".norm.bias"] = np.asarray(st["ln"]["bias"][i])
            sd[base + ".mlp.fc1.weight"] = np.asarray(st["pw1"]["kernel"][i]).T
            sd[base + ".mlp.fc1.bias"] = np.asarray(st["pw1"]["bias"][i])
            sd[base + ".mlp.fc2.weight"] = np.asarray(st["pw2"]["kernel"][i]).T
            sd[base + ".mlp.fc2.bias"] = np.asarray(st["pw2"]["bias"][i])
            sd[base + ".gamma"] = np.asarray(st["gamma"][i])
        if s > 0:
            dn = vp[f"down_{s}"]
            sd[f"{prefix}.stages.{s}.downsample.0.weight"] = np.asarray(dn["ln"]["scale"])
            sd[f"{prefix}.stages.{s}.downsample.0.bias"] = np.asarray(dn["ln"]["bias"])
            sd[f"{prefix}.stages.{s}.downsample.1.weight"] = conv(dn["conv"]["kernel"])
            sd[f"{prefix}.stages.{s}.downsample.1.bias"] = np.asarray(dn["conv"]["bias"])
    return sd


def _lm_to_hf(lp, cfg, prefix):
    sd = {}
    sd[f"{prefix}.model.embed_tokens.weight"] = np.asarray(lp["embed"]["embedding"])
    sd[f"{prefix}.model.norm.weight"] = np.asarray(lp["final_norm"]["scale"])
    if "lm_head" in lp:
        sd[f"{prefix}.lm_head.weight"] = np.asarray(lp["lm_head"]["kernel"]).T
    b = lp["blocks"]
    for i in range(cfg.lm.depth):
        base = f"{prefix}.model.layers.{i}"
        sd[base + ".input_layernorm.weight"] = np.asarray(b["ln1"]["scale"][i])
        sd[base + ".post_attention_layernorm.weight"] = np.asarray(b["ln2"]["scale"][i])
        for nm, ours in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"), ("o_proj", "o")):
            sd[base + f".self_attn.{nm}.weight"] = np.asarray(b["attn"][ours]["kernel"][i]).T
        for nm, ours in (("gate_proj", "gate"), ("up_proj", "up"), ("down_proj", "down")):
            sd[base + f".mlp.{nm}.weight"] = np.asarray(b["mlp"][ours]["kernel"][i]).T
    return sd


def _fake_magma_sd(params, cfg):
    sd = _vision_to_timm(params["vision"], cfg,
                         "vision_tower.clip_vision_model.trunk")
    sd.update(_lm_to_hf(params["lm"], cfg, "language_model"))
    pj = params["projector"]
    sd["multi_modal_projector.linear_1.weight"] = np.asarray(pj["linear_1"]["kernel"]).T
    sd["multi_modal_projector.linear_1.bias"] = np.asarray(pj["linear_1"]["bias"])
    sd["multi_modal_projector.linear_2.weight"] = np.asarray(pj["linear_2"]["kernel"]).T
    sd["multi_modal_projector.linear_2.bias"] = np.asarray(pj["linear_2"]["bias"])
    return sd


class TestImport:
    def test_hf_roundtrip_exact(self, cfg, params):
        """Native params -> HF-layout state dict -> importer reproduces the
        identical tree (pins every transpose and naming rule)."""
        imported = magma.from_hf_state_dict(_fake_magma_sd(params, cfg), cfg)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=jax.tree_util.keystr(path),
            )

    def test_generate_matches_after_import(self, cfg, params):
        imported = magma.from_hf_state_dict(_fake_magma_sd(params, cfg), cfg)
        tokens, masks = _prompt(cfg)
        img = _images(cfg, 1)
        a = magma.generate(params, img, tokens, masks, cfg)
        b = magma.generate(imported, img, tokens, masks, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_head_norm_synthesized(self, cfg, params):
        sd = _fake_magma_sd(params, cfg)
        del sd["vision_tower.clip_vision_model.trunk.head.norm.weight"]
        del sd["vision_tower.clip_vision_model.trunk.head.norm.bias"]
        imported = magma.from_hf_state_dict(sd, cfg)
        fl = imported["vision"]["final_ln"]
        np.testing.assert_array_equal(np.asarray(fl["scale"]),
                                      np.ones_like(np.asarray(fl["scale"])))

    def test_unknown_vision_key_is_loud(self, cfg, params):
        sd = _fake_magma_sd(params, cfg)
        sd["vision_tower.clip_vision_model.trunk.mystery.weight"] = np.zeros(3)
        with pytest.raises(KeyError, match="unrecognized"):
            magma.from_hf_state_dict(sd, cfg)

    def test_shape_mismatch_is_loud(self, cfg, params):
        sd = _fake_magma_sd(params, cfg)
        key = "multi_modal_projector.linear_1.weight"
        sd[key] = np.zeros((3, 5), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            magma.from_hf_state_dict(sd, cfg)

    def test_load_magma_checkpoint_safetensors(self, cfg, params, tmp_path):
        """HF snapshot layout on disk (sharded safetensors) -> params."""
        from safetensors.numpy import save_file

        sd = {k: np.ascontiguousarray(v, np.float32)
              for k, v in _fake_magma_sd(params, cfg).items()}
        keys = sorted(sd)
        half = len(keys) // 2
        save_file({k: sd[k] for k in keys[:half]},
                  str(tmp_path / "model-00001-of-00002.safetensors"))
        save_file({k: sd[k] for k in keys[half:]},
                  str(tmp_path / "model-00002-of-00002.safetensors"))
        imported = magma.load_magma_checkpoint(str(tmp_path), cfg)
        tokens, masks = _prompt(cfg)
        img = _images(cfg, 1)
        np.testing.assert_array_equal(
            np.asarray(magma.generate(params, img, tokens, masks, cfg)),
            np.asarray(magma.generate(imported, img, tokens, masks, cfg)),
        )

    def test_padded_vocab_rows_sliced(self, cfg, params):
        """Checkpoints with alignment-padded embed/lm_head tables import by
        slicing down to the configured vocab (real Magma-8B pads past the
        logical vocab)."""
        sd = _fake_magma_sd(params, cfg)
        pad = 16
        emb = sd["language_model.model.embed_tokens.weight"]
        sd["language_model.model.embed_tokens.weight"] = np.concatenate(
            [emb, np.zeros((pad, emb.shape[1]), emb.dtype)])
        head = sd["language_model.lm_head.weight"]
        sd["language_model.lm_head.weight"] = np.concatenate(
            [head, np.zeros((pad, head.shape[1]), head.dtype)])
        imported = magma.from_hf_state_dict(sd, cfg)
        tokens, masks = _prompt(cfg)
        img = _images(cfg, 1)
        np.testing.assert_array_equal(
            np.asarray(magma.generate(params, img, tokens, masks, cfg)),
            np.asarray(magma.generate(imported, img, tokens, masks, cfg)),
        )

    def test_alternate_prefixes(self, cfg, params):
        """vision_tower.trunk.* layout (no clip_vision_model nesting)."""
        sd = _vision_to_timm(params["vision"], cfg, "vision_tower.trunk")
        sd.update(_lm_to_hf(params["lm"], cfg, "language_model"))
        pj = params["projector"]
        # sequential-style projector naming
        sd["multi_modal_projector.proj.0.weight"] = np.asarray(pj["linear_1"]["kernel"]).T
        sd["multi_modal_projector.proj.0.bias"] = np.asarray(pj["linear_1"]["bias"])
        sd["multi_modal_projector.proj.2.weight"] = np.asarray(pj["linear_2"]["kernel"]).T
        sd["multi_modal_projector.proj.2.bias"] = np.asarray(pj["linear_2"]["bias"])
        imported = magma.from_hf_state_dict(sd, cfg)
        tokens, masks = _prompt(cfg)
        img = _images(cfg, 1)
        np.testing.assert_array_equal(
            np.asarray(magma.generate(params, img, tokens, masks, cfg)),
            np.asarray(magma.generate(imported, img, tokens, masks, cfg)),
        )


class TestServing:
    def test_native_wrapper_over_websocket(self, tmp_path, monkeypatch):
        """Full native Magma serving slice: wrapper -> websocket server ->
        sync client infer/reset, 7-dof env action out."""
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
        from intact_tpu.serve.policy_wrapper import MagmaNativePolicyWrapper

        monkeypatch.setenv("VLA_LOG_DIR", str(tmp_path))
        repo = Path(__file__).resolve().parent.parent
        cfg_pipe = TrainPipelineConfig(
            name="magma_native_serve_test",
            model_cfg={"type": "magma_native_tiny"},
            use_bf16=False,
            tokenizer_path="hash",
            eval_cfg=EvalConfig(
                simulator_name="simpler",
                env_adapter="BridgeSimplerAdapter",
                task_list=["widowx_carrot_on_plate"],
                n_eval_episode=1, n_video=0, recording=False,
                role="server", host="127.0.0.1", port=18641, action_step=1,
            ),
            env=EnvConfig(
                dataset_statistics_path=str(repo / "config/dataset/bridge_statistics.json"),
                image_size=(32, 32),
            ),
        )
        wrapper = MagmaNativePolicyWrapper(cfg_pipe)
        server = WebsocketPolicyServer(
            wrapper, host="127.0.0.1", port=18641, metadata={"model": "magma_native_tiny"}
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
        client = WebsocketPolicyClient("127.0.0.1", 18641, retry_interval_s=0.2)
        action = np.asarray(client.infer(obs))  # [action_step, 7]
        assert action.shape == (1, 7) and np.isfinite(action).all()
        assert client.reset() == {"status": "reset"}
