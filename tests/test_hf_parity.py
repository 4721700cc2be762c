"""HF-convention parity fixtures (SURVEY.md §7 "hard parts").

Checkpoint parity with released Pi0 weights hinges on matching HF/LeRobot
numerics exactly: GQA head layout, RoPE rotation convention, RMSNorm (1+w)
gain, the Gemma sqrt(width) embed scaling, and PaliGemma's projector
scaling (get_image_features divides by sqrt(hidden), the policy multiplies
back — net unscaled). Rather than recorded fixtures, these tests construct
TINY RANDOM-WEIGHT HF torch models locally (no network), convert their
state dicts through models/pi0/convert.py, and require our JAX forward to
reproduce the torch outputs to float32 tolerance. Any convention break
fails loudly.

Reference access patterns: `src/model/mvla/mllm.py:30-52` (RoPE),
`modeling_mvla.py:582-620` (embed scaling), lerobot PI0Policy state-dict
naming (convert.py prefixes).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from intact_tpu.models import common as cm  # noqa: E402
from intact_tpu.models import gemma as gemma_mod  # noqa: E402
from intact_tpu.models import siglip as siglip_mod  # noqa: E402
from intact_tpu.models.pi0 import convert  # noqa: E402

FP32 = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)

# tiny-but-nontrivial: GQA with num_heads*head_dim != hidden stresses the
# q/k/v reshape layout exactly where PaliGemma does (8 q / 1 kv, 256 dim)
HIDDEN, LAYERS, HEADS, KV_HEADS, HEAD_DIM, MLP, VOCAB = 32, 2, 4, 1, 16, 64, 99


def _remap(sd: dict, old_prefix: str, new_prefix: str) -> dict:
    out = {}
    for k, v in sd.items():
        assert k.startswith(old_prefix), k
        out[new_prefix + k[len(old_prefix):]] = v.detach().numpy().astype(np.float32)
    return out


@pytest.fixture(scope="module")
def hf_gemma():
    from transformers import GemmaConfig, GemmaModel

    cfg = GemmaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=MLP,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
        rms_norm_eps=1e-6, rope_theta=10000.0, attention_bias=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = GemmaModel(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def our_gemma_cfg():
    return gemma_mod.GemmaConfig(
        width=HIDDEN, depth=LAYERS, mlp_dim=MLP, num_heads=HEADS,
        num_kv_heads=KV_HEADS, head_dim=HEAD_DIM, vocab_size=VOCAB,
    )


class TestGemmaParity:
    """HF GemmaModel (random tiny) == our embed*sqrt(d) -> prefill stack.

    One end-to-end equality through 2 layers pins every convention at once:
    a wrong RoPE half-split, a (1+w) vs w RMSNorm, a transposed GQA head
    layout, or a missing sqrt(width) each shift outputs by O(1)."""

    def _ours_from_hf(self, hf_gemma, our_gemma_cfg):
        sd = _remap(hf_gemma.state_dict(), "", convert.P_LM + ".")
        blocks = convert._gemma_blocks_from_sd(sd, convert.P_LM, our_gemma_cfg)
        embed = {"embedding": sd[convert.P_LM + ".embed_tokens.weight"]}
        return blocks, embed

    def test_full_forward(self, hf_gemma, our_gemma_cfg):
        blocks, embed = self._ours_from_hf(hf_gemma, our_gemma_cfg)
        ids = np.array([[1, 5, 9, 42, 7], [3, 3, 8, 97, 0]], np.int32)
        with torch.no_grad():
            ref = hf_gemma(torch.tensor(ids.astype(np.int64))).last_hidden_state.numpy()

        b, t = ids.shape
        x = cm.embed_lookup(embed, jnp.asarray(ids), FP32)
        x = x * jnp.asarray(HIDDEN**0.5, x.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))[None].repeat(b, 0)
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        out, _ = gemma_mod.prefill(blocks, x, causal, positions, our_gemma_cfg, FP32)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)

    def test_rope_matches_hf_rotation(self, hf_gemma):
        """Direct RoPE pin: our half-split rotation == HF rotate_half +
        duplicated cos/sin, for asymmetric positions."""
        from transformers.models.gemma.modeling_gemma import (
            GemmaRotaryEmbedding,
            apply_rotary_pos_emb,
        )

        from intact_tpu.ops.rope import apply_rope

        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, 5, HEADS, HEAD_DIM)).astype(np.float32)
        pos = np.array([[0, 1, 2, 3, 4], [2, 4, 6, 8, 10]], np.int32)

        rot = GemmaRotaryEmbedding(config=hf_gemma.config)
        qt = torch.tensor(q).permute(0, 2, 1, 3)  # [B, H, T, D]
        cos, sin = rot(qt, torch.tensor(pos.astype(np.int64)))
        ref, _ = apply_rotary_pos_emb(qt, qt, cos, sin)
        ref = ref.permute(0, 2, 1, 3).numpy()

        ours = np.asarray(apply_rope(jnp.asarray(q), jnp.asarray(pos)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_rmsnorm_one_plus_weight(self):
        """HF GemmaRMSNorm applies (1 + w) in fp32; converted scale must be
        copied, not shifted."""
        from transformers.models.gemma.modeling_gemma import GemmaRMSNorm

        norm = GemmaRMSNorm(HIDDEN, eps=1e-6)
        with torch.no_grad():
            norm.weight.copy_(torch.linspace(-0.5, 0.5, HIDDEN))
        x = np.random.default_rng(1).normal(size=(3, HIDDEN)).astype(np.float32)
        with torch.no_grad():
            ref = norm(torch.tensor(x)).numpy()
        ours = cm.rms_norm({"scale": jnp.asarray(norm.weight.detach().numpy())},
                           jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


class TestSiglipParity:
    """HF SiglipVisionModel (random tiny) == our patchify-matmul encoder."""

    @pytest.fixture(scope="class")
    def hf_siglip(self):
        from transformers import SiglipVisionConfig, SiglipVisionModel

        cfg = SiglipVisionConfig(
            hidden_size=HIDDEN, intermediate_size=MLP, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, image_size=28, patch_size=14,
            layer_norm_eps=1e-6, attn_implementation="eager",
        )
        torch.manual_seed(0)
        return SiglipVisionModel(cfg).eval().float()

    def test_encoder_forward(self, hf_siglip):
        our_cfg = siglip_mod.SigLIPConfig(
            image_size=28, patch_size=14, width=HIDDEN, depth=LAYERS,
            mlp_dim=MLP, num_heads=HEADS,
        )
        sd = _remap(hf_siglip.state_dict(), "vision_model", convert.P_VISION)
        params = convert._siglip_from_sd(sd, our_cfg)

        rng = np.random.default_rng(2)
        img = rng.uniform(-1, 1, size=(2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf_siglip(
                torch.tensor(img.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()
        ours = siglip_mod.encode(params, jnp.asarray(img), our_cfg, FP32)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


class TestPaliGemmaProjectorScaling:
    """The net image-embedding scale: HF get_image_features divides the
    projector output by sqrt(hidden); the reference policy multiplies by
    sqrt(hidden) (modeling_mvla.py:598-602). Net = RAW projector output —
    embed_prefix must NOT apply an extra sqrt(width)."""

    def test_embed_prefix_matches_reference_composition(self):
        from transformers import (
            GemmaConfig,
            PaliGemmaConfig,
            PaliGemmaForConditionalGeneration,
            SiglipVisionConfig,
        )

        from intact_tpu.models.pi0 import model as pi0
        from intact_tpu.models.pi0.config import Pi0Config

        vis = SiglipVisionConfig(
            hidden_size=HIDDEN, intermediate_size=MLP, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, image_size=28, patch_size=14,
            projection_dim=HIDDEN, layer_norm_eps=1e-6,
        )
        txt = GemmaConfig(
            vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=MLP,
            num_hidden_layers=LAYERS, num_attention_heads=HEADS,
            num_key_value_heads=KV_HEADS, head_dim=HEAD_DIM,
        )
        torch.manual_seed(0)
        pg = PaliGemmaForConditionalGeneration(
            PaliGemmaConfig(vision_config=vis, text_config=txt,
                            projection_dim=HIDDEN, image_token_index=VOCAB - 1)
        ).eval().float()

        cfg = Pi0Config.tiny()
        # align the tiny Pi0 config with this HF instance
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            vision=siglip_mod.SigLIPConfig(
                image_size=28, patch_size=14, width=HIDDEN, depth=LAYERS,
                mlp_dim=MLP, num_heads=HEADS,
            ),
            vlm=gemma_mod.GemmaConfig(
                width=HIDDEN, depth=LAYERS, mlp_dim=MLP, num_heads=HEADS,
                num_kv_heads=KV_HEADS, head_dim=HEAD_DIM, vocab_size=VOCAB,
            ),
            tokenizer_max_length=4,
            num_cameras=1,
        )

        # assemble our params from the HF modules through the converter
        full_sd = {
            k: v for k, v in pg.state_dict().items()
        }
        base = "model." if any(k.startswith("model.vision_tower") for k in full_sd) else ""
        sd = {}
        sd.update(_remap(
            {k: v for k, v in full_sd.items() if k.startswith(base + "vision_tower")},
            base + "vision_tower.vision_model", convert.P_VISION))
        sd.update(_remap(
            {k: v for k, v in full_sd.items() if k.startswith(base + "multi_modal_projector")},
            base + "multi_modal_projector", convert.P_PROJ))
        sd.update(_remap(
            {k: v for k, v in full_sd.items() if k.startswith(base + "language_model")},
            base + "language_model", convert.P_LM))
        params = {
            "siglip": convert._siglip_from_sd(sd, cfg.vision),
            "img_proj": {
                "kernel": np.asarray(sd[convert.P_PROJ + ".linear.weight"]).T.copy(),
                "bias": np.asarray(sd[convert.P_PROJ + ".linear.bias"]),
            },
            "vlm_embed": {"embedding": sd[convert.P_LM + ".embed_tokens.weight"]},
        }

        rng = np.random.default_rng(3)
        img = rng.uniform(-1, 1, size=(2, 1, 28, 28, 3)).astype(np.float32)
        ids = np.array([[1, 5, 9, 0], [3, 8, 0, 0]], np.int32)
        masks = ids > 0

        with torch.no_grad():
            feats = pg.get_image_features(
                torch.tensor(img[:, 0].transpose(0, 3, 1, 2))
            )
            if isinstance(feats, tuple):
                feats = feats[0]
            ref_img = (feats * HIDDEN**0.5).numpy()  # reference's multiply-back
            ref_lang = (
                pg.language_model.embed_tokens(torch.tensor(ids.astype(np.int64)))
                * HIDDEN**0.5
            ).numpy()

        embs, pad, att = pi0.embed_prefix(
            params, jnp.asarray(img), jnp.ones((2, 1), bool), jnp.asarray(ids),
            jnp.asarray(masks), cfg, FP32,
        )
        n_patch = cfg.vision.num_patches
        np.testing.assert_allclose(
            np.asarray(embs[:, :n_patch]), ref_img, rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(embs[:, n_patch:]), ref_lang, rtol=2e-4, atol=2e-5
        )
