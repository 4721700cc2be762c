"""Native Magma-8B: ConvNeXt vision tower + projector + LLaMA-3 decode.

Reference behavior (``src/experiments/policies/policy_wrapper.py:226-303``):
chat prompt with an ``<image>`` placeholder -> HF ``generate`` (Python loop,
``use_cache=False``) -> last 7 tokens -> 256-bin vocab-offset actions. Here
the whole inference is ONE XLA program: ConvNeXt encode, feature splice at
the placeholder positions, LLaMA prefill + KV-cached greedy decode under
``lax.scan`` (models/llama.py), on TPU without torch.

Weight import consumes the microsoft/Magma-8B checkpoint layout
(``vision_tower.*`` open_clip/timm ConvNeXt naming, ``multi_modal_projector``,
``language_model.*`` LlamaForCausalLM naming), shape-checked against
``jax.eval_shape`` of our init so convention drift fails loudly.
"""

from __future__ import annotations

import logging
import re

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import convnext, llama
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.magma.config import MagmaConfig


# ---------------------------------------------------------------------------
# init / forward
# ---------------------------------------------------------------------------

def init(key, cfg: MagmaConfig) -> cm.Params:
    ks = jax.random.split(key, 4)
    proj: cm.Params = {
        "linear_1": cm.dense_init(ks[2], cfg.vision.dims[-1], cfg.lm.width)
    }
    if cfg.projector_layers == 2:
        proj["linear_2"] = cm.dense_init(ks[3], cfg.lm.width, cfg.lm.width)
    return {
        "vision": convnext.init(ks[0], cfg.vision),
        "projector": proj,
        "lm": llama.init(ks[1], cfg.lm),
    }


# CLIP image normalization constants (the HF Magma processor's convention)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> CLIP-normalized float32, ON DEVICE.

    Serving ships uint8 over the host->device transfer (4x fewer bytes than
    pre-normalized float32 — the transfer dominates per-request latency at
    512px) and pays the normalize on the VPU where it is free."""
    pix01 = images_u8.astype(jnp.float32) / 255.0
    return (pix01 - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def encode_images(params, images, cfg: MagmaConfig,
                  policy: DtypePolicy = DEFAULT_POLICY):
    """images [B, H, W, 3] -> projected vision tokens [B, n_image_tokens, D_lm]."""
    feats, _ = convnext.encode(params["vision"], images, cfg.vision, policy)
    b, h, w, c = feats.shape
    x = cm.dense(params["projector"]["linear_1"], feats.reshape(b, h * w, c), policy)
    if "linear_2" in params["projector"]:
        x = cm.dense(params["projector"]["linear_2"],
                     jax.nn.gelu(x, approximate=False), policy)
    return x


def embed_prompt(params, images, tokens, masks, cfg: MagmaConfig,
                 policy: DtypePolicy = DEFAULT_POLICY):
    """Token embeds with vision features spliced at ``image_token_id``
    positions, in order (the HF model scatters image features over the
    placeholder run the same way). Shapes stay static: the i-th placeholder
    in each row receives the i-th vision token of that row."""
    text = cm.embed_lookup(params["lm"]["embed"], tokens, policy)  # [B, T, D]
    vis = encode_images(params, images, cfg, policy)      # [B, N, D]
    is_img = tokens == cfg.image_token_id                 # [B, T]
    idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, vis.shape[1] - 1)
    gathered = jnp.take_along_axis(vis, idx[:, :, None], axis=1)
    return jnp.where(is_img[:, :, None], gathered, text), masks


def generate(params, images, tokens, masks, cfg: MagmaConfig,
             policy: DtypePolicy = DEFAULT_POLICY,
             max_new_tokens: int | None = None) -> jnp.ndarray:
    """-> [B, max_new_tokens] generated ids (greedy). The trained model emits
    the 7 action tokens first, then EOS — callers slice the leading
    ``n_action_tokens`` (equivalent to the reference's ``[-8:-1]`` slice of a
    generate that stops right after them)."""
    n = max_new_tokens or cfg.n_action_tokens + 1
    embeds, mask = embed_prompt(params, images, tokens, masks, cfg, policy)
    return llama.greedy_decode(params["lm"], embeds, mask, n, cfg.lm, policy)


# LLaMA-3-instruct chat framing around the user turn — what
# apply_chat_template(add_generation_prompt=True) produces and what the
# reference serves through (policy_wrapper.py:275-280). The <image> block
# sits at the start of the user content, mirroring the reference's
# "<image>\n{question}" template.
_CHAT_PRE = "<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
_CHAT_POST = "<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n"


def _encode_segment(tokenizer, text: str) -> list[int]:
    """Tokenize a fixed template segment without padding/BOS. Uses the
    underlying HF tokenizer when available; the hermetic hash tokenizer
    hashes the words (no special-token vocab — fine for tests/bench)."""
    hf = getattr(tokenizer, "tok", None)
    if hf is not None:
        return list(hf.encode(text, add_special_tokens=False))
    return [tokenizer._word_id(w) for w in text.split()]


def build_prompt(tokenizer, tasks: list[str], cfg: MagmaConfig):
    """[chat pre] + [image tokens] + [instruction + chat post, padded] ->
    (tokens, masks) int32/bool. Mirrors the reference's chat-templated
    "<image>\\nWhat action should the robot take to {task}?" prompt
    (policy_wrapper.py:275-280); ``use_chat_template=False`` drops the
    instruct framing (tiny/hermetic runs)."""
    b = len(tasks)
    if cfg.use_chat_template:
        pre_ids = _encode_segment(tokenizer, _CHAT_PRE)  # includes BOS
    else:
        bos = getattr(tokenizer, "bos_id", None)
        hf = getattr(tokenizer, "tok", None)
        if bos is None and hf is not None:
            bos = hf.bos_token_id
        pre_ids = [bos] if bos is not None else []
    # the assistant-header suffix must survive truncation: decoding from a
    # user-turn context breaks the LLaMA-3-instruct framing, so an
    # over-long instruction loses its own tail, never the chat suffix
    suffix_ids = (
        _encode_segment(tokenizer, _CHAT_POST) if cfg.use_chat_template else []
    )
    body_ids = [
        _encode_segment(tokenizer, f"\nWhat action should the robot take to {t}?")
        for t in tasks
    ]

    n_pre, n_img = len(pre_ids), cfg.n_image_tokens
    n_post = cfg.max_prompt_tokens
    n_body_max = max(n_post - len(suffix_ids), 0)
    tokens = np.zeros((b, n_pre + n_img + n_post), np.int32)
    masks = np.zeros_like(tokens, bool)
    tokens[:, :n_pre] = pre_ids
    masks[:, :n_pre] = True
    tokens[:, n_pre:n_pre + n_img] = cfg.image_token_id
    masks[:, n_pre:n_pre + n_img] = True
    for i, body in enumerate(body_ids):
        if len(body) > n_body_max:
            logging.getLogger("intact_tpu.magma").warning(
                "instruction %r truncated from %d to %d tokens to fit "
                "max_prompt_tokens=%d (chat suffix preserved)",
                tasks[i][:60], len(body), n_body_max, n_post,
            )
        ids = body[:n_body_max] + suffix_ids
        ids = ids[:n_post]
        tokens[i, n_pre + n_img:n_pre + n_img + len(ids)] = ids
        masks[i, n_pre + n_img:n_pre + n_img + len(ids)] = True
    # a TEXT token equal to image_token_id would make embed_prompt splice a
    # vision embedding into the instruction (possible with hash-fallback
    # tokenizers whose id range overlaps the placeholder); remap rather
    # than corrupt the prompt silently
    collisions = tokens == cfg.image_token_id
    collisions[:, n_pre:n_pre + n_img] = False  # the real placeholders
    if collisions.any():
        logging.getLogger("intact_tpu.magma").warning(
            "%d text token(s) collided with image_token_id=%d; remapped",
            int(collisions.sum()), cfg.image_token_id,
        )
        tokens[collisions] = max(cfg.image_token_id - 1, 0)
    return tokens, masks


# ---------------------------------------------------------------------------
# HF checkpoint -> params
# ---------------------------------------------------------------------------

_TIMM_RULES = [
    (re.compile(r"^stem\.0\.(weight|bias)$"), r"embeddings.patch_embeddings.\1"),
    (re.compile(r"^stem\.1\.(weight|bias)$"), r"embeddings.layernorm.\1"),
    (re.compile(r"^stages\.(\d+)\.downsample\.0\.(weight|bias)$"),
     r"encoder.stages.\1.downsampling_layer.0.\2"),
    (re.compile(r"^stages\.(\d+)\.downsample\.1\.(weight|bias)$"),
     r"encoder.stages.\1.downsampling_layer.1.\2"),
    (re.compile(r"^stages\.(\d+)\.blocks\.(\d+)\.conv_dw\.(weight|bias)$"),
     r"encoder.stages.\1.layers.\2.dwconv.\3"),
    (re.compile(r"^stages\.(\d+)\.blocks\.(\d+)\.norm\.(weight|bias)$"),
     r"encoder.stages.\1.layers.\2.layernorm.\3"),
    (re.compile(r"^stages\.(\d+)\.blocks\.(\d+)\.mlp\.fc1\.(weight|bias)$"),
     r"encoder.stages.\1.layers.\2.pwconv1.\3"),
    (re.compile(r"^stages\.(\d+)\.blocks\.(\d+)\.mlp\.fc2\.(weight|bias)$"),
     r"encoder.stages.\1.layers.\2.pwconv2.\3"),
    (re.compile(r"^stages\.(\d+)\.blocks\.(\d+)\.gamma$"),
     r"encoder.stages.\1.layers.\2.layer_scale_parameter"),
    (re.compile(r"^head\.norm\.(weight|bias)$"), r"layernorm.\1"),
]


def timm_to_transformers(sd: dict, prefix: str) -> dict:
    """open_clip/timm ConvNeXt naming -> transformers ConvNextModel naming
    (what ``convnext.from_hf_state_dict`` consumes). Keys under ``prefix``
    that match no rule raise — naming drift must not silently drop weights."""
    prefix = prefix + "." if prefix else ""
    out, saw_final_ln = {}, False
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rel = key[len(prefix):]
        for pat, repl in _TIMM_RULES:
            m = pat.match(rel)
            if m:
                new = pat.sub(repl, rel)
                saw_final_ln |= new.startswith("layernorm.")
                out[new] = val
                break
        else:
            raise KeyError(f"unrecognized timm ConvNeXt key: {key!r}")
    if not out:
        raise KeyError(f"no keys under vision prefix {prefix!r}")
    if not saw_final_ln:
        # feature-extractor checkpoints drop the pooling head; our pooled
        # output is unused by Magma, so synthesize an identity LN
        last = max(int(m.group(1)) for k in out
                   if (m := re.match(r"encoder\.stages\.(\d+)\.", k)))
        dim = np.asarray(
            out[f"encoder.stages.{last}.layers.0.pwconv2.weight"]
        ).shape[0]
        out["layernorm.weight"] = np.ones((dim,), np.float32)
        out["layernorm.bias"] = np.zeros((dim,), np.float32)
    return out


def from_hf_state_dict(
    sd: dict,
    cfg: MagmaConfig,
    vision_prefix: str = "vision_tower.clip_vision_model.trunk",
    projector_prefix: str = "multi_modal_projector",
    lm_prefix: str = "language_model.model",
    lm_head_key: str = "language_model.lm_head.weight",
) -> cm.Params:
    """Full Magma checkpoint -> param tree, every leaf shape-checked against
    ``jax.eval_shape(init)`` (GQA layout / transpose errors fail here, not at
    serve time). Vision prefixes are probed across known layout variants;
    oversized (padding-aligned) vocab tables slice down to cfg.lm.vocab_size."""
    from intact_tpu.models.hf_import import (
        check_shapes,
        mlp2_from_sd,
        slice_vocab_rows,
    )

    for cand in (vision_prefix, "vision_tower.trunk", "vision_tower"):
        if any(k.startswith(cand + ".stem") or k.startswith(cand + ".stages")
               for k in sd):
            vision_prefix = cand
            break
    vis_sd = timm_to_transformers(sd, vision_prefix)
    lm = llama.from_hf_state_dict(sd, cfg.lm, prefix=lm_prefix,
                                  head_key=lm_head_key)
    lm["embed"]["embedding"] = slice_vocab_rows(
        lm["embed"]["embedding"], cfg.lm.vocab_size, "magma embed_tokens")
    if "lm_head" in lm:
        lm["lm_head"]["kernel"] = slice_vocab_rows(
            np.asarray(lm["lm_head"]["kernel"]).T, cfg.lm.vocab_size,
            "magma lm_head").T.copy()
    params: cm.Params = {
        "vision": convnext.from_hf_state_dict(vis_sd, cfg.vision, prefix=""),
        "projector": mlp2_from_sd(sd, projector_prefix, "projector"),
        "lm": lm,
    }
    return check_shapes(params, lambda: init(jax.random.key(0), cfg))


def load_magma_checkpoint(path: str, cfg: MagmaConfig) -> cm.Params:
    """Load a Magma HF snapshot directory (sharded ``*.safetensors``) and
    convert — torch-free via safetensors.numpy."""
    from intact_tpu.models.hf_import import load_safetensors_dir

    return from_hf_state_dict(load_safetensors_dir(path), cfg)
