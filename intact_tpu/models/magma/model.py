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


def build_prompt(tokenizer, tasks: list[str], cfg: MagmaConfig):
    """[image tokens] + tokenized instruction -> (tokens, masks) int32/bool
    [B, n_image_tokens + max_prompt_tokens]. Mirrors the reference's
    "<image>\\nWhat action should the robot take to {task}?" template."""
    texts = [f"What action should the robot take to {t}?" for t in tasks]
    txt_tokens, txt_masks = tokenizer(texts, cfg.max_prompt_tokens)
    b = len(tasks)
    img = np.full((b, cfg.n_image_tokens), cfg.image_token_id, np.int32)
    tokens = np.concatenate([img, txt_tokens.astype(np.int32)], axis=1)
    masks = np.concatenate([np.ones_like(img, bool), txt_masks.astype(bool)], axis=1)
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


def _projector_from_sd(sd: dict, prefix: str) -> cm.Params:
    """multi_modal_projector: LLaVA-style {linear_1, linear_2} or
    nn.Sequential-style {proj.0, proj.2}."""
    def lin(name):
        return {"kernel": np.asarray(sd[f"{prefix}.{name}.weight"]).T.copy(),
                "bias": np.asarray(sd[f"{prefix}.{name}.bias"])}

    names = [k[len(prefix) + 1:] for k in sd if k.startswith(prefix + ".")]
    if any(n.startswith("linear_1.") for n in names):
        proj = {"linear_1": lin("linear_1")}
        if any(n.startswith("linear_2.") for n in names):
            proj["linear_2"] = lin("linear_2")
        return proj
    if any(n.startswith("proj.0.") for n in names):
        proj = {"linear_1": lin("proj.0")}
        if any(n.startswith("proj.2.") for n in names):
            proj["linear_2"] = lin("proj.2")
        return proj
    raise KeyError(
        f"no projector weights under {prefix!r} (saw {sorted(names)[:4]}...)"
    )


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
    serve time). Vision prefixes are probed across known layout variants."""
    for cand in (vision_prefix, "vision_tower.trunk", "vision_tower"):
        if any(k.startswith(cand + ".stem") or k.startswith(cand + ".stages")
               for k in sd):
            vision_prefix = cand
            break
    vis_sd = timm_to_transformers(sd, vision_prefix)
    params: cm.Params = {
        "vision": convnext.from_hf_state_dict(vis_sd, cfg.vision, prefix=""),
        "projector": _projector_from_sd(sd, projector_prefix),
        "lm": llama.from_hf_state_dict(sd, cfg.lm, prefix=lm_prefix,
                                       head_key=lm_head_key),
    }
    expected = jax.eval_shape(lambda: init(jax.random.key(0), cfg))
    flat_got = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, exp in jax.tree_util.tree_flatten_with_path(expected)[0]:
        got = flat_got.get(path)
        if got is None:
            raise KeyError(f"missing imported weight at {jax.tree_util.keystr(path)}")
        if tuple(got.shape) != tuple(exp.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path)}: "
                f"imported {tuple(got.shape)} != expected {tuple(exp.shape)}"
            )
    return params


def load_magma_checkpoint(path: str, cfg: MagmaConfig) -> cm.Params:
    """Load a Magma HF snapshot directory (sharded ``*.safetensors``) and
    convert — torch-free via safetensors.numpy."""
    from pathlib import Path

    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    from safetensors.numpy import load_file

    sd: dict = {}
    for f in files:
        sd.update(load_file(str(f)))
    return from_hf_state_dict(sd, cfg)
