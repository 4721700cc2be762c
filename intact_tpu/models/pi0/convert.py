"""Checkpoint conversion: LeRobot/HF Pi0 (PyTorch safetensors) <-> intact_tpu.

The released INT-ACT policies (`juexzz/INTACT-pi0-finetune-bridge` etc.) are
LeRobot `PI0Policy` safetensors whose module tree is
`model.paligemma_with_expert.{paligemma,gemma_expert}` + projection heads
(SURVEY.md §2.4). This module maps that naming onto the intact_tpu param
pytree (stacked layers) and back:

  * torch Linear weights [out, in] -> transposed kernels [in, out]
  * SigLIP conv patch embedding [D, 3, P, P] -> [P, P, 3, D]
  * per-layer HF keys .layers.{i}. -> stacked leaves with leading layer axis
  * HF Gemma RMSNorm stores the same (1 + w) convention as ours -> copied

`to_torch_state_dict` inverts the mapping (used for round-trip tests and for
exporting checkpoints to LeRobot consumers). Parity target: action-chunk MSE
< 1e-3 vs the released checkpoints (BASELINE.md) once the real weights are
present; the structural mapping is pinned by round-trip tests here.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from intact_tpu.models.pi0.config import Pi0Config

# prefixes inside the LeRobot PI0Policy state dict
P_VISION = "model.paligemma_with_expert.paligemma.vision_tower.vision_model"
P_PROJ = "model.paligemma_with_expert.paligemma.multi_modal_projector"
P_LM = "model.paligemma_with_expert.paligemma.language_model.model"
P_EXPERT = "model.paligemma_with_expert.gemma_expert.model"
P_HEADS = "model"


def _t(w) -> np.ndarray:  # torch Linear weight -> kernel
    return np.asarray(w).T.copy()


def _stack(sd: dict, fmt: str, n: int, transform=np.asarray) -> np.ndarray:
    return np.stack([transform(sd[fmt.format(i=i)]) for i in range(n)])


def _gemma_blocks_from_sd(sd: dict, prefix: str, cfg) -> dict:
    fmt = prefix + ".layers.{i}."
    n = cfg.depth

    def lin(name):
        return _stack(sd, fmt + name + ".weight", n, _t)

    return {
        "blocks": {
            "ln1": {"scale": _stack(sd, fmt + "input_layernorm.weight", n)},
            "attn": {
                "q": {"kernel": lin("self_attn.q_proj")},
                "k": {"kernel": lin("self_attn.k_proj")},
                "v": {"kernel": lin("self_attn.v_proj")},
                "o": {"kernel": lin("self_attn.o_proj")},
            },
            "ln2": {"scale": _stack(sd, fmt + "post_attention_layernorm.weight", n)},
            "mlp": {
                "gate": {"kernel": lin("mlp.gate_proj")},
                "up": {"kernel": lin("mlp.up_proj")},
                "down": {"kernel": lin("mlp.down_proj")},
            },
        },
        "final_norm": {"scale": np.asarray(sd[prefix + ".norm.weight"])},
    }


def _siglip_from_sd(sd: dict, cfg, prefix: str = P_VISION) -> dict:
    """transformers SiglipVisionModel naming -> siglip param tree; ``prefix``
    locates the vision_model inside larger checkpoints (Pi0, SpatialVLA)."""
    P_VISION = prefix
    fmt = P_VISION + ".encoder.layers.{i}."
    n = cfg.depth

    def lin_w(name):
        return _stack(sd, fmt + name + ".weight", n, _t)

    def lin_b(name):
        return _stack(sd, fmt + name + ".bias", n)

    conv = np.asarray(sd[P_VISION + ".embeddings.patch_embedding.weight"])
    return {
        "patch_embed": {
            "kernel": conv.transpose(2, 3, 1, 0).copy(),  # [D,3,P,P] -> [P,P,3,D]
            "bias": np.asarray(sd[P_VISION + ".embeddings.patch_embedding.bias"]),
        },
        "pos_embed": np.asarray(
            sd[P_VISION + ".embeddings.position_embedding.weight"]
        )[None],
        "blocks": {
            "ln1": {"scale": _stack(sd, fmt + "layer_norm1.weight", n),
                    "bias": _stack(sd, fmt + "layer_norm1.bias", n)},
            "attn": {
                "q": {"kernel": lin_w("self_attn.q_proj"), "bias": lin_b("self_attn.q_proj")},
                "k": {"kernel": lin_w("self_attn.k_proj"), "bias": lin_b("self_attn.k_proj")},
                "v": {"kernel": lin_w("self_attn.v_proj"), "bias": lin_b("self_attn.v_proj")},
                "o": {"kernel": lin_w("self_attn.out_proj"), "bias": lin_b("self_attn.out_proj")},
            },
            "ln2": {"scale": _stack(sd, fmt + "layer_norm2.weight", n),
                    "bias": _stack(sd, fmt + "layer_norm2.bias", n)},
            "mlp": {
                "fc1": {"kernel": lin_w("mlp.fc1"), "bias": lin_b("mlp.fc1")},
                "fc2": {"kernel": lin_w("mlp.fc2"), "bias": lin_b("mlp.fc2")},
            },
        },
        "ln_post": {
            "scale": np.asarray(sd[P_VISION + ".post_layernorm.weight"]),
            "bias": np.asarray(sd[P_VISION + ".post_layernorm.bias"]),
        },
    }


def from_torch_state_dict(sd: dict, cfg: Pi0Config) -> dict:
    """Flat {name: array} (torch layout) -> intact_tpu pi0 param pytree."""
    heads = {}
    for ours, theirs in [
        ("state_proj", "state_proj"),
        ("action_in_proj", "action_in_proj"),
        ("action_out_proj", "action_out_proj"),
        ("time_mlp_in", "action_time_mlp_in"),
        ("time_mlp_out", "action_time_mlp_out"),
    ]:
        heads[ours] = {
            "kernel": _t(sd[f"{P_HEADS}.{theirs}.weight"]),
            "bias": np.asarray(sd[f"{P_HEADS}.{theirs}.bias"]),
        }
    return {
        "siglip": _siglip_from_sd(sd, cfg.vision),
        "img_proj": {
            "kernel": _t(sd[P_PROJ + ".linear.weight"]),
            "bias": np.asarray(sd[P_PROJ + ".linear.bias"]),
        },
        "vlm_embed": {"embedding": np.asarray(sd[P_LM + ".embed_tokens.weight"])},
        "vlm": _gemma_blocks_from_sd(sd, P_LM, cfg.vlm),
        "expert": _gemma_blocks_from_sd(sd, P_EXPERT, cfg.expert),
        **heads,
    }


def to_torch_state_dict(params: dict, cfg: Pi0Config) -> dict:
    """Inverse mapping -> flat {name: np.ndarray} in torch layout."""
    sd: dict[str, np.ndarray] = {}

    def put_linear(name, p, bias=True):
        sd[name + ".weight"] = np.asarray(p["kernel"]).T.copy()
        if bias and "bias" in p:
            sd[name + ".bias"] = np.asarray(p["bias"])

    # heads
    for ours, theirs in [
        ("state_proj", "state_proj"),
        ("action_in_proj", "action_in_proj"),
        ("action_out_proj", "action_out_proj"),
        ("time_mlp_in", "action_time_mlp_in"),
        ("time_mlp_out", "action_time_mlp_out"),
    ]:
        put_linear(f"{P_HEADS}.{theirs}", params[ours])
    put_linear(P_PROJ + ".linear", params["img_proj"])
    sd[P_LM + ".embed_tokens.weight"] = np.asarray(params["vlm_embed"]["embedding"])

    # gemma stacks
    for prefix, tree, cfg_ in [(P_LM, params["vlm"], cfg.vlm), (P_EXPERT, params["expert"], cfg.expert)]:
        b = tree["blocks"]
        for i in range(cfg_.depth):
            base = f"{prefix}.layers.{i}."
            sd[base + "input_layernorm.weight"] = np.asarray(b["ln1"]["scale"][i])
            sd[base + "post_attention_layernorm.weight"] = np.asarray(b["ln2"]["scale"][i])
            for qkv, theirs in [("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "o_proj")]:
                sd[base + f"self_attn.{theirs}.weight"] = np.asarray(
                    b["attn"][qkv]["kernel"][i]
                ).T.copy()
            for m, theirs in [("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")]:
                sd[base + f"mlp.{theirs}.weight"] = np.asarray(b["mlp"][m]["kernel"][i]).T.copy()
        sd[prefix + ".norm.weight"] = np.asarray(tree["final_norm"]["scale"])

    # siglip
    v = params["siglip"]
    sd[P_VISION + ".embeddings.patch_embedding.weight"] = np.asarray(
        v["patch_embed"]["kernel"]
    ).transpose(3, 2, 0, 1).copy()
    sd[P_VISION + ".embeddings.patch_embedding.bias"] = np.asarray(v["patch_embed"]["bias"])
    sd[P_VISION + ".embeddings.position_embedding.weight"] = np.asarray(v["pos_embed"])[0]
    vb = v["blocks"]
    for i in range(cfg.vision.depth):
        base = f"{P_VISION}.encoder.layers.{i}."
        for ln, theirs in [("ln1", "layer_norm1"), ("ln2", "layer_norm2")]:
            sd[base + theirs + ".weight"] = np.asarray(vb[ln]["scale"][i])
            sd[base + theirs + ".bias"] = np.asarray(vb[ln]["bias"][i])
        for qkv, theirs in [("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "out_proj")]:
            sd[base + f"self_attn.{theirs}.weight"] = np.asarray(vb["attn"][qkv]["kernel"][i]).T.copy()
            sd[base + f"self_attn.{theirs}.bias"] = np.asarray(vb["attn"][qkv]["bias"][i])
        for m in ["fc1", "fc2"]:
            sd[base + f"mlp.{m}.weight"] = np.asarray(vb["mlp"][m]["kernel"][i]).T.copy()
            sd[base + f"mlp.{m}.bias"] = np.asarray(vb["mlp"][m]["bias"][i])
    sd[P_VISION + ".post_layernorm.weight"] = np.asarray(v["ln_post"]["scale"])
    sd[P_VISION + ".post_layernorm.bias"] = np.asarray(v["ln_post"]["bias"])
    return sd


def load_safetensors_checkpoint(path: str | Path, cfg: Pi0Config) -> dict:
    """Load a LeRobot pi0 `model.safetensors` (file or HF-layout dir) and
    convert. Values come back float32."""
    from safetensors import safe_open

    path = Path(path)
    if path.is_dir():
        path = path / "model.safetensors"
    sd = {}
    with safe_open(str(path), framework="np") as f:
        for key in f.keys():
            arr = f.get_tensor(key)
            sd[key] = np.asarray(arr, np.float32)
    return from_torch_state_dict(sd, cfg)
