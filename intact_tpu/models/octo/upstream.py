"""Released-Octo (rail-berkeley/octo-small) architecture + weight import.

The reference serves real Octo checkpoints through the upstream JAX package
(`src/experiments/policies/policy_wrapper.py:356-371`,
`OctoModel.from_pretrained("hf://rail-berkeley/octo-small")`). This module
reimplements that model's serving path natively so imported weights run
under our jit/sharding stack with no octo-package dependency:

  SmallStem16 conv tokenizer (256 primary-image tokens)
  T5-base language encoder (models/t5.py, HF-parity tested)
  group projections + learned group positional embeddings
  ViT-S block transformer with the octo attention rules
  diffusion action head (FourierFeatures -> cond MLP -> MLPResNet eps-net,
  20-step DDPM with clipping)

`convert_octo_params` maps the released checkpoint's flax param tree onto
this module's layout via suffix regex rules over the flattened tree, so
minor naming drift across octo versions degrades into a readable error
report instead of silent misloading. Offline validation: every numerics
convention with an HF counterpart (T5) is parity-tested; the remaining
structure is covered by synthetic-tree round-trip tests
(tests/test_octo_upstream.py). Real-weight validation requires the
checkpoint asset (zero-egress here); wire it via
OctoUpstreamPolicy.from_checkpoint once present.
"""

from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import t5 as t5_mod
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class OctoUpstreamConfig:
    image_size: int = 256
    history: int = 2
    # SmallStem16
    stem_features: tuple = (32, 96, 192, 384)
    stem_kernel: int = 3
    stem_stride: int = 2
    stem_embed_features: int = 512
    # transformer (octo-small = ViT-S)
    width: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    # language
    t5: t5_mod.T5Config = dataclasses.field(default_factory=t5_mod.t5_base)
    max_lang_tokens: int = 16
    # action head
    horizon: int = 4
    action_dim: int = 7
    diffusion_steps: int = 20
    time_dim: int = 32
    head_hidden: int = 256
    head_blocks: int = 3
    max_action: float = 5.0
    norm_eps: float = 1e-6

    @property
    def n_patches(self) -> int:
        return (self.image_size // 16) ** 2


def octo_small() -> OctoUpstreamConfig:
    return OctoUpstreamConfig()


def octo_base() -> OctoUpstreamConfig:
    return OctoUpstreamConfig(width=768, depth=12, num_heads=12, mlp_dim=3072)


def tiny_test_config() -> OctoUpstreamConfig:
    return OctoUpstreamConfig(
        image_size=32, history=2, stem_features=(4, 8, 8, 8),
        stem_embed_features=16, width=16, depth=2, num_heads=2, mlp_dim=32,
        t5=t5_mod.tiny_test_config(), max_lang_tokens=6,
        horizon=2, action_dim=3, diffusion_steps=4, time_dim=8,
        head_hidden=16, head_blocks=2,
    )


# ---------------------------------------------------------------------------
# init (defines the param layout the converter fills)
# ---------------------------------------------------------------------------

def init(key, cfg: OctoUpstreamConfig) -> cm.Params:
    ks = jax.random.split(key, 16)
    d = cfg.width

    stem = {}
    in_ch = 3
    for i, feat in enumerate(cfg.stem_features):
        k3 = cfg.stem_kernel
        stem[f"conv_{i}"] = {
            "kernel": cm.lecun_normal(ks[i], (k3, k3, in_ch, feat),
                                      in_axis_size=k3 * k3 * in_ch),
            "bias": jnp.zeros((feat,), jnp.float32),
        }
        stem[f"gn_{i}"] = {"scale": jnp.ones((feat,), jnp.float32),
                           "bias": jnp.zeros((feat,), jnp.float32)}
        in_ch = feat
    stem["embed"] = {
        "kernel": cm.lecun_normal(ks[4], (1, 1, in_ch, cfg.stem_embed_features),
                                  in_axis_size=in_ch),
        "bias": jnp.zeros((cfg.stem_embed_features,), jnp.float32),
    }

    def vit_block(k):
        bs = jax.random.split(k, 6)
        return {
            "ln1": cm.layernorm_init(d),
            "attn": {
                "q": cm.dense_init(bs[0], d, d),
                "k": cm.dense_init(bs[1], d, d),
                "v": cm.dense_init(bs[2], d, d),
                "o": cm.dense_init(bs[3], d, d),
            },
            "ln2": cm.layernorm_init(d),
            "mlp": {"fc1": cm.dense_init(bs[4], d, cfg.mlp_dim),
                    "fc2": cm.dense_init(bs[5], cfg.mlp_dim, d)},
        }

    head = {
        "fourier": {"kernel": jax.random.normal(ks[10], (1, cfg.time_dim // 2)) * 0.2},
        "cond_mlp": {
            "fc1": cm.dense_init(ks[11], cfg.time_dim, 2 * cfg.time_dim),
            "fc2": cm.dense_init(ks[12], 2 * cfg.time_dim, cfg.time_dim),
        },
        "reverse": _mlp_resnet_init(ks[13], cfg),
    }

    return {
        "stem_primary": stem,
        "t5": t5_mod.init(ks[5], cfg.t5),
        "obs_primary_projection": cm.dense_init(ks[6], cfg.stem_embed_features, d),
        "task_language_projection": cm.dense_init(ks[7], cfg.t5.d_model, d),
        "obs_primary_pos_embedding": jax.random.normal(
            ks[8], (1, cfg.history, cfg.n_patches, d)) * 0.02,
        "task_language_pos_embedding": jax.random.normal(
            ks[9], (1, cfg.max_lang_tokens, d)) * 0.02,
        "readout_action_pos_embedding": jax.random.normal(
            ks[14], (1, cfg.history, 1, d)) * 0.02,
        "blocks": cm.stack_layer_init(ks[15], cfg.depth, vit_block),
        "encoder_norm": cm.layernorm_init(d),
        "head": head,
    }


def _mlp_resnet_init(key, cfg: OctoUpstreamConfig) -> cm.Params:
    ks = jax.random.split(key, cfg.head_blocks * 2 + 2)
    in_dim = cfg.time_dim + cfg.width + cfg.horizon * cfg.action_dim
    p = {"dense_in": cm.dense_init(ks[0], in_dim, cfg.head_hidden)}
    for i in range(cfg.head_blocks):
        p[f"block_{i}"] = {
            "ln": cm.layernorm_init(cfg.head_hidden),
            "fc1": cm.dense_init(ks[1 + 2 * i], cfg.head_hidden, cfg.head_hidden * 4),
            "fc2": cm.dense_init(ks[2 + 2 * i], cfg.head_hidden * 4, cfg.head_hidden),
        }
    p["dense_out"] = cm.dense_init(ks[-1], cfg.head_hidden,
                                   cfg.horizon * cfg.action_dim)
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _group_norm(p, x, groups: int, eps: float = 1e-5):
    b, h, w, c = x.shape
    g = min(groups, c)
    x32 = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = x32.var(axis=(1, 2, 4), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def small_stem_encode(stem: cm.Params, images: jnp.ndarray,
                      cfg: OctoUpstreamConfig,
                      policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    """uint8/float images [B, H, W, 3] -> [B, n_patches, stem_embed]."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 127.5 - 1.0
    x = policy.cast(x)
    for i in range(len(cfg.stem_features)):
        p = stem[f"conv_{i}"]
        x = jax.lax.conv_general_dilated(
            x, policy.cast(p["kernel"]),
            window_strides=(cfg.stem_stride, cfg.stem_stride),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + policy.cast(p["bias"])
        x = _group_norm(stem[f"gn_{i}"], x, groups=32)
        x = jax.nn.relu(x)
    p = stem["embed"]
    x = jax.lax.conv_general_dilated(
        x, policy.cast(p["kernel"]), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + policy.cast(p["bias"])
    b, gh, gw, c = x.shape
    return x.reshape(b, gh * gw, c)


def encode(params, images, img_masks, lang_tokens, lang_masks,
           cfg: OctoUpstreamConfig, policy: DtypePolicy = DEFAULT_POLICY):
    """-> readout embeddings [B, history, width].

    images [B, T, H, W, 3]; token layout and attention rules follow
    models/octo/model.py (task | per-frame obs + readout blocks).
    """
    from intact_tpu.models.octo.model import _mask_template

    b, t = images.shape[:2]
    n_patch = cfg.n_patches
    d = cfg.width

    obs = small_stem_encode(
        params["stem_primary"], images.reshape(b * t, *images.shape[2:]), cfg, policy
    )
    obs = cm.dense(params["obs_primary_projection"], obs, policy)
    obs = obs.reshape(b, t, n_patch, d) + policy.cast(params["obs_primary_pos_embedding"])

    lang = t5_mod.encode(params["t5"], lang_tokens, lang_masks, cfg.t5, policy)
    lang = cm.dense(params["task_language_projection"], lang, policy)
    lt = lang.shape[1]
    lang = lang + policy.cast(params["task_language_pos_embedding"][:, :lt])

    readout = jnp.broadcast_to(
        policy.cast(params["readout_action_pos_embedding"]), (b, t, 1, d)
    )

    frames = jnp.concatenate([obs, readout], axis=2)  # [B, T, P+1, D]
    tokens = jnp.concatenate([lang, frames.reshape(b, t * (n_patch + 1), d)], axis=1)

    template = jnp.asarray(_mask_template(lt, n_patch, t))
    frame_pad = jnp.repeat(img_masks.astype(bool), n_patch + 1, axis=1)
    pad = jnp.concatenate([lang_masks.astype(bool), frame_pad], axis=1)
    mask = template[None] & pad[:, None, :]

    h, hd = cfg.num_heads, d // cfg.num_heads
    n = tokens.shape[1]

    def body(xc, bp):
        y = cm.layer_norm(bp["ln1"], xc, cfg.norm_eps)
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, hd)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, hd)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, hd)
        att = multi_head_attention(q, k, v, mask=mask)
        xc = xc + cm.dense(bp["attn"]["o"], att.reshape(b, n, d), policy)
        y = cm.layer_norm(bp["ln2"], xc, cfg.norm_eps)
        return xc + cm.gelu_mlp(bp["mlp"], y, policy), None

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])
    tokens = cm.layer_norm(params["encoder_norm"], tokens, cfg.norm_eps)

    readout_idx = lt + jnp.arange(t) * (n_patch + 1) + n_patch
    return tokens[:, readout_idx]


# ---------------------------------------------------------------------------
# diffusion action head (ScoreActor-style)
# ---------------------------------------------------------------------------

def _eps_fn(params, cfg: OctoUpstreamConfig, x_t, time, cond):
    """x_t [B, horizon*action_dim] flattened, time float [B], cond [B, width]."""
    head = params["head"]
    fp32 = DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    # learnable fourier features over the RAW integer timestep — upstream
    # Octo's FourierFeatures consumes unnormalized t in [0, diffusion_steps)
    # (its kernel was trained at that scale; normalizing here would shrink
    # the learned frequencies ~20x for imported weights)
    t_in = time.astype(jnp.float32)[:, None]
    f = 2.0 * jnp.pi * t_in @ head["fourier"]["kernel"].astype(jnp.float32)
    t_ff = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)  # [B, time_dim]
    c = jax.nn.swish(cm.dense(head["cond_mlp"]["fc1"], t_ff, fp32))
    c = cm.dense(head["cond_mlp"]["fc2"], c, fp32)

    h = jnp.concatenate(
        [c, cond.astype(jnp.float32), x_t.reshape(x_t.shape[0], -1)], axis=-1
    )
    r = head["reverse"]
    h = cm.dense(r["dense_in"], h, fp32)
    for i in range(cfg.head_blocks):
        blk = r[f"block_{i}"]
        y = cm.layer_norm(blk["ln"], h, cfg.norm_eps)
        y = jax.nn.swish(cm.dense(blk["fc1"], y, fp32))
        y = cm.dense(blk["fc2"], y, fp32)
        h = h + y
    h = jax.nn.swish(h)
    return cm.dense(r["dense_out"], h, fp32).reshape(x_t.shape)


def sample_actions(params, key, images, img_masks, lang_tokens, lang_masks, state,
                   cfg: OctoUpstreamConfig, policy: DtypePolicy = DEFAULT_POLICY,
                   noise=None):
    """DDPM sampling with PER-STEP clipping to [-max_action, max_action]
    (upstream Octo clips current_x after every denoising step).
    ``noise`` fixes x_T for deterministic parity comparisons."""
    from intact_tpu.models import diffusion as diff

    readouts = encode(params, images, img_masks, lang_tokens, lang_masks, cfg, policy)
    cond = readouts[:, -1]
    schedule = diff.make_schedule(cfg.diffusion_steps)
    shape = (images.shape[0], cfg.horizon, cfg.action_dim)
    return diff.ddpm_sample(
        schedule,
        lambda x, t, c: _eps_fn(params, cfg, x, t, c),
        key, shape, cond,
        clip_value=cfg.max_action, init_noise=noise,
    )


def compute_loss(params, key, batch, cfg: OctoUpstreamConfig,
                 policy: DtypePolicy = DEFAULT_POLICY, train: bool = True):
    from intact_tpu.models import diffusion as diff

    readouts = encode(params, batch["images"], batch["img_masks"],
                      batch["lang_tokens"], batch["lang_masks"], cfg, policy)
    cond = readouts[:, -1]
    schedule = diff.make_schedule(cfg.diffusion_steps)
    loss, aux = diff.training_loss(
        schedule, lambda x, t, c: _eps_fn(params, cfg, x, t, c),
        key, batch["actions"].astype(jnp.float32), cond,
    )
    return loss, {"l2_loss": loss, "losses": aux["losses"]}


# ---------------------------------------------------------------------------
# checkpoint import
# ---------------------------------------------------------------------------

def _flatten(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _assign(tree, path: tuple, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node[k]
    expect = np.asarray(node[path[-1]])
    if expect.shape != value.shape:
        raise ValueError(
            f"shape mismatch at {'/'.join(map(str, path))}: "
            f"checkpoint {value.shape} vs model {expect.shape}"
        )
    node[path[-1]] = value.astype(np.float32)


def convert_octo_params(ckpt_tree: dict, cfg: OctoUpstreamConfig,
                        strict: bool = True) -> cm.Params:
    """Released octo flax param tree -> this module's layout.

    Matching is by path SUFFIX regex over the flattened tree, so exact
    module nesting ('octo_transformer/...') may vary between octo releases
    without breaking the import. Missing required targets raise with a
    report of every unmatched rule (strict=True).
    """
    flat = _flatten(ckpt_tree)
    params = jax.tree.map(np.asarray, init(jax.random.key(0), cfg))
    n_layers = cfg.depth
    missing: list[str] = []

    def grab(pattern: str):
        rx = re.compile(pattern)
        hits = {k: v for k, v in flat.items() if rx.search(k)}
        return hits

    def one(pattern: str):
        hits = grab(pattern)
        if len(hits) == 1:
            return next(iter(hits.values()))
        missing.append(f"{pattern} -> {len(hits)} matches")
        return None

    # ---- ViT encoder blocks ----
    for i in range(n_layers):
        blk = rf"encoderblock_{i}/"
        for ours, theirs in [("q", "query"), ("k", "key"), ("v", "value"),
                             ("o", "out")]:
            kern = one(blk + rf"MultiHeadDotProductAttention_0/{theirs}/kernel$")
            bias = one(blk + rf"MultiHeadDotProductAttention_0/{theirs}/bias$")
            if kern is not None:
                d = cfg.width
                if ours == "o":
                    kern = kern.reshape(d, d)  # [h, dh, d] -> [d(in), d]
                    bias = bias.reshape(d)
                else:
                    kern = kern.reshape(d, d)  # [d, h, dh] -> [d, d]
                    bias = bias.reshape(d)
                _assign(params, ("blocks", "attn", ours, "kernel"),
                        _stacked(params["blocks"]["attn"][ours]["kernel"], i, kern))
                _assign(params, ("blocks", "attn", ours, "bias"),
                        _stacked(params["blocks"]["attn"][ours]["bias"], i, bias))
        for ours, theirs in [("ln1", "LayerNorm_0"), ("ln2", "LayerNorm_1")]:
            for f_ours, f_theirs in [("scale", "scale"), ("bias", "bias")]:
                v = one(blk + rf"{theirs}/{f_theirs}$")
                if v is not None:
                    _assign(params, ("blocks", ours, f_ours),
                            _stacked(params["blocks"][ours][f_ours], i, v))
        for ours, theirs in [("fc1", "Dense_0"), ("fc2", "Dense_1")]:
            for field in ["kernel", "bias"]:
                v = one(blk + rf"MlpBlock_0/{theirs}/{field}$")
                if v is not None:
                    _assign(params, ("blocks", "mlp", ours, field),
                            _stacked(params["blocks"]["mlp"][ours][field], i, v))

    # ---- norms, projections, embeddings ----
    for path, pattern in [
        (("encoder_norm", "scale"), r"encoder_norm/scale$"),
        (("encoder_norm", "bias"), r"encoder_norm/bias$"),
        (("obs_primary_projection", "kernel"), r"obs_primary_projection/kernel$"),
        (("obs_primary_projection", "bias"), r"obs_primary_projection/bias$"),
        (("task_language_projection", "kernel"), r"task_language_projection/kernel$"),
        (("task_language_projection", "bias"), r"task_language_projection/bias$"),
        (("obs_primary_pos_embedding",), r"obs_primary_pos_embedding$"),
        (("task_language_pos_embedding",), r"task_language_pos_embedding$"),
        (("readout_action_pos_embedding",), r"readout_action_pos_embedding$"),
    ]:
        v = one(pattern)
        if v is not None:
            target = np.asarray(_get(params, path))
            if v.size == target.size:
                v = v.reshape(target.shape)
            _assign(params, path, v)

    # ---- SmallStem ----
    for i in range(len(cfg.stem_features)):
        for field in ["kernel", "bias"]:
            v = one(rf"observation_tokenizers_primary/.*Conv_{i}/{field}$")
            if v is not None:
                _assign(params, ("stem_primary", f"conv_{i}", field), v)
            g = one(rf"observation_tokenizers_primary/.*GroupNorm_{i}/{field.replace('kernel', 'scale')}$")
            if g is not None:
                _assign(params, ("stem_primary", f"gn_{i}",
                                 "scale" if field == "kernel" else "bias"), g)
    emb_k = one(r"observation_tokenizers_primary/.*embedding/kernel$")
    emb_b = one(r"observation_tokenizers_primary/.*embedding/bias$")
    if emb_k is not None:
        _assign(params, ("stem_primary", "embed", "kernel"), emb_k)
        _assign(params, ("stem_primary", "embed", "bias"), emb_b)

    # ---- T5 (flax layout: kernels already [in, out]) ----
    t5p = params["t5"]
    emb = one(r"task_tokenizers_language/.*shared/embedding$")
    if emb is not None:
        _assign(params, ("t5", "embed", "embedding"), emb)
    rel = one(r"task_tokenizers_language/.*block/0/layer/0/SelfAttention/"
              r"relative_attention_bias/embedding$")
    if rel is not None:
        _assign(params, ("t5", "rel_bias"), rel)
    for i in range(cfg.t5.num_layers):
        base = rf"task_tokenizers_language/.*block/{i}/layer/"
        for ours, theirs in [("q", "q"), ("k", "k"), ("v", "v"), ("o", "o")]:
            v = one(base + rf"0/SelfAttention/{theirs}/kernel$")
            if v is not None:
                _assign(params, ("t5", "blocks", "attn", ours, "kernel"),
                        _stacked(t5p["blocks"]["attn"][ours]["kernel"], i, v))
        for ours, idx in [("ln1", "0"), ("ln2", "1")]:
            v = one(base + rf"{idx}/layer_norm/weight$")
            if v is not None:
                _assign(params, ("t5", "blocks", ours, "scale"),
                        _stacked(t5p["blocks"][ours]["scale"], i, v))
        for ours, theirs in [("wi", "wi"), ("wo", "wo")]:
            v = one(base + rf"1/DenseReluDense/{theirs}/kernel$")
            if v is not None:
                _assign(params, ("t5", "blocks", "mlp", ours, "kernel"),
                        _stacked(t5p["blocks"]["mlp"][ours]["kernel"], i, v))
    fn = one(r"task_tokenizers_language/.*final_layer_norm/weight$")
    if fn is not None:
        _assign(params, ("t5", "final_norm", "scale"), fn)

    # ---- diffusion head ----
    # FourierFeatures stores its kernel as [out//2, in] upstream; this
    # module multiplies t [B, in] @ kernel [in, out//2]
    ff = one(r"heads_action/.*FourierFeatures_0/kernel$")
    if ff is not None:
        target = np.asarray(_get(params, ("head", "fourier", "kernel")))
        if ff.shape == target.shape[::-1] and ff.shape != target.shape:
            ff = ff.T.copy()
        _assign(params, ("head", "fourier", "kernel"), ff)
    for path, pattern in [
        (("head", "cond_mlp", "fc1", "kernel"), r"heads_action/.*cond_encoder/Dense_0/kernel$"),
        # (fourier kernel handled above with its transpose)
        (("head", "cond_mlp", "fc1", "bias"), r"heads_action/.*cond_encoder/Dense_0/bias$"),
        (("head", "cond_mlp", "fc2", "kernel"), r"heads_action/.*cond_encoder/Dense_1/kernel$"),
        (("head", "cond_mlp", "fc2", "bias"), r"heads_action/.*cond_encoder/Dense_1/bias$"),
        (("head", "reverse", "dense_in", "kernel"), r"heads_action/.*reverse_network/Dense_0/kernel$"),
        (("head", "reverse", "dense_in", "bias"), r"heads_action/.*reverse_network/Dense_0/bias$"),
        (("head", "reverse", "dense_out", "kernel"), r"heads_action/.*reverse_network/Dense_1/kernel$"),
        (("head", "reverse", "dense_out", "bias"), r"heads_action/.*reverse_network/Dense_1/bias$"),
    ]:
        v = one(pattern)
        if v is not None:
            _assign(params, path, v)
    for i in range(cfg.head_blocks):
        base = rf"heads_action/.*reverse_network/MLPResNetBlock_{i}/"
        for path, pattern in [
            (("ln", "scale"), base + r"LayerNorm_0/scale$"),
            (("ln", "bias"), base + r"LayerNorm_0/bias$"),
            (("fc1", "kernel"), base + r"Dense_0/kernel$"),
            (("fc1", "bias"), base + r"Dense_0/bias$"),
            (("fc2", "kernel"), base + r"Dense_1/kernel$"),
            (("fc2", "bias"), base + r"Dense_1/bias$"),
        ]:
            v = one(pattern)
            if v is not None:
                _assign(params, ("head", "reverse", f"block_{i}") + path, v)

    if strict and missing:
        raise ValueError(
            "octo checkpoint import: %d rules did not match exactly once:\n  "
            % len(missing) + "\n  ".join(missing[:40])
        )
    return jax.tree.map(jnp.asarray, params)


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _stacked(stacked: np.ndarray, i: int, value: np.ndarray) -> np.ndarray:
    """Insert layer i's leaf into a stacked-leading-axis array (returns a
    full array so _assign's shape check applies to the stack)."""
    out = np.asarray(stacked).copy()
    out[i] = value.reshape(out[i].shape)
    return out


def load_octo_checkpoint(path: str, cfg: OctoUpstreamConfig) -> cm.Params:
    """Load a released Octo checkpoint directory (msgpack or orbax params)
    and convert. Accepts the HF snapshot layout of rail-berkeley/octo-*."""
    from pathlib import Path

    p = Path(path)
    candidates = list(p.glob("*.msgpack")) + [p / "params", p]
    tree = None
    for c in candidates:
        if c.is_file() and c.suffix == ".msgpack":
            from flax import serialization

            tree = serialization.msgpack_restore(c.read_bytes())
            break
        if (c / "_METADATA").exists() or (c / "checkpoint").exists():
            import orbax.checkpoint as ocp

            tree = ocp.StandardCheckpointer().restore(str(c))
            break
    if tree is None:
        raise FileNotFoundError(f"no octo params found under {path}")
    # octo checkpoints nest under {"octo_transformer": ..., "heads_action"...}
    # possibly wrapped in {"params": ...} / {"model": {"params": ...}}
    for key in ("model", "params"):
        if isinstance(tree, dict) and key in tree and isinstance(tree[key], dict):
            tree = tree[key]
    return convert_octo_params(tree, cfg)
