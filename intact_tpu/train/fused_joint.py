"""Fused backward+optimizer train step for the full-tower joint recipe.

WHY THIS EXISTS. The reference's primary recipe
(`/root/reference/config/train/pi0_finetune_bridge.yaml` +
`src/agent/trainer.py:109-123`) trains the WHOLE PaliGemma-3B + expert
(only the token embedding is frozen). A standard `jax.grad` step must
materialize the full gradient tree at the end of backward; on one 16 GB
v5e that is params (bf16, 6.4 GB) + Adam moments (int8, 5.5 GB) + grads
(bf16, 5.4 GB) ≈ 17.3 GB before a single activation — it can NEVER fit,
at any batch size. (The reference runs this recipe on 80 GB A100s.)

THE TPU ANSWER: hand-roll the trunk backward as a `lax.scan` in reverse
layer order and apply the (8-bit-state) AdamW update to each layer's
parameters IMMEDIATELY inside the scan body, carrying the param and
moment arrays through the scan and updating them in place (`.at[l].set`
— XLA aliases scan carries, so no copy). A layer's gradient exists only
for one scan iteration (~0.25 GB); the full gradient tree never exists.
Peak memory ≈ params + moments + per-layer activations ≈ 13.5 GB at
batch 24.

Per-layer rematerialization is inherent: the body recomputes the layer
forward from the saved layer-input carries via `jax.vjp` (same recompute
a `jax.checkpoint` scan body does).

SEMANTIC DELTA, STATED LOUDLY: global-gradient-norm clipping needs the
full norm BEFORE the first update, but the fused step updates layer L-1
before layer 0's gradient exists. It therefore clips with the PREVIOUS
step's global norm ("delayed clipping", clip_mode="delayed"): factor_t =
min(1, max_norm / ||g||_{t-1}), with factor_0 = 1. The exact current
norm IS computed and reported each step (`grad_norm`), so the delay is
observable. Gradient norms move slowly relative to one step; for exact
reference clipping semantics use the standard (unfused) step on hardware
with the memory for it (e.g. ≥2-chip FSDP). tests/test_fused_joint.py
pins the fused step == standard autodiff step to float tolerance when
clipping is inactive, and the delayed-clip trajectory against the exact
one.

Scope: pi0-family joint recipe (the only full-tower recipe the reference
has). Frozen set is exactly {vlm_embed}.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import gemma
from intact_tpu.models.pi0 import model as pi0_model
from intact_tpu.ops.masks import make_att_2d_masks
from intact_tpu.train.optim import OptimizerConfig, cosine_warmup_restarts
from intact_tpu.train import optim8bit as q8


# ---------------------------------------------------------------------------
# state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedTrainState:
    params: Any
    mu: Any  # moments for trainable leaves only (params minus vlm_embed)
    nu: Any
    count: jnp.ndarray  # int32: emitted updates
    prev_gnorm: jnp.ndarray  # f32: last step's exact global grad norm
    rng: Any


def to_train_state(fs: "FusedTrainState"):
    """FusedTrainState -> TrainState view (same arrays, no copies) so the
    trainer's checkpoint/restore machinery (train/checkpoint.py operates on
    params/opt_state/step) works unchanged for fused runs."""
    from intact_tpu.train.train_step import TrainState

    return TrainState(
        params=fs.params,
        opt_state={"mu": fs.mu, "nu": fs.nu, "prev_gnorm": fs.prev_gnorm},
        step=fs.count,
        rng=fs.rng,
    )


def from_train_state(ts) -> "FusedTrainState":
    return FusedTrainState(
        params=ts.params,
        mu=ts.opt_state["mu"],
        nu=ts.opt_state["nu"],
        count=ts.step,
        prev_gnorm=ts.opt_state["prev_gnorm"],
        rng=ts.rng,
    )


def _is_quant_leaf(x) -> bool:
    """Quantized-moment sentinel: EXACTLY {"q","scale"} — attention param
    dicts contain a key literally named "q" ({q,k,v,o}), so a mere
    membership test would swallow the whole attn subtree."""
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def _trunk_layout(p, block_size: int, min_quant: int):
    """Trunk-stacked leaves [L, ...] -> per-layer-row quantized layout
    {"q": [L, nb, block], "scale": [L, nb, 1]} so the reverse scan can
    read/write one layer's rows in place. Returns None if the leaf should
    keep fp32 moments (too small / not block-divisible)."""
    if p.ndim < 2 or p.size < min_quant:
        return None
    n_l = int(np.prod(p.shape[1:]))
    if n_l % block_size:
        return None
    return (p.shape[0], n_l // block_size)


def _init_moment_tree(params, trunk_names, block_size, min_quant, zero_idx_s,
                      zero_idx_u, signed):
    zero_idx = zero_idx_s if signed else zero_idx_u

    def init_leaf(path_is_trunk, p):
        if path_is_trunk:
            layout = _trunk_layout(p, block_size, min_quant)
            if layout is not None:
                L, nb = layout
                return {
                    "q": jnp.full((L, nb, block_size), zero_idx, jnp.int8),
                    "scale": jnp.zeros((L, nb, 1), jnp.float32),
                }
            return jnp.zeros(p.shape, jnp.float32)
        if p.size >= min_quant:
            nb = -(-p.size // block_size)
            return {
                "q": jnp.full((nb, block_size), zero_idx, jnp.int8),
                "scale": jnp.zeros((nb, 1), jnp.float32),
            }
        return jnp.zeros(p.shape, jnp.float32)

    out = {}
    for name, sub in params.items():
        if name == "vlm_embed":
            continue  # frozen: no optimizer state at all
        is_trunk = name in trunk_names
        out[name] = jax.tree.map(lambda p: init_leaf(is_trunk, p), sub)
    return out


def init_fused_state(params, seed: int, block_size: int = 2048,
                     min_quant_elems: int = 65536) -> FusedTrainState:
    zs = q8.zero_index(signed=True)
    zu = q8.zero_index(signed=False)
    trunk = ("vlm", "expert")
    return FusedTrainState(
        params=params,
        mu=_init_moment_tree(params, trunk, block_size, min_quant_elems,
                             zs, zu, signed=True),
        nu=_init_moment_tree(params, trunk, block_size, min_quant_elems,
                             zs, zu, signed=False),
        count=jnp.zeros((), jnp.int32),
        prev_gnorm=jnp.zeros((), jnp.float32),
        rng=jax.random.key(seed),
    )


# ---------------------------------------------------------------------------
# the leaf update (decode -> adam -> encode, plus stochastic rounding)
# ---------------------------------------------------------------------------

def _sr_add(p, upd_f32, key, stochastic: bool):
    exact = p.astype(jnp.float32) + upd_f32
    if p.dtype != jnp.bfloat16 or not stochastic:
        return exact.astype(p.dtype)
    bits = jax.lax.bitcast_convert_type(exact, jnp.uint32)
    noise = jax.random.randint(key, exact.shape, 0, 1 << 16, dtype=jnp.uint32)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


def _adam_math(g, mu, nu, c1, c2, hp):
    mu = hp.betas[0] * mu + (1.0 - hp.betas[0]) * g
    nu = hp.betas[1] * nu + (1.0 - hp.betas[1]) * jnp.square(g)
    direction = (mu / c1) / (jnp.sqrt(nu / c2) + hp.eps)
    return mu, nu, direction


def leaf_update(p, g, mu_s, nu_s, *, c1, c2, lr, clip_factor, hp,
                key, stochastic, block_size):
    """One parameter leaf: returns (p_new, mu_s_new, nu_s_new, ss).

    ss = sum of squared RAW gradients (fp32-accumulated) for the global
    norm metric. Clipping scales g by clip_factor before the moments, the
    exact analogue of optax clip-then-adam.
    mu_s/nu_s are either fp32 arrays (exact) or {"q","scale"} dicts in the
    FLAT padded layout (q8._encode).

    Quantized leaves run CHUNKED under lax.map: a 134M-element SigLIP
    kernel would otherwise materialize ~2 GB of fp32/s32 decode +
    searchsorted temporaries at once (measured: pushed the joint step 1.9 GB
    past HBM); chunking bounds the temporaries to ~tens of MB while the
    decode->adam->encode math is unchanged."""
    g32 = g.astype(jnp.float32)
    ss = jnp.sum(jnp.square(g32))
    quant = isinstance(mu_s, dict)
    if not quant:
        geff = g32 * clip_factor
        mu, nu, direction = _adam_math(geff, mu_s, nu_s, c1, c2, hp)
        upd = -lr * (direction + hp.weight_decay * p.astype(jnp.float32))
        return _sr_add(p, upd, key, stochastic), mu, nu, ss

    n = p.size
    nb = -(-n // block_size)  # state layout rows (q8._encode convention)
    rows_c = 4096 if nb > 4096 else nb
    nb_pad = -(-nb // rows_c) * rows_c
    n_chunks = nb_pad // rows_c

    def pad_rows(a, fill=0):
        return jnp.pad(a, ((0, nb_pad - nb),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    def to_chunks(flat_vals, dtype):
        flat_vals = jnp.pad(flat_vals.reshape(-1), (0, nb * block_size - n))
        return pad_rows(flat_vals.reshape(nb, block_size)).astype(dtype)

    g_c = to_chunks(g, g.dtype).reshape(n_chunks, rows_c, block_size)
    p_c = to_chunks(p, p.dtype).reshape(n_chunks, rows_c, block_size)
    qm = pad_rows(mu_s["q"]).reshape(n_chunks, rows_c, block_size)
    sm = pad_rows(mu_s["scale"]).reshape(n_chunks, rows_c, 1)
    qn = pad_rows(nu_s["q"]).reshape(n_chunks, rows_c, block_size)
    sn = pad_rows(nu_s["scale"]).reshape(n_chunks, rows_c, 1)
    code_s = jnp.asarray(q8._CODE_SIGNED)
    code_u = jnp.asarray(q8._CODE_UNSIGNED)
    bounds_s = jnp.asarray(q8._BOUND_SIGNED)
    bounds_u = jnp.asarray(q8._BOUND_UNSIGNED)

    def chunk_body(xs):
        gc, pc, qmc, smc, qnc, snc, idx = xs
        gc = gc.astype(jnp.float32) * clip_factor
        mu = code_s[qmc.astype(jnp.int32) + 128] * smc
        nu = code_u[qnc.astype(jnp.int32) + 128] * snc
        mu, nu, direction = _adam_math(gc, mu, nu, c1, c2, hp)
        upd = -lr * (direction + hp.weight_decay * pc.astype(jnp.float32))
        pc_new = _sr_add(pc, upd, jax.random.fold_in(key, idx), stochastic)

        def enc(x, bounds):
            scale = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            u = x / jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
            qi = jnp.searchsorted(bounds, u)
            return (qi.astype(jnp.int32) - 128).astype(jnp.int8), scale

        qm2, sm2 = enc(mu, bounds_s)
        qn2, sn2 = enc(nu, bounds_u)
        return pc_new, qm2, sm2, qn2, sn2

    p_new, qm2, sm2, qn2, sn2 = jax.lax.map(
        chunk_body, (g_c, p_c, qm, sm, qn, sn, jnp.arange(n_chunks)))
    p_new = p_new.reshape(-1)[:n].reshape(p.shape).astype(p.dtype)
    mu_s = {"q": qm2.reshape(nb_pad, block_size)[:nb],
            "scale": sm2.reshape(nb_pad, 1)[:nb]}
    nu_s = {"q": qn2.reshape(nb_pad, block_size)[:nb],
            "scale": sn2.reshape(nb_pad, 1)[:nb]}
    return p_new, mu_s, nu_s, ss


def layer_row_update(p_row, g_row, mu_s, nu_s, layer, *, c1, c2, lr,
                     clip_factor, hp, key, stochastic, block_size):
    """One LAYER ROW of a trunk-stacked leaf, moments in the [L, nb, block]
    row layout; reads and writes only row `layer` (in place under the scan
    carry). Returns (p_row_new, mu_row_new or None, nu_row_new, ss).

    Quantized rows run CHUNKED under lax.map like leaf_update: a 33.5M-elem
    mlp row decodes to 3x128 MB fp32 temporaries unchunked (measured: the
    last ~0.4 GB past HBM)."""
    g = g_row.astype(jnp.float32)
    ss = jnp.sum(jnp.square(g))
    quant = isinstance(mu_s, dict)
    if not quant:
        geff = g * clip_factor
        mu, nu = mu_s[layer], nu_s[layer]
        mu, nu, direction = _adam_math(geff, mu, nu, c1, c2, hp)
        upd = -lr * (direction + hp.weight_decay * p_row.astype(jnp.float32))
        return _sr_add(p_row, upd, key, stochastic), (mu,), (nu,), ss

    nb = mu_s["q"].shape[1]  # rows per layer; exact (trunk leaves divide)
    rows_c = 2048 if nb > 2048 and nb % 2048 == 0 else nb
    n_chunks = nb // rows_c
    code_s = jnp.asarray(q8._CODE_SIGNED)
    code_u = jnp.asarray(q8._CODE_UNSIGNED)
    bounds_s = jnp.asarray(q8._BOUND_SIGNED)
    bounds_u = jnp.asarray(q8._BOUND_UNSIGNED)

    g_c = g_row.reshape(n_chunks, rows_c, block_size)
    p_c = p_row.reshape(n_chunks, rows_c, block_size)
    qm = mu_s["q"][layer].reshape(n_chunks, rows_c, block_size)
    sm = mu_s["scale"][layer].reshape(n_chunks, rows_c, 1)
    qn = nu_s["q"][layer].reshape(n_chunks, rows_c, block_size)
    sn = nu_s["scale"][layer].reshape(n_chunks, rows_c, 1)

    def chunk_body(xs):
        gc, pc, qmc, smc, qnc, snc, idx = xs
        gc = gc.astype(jnp.float32) * clip_factor
        mu = code_s[qmc.astype(jnp.int32) + 128] * smc
        nu = code_u[qnc.astype(jnp.int32) + 128] * snc
        mu, nu, direction = _adam_math(gc, mu, nu, c1, c2, hp)
        upd = -lr * (direction + hp.weight_decay * pc.astype(jnp.float32))
        pc_new = _sr_add(pc, upd, jax.random.fold_in(key, idx), stochastic)

        def enc(x, bounds):
            scale = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            u = x / jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
            qi = jnp.searchsorted(bounds, u)
            return (qi.astype(jnp.int32) - 128).astype(jnp.int8), scale

        qm2, sm2 = enc(mu, bounds_s)
        qn2, sn2 = enc(nu, bounds_u)
        return pc_new, qm2, sm2, qn2, sn2

    p_new, qm2, sm2, qn2, sn2 = jax.lax.map(
        chunk_body, (g_c, p_c, qm, sm, qn, sn, jnp.arange(n_chunks)))
    p_new = p_new.reshape(p_row.shape).astype(p_row.dtype)
    mu_new = (qm2.reshape(nb, block_size), sm2.reshape(nb, 1))
    nu_new = (qn2.reshape(nb, block_size), sn2.reshape(nb, 1))
    return p_new, mu_new, nu_new, ss


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

def make_fused_joint_step(cfg, opt: OptimizerConfig, policy=None, *,
                          block_size: int = 2048,
                          min_quant_elems: int = 65536,
                          stochastic_rounding: bool = True,
                          clip_mode: str = "delayed"):
    """-> step(FusedTrainState, batch) -> (FusedTrainState, metrics).

    jit with donate_argnums=(0,). Batch keys as pi0.compute_loss.
    clip_mode: "delayed" (previous step's global norm) or "none".
    """
    if clip_mode not in ("delayed", "none"):
        raise ValueError(f"clip_mode must be delayed|none, got {clip_mode!r}")
    policy = policy or cm.DEFAULT_POLICY
    schedule = cosine_warmup_restarts(
        max_lr=opt.lr, first_cycle_steps=opt.first_cycle_steps,
        warmup_steps=opt.warmup_steps, min_lr=opt.min_lr,
        cycle_mult=opt.cycle_mult, gamma=opt.gamma,
    )
    L = cfg.vlm.depth
    if cfg.expert.depth != L:
        raise ValueError("fused joint step assumes equal vlm/expert depth")

    def step(state: FusedTrainState, batch):
        params, mu, nu = state.params, state.mu, state.nu
        rng, k_flow, k_sr = jax.random.split(state.rng, 3)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        c1 = 1.0 - opt.betas[0] ** cf
        c2 = 1.0 - opt.betas[1] ** cf
        # schedule indexed by already-emitted updates, like optax adamw
        lr = schedule(state.count).astype(jnp.float32)
        if clip_mode == "delayed":
            clip_factor = jnp.where(
                state.prev_gnorm > opt.max_grad_norm,
                opt.max_grad_norm / jnp.maximum(state.prev_gnorm, 1e-16),
                1.0,
            ).astype(jnp.float32)
        else:
            clip_factor = jnp.float32(1.0)

        hp = opt

        # ---- flow-matching setup (pi0_model.compute_loss semantics) ----
        actions = batch["actions"].astype(jnp.float32)
        k_noise, k_time = jax.random.split(k_flow)
        noise = pi0_model.sample_noise(k_noise, actions.shape)
        time = pi0_model.sample_time(k_time, actions.shape[0], cfg)
        t = time[:, None, None]
        x_t = t * noise + (1 - t) * actions
        u_t = noise - actions

        b = actions.shape[0]
        n_patch = cfg.vision.num_patches
        img_pad = jnp.repeat(batch["img_masks"].astype(bool), n_patch, axis=1)
        pre_pad = jnp.concatenate(
            [img_pad, batch["lang_masks"].astype(bool)], axis=1)
        p_len = pre_pad.shape[1]
        pre_att = jnp.zeros((b, p_len), jnp.int32)
        suf_pad = jnp.ones((b, 1 + cfg.chunk_size), bool)
        suf_att = jnp.concatenate(
            [jnp.ones((b, 2), jnp.int32),
             jnp.zeros((b, cfg.chunk_size - 1), jnp.int32)], axis=1)
        pad = jnp.concatenate([pre_pad, suf_pad], axis=1)
        att = jnp.concatenate([pre_att, suf_att], axis=1)
        mask_2d = make_att_2d_masks(pad, att)
        positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1
        pos_pre, pos_suf = positions[:, :p_len], positions[:, p_len:]

        if "action_is_pad" in batch:
            keep = (~batch["action_is_pad"]).astype(jnp.float32)[:, :, None]
            denom = jnp.maximum(keep.sum() * cfg.max_action_dim, 1.0)
        else:
            keep = jnp.ones((), jnp.float32)
            denom = jnp.asarray(float(u_t.size), jnp.float32)

        frozen_embed = params["vlm_embed"]

        # ---- stage 1: embeds (vjp'd normally; siglip is layer-remat) ----
        embed_names = ("siglip", "img_proj", "state_proj", "action_in_proj",
                       "time_mlp_in", "time_mlp_out")

        def embed_fn(ep):
            full = dict(ep)
            full["vlm_embed"] = frozen_embed
            pre_embs, _, _ = pi0_model.embed_prefix(
                full, batch["images"], batch["img_masks"],
                batch["lang_tokens"], batch["lang_masks"], cfg, policy)
            suf_embs, _, _ = pi0_model.embed_suffix(
                full, batch["state"], x_t, time, cfg, policy)
            return pre_embs, suf_embs

        embed_p = {k: params[k] for k in embed_names}
        (pre_embs, suf_embs), vjp_embed = jax.vjp(embed_fn, embed_p)

        # ---- stage 2: trunk forward over layers 0..L-2, saving layer
        # inputs (the remat carries). Layers are GATHERED by index from the
        # full stacked arrays — a tree_map slice (a[:-1]) would copy the
        # whole 4.3 GB trunk ----
        body = gemma._joint_body(mask_2d, pos_pre, pos_suf, cfg.vlm,
                                 cfg.expert, policy, cfg.attention_impl)
        vlm_blocks0 = params["vlm"]["blocks"]
        exp_blocks0 = params["expert"]["blocks"]

        def fwd_body(carry, i):
            bp_v = jax.tree.map(lambda a: a[i], vlm_blocks0)
            bp_e = jax.tree.map(lambda a: a[i], exp_blocks0)
            out, _ = body(carry, (bp_v, bp_e))
            return out, carry  # ys = the layer's INPUT carry

        (xp_top, xs_top), layer_inputs = jax.lax.scan(
            fwd_body, (pre_embs, suf_embs), jnp.arange(L - 1))

        # ---- stage 3: head (last layer pair, suffix-only + loss) ----
        def head_fn(hp_, h):
            xp, xs = h
            xs = gemma.joint_last_pair(
                hp_["last_v"], hp_["last_e"], xp, xs,
                mask_2d[:, p_len:, :], pos_pre, pos_suf,
                cfg.vlm, cfg.expert, policy)
            xs = cm.rms_norm(hp_["final_norm"], xs, cfg.expert.norm_eps)
            suffix_out = xs[:, -cfg.chunk_size:].astype(jnp.float32)
            v_t = cm.dense(
                hp_["out_proj"], suffix_out,
                cm.DtypePolicy(param_dtype=jnp.float32,
                               compute_dtype=jnp.float32))
            losses = jnp.square(u_t - v_t) * keep
            return losses.sum() / denom

        head_p = {
            "last_v": jax.tree.map(lambda a: a[L - 1],
                                   params["vlm"]["blocks"]),
            "last_e": jax.tree.map(lambda a: a[L - 1],
                                   params["expert"]["blocks"]),
            "final_norm": params["expert"]["final_norm"],
            "out_proj": params["action_out_proj"],
        }
        loss, vjp_head = jax.vjp(head_fn, head_p, (xp_top, xs_top))
        d_head, (dxp, dxs) = vjp_head(jnp.ones((), loss.dtype))

        ss_total = jnp.zeros((), jnp.float32)

        # ---- stage 4: update head params ----
        def update_small_tree(ptree, gtree, mtree, ntree, base_key):
            nonlocal ss_total
            flat_p = jax.tree_util.tree_flatten_with_path(ptree)[0]
            g_by = dict(jax.tree_util.tree_flatten_with_path(gtree)[0])
            m_by = dict(jax.tree_util.tree_flatten_with_path(
                mtree, is_leaf=_is_quant_leaf)[0])
            n_by = dict(jax.tree_util.tree_flatten_with_path(
                ntree, is_leaf=_is_quant_leaf)[0])
            flat_new_p, flat_new_m, flat_new_n = [], [], []
            for i, (path, p) in enumerate(flat_p):
                k = jax.random.fold_in(base_key, i)
                pn, mn, nn, ss = leaf_update(
                    p, g_by[path], m_by[path], n_by[path],
                    c1=c1, c2=c2, lr=lr, clip_factor=clip_factor, hp=hp,
                    key=k, stochastic=stochastic_rounding,
                    block_size=block_size)
                ss_total = ss_total + ss
                flat_new_p.append(pn)
                flat_new_m.append(mn)
                flat_new_n.append(nn)
            treedef = jax.tree_util.tree_structure(ptree)
            mdef = jax.tree_util.tree_structure(
                mtree, is_leaf=_is_quant_leaf)
            return (
                jax.tree_util.tree_unflatten(treedef, flat_new_p),
                jax.tree_util.tree_unflatten(mdef, flat_new_m),
                jax.tree_util.tree_unflatten(mdef, flat_new_n),
            )

        # head: last trunk rows get the trunk row-update; final_norm/out_proj
        # are plain leaves of the expert/action trees
        new_vlm_blocks = params["vlm"]["blocks"]
        new_exp_blocks = params["expert"]["blocks"]
        mu_vb, nu_vb = mu["vlm"]["blocks"], nu["vlm"]["blocks"]
        mu_eb, nu_eb = mu["expert"]["blocks"], nu["expert"]["blocks"]

        def apply_trunk_row(p_stack, g_row_tree, m_stack, n_stack, layer,
                            base_key):
            """Update row `layer` of every leaf of one trunk block tree,
            in place. Returns (p_stack', m_stack', n_stack', ss)."""
            ss_acc = jnp.zeros((), jnp.float32)
            flat_p = jax.tree_util.tree_flatten_with_path(p_stack)[0]
            g_by = dict(jax.tree_util.tree_flatten_with_path(g_row_tree)[0])
            is_q = _is_quant_leaf
            m_by = dict(jax.tree_util.tree_flatten_with_path(m_stack, is_leaf=is_q)[0])
            n_by = dict(jax.tree_util.tree_flatten_with_path(n_stack, is_leaf=is_q)[0])
            new_p, new_m, new_n = [], [], []
            for i, (path, p) in enumerate(flat_p):
                k = jax.random.fold_in(base_key, i)
                m_s, n_s = m_by[path], n_by[path]
                p_row = p[layer]
                pn, mn, nn, ss = layer_row_update(
                    p_row, g_by[path], m_s, n_s, layer,
                    c1=c1, c2=c2, lr=lr, clip_factor=clip_factor, hp=hp,
                    key=k, stochastic=stochastic_rounding,
                    block_size=block_size)
                ss_acc = ss_acc + ss
                new_p.append(p.at[layer].set(pn))
                if isinstance(m_s, dict):
                    qm, sm = mn
                    qn_, sn_ = nn
                    new_m.append({"q": m_s["q"].at[layer].set(qm),
                                  "scale": m_s["scale"].at[layer].set(sm)})
                    new_n.append({"q": n_s["q"].at[layer].set(qn_),
                                  "scale": n_s["scale"].at[layer].set(sn_)})
                else:
                    new_m.append(m_s.at[layer].set(mn[0]))
                    new_n.append(n_s.at[layer].set(nn[0]))
            treedef = jax.tree_util.tree_structure(p_stack)
            mdef = jax.tree_util.tree_structure(m_stack, is_leaf=is_q)
            return (
                jax.tree_util.tree_unflatten(treedef, new_p),
                jax.tree_util.tree_unflatten(mdef, new_m),
                jax.tree_util.tree_unflatten(mdef, new_n),
                ss_acc,
            )

        new_vlm_blocks, mu_vb, nu_vb, ss = apply_trunk_row(
            new_vlm_blocks, d_head["last_v"], mu_vb, nu_vb, L - 1,
            jax.random.fold_in(k_sr, 1001))
        ss_total = ss_total + ss
        new_exp_blocks, mu_eb, nu_eb, ss = apply_trunk_row(
            new_exp_blocks, d_head["last_e"], mu_eb, nu_eb, L - 1,
            jax.random.fold_in(k_sr, 1002))
        ss_total = ss_total + ss

        fn_new, fn_mu, fn_nu = update_small_tree(
            {"final_norm": params["expert"]["final_norm"],
             "out_proj": params["action_out_proj"]},
            {"final_norm": d_head["final_norm"],
             "out_proj": d_head["out_proj"]},
            {"final_norm": mu["expert"]["final_norm"],
             "out_proj": mu["action_out_proj"]},
            {"final_norm": nu["expert"]["final_norm"],
             "out_proj": nu["action_out_proj"]},
            jax.random.fold_in(k_sr, 1003))

        # ---- stage 5: reverse scan over layers L-2..0 with in-place
        # per-layer updates ----
        def layer_fwd(bp_v, bp_e, carry):
            out, _ = body(carry, (bp_v, bp_e))
            return out

        def bwd_body(carry, xs_in):
            (dxp_, dxs_, vb, eb, m_vb, n_vb, m_eb, n_eb, ss_c, key) = carry
            layer, layer_in = xs_in  # layer index + saved input carry
            bp_v = jax.tree.map(lambda a: a[layer], vb)
            bp_e = jax.tree.map(lambda a: a[layer], eb)
            _, vjp_l = jax.vjp(layer_fwd, bp_v, bp_e, layer_in)
            g_v, g_e, (dxp_new, dxs_new) = vjp_l((dxp_, dxs_))
            key, k_v, k_e = jax.random.split(key, 3)
            vb, m_vb, n_vb, ss1 = apply_trunk_row(
                vb, g_v, m_vb, n_vb, layer, k_v)
            eb, m_eb, n_eb, ss2 = apply_trunk_row(
                eb, g_e, m_eb, n_eb, layer, k_e)
            return (dxp_new, dxs_new, vb, eb, m_vb, n_vb, m_eb, n_eb,
                    ss_c + ss1 + ss2, key), None

        carry0 = (dxp, dxs, new_vlm_blocks, new_exp_blocks,
                  mu_vb, nu_vb, mu_eb, nu_eb, ss_total,
                  jax.random.fold_in(k_sr, 2000))
        (dxp, dxs, new_vlm_blocks, new_exp_blocks,
         mu_vb, nu_vb, mu_eb, nu_eb, ss_total, _), _ = jax.lax.scan(
            bwd_body, carry0,
            (jnp.arange(L - 1), layer_inputs), reverse=True)

        # ---- stage 6: embed-side updates ----
        (d_embed,) = vjp_embed((dxp, dxs))
        emb_new, emb_mu, emb_nu = update_small_tree(
            embed_p, d_embed,
            {k: mu[k] for k in embed_names},
            {k: nu[k] for k in embed_names},
            jax.random.fold_in(k_sr, 3000))

        # ---- assemble new state ----
        new_params = dict(params)
        for k in embed_names:
            new_params[k] = emb_new[k]
        new_params["vlm"] = {"blocks": new_vlm_blocks,
                             "final_norm": params["vlm"]["final_norm"]}
        new_params["expert"] = {"blocks": new_exp_blocks,
                                "final_norm": fn_new["final_norm"]}
        new_params["action_out_proj"] = fn_new["out_proj"]
        new_params["vlm_embed"] = frozen_embed

        new_mu = dict(mu)
        new_nu = dict(nu)
        for k in embed_names:
            new_mu[k] = emb_mu[k]
            new_nu[k] = emb_nu[k]
        # vlm final_norm: zero gradient by construction (suffix_only head
        # discards prefix_out), moments stay at init
        new_mu["vlm"] = {"blocks": mu_vb,
                         "final_norm": mu["vlm"]["final_norm"]}
        new_nu["vlm"] = {"blocks": nu_vb,
                         "final_norm": nu["vlm"]["final_norm"]}
        new_mu["expert"] = {"blocks": mu_eb,
                            "final_norm": fn_mu["final_norm"]}
        new_nu["expert"] = {"blocks": nu_eb,
                            "final_norm": fn_nu["final_norm"]}
        new_mu["action_out_proj"] = fn_mu["out_proj"]
        new_nu["action_out_proj"] = fn_nu["out_proj"]

        gnorm = jnp.sqrt(ss_total)
        metrics = {
            "l2_loss": loss,
            "grad_norm": gnorm,  # exact, current step (clip uses prev)
            "clip_factor": clip_factor,
        }
        return FusedTrainState(
            params=new_params, mu=new_mu, nu=new_nu, count=count,
            prev_gnorm=gnorm, rng=rng,
        ), metrics

    return step
