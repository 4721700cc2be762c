"""Phase decomposition of the Pi0 serving step on one chip.

Breaks `sample_actions` (bench.py's headline measurement) into its three
phases and times each as its OWN jitted program:

  embed    SigLIP vision tower + prefix embedding assembly
  prefill  18-layer Gemma-2B pass over the prefix (fills the KV cache)
  denoise  num_steps x (suffix embed + 300M expert decode against the cache)

Tunnel-safe timing (verify skill: never trust single-op wall timings over
the axon tunnel): each phase chains `--chain` iterations inside ONE
`lax.fori_loop` whose carry feeds a tiny input perturbation into the next
iteration — the data dependence defeats loop-invariant hoisting, so XLA
must execute every iteration — and the loop result is read back to the
host before the clock stops.

Also reports a rough matmul-FLOP estimate per phase -> implied TFLOP/s, to
show where the step sits against the chip's bf16 roofline (v5e ~197
bf16 TFLOP/s).

Usage:
  python scripts/profile_pi0_phases.py --batch 64            # real chip
  python scripts/profile_pi0_phases.py --tiny --cpu --chain 2  # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

V5E_BF16_TFLOPS = 197.0


def gemma_matmul_flops_per_token(cfg) -> float:
    """2 * (matmul params) per token: qkvo + 3-matrix gated MLP."""
    qo = cfg.width * cfg.num_heads * cfg.head_dim * 2
    kv = cfg.width * cfg.num_kv_heads * cfg.head_dim * 2
    mlp = 3 * cfg.width * cfg.mlp_dim
    return 2.0 * cfg.depth * (qo + kv + mlp)


def siglip_matmul_flops_per_token(cfg) -> float:
    per_layer = 4 * cfg.width**2 + 2 * cfg.width * cfg.mlp_dim
    return 2.0 * cfg.depth * per_layer


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chain", type=int, default=8,
                    help="iterations chained inside one jit per timing")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--attention", choices=["xla", "pallas"], default="pallas")
    ap.add_argument("--num-steps", type=int, default=None,
                    help="override cfg.num_steps (ablate the Euler loop: "
                         "slope over steps = marginal per-step cost)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import dataclasses

    import jax.numpy as jnp

    from intact_tpu.models import gemma
    from intact_tpu.models.common import DtypePolicy, SERVING_POLICY
    from intact_tpu.models.pi0 import model as pi0
    from intact_tpu.models.pi0.config import Pi0Config
    from intact_tpu.ops.masks import make_att_2d_masks
    from intact_tpu.utils.device import drain_device_queue

    cfg = Pi0Config.tiny() if args.tiny else Pi0Config.bridge()
    if args.cpu and args.attention == "pallas":
        args.attention = "xla"  # pallas TPU kernel does not run on CPU
    cfg = dataclasses.replace(cfg, attention_impl=args.attention)
    if args.num_steps is not None:
        cfg = dataclasses.replace(cfg, num_steps=args.num_steps)
    policy = (DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
              if args.cpu else SERVING_POLICY)

    b = args.batch
    print(f"# device={jax.devices()[0]} batch={b} chain={args.chain} "
          f"attention={cfg.attention_impl}", file=sys.stderr)

    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(policy.param_dtype), pi0.init(k, cfg)
    ))(jax.random.key(0))

    s = cfg.vision.image_size
    ks = jax.random.split(jax.random.key(1), 4)
    images = jax.random.uniform(ks[0], (b, cfg.num_cameras, s, s, 3),
                                minval=-1, maxval=1)
    img_masks = jnp.ones((b, cfg.num_cameras), bool)
    lang_tokens = jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 255)
    lang_masks = jnp.ones((b, cfg.tokenizer_max_length), bool)
    state = jax.random.normal(ks[2], (b, cfg.max_state_dim))
    noise = jax.random.normal(ks[3], (b, cfg.chunk_size, cfg.max_action_dim))

    drain_device_queue((params, images, state, noise))

    # ---- fixed intermediates for the isolated phases (computed once) ----
    pre_embs, pre_pad, pre_att = jax.jit(
        lambda p, i: pi0.embed_prefix(p, i, img_masks, lang_tokens,
                                      lang_masks, cfg, policy)
    )(params, images)
    pre_mask = make_att_2d_masks(pre_pad, pre_att)
    pre_pos = jnp.cumsum(pre_pad.astype(jnp.int32), axis=1) - 1

    _, kv_cache = jax.jit(
        lambda p, e: gemma.prefill(p["vlm"], e, pre_mask, pre_pos, cfg.vlm,
                                   policy, cfg.attention_impl)
    )(params, pre_embs)

    prefix_count = pre_pad.sum(axis=1, keepdims=True).astype(jnp.int32)
    _, suf_pad, suf_att = jax.jit(
        lambda p, n: pi0.embed_suffix(p, state, n, jnp.ones((b,), jnp.float32),
                                      cfg, policy)
    )(params, noise)
    suf_self = make_att_2d_masks(suf_pad, suf_att)
    suf_to_pre = jnp.broadcast_to(
        pre_pad[:, None, :], (b, suf_pad.shape[1], pre_pad.shape[1])
    )
    dec_mask = jnp.concatenate([suf_to_pre, suf_self], axis=2)
    suf_pos = prefix_count + jnp.cumsum(suf_pad.astype(jnp.int32), axis=1) - 1
    drain_device_queue((pre_embs, kv_cache, dec_mask))

    # all device operands travel as ARGUMENTS into the jitted timers —
    # closing a jit over concrete 3B params bakes them into the HLO as
    # constants (verify-skill rule; it also stalls the tunnel for minutes)
    ops = {
        "params": params, "images": images, "img_masks": img_masks,
        "lang_tokens": lang_tokens, "lang_masks": lang_masks,
        "state": state, "noise": noise,
        "pre_embs": pre_embs, "pre_mask": pre_mask, "pre_pos": pre_pos,
        "kv_cache": kv_cache, "dec_mask": dec_mask, "suf_pos": suf_pos,
    }

    # ---- phase bodies: (carry scalar, ops) -> new carry, with a real data
    # dependence input<-carry and carry<-output in both directions ----
    def embed_body(x, o):
        e, _, _ = pi0.embed_prefix(o["params"], o["images"] + x * 1e-6,
                                   o["img_masks"], o["lang_tokens"],
                                   o["lang_masks"], cfg, policy)
        return x + e.astype(jnp.float32).mean() * 1e-20

    def prefill_body(x, o):
        _, kv = gemma.prefill(o["params"]["vlm"], o["pre_embs"] + x * 1e-6,
                              o["pre_mask"], o["pre_pos"], cfg.vlm, policy,
                              cfg.attention_impl)
        return x + jax.tree.leaves(kv)[0].astype(jnp.float32).mean() * 1e-20

    def denoise_body(x, o):
        dt = -1.0 / cfg.num_steps

        def euler_step(x_t, t_scalar):
            t_vec = jnp.full((b,), t_scalar, jnp.float32)
            suf_embs, _, _ = pi0.embed_suffix(o["params"], o["state"], x_t,
                                              t_vec, cfg, policy)
            out = gemma.decode(o["params"]["expert"], o["kv_cache"], suf_embs,
                               o["dec_mask"], o["suf_pos"], cfg.expert,
                               policy, cfg.attention_impl)
            out = out[:, -cfg.chunk_size:].astype(jnp.float32)
            from intact_tpu.models import common as cm

            v_t = cm.dense(o["params"]["action_out_proj"], out, DtypePolicy(
                param_dtype=jnp.float32, compute_dtype=jnp.float32))
            return x_t + dt * v_t, None

        ts = 1.0 + dt * jnp.arange(cfg.num_steps, dtype=jnp.float32)
        x0, _ = jax.lax.scan(euler_step, o["noise"] + x * 1e-6, ts)
        return x + x0.mean() * 1e-20

    def full_body(x, o):
        out = pi0.sample_actions(
            o["params"], jax.random.key(7), o["images"] + x * 1e-6,
            o["img_masks"], o["lang_tokens"], o["lang_masks"], o["state"],
            cfg, policy, noise=o["noise"],
        )
        return x + out.mean() * 1e-20

    def timed(name, body):
        @jax.jit
        def fn(o):
            return jax.lax.fori_loop(
                0, args.chain, lambda i, x: body(x, o), jnp.float32(0.0))

        t0 = time.time()
        float(fn(ops))  # compile + first (host readback = completion barrier)
        compile_s = time.time() - t0
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            float(fn(ops))
            reps.append(time.time() - t0)
        ms = sorted(reps)[len(reps) // 2] / args.chain * 1e3
        print(f"# {name:8s} {ms:8.2f} ms/call  (compile+first {compile_s:.1f}s)",
              file=sys.stderr)
        return ms

    ms = {
        "embed": timed("embed", embed_body),
        "prefill": timed("prefill", prefill_body),
        "denoise": timed("denoise", denoise_body),
        "full": timed("full", full_body),
    }

    # rough matmul-FLOP accounting (per inference, batch b)
    n_img_tok = cfg.num_cameras * cfg.vision.num_patches
    n_pre = cfg.prefix_len
    n_suf = cfg.suffix_len
    flops = {
        "embed": b * n_img_tok * siglip_matmul_flops_per_token(cfg.vision),
        "prefill": b * n_pre * gemma_matmul_flops_per_token(cfg.vlm),
        "denoise": b * cfg.num_steps * n_suf
        * gemma_matmul_flops_per_token(cfg.expert),
    }
    flops["full"] = sum(flops.values())

    rows = {}
    covered = sum(ms[k] for k in ("embed", "prefill", "denoise"))
    for k in ("embed", "prefill", "denoise", "full"):
        share = ms[k] / ms["full"]
        tflops = flops[k] / (ms[k] * 1e-3) / 1e12
        rows[k] = {
            "ms": round(ms[k], 2),
            "share_of_full": round(share, 3),
            "est_matmul_tflops": round(tflops, 1),
            "est_mxu_util": round(tflops / V5E_BF16_TFLOPS, 3),
        }
        print(f"# {k:8s} {ms[k]:8.2f} ms  share {share:5.1%}  "
              f"~{tflops:6.1f} TFLOP/s ({tflops / V5E_BF16_TFLOPS:5.1%} of "
              f"v5e bf16 peak)", file=sys.stderr)
    print(f"# phase-sum / full = {covered / ms['full']:.1%} "
          f"(remainder = noise/suffix-mask setup + dispatch)", file=sys.stderr)
    print(json.dumps({"batch": b, "attention": cfg.attention_impl,
                      "phases": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
