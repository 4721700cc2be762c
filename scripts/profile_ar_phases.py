"""Phase decomposition of the native AR serving families (SpatialVLA-4B,
Magma-8B) on one chip — the VERDICT r3 task-3 instrument.

Splits one serving inference (`predict_action_tokens` / `generate`,
bench.py's native-VLA measurement) into:

  vision   image tower + multimodal embed assembly
           (SigLIP+Ego3D+projector | ConvNeXt+projector+splice)
  prefill  prompt pass through the LM (fills the KV cache)
  decode   the per-token lax.scan (KV-cached greedy steps)
  full     the whole fused program

`decode` is measured two ways: (a) full - vision - prefill (residual) and
(b) the SLOPE of full over extra generated tokens (marginal per-token-step
cost) — the slope is the honest number, immune to phase overlap.

Each phase reports an estimated matmul TFLOP/s against the v5e bf16/int8
peak AND — for decode, which at action-token counts is weight-bandwidth
bound, not FLOP bound — the implied HBM GB/s against the v5e ~819 GB/s
peak: one decode step re-reads every LM weight once regardless of batch,
so ms/token-step >= lm_bytes / 819 GB/s is the wall. The reference serves
Magma with `use_cache=False` HF generate (policy_wrapper.py:282-293),
recomputing the whole prefix per token; this path's roofline question is
only whether the cached scan saturates weight streaming.

Tunnel-safe timing (verify skill): phases chain `--chain` iterations inside
one lax.fori_loop with a data dependence, and the result is read back.

Usage:
  python scripts/profile_ar_phases.py --model magma --int8     # real chip
  python scripts/profile_ar_phases.py --model spatialvla
  python scripts/profile_ar_phases.py --model magma --tiny --cpu --chain 2
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
V5E_INT8_TOPS = 394.0
V5E_HBM_GBPS = 819.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["spatialvla", "magma"], required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--extra-tokens", type=int, default=8,
                    help="second decode length for the marginal-cost slope")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import importlib

    import jax.numpy as jnp

    from intact_tpu.models import registry as model_registry
    from intact_tpu.models.common import DtypePolicy, SERVING_POLICY
    from intact_tpu.models.tokenizer import HashTokenizer
    from intact_tpu.utils.device import drain_device_queue

    mtype = f"{args.model}_native" + ("_tiny" if args.tiny else "")
    entry = model_registry.get(mtype)
    mod = importlib.import_module(entry["module"])
    cfg = entry["default_config"]()
    policy = (DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
              if args.cpu else SERVING_POLICY)
    int8 = args.int8
    if args.model == "magma" and not args.cpu and not args.tiny and not int8:
        print("# magma bf16 exceeds one v5e; forcing --int8", file=sys.stderr)
        int8 = True

    b = args.batch
    print(f"# device={jax.devices()[0]} batch={b} model={mtype} int8={int8}",
          file=sys.stderr)

    init_fn = lambda k: jax.tree.map(  # noqa: E731
        lambda x: x.astype(policy.param_dtype), mod.init(k, cfg))
    if int8:
        from intact_tpu.models.common import streamed_quantized_init

        params = streamed_quantized_init(init_fn, jax.random.key(0), policy)
    else:
        params = jax.jit(init_fn)(jax.random.key(0))
    _ = np.asarray(min(jax.tree.leaves(params), key=lambda x: x.size)).ravel()[0]

    # ---- inputs (the serving wire shapes: uint8 images) ----
    rng = np.random.default_rng(0)
    if args.model == "spatialvla":
        from intact_tpu.models import gemma2 as lm_mod

        tok = HashTokenizer(vocab_size=cfg.spatial_offset,
                            max_length=cfg.tokenizer_max_length)
        lang, lmask = tok(["put the carrot on the plate"] * b,
                          cfg.tokenizer_max_length)
        s = cfg.vision.image_size
        images = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        depth = np.asarray(mod.flat_depth(b, cfg), np.float32)
        n_tokens = cfg.tokens_per_action * cfg.n_action_steps
        lm_cfg = cfg.lm

        def vision_body(x, o):
            e, _ = mod.embed_prefix(
                o["params"], mod.normalize_images(o["images"]) + x * 1e-6,
                o["depth"], o["lang"], o["lmask"], cfg, policy)
            return x + e.astype(jnp.float32).mean() * 1e-20

        def decode_fn(o, n, eps):
            e, m = mod.embed_prefix(
                o["params"], mod.normalize_images(o["images"]) + eps,
                o["depth"], o["lang"], o["lmask"], cfg, policy)
            return lm_mod.greedy_decode(
                o["params"]["lm"], e, m, n, lm_cfg, policy,
                prefix_full_attention=True)

        def prefill_body(x, o):
            e, m = mod.embed_prefix(
                o["params"], mod.normalize_images(o["images"]) + x * 1e-6,
                o["depth"], o["lang"], o["lmask"], cfg, policy)
            pos = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
            h, _ = lm_mod.forward(o["params"]["lm"], e, m[:, None, :], pos,
                                  lm_cfg, policy, use_sliding=False)
            return x + h.astype(jnp.float32).mean() * 1e-20

        ops = {"params": params, "images": images, "depth": depth,
               "lang": lang, "lmask": lmask}
        prompt_len = cfg.vision.num_patches + cfg.tokenizer_max_length
    else:
        from intact_tpu.models import llama as lm_mod

        tok = HashTokenizer(vocab_size=cfg.image_token_id,
                            max_length=cfg.max_prompt_tokens)
        tokens, masks = mod.build_prompt(
            tok, ["put the carrot on the plate"] * b, cfg)
        s = cfg.image_size
        images = rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8)
        n_tokens = cfg.n_action_tokens + 1
        lm_cfg = cfg.lm

        def vision_body(x, o):
            e, _ = mod.embed_prompt(
                o["params"], mod.normalize_images(o["images"]) + x * 1e-6,
                o["tokens"], o["masks"], cfg, policy)
            return x + e.astype(jnp.float32).mean() * 1e-20

        def decode_fn(o, n, eps):
            e, m = mod.embed_prompt(
                o["params"], mod.normalize_images(o["images"]) + eps,
                o["tokens"], o["masks"], cfg, policy)
            return lm_mod.greedy_decode(o["params"]["lm"], e, m, n, lm_cfg,
                                        policy)

        def prefill_body(x, o):
            e, m = mod.embed_prompt(
                o["params"], mod.normalize_images(o["images"]) + x * 1e-6,
                o["tokens"], o["masks"], cfg, policy)
            p_len = e.shape[1]
            pos = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
            causal = jnp.tril(jnp.ones((p_len, p_len), bool))[None]
            h, _ = lm_mod.forward(o["params"]["lm"], e,
                                  causal & m[:, None, :], pos, lm_cfg, policy)
            return x + h.astype(jnp.float32).mean() * 1e-20

        ops = {"params": params, "images": images, "tokens": tokens,
               "masks": masks}
        prompt_len = int(tokens.shape[1])

    drain_device_queue((params, images))

    def timed(name, body):
        @jax.jit
        def fn(o):
            return jax.lax.fori_loop(
                0, args.chain, lambda i, x: body(x, o), jnp.float32(0.0))

        t0 = time.time()
        float(fn(ops))
        compile_s = time.time() - t0
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            float(fn(ops))
            reps.append(time.time() - t0)
        ms = sorted(reps)[len(reps) // 2] / args.chain * 1e3
        print(f"# {name:12s} {ms:8.2f} ms/call (compile+first {compile_s:.1f}s)",
              file=sys.stderr)
        return ms

    def full_body_n(n):
        def body(x, o):
            out = decode_fn(o, n, x * 1e-6)
            return x + out.astype(jnp.float32).mean() * 1e-20
        return body

    ms = {
        "vision": timed("vision", vision_body),
        "prefill": timed("prefill", prefill_body),
        "full": timed("full", full_body_n(n_tokens)),
        "full_extra": timed(
            f"full+{args.extra_tokens}tok",
            full_body_n(n_tokens + args.extra_tokens)),
    }
    per_token_ms = (ms["full_extra"] - ms["full"]) / args.extra_tokens
    decode_resid = ms["full"] - ms["prefill"]  # prefill body includes vision

    # ---- rooflines ----
    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(t))

    def tree_count(t):
        return sum(x.size for x in jax.tree.leaves(t))

    lm_params = params["lm"]
    lm_bytes = tree_bytes(lm_params)
    embed_count = int(lm_params["embed"]["embedding"].size) \
        if "embed" in lm_params else 0
    lm_nonembed = tree_count(lm_params) - embed_count
    d = lm_cfg.width
    vocab = lm_cfg.vocab_size

    # FLOP estimates
    prefill_flops = 2.0 * lm_nonembed * prompt_len * b
    prefill_tflops = prefill_flops / (ms["prefill"] * 1e-3) / 1e12
    # one decode step: every weight once (batch-amortized) + logits
    step_flops = 2.0 * (lm_nonembed + d * vocab) * b
    step_tflops = step_flops / (per_token_ms * 1e-3) / 1e12
    # bandwidth: one step streams the LM weights once (+ logits head =
    # embed table when tied) + the KV cache
    kv_bytes = 2 * lm_cfg.depth * b * (prompt_len + n_tokens) \
        * lm_cfg.num_kv_heads * lm_cfg.head_dim * 2
    step_bytes = lm_bytes + kv_bytes
    step_gbps = step_bytes / (per_token_ms * 1e-3) / 1e9
    floor_ms = step_bytes / (V5E_HBM_GBPS * 1e9) * 1e3

    peak = V5E_INT8_TOPS if int8 else V5E_BF16_TFLOPS
    print(f"# prompt_len {prompt_len}  action tokens {n_tokens}",
          file=sys.stderr)
    print(f"# prefill  ~{prefill_tflops:6.1f} TFLOP/s "
          f"({prefill_tflops / peak:5.1%} of peak)", file=sys.stderr)
    print(f"# decode   {per_token_ms:6.2f} ms/token-step (slope) | residual "
          f"{decode_resid / n_tokens:6.2f} | weights+cache {step_bytes / 2**30:.2f} GiB "
          f"-> {step_gbps:6.1f} GB/s ({step_gbps / V5E_HBM_GBPS:5.1%} of HBM peak; "
          f"bandwidth floor {floor_ms:.2f} ms/token)", file=sys.stderr)
    print(json.dumps({
        "model": mtype, "batch": b, "int8": int8,
        "prompt_len": prompt_len, "n_tokens": n_tokens,
        "ms": {k: round(v, 2) for k, v in ms.items()},
        "per_token_ms": round(per_token_ms, 3),
        "prefill_tflops": round(prefill_tflops, 1),
        "decode_gbps": round(step_gbps, 1),
        "decode_bw_frac_of_peak": round(step_gbps / V5E_HBM_GBPS, 3),
        "decode_bw_floor_ms": round(floor_ms, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
