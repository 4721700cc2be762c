"""Phase decomposition of the fused joint (full-tower-gradient) train step
— the VERDICT r3 task-1 instrument.

Splits one `train/fused_joint.py` step (the reference's PRIMARY recipe,
`/root/reference/config/train/pi0_finetune_bridge.yaml`) into:

  fwd    loss value only (embeds + joint trunk forward + head)
  bwd    fused step with apply_updates=False: fwd + per-layer recompute +
         full backward + exact grad-norm, NO optimizer math / param writes
  full   the real fused step (8-bit moment decode -> AdamW -> encode,
         stochastic-rounded bf16 param writes, in the reverse scan)

Derived:  recompute+backward = bwd - fwd;  optimizer = full - bwd.

Each row reports analytic matmul TFLOP/s (trunk+expert+SigLIP, counted
from the config dims) against the v5e bf16 peak, so the output is directly
a roofline argument: with per-layer recompute the step is a 4x-forward
program; 100% MXU would be ~32 samples/s at the bridge point.

Usage:
  python scripts/profile_joint_phases.py --batch 24           # real chip
  python scripts/profile_joint_phases.py --tiny --cpu --iters 2
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


def analytic_fwd_tflops(cfg) -> float:
    """Matmul-only forward FLOPs per sample (2*N*T per trunk)."""
    def trunk(c):
        attn = (c.width * c.num_heads * c.head_dim      # q
                + 2 * c.width * c.num_kv_heads * c.head_dim  # k,v
                + c.num_heads * c.head_dim * c.width)   # o
        mlp = 3 * c.width * c.mlp_dim
        return c.depth * (attn + mlp)

    t_pre = cfg.num_cameras * cfg.vision.num_patches + cfg.tokenizer_max_length
    t_suf = 1 + cfg.chunk_size
    v = cfg.vision
    sig = v.depth * (4 * v.width * v.width + 2 * v.width * v.mlp_dim)
    flops = 2 * (trunk(cfg.vlm) * (t_pre + t_suf)
                 + trunk(cfg.expert) * t_suf
                 + sig * v.num_patches)
    return flops / 1e12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-sr", action="store_true",
                    help="also measure full step without stochastic rounding")
    ap.add_argument("--update-impl", default="leaf",
                    choices=["leaf", "packed", "hybrid"])
    ap.add_argument("--scale-mode", default="bound",
                    choices=["bound", "exact"])
    args = ap.parse_args()
    impl_kw = dict(update_impl=args.update_impl, scale_mode=args.scale_mode)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from intact_tpu.models import common as cm
    from intact_tpu.models.pi0 import model as pi0
    from intact_tpu.models.pi0.config import Pi0Config
    from intact_tpu.train.fused_joint import (
        init_fused_state,
        make_fused_joint_step,
    )
    from intact_tpu.train.optim import OptimizerConfig
    from intact_tpu.utils.device import drain_device_queue

    import dataclasses

    cfg = Pi0Config.tiny() if args.tiny else Pi0Config.bridge()
    cfg = dataclasses.replace(cfg, train_expert_only=False)
    policy = (cm.DtypePolicy(param_dtype=jnp.float32,
                             compute_dtype=jnp.float32)
              if args.cpu else cm.DEFAULT_POLICY)
    b = args.batch
    fwd_tf = analytic_fwd_tflops(cfg) * b
    print(f"# device={jax.devices()[0]} batch={b} "
          f"analytic fwd {fwd_tf:.2f} TFLOP/step", file=sys.stderr)

    params = jax.jit(
        lambda k: jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                               pi0.init(k, cfg))
    )(jax.random.key(0))

    ks = jax.random.split(jax.random.key(1), 4)
    s = cfg.vision.image_size
    batch = {
        "images": jax.random.uniform(
            ks[0], (b, cfg.num_cameras, s, s, 3), minval=-1, maxval=1),
        "img_masks": jnp.ones((b, cfg.num_cameras), bool),
        "lang_tokens": jax.random.randint(
            ks[1], (b, cfg.tokenizer_max_length), 0, 255),
        "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.normal(
            ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
    }
    drain_device_queue((params, batch))

    def timed(fn, *a, reps=args.iters, warm=args.warmup):
        ts = []
        for _ in range(warm + reps):
            t0 = time.time()
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0]
                       if not isinstance(out, tuple)
                       else jax.tree_util.tree_leaves(out[1])[0])
            ts.append(time.time() - t0)
        return sorted(ts[warm:])[len(ts[warm:]) // 2], out

    def timed_step(step, state, batch, reps=args.iters, warm=args.warmup):
        # steps donate their state: thread it through the loop
        ts = []
        for _ in range(warm + reps):
            t0 = time.time()
            state, m = step(state, batch)
            np.asarray(m["l2_loss"])
            ts.append(time.time() - t0)
        return sorted(ts[warm:])[len(ts[warm:]) // 2], (state, m)

    results = {}
    mult = {"fwd": 1.0, "bwd": 4.0, "full": 4.0, "full_nosr": 4.0}

    def report(name):
        t = results[name]
        tf = fwd_tf * mult[name] / t
        print(f"# {name:<10} {t*1e3:9.1f} ms {b/t:8.1f} samples/s "
              f"{tf:7.1f} TFLOP/s {100*tf/V5E_BF16_TFLOPS:5.1f}% MXU",
              file=sys.stderr, flush=True)

    # ---- fwd: loss value only (standard joint forward path) ----
    @jax.jit
    def loss_only(p, bt):
        losses, _ = pi0.compute_loss(p, jax.random.key(2), bt, cfg, policy)
        return jnp.mean(losses)

    t_fwd, _ = timed(loss_only, params, batch)
    results["fwd"] = t_fwd
    report("fwd")

    opt = OptimizerConfig(lr=5e-5, weight_decay=0.0, warmup_steps=10,
                          first_cycle_steps=10_000)

    # ---- bwd: fused step, optimizer disabled (grad_norm keeps bwd live) --
    state = jax.jit(lambda p: init_fused_state(p, seed=0),
                    donate_argnums=(0,))(params)
    step_nograd = jax.jit(
        make_fused_joint_step(cfg, opt, policy, apply_updates=False,
                              **impl_kw),
        donate_argnums=(0,))
    t_bwd, (state, m) = timed_step(step_nograd, state, batch)
    results["bwd"] = t_bwd
    report("bwd")

    # ---- full: the real fused step ----
    step_full = jax.jit(make_fused_joint_step(cfg, opt, policy, **impl_kw),
                        donate_argnums=(0,))
    t_full, (state, m) = timed_step(step_full, state, batch)
    results["full"] = t_full
    report("full")

    if args.no_sr:
        step_nosr = jax.jit(
            make_fused_joint_step(cfg, opt, policy,
                                  stochastic_rounding=False, **impl_kw),
            donate_argnums=(0,))
        try:
            t_nosr, (state, m) = timed_step(step_nosr, state, batch)
            results["full_nosr"] = t_nosr
            report("full_nosr")
        except Exception as e:  # ablation only: never lose the main rows
            print(f"# full_nosr failed: {e}", file=sys.stderr)

    print(f"# recompute+backward: {(results['bwd']-results['fwd'])*1e3:.1f} ms"
          f"   optimizer: {(results['full']-results['bwd'])*1e3:.1f} ms",
          file=sys.stderr)
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
