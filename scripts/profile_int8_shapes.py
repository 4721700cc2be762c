"""Profile the W8A8 int8 matmul per model shape: Pallas kernel vs XLA lowering.

Round-2 finding: the fused Pallas kernel (ops/pallas_int8.w8a8_matmul) wins
microbenchmarks at M=1024 K=N=2048 (1.26x) but LOSES end to end on pi0 int8
serving (280 vs 510 policy steps/s) — some model shape hits a slow Mosaic
lowering. This script finds it:

1. trace pi0's int8 serving step and record every _dense_int8 (M, K, N)
   (trace-time Python hook — backend-independent, runs anywhere);
2. on TPU, time w8a8_matmul vs the XLA _dense_int8 lowering per unique
   shape (chained-iteration timing per the axon tunnel rules: host
   readback + N iterations inside one jit).

Usage:
  python scripts/profile_int8_shapes.py           # full pi0 3B, real chip
  python scripts/profile_int8_shapes.py --tiny --cpu --shapes-only
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def collect_shapes(tiny: bool, batch: int) -> list[tuple[int, int, int]]:
    """Trace pi0 int8 sample_actions; record every int8 dense (M, K, N)."""
    from intact_tpu.models import common as cm
    from intact_tpu.models import registry as model_registry
    import importlib

    entry = model_registry.get("pi0" + ("_tiny" if tiny else ""))
    pi0 = importlib.import_module(entry["module"])
    cfg = entry["default_config"]()
    policy = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)

    template = jax.eval_shape(lambda k: pi0.init(k, cfg), jax.random.key(0))
    qtemplate = jax.eval_shape(cm.quantize_params, template)

    shapes: list[tuple[int, int, int]] = []
    orig = cm._dense_int8

    def recording(p, x, pol):
        m = 1
        for d in x.shape[:-1]:
            m *= d
        # scan-stacked kernels apply per-layer: record the per-layer 2D shape
        kq = p["kernel_q"]
        shapes.append((m, kq.shape[-2], kq.shape[-1]))
        return orig(p, x, pol)

    cm._dense_int8 = recording
    try:
        s = cfg.vision.image_size
        b = batch
        batch_abs = {
            "images": jax.ShapeDtypeStruct((b, cfg.num_cameras, s, s, 3), jnp.float32),
            "img_masks": jax.ShapeDtypeStruct((b, cfg.num_cameras), jnp.bool_),
            "lang_tokens": jax.ShapeDtypeStruct((b, cfg.tokenizer_max_length), jnp.int32),
            "lang_masks": jax.ShapeDtypeStruct((b, cfg.tokenizer_max_length), jnp.bool_),
            "state": jax.ShapeDtypeStruct((b, cfg.max_state_dim), jnp.float32),
        }

        def sample(p, key, batch):
            return pi0.sample_actions(
                p, key, batch["images"], batch["img_masks"], batch["lang_tokens"],
                batch["lang_masks"], batch["state"], cfg, policy,
            )

        key_abs = jax.eval_shape(lambda: jax.random.key(0))
        jax.eval_shape(sample, qtemplate, key_abs, batch_abs)
    finally:
        cm._dense_int8 = orig

    uniq = sorted(set(shapes))
    counts = {u: shapes.count(u) for u in uniq}
    print("# unique int8 dense shapes (M, K, N) x trace count:", file=sys.stderr)
    for u in uniq:
        print(f"#   M={u[0]:<6} K={u[1]:<6} N={u[2]:<6} x{counts[u]}", file=sys.stderr)
    return uniq


def time_fn(fn, x, *rest, iters: int = 20) -> float:
    """Median-of-3 wall time per call, N iterations chained in one jit.
    The loop input depends on the previous output (else XLA hoists the
    loop-invariant matmul and the timing is pure noise); axon tunnel rules:
    force a real host readback, never trust single-op wall timings."""
    import numpy as np

    @jax.jit
    def chained(x, *rest):
        def body(_, c):
            y = fn(x + c.astype(x.dtype), *rest)
            return y.ravel()[0].astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = chained(x, *rest)
    float(np.asarray(r))  # warmup + compile, real readback
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(chained(x, *rest)))
        ts.append((time.time() - t0) / iters)
    return sorted(ts)[1]


def bench_shapes(shapes, args) -> None:
    import numpy as np

    from intact_tpu.models import common as cm
    from intact_tpu.ops.pallas_int8 import w8a8_matmul

    policy = cm.DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    print(f"{'M':>7} {'K':>6} {'N':>6} | {'xla_us':>8} {'pallas_us':>9} "
          f"{'pallas/xla':>10}")
    for (m, k, n) in shapes:
        key = jax.random.key(0)
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (k, n), jnp.float32)
        p = cm.quantize_dense({"kernel": w})
        xq_t = time_fn(
            lambda xx, kq, ks: cm._dense_int8(
                {"kernel_q": kq, "kernel_scale": ks}, xx, policy),
            x, p["kernel_q"], p["kernel_scale"],
        )
        pl_t = time_fn(
            lambda xx, kq, ks: w8a8_matmul(xx, kq, ks),
            x, p["kernel_q"], p["kernel_scale"],
        )
        flag = "  <-- slow" if pl_t > 1.5 * xq_t else ""
        print(f"{m:>7} {k:>6} {n:>6} | {xq_t*1e6:>8.1f} {pl_t*1e6:>9.1f} "
              f"{pl_t/xq_t:>10.2f}{flag}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--shapes-only", action="store_true",
                    help="only trace + print shapes (no TPU timing)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    shapes = collect_shapes(args.tiny, args.batch)
    if args.shapes_only:
        return 0
    bench_shapes(shapes, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
