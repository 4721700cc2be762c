"""Headline benchmark: Pi0 policy-serving throughput on one TPU chip.

Measures end-to-end `sample_actions` (prefill + 10-step Euler denoise) for a
batch of parallel rollouts at the bridge operating point (PaliGemma-3B +
300M expert, bf16, 224px, chunk 4) and reports aggregate policy steps/sec:
one policy step = one env action executed; each inference yields
`n_action_steps` (4) env actions per rollout.

Baseline (BASELINE.md): >=1000 policy steps/sec aggregate on a v5e-8 driving
256 rollouts => 125 steps/sec per chip. vs_baseline = value / 125.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Usage:
  python bench.py                  # real chip, full model
  python bench.py --tiny --cpu     # smoke test (CI / no TPU)
  python bench.py --batch 64 --iters 5
"""

from __future__ import annotations

import argparse
import json
import sys
import time


PER_CHIP_BASELINE_STEPS_PER_SEC = 1000.0 / 8.0  # BASELINE.md v5e-8 target

# Reference fine-tune envelope (BASELINE.md): 22,705 updates of global batch
# 1024 within 44 h on 4x A100/H100 => >= 147 samples/s on 4 GPUs
PER_DEVICE_BASELINE_TRAIN_SAMPLES_PER_SEC = 22_705 * 1024 / (44 * 3600) / 4


def bench_train(args) -> int:
    """Training-step throughput: Pi0 bridge, expert-only fine-tune with the
    TRAINER'S precision policy (train/trainer.py mixed fine-tune precision):
    frozen 3B VLM stored bf16 (no optimizer state), trainable ~300M expert +
    heads in fp32 masters with fp32 Adam moments, bf16 compute, remat on,
    one chip."""
    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import importlib

    import jax.numpy as jnp

    from intact_tpu.models import common as cm
    from intact_tpu.models import registry as model_registry
    from intact_tpu.train.optim import OptimizerConfig, make_optimizer
    from intact_tpu.train.train_step import init_train_state, make_train_step

    joint = args.recipe == "joint"
    if joint and args.model != "pi0":
        print("--recipe joint is the reference's pi0_finetune_bridge.yaml "
              "recipe; only --model pi0 has it", file=sys.stderr)
        return 2
    if joint and args.int8:
        print("--int8 (quantize_frozen_int8) is unsound on the joint path: "
              "gradients flow through the tower", file=sys.stderr)
        return 2

    entry = model_registry.get(args.model + ("_tiny" if args.tiny else ""))
    pi0 = importlib.import_module(entry["module"])  # family model module
    cfg = entry["default_config"]()
    if hasattr(cfg, "attention_impl"):
        cfg = dataclasses.replace(cfg, attention_impl=args.attention)
    if hasattr(cfg, "train_expert_only"):
        cfg = dataclasses.replace(cfg, train_expert_only=not joint)
    policy = cm.DtypePolicy(
        param_dtype=jnp.float32,
        compute_dtype=jnp.bfloat16 if not args.cpu else jnp.float32,
    )
    b = args.batch
    print(f"# train mode: device={jax.devices()[0]} batch={b} "
          f"model={args.model} recipe={args.recipe}", file=sys.stderr)

    t0 = time.time()
    template = jax.eval_shape(lambda k: pi0.init(k, cfg), jax.random.key(0))
    trainable = jax.tree.map(lambda _: False, template)
    if joint:
        # reference primary recipe (config/train/pi0_finetune_bridge.yaml +
        # src/agent/trainer.py:109-123): everything trains except the VLM
        # token embedding (freeze_lm_head) — full SigLIP+VLM gradients
        trainable = jax.tree.map(lambda _: True, template)
        trainable["vlm_embed"] = jax.tree.map(
            lambda _: False, trainable["vlm_embed"])
        trainable_names = [n for n in template if n != "vlm_embed"]
    else:
        # per-family trainable set under train_expert_only (frozen: SigLIP +
        # VLM + glue; MVLA's metaqueries/connector train through the frozen
        # VLM)
        trainable_names = [
            n for n in ["expert", "connector", "metaquery", "state_proj",
                        "action_in_proj", "time_mlp_in", "time_mlp_out",
                        "action_out_proj", "action_head", "value_head"]
            if n in template
        ]
        for name in trainable_names:
            trainable[name] = jax.tree.map(lambda _: True, trainable[name])
        if not trainable_names:  # pi0fast: AR over the VLM -> full fine-tune
            trainable = jax.tree.map(lambda _: True, template)

    if joint:
        # reference joint precision: the whole model bf16 (model.to(bf16),
        # trainer.py:133-140); updates applied with stochastic rounding
        params = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), pi0.init(k, cfg))
        )(jax.random.key(0))
    else:
        frozen_dtype = jnp.float32 if args.cpu else jnp.bfloat16
        params = jax.jit(
            lambda k: jax.tree.map(
                lambda x, t: x if t else x.astype(frozen_dtype),
                pi0.init(k, cfg), trainable,
            )
        )(jax.random.key(0))
    jax.block_until_ready(params)

    if args.int8:
        # trainer's quantize_frozen_int8 mode: frozen tower block kernels
        # int8 (W8A8 prefill on the int8 MXU); only grad-safe where no
        # gradient flows through the tower (trainer.py _QUANTIZE_FROZEN_SAFE)
        if args.model != "pi0":
            print("--mode train --int8 (quantize_frozen_int8) is only "
                  "grad-safe for pi0 expert-only fine-tunes", file=sys.stderr)
            return 2
        params = jax.jit(lambda p: cm.quantize_frozen(p, trainable))(params)
        jax.block_until_ready(params)
        # rebuild the mask over the quantized structure (kernel ->
        # kernel_q/kernel_scale under frozen blocks)
        trainable = jax.tree.map(lambda _: False, params)
        for name in trainable_names:
            trainable[name] = jax.tree.map(lambda _: True, trainable[name])

    opt_mode = args.opt or ("8bit" if joint else "fp32")
    if joint:
        # FUSED step (train/fused_joint.py): the full gradient tree never
        # exists — params (bf16, 6.4 GB) + int8 moments (5.5 GB) + all
        # grads (5.4 GB) cannot coexist on a 15.75 GB chip, so the reverse
        # layer scan applies each layer's AdamW update in place. Delayed
        # global-norm clipping (module docstring).
        from intact_tpu.train.fused_joint import (
            init_fused_state,
            make_fused_joint_step,
        )

        if opt_mode != "8bit":
            print("# note: --recipe joint always uses int8 moments for "
                  "large leaves (fp32 moments alone exceed HBM)",
                  file=sys.stderr)
        state = jax.jit(
            lambda p: init_fused_state(p, seed=0), donate_argnums=(0,)
        )(params)
        step = jax.jit(
            make_fused_joint_step(cfg, OptimizerConfig(
                lr=5e-5, weight_decay=0.0, warmup_steps=10,
                first_cycle_steps=10_000), policy),
            donate_argnums=(0,),
        )
    else:
        tx, _ = make_optimizer(
            OptimizerConfig(lr=5e-5, warmup_steps=10, first_cycle_steps=10_000,
                            quantize_moments=opt_mode == "8bit"),
            frozen_mask=trainable,
        )

        def loss_fn(p, key, batch):
            return pi0.compute_loss(p, key, batch, cfg, policy)

        # remat default: OFF for pi0 — the frozen-prefix fast path stores
        # only expert activations (the 3B tower has no backward at all), so
        # rematerialization is pure recompute: 46.3 -> 89.6 samples/s at
        # batch 48 with it off (96 OOMs bf16; int8 frozen tower reaches
        # 125.7 at 96). ON for families that backward through the tower
        # (mvla activation grads; pi0fast/octo full fine-tune).
        use_remat = {"on": True, "off": False}.get(
            args.remat, args.model != "pi0")
        # jit + donate: eager tx.init would chain per-leaf transients (fp32
        # zeros, quantization indices) that OOM a 3B init; under jit XLA
        # frees them and aliases params into the state
        state = jax.jit(
            lambda p: init_train_state(p, tx, seed=0), donate_argnums=(0,)
        )(params)
        step = jax.jit(
            make_train_step(
                loss_fn, tx, policy, remat=use_remat,
                trainable_mask=trainable if trainable_names else None),
            donate_argnums=(0,),
        )
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    ks = jax.random.split(jax.random.key(1), 4)
    s = cfg.vision.image_size if hasattr(cfg, "vision") else cfg.image_size
    batch = {
        "images": jax.random.uniform(ks[0], (b, cfg.num_cameras, s, s, 3),
                                     minval=-1, maxval=1, dtype=jnp.float32),
        "img_masks": jnp.ones((b, cfg.num_cameras), bool),
        "lang_tokens": jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 255),
        "lang_masks": jnp.ones((b, cfg.tokenizer_max_length), bool),
        "state": jax.random.normal(ks[2], (b, cfg.max_state_dim)),
        "actions": jax.random.normal(ks[3], (b, cfg.chunk_size, cfg.max_action_dim)),
    }

    import numpy as np

    # drain the device queue before the first jit call (tunnel slow path —
    # see intact_tpu.utils.device.drain_device_queue)
    from intact_tpu.utils.device import drain_device_queue

    drain_device_queue((state.params, batch))

    t0 = time.time()
    state, metrics = step(state, batch)
    print(f"# compile+first {time.time()-t0:.1f}s (loss {float(metrics['l2_loss']):.3f})",
          file=sys.stderr)

    times = []
    for _ in range(args.warmup + args.iters):
        t0 = time.time()
        state, metrics = step(state, batch)
        np.asarray(metrics["l2_loss"])  # host readback = real sync
        times.append(time.time() - t0)
    times = times[args.warmup:]
    t_med = sorted(times)[len(times) // 2]
    samples_per_sec = b / t_med
    print(f"# median step {t_med*1e3:.1f} ms -> {samples_per_sec:.1f} samples/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"{args.model}_train"
                  f"{'_joint' if joint else ''}"
                  f"{'_int8frozen' if args.int8 else ''}"
                  "_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        # the BASELINE.md envelope is the Pi0 bridge fine-tune; other
        # families have no reference number to compare against
        "vs_baseline": (
            round(samples_per_sec / PER_DEVICE_BASELINE_TRAIN_SAMPLES_PER_SEC, 3)
            if args.model == "pi0" else None
        ),
    }))
    return 0


def bench_native_vla(args) -> int:
    """Serving throughput for the native autoregressive VLAs (SpatialVLA-4B,
    Magma-8B): one fused greedy decode per batch, ONE env action executed per
    inference (SpatialVLA ensembles its chunk, reference simpler.py:492-519;
    Magma de-discretizes 7 tokens, reference policy_wrapper.py:226-303).

    Memory budget on one v5e (16 GB HBM): spatialvla_native is 3.04B params
    (6.1 GB bf16 — fits); magma_native is 8.90B (17.8 GB bf16 — does NOT
    fit), so magma defaults to --int8 (8.9 GB weights) on a single chip;
    bf16 magma is a sharded (multi-chip) configuration.
    """
    import functools
    import importlib

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from intact_tpu.models import registry as model_registry
    from intact_tpu.models.common import (
        DtypePolicy,
        SERVING_POLICY,
        quantize_params,
    )
    from intact_tpu.models.tokenizer import HashTokenizer

    import jax.numpy as jnp

    mtype = f"{args.model}_native" + ("_tiny" if args.tiny else "")
    entry = model_registry.get(mtype)
    mod = importlib.import_module(entry["module"])
    cfg = entry["default_config"]()
    policy = (
        DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
        if args.cpu else SERVING_POLICY
    )
    int8 = args.int8
    if args.model == "magma" and not args.cpu and not args.tiny and not int8:
        print("# magma_native bf16 is 17.8 GB of weights — over one v5e's "
              "HBM; forcing --int8 (use a sharded mesh for bf16)",
              file=sys.stderr)
        int8 = True

    b = args.batch
    dev = jax.devices()[0]
    print(f"# device={dev} batch={b} model={mtype} int8={int8}", file=sys.stderr)

    t0 = time.time()
    init_fn = lambda k: jax.tree.map(  # noqa: E731
        lambda x: x.astype(policy.param_dtype), mod.init(k, cfg)
    )
    if int8:
        # STREAMED per-leaf init+quantize: quantizing inside one jit peaks
        # at bf16 + int8 of the whole model simultaneously (26 GB for
        # Magma-8B -> ResourceExhausted on a 16 GB v5e). Leaf-at-a-time,
        # the bf16 intermediate only ever exists for one stacked kernel
        # (<= ~4 GB) beside the accumulating int8 tree.
        from intact_tpu.models.common import streamed_quantized_init

        params = streamed_quantized_init(init_fn, jax.random.key(0), policy)
    else:
        params = jax.jit(init_fn)(jax.random.key(0))
    # tiny-leaf readback: real completion barrier (tunnel quirk)
    _small = min(jax.tree.leaves(params), key=lambda x: x.size)
    _ = np.asarray(_small).ravel()[0]
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    # images are fed as HOST uint8 each call — the serving wire path: the
    # wrappers ship uint8 and normalize on device (models/*/normalize_images),
    # so the per-iteration host->device transfer is part of the measurement
    # at its real (4x-reduced) size
    if args.model == "spatialvla":
        tok = HashTokenizer(vocab_size=cfg.spatial_offset,
                            max_length=cfg.tokenizer_max_length)
        lang, mask = tok(["put the carrot on the plate"] * b,
                         cfg.tokenizer_max_length)
        s = cfg.vision.image_size
        images = np.random.default_rng(0).integers(
            0, 256, (b, s, s, 3), dtype=np.uint8)
        depth = np.asarray(mod.flat_depth(b, cfg), np.float32)

        def fn_py(params, images_u8, depth, lang, mask):
            return mod.predict_action_tokens(
                params, mod.normalize_images(images_u8), depth, lang, mask,
                cfg=cfg, policy=policy,
            )

        fn = jax.jit(fn_py)
        call_args = (params, images, depth, lang, mask)
    else:  # magma
        tok = HashTokenizer(vocab_size=cfg.image_token_id,
                            max_length=cfg.max_prompt_tokens)
        tokens, masks = mod.build_prompt(
            tok, ["put the carrot on the plate"] * b, cfg)
        s = cfg.image_size
        images = np.random.default_rng(0).integers(
            0, 256, (b, s, s, 3), dtype=np.uint8)

        def fn_py(params, images_u8, tokens, masks):
            return mod.generate(
                params, mod.normalize_images(images_u8), tokens, masks,
                cfg=cfg, policy=policy,
            )

        fn = jax.jit(fn_py)
        call_args = (params, images, tokens, masks)

    def run():
        return np.asarray(fn(*call_args))

    t0 = time.time()
    run()
    print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr)
    for _ in range(args.warmup):
        run()
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    t_med = sorted(times)[len(times) // 2]
    # ONE env action per inference for both families (see docstring)
    steps_per_sec = b / t_med
    print(
        f"# median inference {t_med*1e3:.1f} ms -> {steps_per_sec:.1f} policy "
        f"steps/s (p50 per-action latency {t_med*1e3:.1f} ms)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"{args.model}_native_policy_steps_per_sec_per_chip"
                  + ("_int8" if int8 else ""),
        "value": round(steps_per_sec, 2),
        "unit": "policy_steps/s",
        # no per-chip reference target for the baseline policies
        "vs_baseline": None,
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="parallel rollouts (default: 64 serve, 12 train)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--tiny", action="store_true", help="tiny model (smoke)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--attention", choices=["xla", "pallas"], default="pallas")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 dynamic-quant serving (block matmuls on the int8 MXU)")
    ap.add_argument("--mode", choices=["serve", "train"], default="serve",
                    help="train: expert-only fine-tune step throughput")
    ap.add_argument("--remat", choices=["auto", "on", "off"], default="auto",
                    help="train mode: loss remat. auto = off for pi0 (the "
                         "frozen-prefix fast path stores only expert "
                         "activations; recompute costs ~2x throughput, "
                         "89.6 vs 46.3 samples/s at batch 48), on for "
                         "families that backward through the tower")
    ap.add_argument("--model",
                    choices=["pi0", "pi0fast", "mvla", "octo",
                             "spatialvla", "magma"],
                    default="pi0",
                    help="model family (pi0/pi0fast/mvla/octo share the "
                         "sample_actions / compute_loss signatures; "
                         "spatialvla/magma bench their native AR decode)")
    ap.add_argument("--recipe", choices=["expertonly", "joint"],
                    default="expertonly",
                    help="train mode: expertonly = frozen tower (fast path);"
                         " joint = the reference's PRIMARY recipe "
                         "(pi0_finetune_bridge.yaml) — full VLM+SigLIP "
                         "gradients, only the token embedding frozen "
                         "(freeze_lm_head), bf16 masters + stochastic "
                         "rounding + 8-bit Adam moments (bnb AdamW8bit "
                         "precision parity)")
    ap.add_argument("--opt", choices=["8bit", "fp32"], default=None,
                    help="optimizer moment storage (default: 8bit for "
                         "--recipe joint, fp32 otherwise)")
    args = ap.parse_args()
    if args.batch is None:
        # train default 48: with the frozen-prefix fast path (no VLM
        # backward) batch 48 fits the honest fine-tune policy and sits on
        # the throughput plateau (41.2/46.9/47.4 samples/s @ 12/48/64;
        # 96 OOMs). AR decode at 4-8B: batch 16 fits beside the KV cache.
        if args.model in ("spatialvla", "magma"):
            args.batch = 16
        elif args.mode == "train" and args.recipe == "joint":
            args.batch = 24  # full-tower grads: VERDICT r3 target batch
        else:
            args.batch = 48 if args.mode == "train" else 64
    if args.model in ("spatialvla", "magma"):
        if args.mode == "train":
            print("train bench covers the trained families "
                  "(pi0/pi0fast/mvla/octo); spatialvla/magma are "
                  "serving-only baselines (reference run.py:24-56)",
                  file=sys.stderr)
            return 2
        return bench_native_vla(args)
    if args.mode == "train":
        return bench_train(args)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from intact_tpu.models.common import SERVING_POLICY, DtypePolicy
    from intact_tpu.models import registry as model_registry

    import dataclasses
    import importlib

    entry = model_registry.get(args.model + ("_tiny" if args.tiny else ""))
    pi0 = importlib.import_module(entry["module"])  # family model module
    cfg = entry["default_config"]()
    if hasattr(cfg, "attention_impl"):
        cfg = dataclasses.replace(cfg, attention_impl=args.attention)
    policy = (
        DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
        if args.cpu
        else SERVING_POLICY
    )

    dev = jax.devices()[0]
    print(f"# device={dev} batch={args.batch} "
          f"model={args.model}{'-tiny' if args.tiny else ''}",
          file=sys.stderr)

    t0 = time.time()
    init_fn = lambda k: jax.tree.map(  # noqa: E731
        lambda x: x.astype(policy.param_dtype), pi0.init(k, cfg)
    )
    if args.int8:
        from intact_tpu.models.common import quantize_params

        params = jax.jit(lambda k: quantize_params(init_fn(k)))(jax.random.key(0))
    else:
        params = jax.jit(init_fn)(jax.random.key(0))
    jax.block_until_ready(params)
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    # octo keeps image_size on the config root (history frames play the
    # num_cameras role); the paligemma families nest it under .vision
    b = args.batch
    s = cfg.vision.image_size if hasattr(cfg, "vision") else cfg.image_size
    ks = jax.random.split(jax.random.key(1), 3)
    images = jax.random.uniform(ks[0], (b, cfg.num_cameras, s, s, 3), minval=-1, maxval=1)
    img_masks = jnp.ones((b, cfg.num_cameras), bool)
    lang_tokens = jax.random.randint(ks[1], (b, cfg.tokenizer_max_length), 0, 255)
    lang_masks = jnp.ones((b, cfg.tokenizer_max_length), bool)
    state = jax.random.normal(ks[2], (b, cfg.max_state_dim))

    import numpy as np

    # Drain the device queue before the first jit call (tunnel slow path:
    # lowering while init/batch programs are in flight stalls 100-300 s —
    # the round-2 "11x cold-compile regression"; see the helper docstring).
    from intact_tpu.utils.device import drain_device_queue

    drain_device_queue((params, images, img_masks, lang_tokens, lang_masks, state))

    # params passed explicitly: closing over concrete params would bake GBs
    # of constants into the lowered HLO
    @jax.jit
    def infer(params, key, images, state):
        return pi0.sample_actions(
            params, key, images, img_masks, lang_tokens, lang_masks, state, cfg, policy
        )

    import numpy as np

    def run(key):
        # force a host readback: through the tunneled TPU, block_until_ready
        # can return before execution completes; fetching the result cannot
        return np.asarray(infer(params, key, images, state))

    t0 = time.time()
    run(jax.random.key(2))
    print(f"# compile+first {time.time()-t0:.1f}s", file=sys.stderr)

    for i in range(args.warmup):
        run(jax.random.key(3 + i))

    times = []
    for i in range(args.iters):
        t0 = time.time()
        run(jax.random.key(100 + i))
        times.append(time.time() - t0)

    t_med = sorted(times)[len(times) // 2]
    steps_per_sec = args.batch * cfg.n_action_steps / t_med
    print(
        f"# median inference {t_med*1e3:.1f} ms -> {steps_per_sec:.1f} policy steps/s "
        f"(p50 per-action latency {t_med/cfg.n_action_steps*1e3:.1f} ms)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": f"{args.model}_policy_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "policy_steps/s",
        # the >=125/chip target is the Pi0 bridge operating point; chunk-50
        # mvla etc. are not comparable against it
        "vs_baseline": (
            round(steps_per_sec / PER_CHIP_BASELINE_STEPS_PER_SEC, 3)
            if args.model == "pi0" else None
        ),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
