"""Action-chunk parity gate (BASELINE.md: MSE < 1e-3 vs the released
INTACT-pi0-finetune-bridge outputs).

Three roles:
  record   run OUR policy on a fixture's inputs and store its action chunks
           (also usable to snapshot-regress our own checkpoints);
  compare  run OUR policy on the fixture's inputs and score MSE against the
           fixture's stored reference actions (recorded from the torch
           reference via scripts in its repo, or from a previous `record`);
  int8     run the SAME fixture inputs (shared denoise noise) through the
           bf16 path and the W8A8 int8 path and score int8-vs-bf16 chunk
           MSE + mean relative deviation against a stated budget — the
           automated acceptance gate for serving int8 (VERDICT round-2
           next #5): a recorded pass/fail decision, not a README caveat.
           For the native AR families (--model spatialvla_native /
           magma_native, the config-level quantize_int8 serving mode) the
           gate runs both precisions through the full greedy decode on
           identical deterministic inputs (no fixture needed; --batch/--seed
           control them) and scores the DECODED ACTIONS — the behavioral
           quantity — plus the raw token agreement rate. Greedy argmax at
           RANDOM-INIT weights sits on knife-edge logits, so run this gate
           on a real checkpoint (--checkpoint) for a meaningful verdict.

Fixture format (single .npz):
  images          float32 [N, K, H, W, 3] in [-1, 1]
  state           float32 [N, state_dim]
  lang_tokens     int32   [N, L]        (PaliGemma ids incl. the "\n" suffix)
  lang_masks      bool    [N, L]
  noise           float32 [N, chunk, action_dim]  (shared denoise start)
  actions         float32 [N, chunk, action_dim]  (reference outputs; absent
                                                   in input-only fixtures)

Usage:
  python scripts/eval/action_parity.py compare --fixture ref_fixture.npz \
      --checkpoint /ckpts/pi0_bridge_converted [--model pi0]
  python scripts/eval/action_parity.py record --fixture inputs.npz \
      --out ours.npz --checkpoint ...
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

MSE_GATE = 1e-3
# int8-vs-bf16 budget: actions are normalized (|a| <~ 1); W8A8 noise across
# prefill + 10 Euler steps stays well under this on the bridge operating
# point, while a broken quantization path (wrong scales, clipped channels)
# lands orders of magnitude above it
INT8_MSE_GATE = 5e-3
INT8_REL_GATE = 0.10


def run_policy(fix: dict, checkpoint: str | None, model_type: str,
               use_bf16: bool, quantize: bool = False) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from intact_tpu.models import common as cm
    from intact_tpu.models import registry
    import importlib

    entry = registry.get(model_type)
    cfg = entry["default_config"]()
    model = importlib.import_module(entry["module"])
    policy = cm.SERVING_POLICY if use_bf16 else cm.DtypePolicy(
        param_dtype=jnp.float32, compute_dtype=jnp.float32
    )

    if checkpoint:
        from intact_tpu.models.pi0 import convert
        from intact_tpu.train import checkpoint as ckpt_lib

        path = Path(checkpoint)
        if (path / "model.safetensors").exists() or path.suffix == ".safetensors":
            params = convert.load_safetensors_checkpoint(path, cfg)
            params = jax.tree.map(
                lambda x: jnp.asarray(x, policy.param_dtype), params
            )
        else:
            template = jax.eval_shape(lambda k: model.init(k, cfg), jax.random.key(0))
            params = ckpt_lib.restore_params(str(path), template)
            params = jax.tree.map(lambda x: x.astype(policy.param_dtype), params)
    else:
        params = jax.jit(lambda k: jax.tree.map(
            lambda x: x.astype(policy.param_dtype), model.init(k, cfg)
        ))(jax.random.key(0))
    if quantize:
        params = jax.jit(cm.quantize_params)(params)

    images = jnp.asarray(fix["images"])
    b = images.shape[0]
    img_masks = jnp.ones((b, images.shape[1]), bool)
    state = np.zeros((b, cfg.max_state_dim), np.float32)
    state[:, : fix["state"].shape[-1]] = fix["state"]
    noise = None
    if "noise" in fix:
        noise = np.zeros((b, cfg.chunk_size, cfg.max_action_dim), np.float32)
        noise[:, :, : fix["noise"].shape[-1]] = fix["noise"]
        noise = jnp.asarray(noise)

    actions = model.sample_actions(
        params, jax.random.key(0), images, img_masks,
        jnp.asarray(fix["lang_tokens"]), jnp.asarray(fix["lang_masks"]),
        jnp.asarray(state), cfg, policy, noise=noise,
    )
    return np.asarray(actions, np.float32)


def score_int8(fix: dict, checkpoint: str | None, model_type: str,
               mse_gate: float = INT8_MSE_GATE,
               rel_gate: float = INT8_REL_GATE,
               use_bf16: bool = True) -> dict:
    """int8-vs-baseline on identical inputs + shared noise -> gated verdict.
    The baseline precision follows use_bf16 (--fp32 on CPU gate hosts)."""
    if "noise" not in fix:
        raise SystemExit(
            "int8: fixture must carry shared 'noise' so the two precisions "
            "denoise from the same start (make_fixture adds it)"
        )
    ref = run_policy(fix, checkpoint, model_type, use_bf16=use_bf16)
    q = run_policy(fix, checkpoint, model_type, use_bf16=use_bf16, quantize=True)
    mse = float(((q - ref) ** 2).mean())
    rel = float(
        (np.abs(q - ref) / (np.abs(ref) + 1e-6)).mean()
    )
    return {
        "metric": "pi0_int8_vs_bf16_chunk_deviation",
        "mse": mse,
        "mean_relative_deviation": rel,
        "mse_gate": mse_gate,
        "rel_gate": rel_gate,
        "pass": mse < mse_gate and rel < rel_gate,
    }


AR_NATIVE_PREFIXES = ("spatialvla_native", "magma_native")


def _is_ar_native(model_type: str) -> bool:
    return model_type.startswith(AR_NATIVE_PREFIXES)


_AR_GATE_TASKS = (
    "put the carrot on the plate",
    "put the spoon on the towel",
    "put eggplant into yellow basket",
    "stack the green block on the yellow block",
)


def run_ar_policy(model_type: str, checkpoint: str | None, batch: int = 4,
                  seed: int = 0, use_bf16: bool = True,
                  quantize: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Full greedy decode for a native AR family on deterministic inputs.

    Returns (actions, token_ids): actions are the DECODED action-space
    outputs (SpatialVLA: [N, n_action_steps, 7] normalized chunk via the
    spatial-grid tokenizer; Magma: [N, 7] normalized pre-quantile-denorm) —
    the quantity the int8 gate budgets, because a flipped token only matters
    through the action it decodes to.
    """
    import importlib

    import jax
    import jax.numpy as jnp

    from intact_tpu.models import common as cm
    from intact_tpu.models import registry
    from intact_tpu.models.tokenizer import HashTokenizer

    entry = registry.get(model_type)
    cfg = entry["default_config"]()
    mod = importlib.import_module(entry["module"])
    policy = cm.SERVING_POLICY if use_bf16 else cm.DtypePolicy(
        param_dtype=jnp.float32, compute_dtype=jnp.float32
    )

    if checkpoint:
        loader = (mod.load_spatialvla_checkpoint
                  if "spatialvla" in model_type else mod.load_magma_checkpoint)
        params = loader(checkpoint, cfg)
        params = jax.tree.map(
            lambda x: jnp.asarray(x, policy.param_dtype), params
        )
    else:
        params = jax.jit(lambda k: jax.tree.map(
            lambda x: x.astype(policy.param_dtype), mod.init(k, cfg)
        ))(jax.random.key(0))
    if quantize:
        params = jax.jit(cm.quantize_params)(params)

    rng = np.random.default_rng(seed)
    tasks = [_AR_GATE_TASKS[i % len(_AR_GATE_TASKS)] for i in range(batch)]

    if "spatialvla" in model_type:
        tok = HashTokenizer(vocab_size=cfg.spatial_offset,
                            max_length=cfg.tokenizer_max_length)
        lang, mask = tok(tasks, cfg.tokenizer_max_length)
        s = cfg.vision.image_size
        images = rng.integers(0, 256, (batch, s, s, 3), dtype=np.uint8)
        depth = np.asarray(mod.flat_depth(batch, cfg), np.float32)
        ids = np.asarray(jax.jit(
            lambda p, i, d, lt, lm: mod.predict_action_tokens(
                p, mod.normalize_images(i), d, lt, lm, cfg=cfg, policy=policy,
            )
        )(params, images, depth, jnp.asarray(lang), jnp.asarray(mask)))
        atok = mod.make_action_tokenizer(cfg)
        actions = np.stack([
            atok.decode(ids[i].reshape(cfg.n_action_steps,
                                       cfg.tokens_per_action))
            for i in range(batch)
        ])
    else:  # magma
        tok = HashTokenizer(
            vocab_size=min(cfg.image_token_id, cfg.lm.vocab_size),
            max_length=cfg.max_prompt_tokens,
        )
        tokens, masks = mod.build_prompt(tok, tasks, cfg)
        s = cfg.image_size
        images = rng.integers(0, 256, (batch, s, s, 3), dtype=np.uint8)
        ids = np.asarray(jax.jit(
            lambda p, i, t, m: mod.generate(
                p, mod.normalize_images(i), t, m, cfg=cfg, policy=policy,
            )
        )(params, images, tokens, masks))
        from intact_tpu.serve.decoding import tokens_to_actions

        ids = ids[:, : cfg.n_action_tokens]
        actions = tokens_to_actions(
            ids, vocab_size=cfg.lm.vocab_size, n_bins=cfg.n_action_bins,
        )
    return actions.astype(np.float32), np.asarray(ids)


def score_int8_ar(model_type: str, checkpoint: str | None, batch: int = 4,
                  seed: int = 0, mse_gate: float = INT8_MSE_GATE,
                  rel_gate: float = INT8_REL_GATE,
                  use_bf16: bool = True) -> dict:
    """int8-vs-baseline for a native AR family: identical inputs through the
    full greedy decode in both precisions; gate on decoded-ACTION deviation
    (the behavioral quantity), report raw token agreement for diagnosis."""
    ref_a, ref_ids = run_ar_policy(model_type, checkpoint, batch, seed,
                                   use_bf16=use_bf16)
    q_a, q_ids = run_ar_policy(model_type, checkpoint, batch, seed,
                               use_bf16=use_bf16, quantize=True)
    mse = float(((q_a - ref_a) ** 2).mean())
    rel = float((np.abs(q_a - ref_a) / (np.abs(ref_a) + 1e-6)).mean())
    agreement = float((q_ids == ref_ids).mean())
    return {
        "metric": f"{model_type}_int8_vs_baseline_action_deviation",
        "mse": mse,
        "mean_relative_deviation": rel,
        "token_agreement": agreement,
        "mse_gate": mse_gate,
        "rel_gate": rel_gate,
        "pass": mse < mse_gate and rel < rel_gate,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("role", choices=["record", "compare", "int8"])
    ap.add_argument("--fixture", default=None,
                    help="input npz (optional for int8 on the AR natives, "
                         "whose gate synthesizes deterministic inputs)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model", default="pi0")
    ap.add_argument("--out", default=None, help="record: output npz")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--batch", type=int, default=4,
                    help="int8 AR gate: synthesized batch size")
    ap.add_argument("--seed", type=int, default=0,
                    help="int8 AR gate: input seed")
    ap.add_argument("--int8-mse-gate", type=float, default=INT8_MSE_GATE)
    ap.add_argument("--int8-rel-gate", type=float, default=INT8_REL_GATE)
    args = ap.parse_args()

    if args.role == "int8" and _is_ar_native(args.model):
        result = score_int8_ar(args.model, args.checkpoint, args.batch,
                               args.seed, args.int8_mse_gate,
                               args.int8_rel_gate, use_bf16=not args.fp32)
        print(json.dumps(result))
        return 0 if result["pass"] else 1

    if not args.fixture:
        raise SystemExit("--fixture is required (it is optional only for "
                         "`int8` on the native AR families)")
    fix = dict(np.load(args.fixture, allow_pickle=False))

    if args.role == "int8":
        result = score_int8(fix, args.checkpoint, args.model,
                            args.int8_mse_gate, args.int8_rel_gate,
                            use_bf16=not args.fp32)
        print(json.dumps(result))
        return 0 if result["pass"] else 1

    ours = run_policy(fix, args.checkpoint, args.model, use_bf16=not args.fp32)

    if args.role == "record":
        out = args.out or args.fixture.replace(".npz", "_ours.npz")
        np.savez(out, **{**fix, "actions": ours})
        print(json.dumps({"recorded": out, "n": int(ours.shape[0])}))
        return 0

    if "actions" not in fix:
        raise SystemExit("compare: fixture has no reference 'actions' array")
    ref = np.asarray(fix["actions"], np.float32)
    d = min(ref.shape[-1], ours.shape[-1])
    h = min(ref.shape[1], ours.shape[1])
    mse = float(((ours[:, :h, :d] - ref[:, :h, :d]) ** 2).mean())
    result = {
        "metric": "pi0_action_chunk_parity_mse",
        "value": mse,
        "gate": MSE_GATE,
        "pass": mse < MSE_GATE,
    }
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
