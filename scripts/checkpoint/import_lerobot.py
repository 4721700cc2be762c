"""Import a LeRobot PI0Policy safetensors checkpoint into an Orbax step dir.

The released INT-ACT policies (e.g. `juexzz/INTACT-pi0-finetune-bridge`)
become intact_tpu checkpoints hot-servable through the policy server:

  python scripts/checkpoint/import_lerobot.py \
      --src /path/to/lerobot_ckpt_dir --out /ckpts/pi0_bridge --step 22695
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="dir or model.safetensors path")
    ap.add_argument("--out", required=True, help="checkpoint root (step_{n} created)")
    ap.add_argument("--step", type=int, default=0)
    ap.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    args = ap.parse_args()

    from intact_tpu.models.pi0.config import Pi0Config
    from intact_tpu.models.pi0.convert import load_safetensors_checkpoint
    from intact_tpu.train import checkpoint as ckpt
    from intact_tpu.train.train_step import TrainState

    cfg = Pi0Config.tiny() if args.tiny else Pi0Config.bridge()
    params = jax.tree.map(jnp.asarray, load_safetensors_checkpoint(args.src, cfg))
    state = TrainState(
        params=params, opt_state=(), step=jnp.asarray(args.step, jnp.int32),
        rng=jax.random.key(0),
    )
    path = ckpt.save_checkpoint(args.out, state, aux={"source": str(args.src)},
                                step=args.step)
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    print(f"imported {n_params/1e9:.2f}B params -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
