"""Export an intact_tpu pi0 checkpoint to LeRobot-layout safetensors
(the inverse of import_lerobot.py; lets LeRobot/PyTorch consumers load
models trained here).

  python scripts/checkpoint/export_lerobot.py \
      --src log/pi0_finetune/checkpoint/step_22695 --out /export/model.safetensors
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="Orbax step dir (or root)")
    ap.add_argument("--out", required=True, help="output .safetensors path")
    ap.add_argument("--tiny", action="store_true", help="tiny config (tests)")
    args = ap.parse_args()

    from safetensors.numpy import save_file

    from intact_tpu.models.pi0 import model as pi0
    from intact_tpu.models.pi0.config import Pi0Config
    from intact_tpu.models.pi0.convert import to_torch_state_dict
    from intact_tpu.train.checkpoint import restore_params

    cfg = Pi0Config.tiny() if args.tiny else Pi0Config.bridge()
    template = jax.eval_shape(lambda k: pi0.init(k, cfg), jax.random.key(0))
    params = restore_params(args.src, template)
    sd = to_torch_state_dict(jax.tree.map(np.asarray, params), cfg)
    save_file({k: np.ascontiguousarray(v, np.float32) for k, v in sd.items()}, args.out)
    print(f"exported {len(sd)} tensors -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
