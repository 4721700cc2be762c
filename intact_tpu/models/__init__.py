"""Model zoo: functional JAX implementations (params = pytrees, apply = pure fns).

Families (reference SURVEY.md §2.4):
  pi0        PaliGemma-3B VLM + ~300M Gemma action expert, flow matching —
             the flagship trained/served model (joint prefix/suffix attention)
  mvla       research fork: metaquery tokens + connector + self/cross expert
  octo       small transformer policy (native JAX)
  spatialvla / magma   autoregressive token->action baselines (serving only)

Design notes (TPU-first, NOT a torch port):
  * parameters are plain nested-dict pytrees; every apply function is pure and
    jittable, so pjit/shard_map sharding is decided entirely by
    `intact_tpu.parallel.sharding` rules over tree paths;
  * repeated transformer blocks store stacked parameters (leading layer dim)
    and run under `jax.lax.scan` — O(1) compile time in depth and natural
    rematerialization boundaries;
  * compute runs in bfloat16 against float32 master params (policy in
    models/common.py).
"""

from intact_tpu.models import registry as registry
