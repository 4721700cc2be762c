"""intact_tpu — a TPU-native Vision-Language-Action (VLA) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of INT-ACT
(arXiv 2506.09930): Pi0-style flow-matching VLA training on Open-X-Embodiment
RLDS data, a policy-server / simulator-client serving stack (websocket +
msgpack-numpy, wire-compatible with the reference protocol), and the
intention-vs-execution evaluation harness.

Layer map (cf. reference SURVEY.md §1):
  protocol/   wire format + websocket transport (host-side, pure python)
  config/     dataclass config tree, YAML + CLI dot-overrides
  ops/        Pallas TPU kernels + XLA attention/masks/rope
  models/     SigLIP + Gemma + PaliGemma + Pi0 flow matching (functional JAX)
  parallel/   device mesh, sharding rules (dp x fsdp x tp), collectives
  train/      pjit trainer, optax optimizers, orbax checkpointing
  data/       RLDS-style input pipeline (tf.data-gated + numpy-native)
  serve/      policy wrappers + continuous-batching websocket server
  envs/       env adapters (obs/action translation) + evaluators
  utils/      geometry, logging/timers, seeding, metrics
"""

__version__ = "0.1.0"
