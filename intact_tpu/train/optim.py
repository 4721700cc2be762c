"""Optimizer + LR schedule factory.

Schedule parity: `cosine_warmup_restarts` reproduces the reference's
CosineAnnealingWarmupRestarts (`src/utils/optim.py:33-150`): linear warmup
min_lr -> max_lr over warmup_steps, cosine decay back to min_lr across the
cycle, geometric cycle growth (cycle_mult) and per-cycle max-lr decay (gamma).

Optimizer: optax AdamW replaces bitsandbytes AdamW8bit (`trainer.py:204-210`).
Two precision modes:
  * default: fp32 moments, sharded with the params under fsdp;
  * quantize_moments=True: blockwise int8 moments (train.optim8bit), the
    bnb-AdamW8bit equivalent — 6 bytes/param less optimizer HBM, the
    difference between fitting and not fitting the full-tower joint recipe
    on a single chip (README training section).
Gradient accumulation uses optax.MultiSteps (reference: DDP no_sync
accumulation, `trainer.py:293-296`).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import optax


def cosine_warmup_restarts(
    max_lr: float,
    first_cycle_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 1e-8,
    cycle_mult: float = 1.0,
    gamma: float = 1.0,
) -> optax.Schedule:
    if warmup_steps >= first_cycle_steps:
        raise ValueError("warmup_steps must be < first_cycle_steps")

    def schedule(count):
        step = jnp.asarray(count, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            step_in_cycle = step - cycle * first_cycle_steps
            cycle_steps = jnp.asarray(first_cycle_steps, jnp.float32)
        else:
            # cycle n starts at first*(mult^n - 1)/(mult - 1)
            ratio = step / first_cycle_steps * (cycle_mult - 1.0) + 1.0
            cycle = jnp.floor(jnp.log(ratio) / math.log(cycle_mult))
            cycle_start = first_cycle_steps * (cycle_mult**cycle - 1.0) / (cycle_mult - 1.0)
            step_in_cycle = step - cycle_start
            cycle_steps = first_cycle_steps * cycle_mult**cycle

        cur_max = max_lr * gamma**cycle
        warm = min_lr + (cur_max - min_lr) * step_in_cycle / max(warmup_steps, 1)
        cos = min_lr + (cur_max - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (step_in_cycle - warmup_steps) / (cycle_steps - warmup_steps))
        )
        return jnp.where(step_in_cycle < warmup_steps, warm, cos)

    return schedule


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 5e-5
    weight_decay: float = 1e-5
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_steps: int = 200
    first_cycle_steps: int = 10_000_000  # effectively single-cycle by default
    min_lr: float = 1e-8
    cycle_mult: float = 1.0
    gamma: float = 1.0
    grad_accumulation_steps: int = 1
    # bnb-AdamW8bit equivalent: blockwise int8 mu/nu (train.optim8bit)
    quantize_moments: bool = False


def clip_by_global_norm_f32(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm with the norm ACCUMULATED in fp32.

    With bf16 master params (master_dtype: bfloat16, the reference's joint
    recipe precision) gradients are bf16; summing ~3e9 squared bf16 terms in
    bf16 loses the norm to accumulation error. The cast fuses into the
    reduction — no fp32 gradient tree is materialized.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        sq = sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree.leaves(updates)
        )
        norm = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-16))
        return (
            jax.tree.map(lambda x: (x * scale.astype(x.dtype)), updates),
            state,
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimizerConfig, frozen_mask=None):
    """-> (optax.GradientTransformation, schedule).

    frozen_mask: optional pytree of bools (True = trainable). Frozen leaves
    get zero updates — the functional analogue of requires_grad=False
    (reference trainer.py:109-123 freeze flags).

    Gradient accumulation (MultiSteps) sits INSIDE the trainable partition:
    the accumulator buffer then only covers trainable leaves — a frozen 3B
    tower costs zero optimizer HBM even with accumulation — and frozen
    leaves (which may be int8-quantized, see trainer quantize_frozen_int8)
    never touch any optimizer buffer.
    """
    schedule = cosine_warmup_restarts(
        max_lr=cfg.lr,
        first_cycle_steps=cfg.first_cycle_steps,
        warmup_steps=cfg.warmup_steps,
        min_lr=cfg.min_lr,
        cycle_mult=cfg.cycle_mult,
        gamma=cfg.gamma,
    )
    if cfg.quantize_moments:
        from intact_tpu.train.optim8bit import adamw8bit

        adam = adamw8bit(
            schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        adam = optax.adamw(
            schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    tx = optax.chain(clip_by_global_norm_f32(cfg.max_grad_norm), adam)
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accumulation_steps)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=jax.tree.map(lambda t: "train" if t else "freeze", frozen_mask),
        )
    return tx, schedule
