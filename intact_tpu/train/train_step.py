"""The jitted training step: loss + grad + optimizer update under pjit.

One compiled XLA program per step. Sharding comes entirely from the in/out
shardings attached at jit time (params/opt-state per `parallel.sharding`
rules, batch over (data, fsdp)); XLA inserts the gradient reduce-scatters /
all-gathers over ICI. State buffers are donated — params are updated in
place in HBM.

Optional `remat` wraps the loss in jax.checkpoint (rematerialize activations
in backward — trades MXU flops for HBM, the standard recipe for 3B-scale
training on 16 GB chips).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from intact_tpu.models import common as cm


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    rng: Any


def init_train_state(params, tx: optax.GradientTransformation, seed: int = 0) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.key(seed),
    )


def make_train_step(
    loss_fn: Callable,  # (params, rng_key, batch) -> (loss, aux_dict)
    tx: optax.GradientTransformation,
    policy: cm.DtypePolicy = cm.DEFAULT_POLICY,
    remat: bool = False,
    trainable_mask=None,  # pytree of bool like params; True = trainable
    stochastic_rounding: bool = False,  # for bf16 master params
):
    """-> step(state, batch) -> (state, metrics). Pure; jit at the call site
    with shardings + donate_argnums=(0,)].

    ``trainable_mask`` PARTITIONS the param tree: frozen leaves become
    closure constants of the differentiated function, so JAX never emits
    the dL/dW contractions for frozen weights (the optimizer would mask
    those grads to zero anyway — the reference relies on torch
    requires_grad=False for the same saving, trainer.py:109-123).
    Activation gradients still flow THROUGH frozen layers (constants on
    the forward path, e.g. MVLA metaqueries train through the frozen VLM).
    Partitioning — rather than stop_gradient on frozen leaves — also
    admits non-differentiable frozen leaves (the int8-quantized frozen
    tower of `quantize_frozen_int8`): jax.grad rejects integer inputs,
    but constants are fine. Frozen grads are synthesized as zeros for the
    optimizer (optax.set_to_zero partition).
    """

    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())

    if trainable_mask is not None:
        # Static partition indices (the mask is a Python pytree of bools).
        mask_leaves = jax.tree.leaves(trainable_mask)
        idx_train = [i for i, m in enumerate(mask_leaves) if m]

        def value_and_grad_params(params, step_key, batch):
            flat, treedef = jax.tree_util.tree_flatten(params)
            train_leaves = [flat[i] for i in idx_train]

            def loss_over_trainable(train_list):
                merged = list(flat)
                for i, leaf in zip(idx_train, train_list):
                    merged[i] = leaf
                return loss_fn(
                    jax.tree_util.tree_unflatten(treedef, merged), step_key, batch
                )

            (loss, aux), g_train = jax.value_and_grad(
                loss_over_trainable, has_aux=True
            )(train_leaves)
            # Frozen grads are zeros; int leaves (quantized kernels) get
            # float32 zeros so optax accumulation/apply stay in float —
            # XLA folds the zero broadcasts, nothing is materialized.
            g_flat = [
                jnp.zeros(
                    leaf.shape,
                    leaf.dtype
                    if jnp.issubdtype(leaf.dtype, jnp.inexact)
                    else jnp.float32,
                )
                for leaf in flat
            ]
            for i, g in zip(idx_train, g_train):
                g_flat[i] = g
            grads = jax.tree_util.tree_unflatten(treedef, g_flat)
            return (loss, aux), grads
    else:

        def value_and_grad_params(params, step_key, batch):
            return jax.value_and_grad(loss_fn, has_aux=True)(params, step_key, batch)

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, step_key, sr_key = jax.random.split(state.rng, 3)
        (loss, aux), grads = value_and_grad_params(state.params, step_key, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if stochastic_rounding:
            # bf16 masters: sub-ulp updates round away under round-to-
            # nearest (bf16 ulp ~ 0.4% relative vs lr*update ~ 1e-5);
            # stochastic rounding keeps E[param] exact (optim8bit docstring)
            from intact_tpu.train.optim8bit import apply_updates_stochastic

            params = apply_updates_stochastic(state.params, updates, sr_key)
        else:
            params = optax.apply_updates(state.params, updates)
        # param_norm over float leaves only: int8 kernel_q leaves (the
        # quantize_frozen_int8 tower) would square in int8 arithmetic,
        # wrap negative, and turn the whole norm into NaN.
        float_params = [
            p
            for p in jax.tree_util.tree_leaves(params)
            if jnp.issubdtype(p.dtype, jnp.floating)
        ]
        metrics = {
            "l2_loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(float_params),
        }
        for k, v in aux.items():
            if jnp.ndim(v) == 0:
                metrics[k] = v
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, rng=rng
        )
        return new_state, metrics

    return step


def jit_train_step(
    step_fn,
    mesh,
    state_shardings,
    batch_sharding,
):
    """Attach shardings + donation and jit."""
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )


def state_shardings(state: TrainState, mesh, rules=None):
    """Shardings for the full TrainState: params + matching opt moments
    (adam mu/nu share the param layout), scalars replicated."""
    from intact_tpu.parallel.sharding import keystr, param_shardings, replicated

    p_sh = param_shardings(state.params, mesh, rules)

    # Optimizer moments (adam mu/nu, MultiSteps grad buffers) are pytrees
    # shaped like params: any opt leaf whose key-path ENDS WITH a param path
    # inherits that param's sharding; scalars/counters replicate.
    flat_params = {
        tuple(keystr(k) for k in path): sh
        for path, sh in jax.tree_util.tree_flatten_with_path(p_sh)[0]
    }

    def match(path, leaf):
        keys = tuple(keystr(k) for k in path)
        for start in range(len(keys)):
            if keys[start:] in flat_params:
                return flat_params[keys[start:]]
        # Quantized moments (optim8bit / fused_joint): {"q": [nb, block],
        # "scale": [nb, 1]} flat per-leaf, or [L, NB, block] packed trunk
        # rows. The blocked layout deliberately flattens the params, so no
        # param spec applies — shard the block-row axis over fsdp instead
        # (ZeRO-style), replicate if indivisible. ("q"/"scale" as a FINAL
        # path element only occurs in these layouts: attention param dicts
        # nest kernel/bias below their q key, and ln "scale" params live in
        # the params tree, not here.)
        if keys[-1] in ("q", "scale"):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from intact_tpu.parallel.sharding import _sanitize

            spec = P("fsdp") if leaf.ndim <= 2 else P(None, "fsdp")
            return NamedSharding(mesh, _sanitize(spec, leaf.shape, mesh))
        return replicated(mesh)

    opt_sh = jax.tree_util.tree_map_with_path(match, state.opt_state)
    return TrainState(
        params=p_sh,
        opt_state=opt_sh,
        step=replicated(mesh),
        rng=replicated(mesh),
    )
