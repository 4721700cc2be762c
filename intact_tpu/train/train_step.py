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
):
    """-> step(state, batch) -> (state, metrics). Pure; jit at the call site
    with shardings + donate_argnums=(0,)].

    ``trainable_mask`` stop-gradients FROZEN param leaves inside the loss:
    JAX's symbolic-zero AD then never emits the dL/dW contractions for
    frozen weights (the optimizer would mask those grads to zero anyway —
    the reference relies on torch requires_grad=False for the same saving,
    trainer.py:109-123). Activation gradients still flow, so parameters
    that train THROUGH frozen layers (e.g. MVLA metaqueries) are unaffected.
    """

    if trainable_mask is not None:
        base_loss = loss_fn

        def loss_fn(params, key, batch):  # noqa: F811
            params = jax.tree.map(
                lambda p, m: p if m else jax.lax.stop_gradient(p),
                params, trainable_mask,
            )
            return base_loss(params, key, batch)

    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())

    def step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, step_key = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, step_key, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "l2_loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(params),
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
        return replicated(mesh)

    opt_sh = jax.tree_util.tree_map_with_path(match, state.opt_state)
    return TrainState(
        params=p_sh,
        opt_state=opt_sh,
        step=replicated(mesh),
        rng=replicated(mesh),
    )
