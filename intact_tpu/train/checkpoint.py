"""Checkpoint save/resume on Orbax, keeping the reference's directory
contract: <ckpt_dir>/step_{n}/ per save, hot-swappable by the serving stack.

Reference parity (`src/agent/trainer.py:596-721`): periodic saves carry
model params AND auxiliary data (optimizer state, scheduler position = step
counter, update/batch counters, wandb run id); resume restores all of it, or
params only when `resume_run` is false. Unlike the reference's FSDP path
(full-state-dict gather to rank-0 CPU), Orbax writes each host's param
shards in parallel and restore re-shards to any mesh.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import orbax.checkpoint as ocp

from intact_tpu.train.train_step import TrainState


def step_dir(ckpt_root: str | Path, step: int) -> Path:
    return Path(ckpt_root) / f"step_{step}"


def list_steps(ckpt_root: str | Path, committed_only: bool = False) -> list[int]:
    """step numbers under the root. ``committed_only`` keeps only fully
    committed saves: auxiliary_data.json is written LAST in save_checkpoint,
    so its presence is the commit marker — a crash mid-save leaves a partial
    step dir that resume must skip, not crash on."""
    root = Path(ckpt_root)
    if not root.exists():
        return []
    out = []
    for p in root.iterdir():
        if not (p.is_dir() and p.name.startswith("step_")):
            continue
        tail = p.name.split("_", 1)[1]
        if not tail.isdigit():
            continue
        if committed_only and not (p / "auxiliary_data.json").exists():
            continue
        out.append(int(tail))
    return sorted(out)


def save_checkpoint(
    ckpt_root: str | Path,
    state: TrainState,
    aux: dict | None = None,
    step: int | None = None,
) -> Path:
    """Write step_{n}/{params,opt_state} via Orbax + auxiliary_data.json.

    `step` is the GRADIENT-UPDATE count (the reference's step_{n} contract);
    state.step counts micro-steps when gradient accumulation is on, so
    callers with accumulation must pass the update count explicitly."""
    step = int(state.step) if step is None else int(step)
    path = step_dir(ckpt_root, step).resolve()
    if (path / "auxiliary_data.json").exists():
        # a COMMITTED checkpoint already lives here (same log_dir reused,
        # or resuming from an older step re-crossed this update). Deleting
        # it and crashing mid-rewrite would lose a good save — refuse,
        # like Orbax itself would, and make the operator decide. Probed on
        # EVERY process before the barrier: committed dirs are never
        # deleted, so all ranks see the same answer and raise together
        # (rank-0-only raising would strand the others in the barrier).
        raise FileExistsError(
            f"{path} already holds a committed checkpoint; refusing to "
            "overwrite. Delete the step dir explicitly (or save under a "
            "new checkpoint root) if this is intended."
        )
    if jax.process_index() == 0 and path.exists() and any(path.iterdir()):
        # stale partial leftovers of a crash mid-save (no commit marker),
        # which resume correctly skipped — clear them so the retry at this
        # update can save. Orbax refuses to overwrite an existing item dir,
        # so without this every retry would crash at the same update.
        # Multi-host: the root is shared storage, so ONLY process 0 probes
        # and removes (a non-zero rank's exists()/iterdir() would race the
        # rmtree); everyone barriers below before any process writes.
        import logging
        import shutil

        logging.getLogger("intact_tpu.checkpoint").warning(
            "clearing stale partial step dir %s", path
        )
        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"intact_tpu_ckpt_clear_{step}")
    path.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "params", jax.tree.map(lambda x: x, state.params))
        if jax.tree.leaves(state.opt_state):  # params-only imports have none
            ckptr.save(path / "opt_state", state.opt_state)
    auxiliary = {"cnt_update": step, "micro_step": int(state.step)}
    auxiliary.update(aux or {})
    # written LAST: doubles as the commit marker (each Orbax item dir is
    # internally atomic, but the step dir as a whole is not — restore skips
    # step dirs without this file). Multi-host: the root is shared storage,
    # so only process 0 writes the marker, and everyone barriers after so
    # any process returning from save() can immediately restore the step.
    if jax.process_index() == 0:
        (path / "auxiliary_data.json").write_text(json.dumps(auxiliary, indent=2))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"intact_tpu_ckpt_commit_{step}")
    return path


def _resolve_latest_step(path: Path) -> Path:
    """Root dir -> newest COMMITTED step dir. A crash mid-save leaves a
    partial step dir without the auxiliary_data.json marker; silently
    restoring it would load truncated params, so partial-only roots raise
    with a pointer instead."""
    steps = list_steps(path, committed_only=True)
    if not steps:
        partial = list_steps(path)
        if partial:
            raise FileNotFoundError(
                f"only uncommitted (crash-truncated?) step dirs under "
                f"{path}: steps {partial}. Each lacks the "
                "auxiliary_data.json commit marker; restoring one risks "
                "partial params. Point ckpt_path directly at a step dir "
                "to force-restore it."
            )
        raise FileNotFoundError(f"no checkpoint under {path}")
    return step_dir(path, steps[-1])


def restore_params(ckpt_path: str | Path, template_params, shardings=None):
    """Restore params only (serving / switch_model). ckpt_path may be the
    step dir or its parent root (latest committed step used)."""
    path = Path(ckpt_path)
    if not (path / "params").exists():
        path = _resolve_latest_step(path)
    if shardings is not None:
        target = jax.tree.map(
            lambda t, s: jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=s),
            template_params, shardings,
        )
    else:
        # default to device-0 placement so checkpoints restore across
        # topologies (e.g. saved on TPU, reloaded on CPU)
        from jax.sharding import SingleDeviceSharding

        dev = jax.local_devices()[0]
        target = jax.tree.map(
            lambda t: jax.ShapeDtypeStruct(
                t.shape, t.dtype, sharding=SingleDeviceSharding(dev)
            ),
            template_params,
        )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path / "params", target)


def restore_params_host(ckpt_path: str | Path, template_params):
    """Restore params as HOST numpy arrays (no device placement).

    The load path for quantized native serving (policy_wrapper), where the
    fp tree may not fit on the device at all (Magma-8B bf16 on one v5e):
    Orbax restores into host buffers and the caller streams them to device
    in int8 form leaf by leaf. template_params: pytree of arrays or
    ShapeDtypeStructs giving shapes/dtypes."""
    import numpy as np

    path = Path(ckpt_path)
    if not (path / "params").exists():
        path = _resolve_latest_step(path)
    # numpy template leaves make Orbax return numpy (np.zeros pages lazily,
    # so the template itself costs no resident RAM)
    target = jax.tree.map(
        lambda t: np.zeros(t.shape, t.dtype), template_params
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path / "params", target)


def restore_train_state(
    ckpt_path: str | Path,
    template_state: TrainState,
    state_shardings=None,
    resume_run: bool = True,
    params_template=None,
    params_shardings=None,
    params_transform=None,
) -> tuple[TrainState, dict]:
    """Restore a full TrainState (+ aux dict). With resume_run=False only
    params are loaded (fresh optimizer/counters), mirroring the reference's
    load_from_checkpoint vs resume_run split.

    params_template/params_shardings/params_transform support restoring a
    checkpoint whose on-disk param structure differs from the live state's:
    params restore into `params_template` and `params_transform` maps them
    into the live structure (the trainer's quantize_frozen_int8 mode loads
    float pretrained checkpoints this way, quantizing the frozen tower
    after restore)."""
    path = Path(ckpt_path)
    if not (path / "params").exists():
        path = _resolve_latest_step(path)

    if params_template is not None:
        params = restore_params(path, params_template, params_shardings)
    else:
        p_shard = state_shardings.params if state_shardings is not None else None
        params = restore_params(path, template_state.params, p_shard)
    if params_transform is not None:
        params = params_transform(params)
    if not resume_run:
        return (
            TrainState(
                params=params,
                opt_state=template_state.opt_state,
                step=template_state.step,
                rng=template_state.rng,
            ),
            {},
        )

    if not (path / "opt_state").exists():
        # params-only checkpoint (converted/imported weights): resume
        # degrades to a fresh optimizer with a loud note, mirroring the
        # reference's graceful fallback (trainer.py:699-721)
        import logging

        logging.getLogger("intact_tpu.checkpoint").warning(
            "resume_run=True but %s has no opt_state (params-only "
            "checkpoint); continuing with a fresh optimizer/schedule", path,
        )
        aux_file = path / "auxiliary_data.json"
        aux = json.loads(aux_file.read_text()) if aux_file.exists() else {}
        return (
            TrainState(
                params=params,
                opt_state=template_state.opt_state,
                step=template_state.step,
                rng=template_state.rng,
            ),
            aux,
        )

    def as_target(t, s):
        return jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=s)

    if state_shardings is not None:
        opt_target = jax.tree.map(as_target, template_state.opt_state, state_shardings.opt_state)
    else:
        opt_target = jax.tree.map(
            lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype), template_state.opt_state
        )
    with ocp.StandardCheckpointer() as ckptr:
        try:
            opt_state = ckptr.restore(path / "opt_state", opt_target)
        except Exception as e:
            # the likeliest structural mismatch: checkpoints written before
            # MultiSteps moved INSIDE the multi_transform partition (so the
            # accumulator only covers trainable params) have
            # MultiStepsState(inner=multi_transform(...)) on disk while the
            # live template is multi_transform(train=MultiSteps(...))
            raise RuntimeError(
                f"opt_state restore from {path} failed with a structure "
                "mismatch. If this checkpoint was written with "
                "grad_accumulation_steps>1 AND a frozen mask by a build "
                "where MultiSteps wrapped the whole chain (outside "
                "multi_transform), its opt_state tree no longer matches. "
                "Resume params-only instead: pass resume_run=False / "
                "--train.resume false (optimizer restarts fresh)."
            ) from e

    aux_file = path / "auxiliary_data.json"
    aux = json.loads(aux_file.read_text()) if aux_file.exists() else {}
    import jax.numpy as jnp

    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(aux.get("micro_step", aux.get("cnt_update", 0)), jnp.int32),
        rng=template_state.rng,
    )
    return state, aux
