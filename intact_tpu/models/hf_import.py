"""Shared helpers for HF-checkpoint -> native-param importers.

Used by the whole-model importers (models/magma, models/spatialvla,
models/octo/upstream): sharded-safetensors directory loading (torch-free),
eval_shape-based structural checks, and small-MLP naming probes.
"""

from __future__ import annotations

import jax
import numpy as np

from intact_tpu.models import common as cm


def load_safetensors_dir(path: str) -> dict:
    """Merge every ``*.safetensors`` shard under ``path`` (HF snapshot
    layout) into one flat state dict via safetensors.numpy."""
    from pathlib import Path

    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    from safetensors.numpy import load_file

    sd: dict = {}
    for f in files:
        sd.update(load_file(str(f)))
    return sd


def check_shapes(params: cm.Params, init_fn) -> cm.Params:
    """Compare an imported tree against ``jax.eval_shape(init_fn)`` leaf by
    leaf — GQA-layout / transpose / naming errors fail HERE, not at serve
    time. Returns ``params`` unchanged on success."""
    expected = jax.eval_shape(init_fn)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, exp in jax.tree_util.tree_flatten_with_path(expected)[0]:
        got = flat_got.get(path)
        if got is None:
            raise KeyError(
                f"missing imported weight at {jax.tree_util.keystr(path)}"
            )
        if tuple(got.shape) != tuple(exp.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path)}: "
                f"imported {tuple(got.shape)} != expected {tuple(exp.shape)}"
            )
    return params


def mlp2_from_sd(sd: dict, prefix: str, what: str) -> cm.Params:
    """Import a 2-layer MLP published under any of the common naming
    schemes: ``{linear_1, linear_2}`` (LLaVA-style), ``{proj.0, proj.2}``
    or bare ``{0, 2}`` (nn.Sequential). -> {"linear_1", "linear_2"}."""

    def lin(name):
        return {"kernel": np.asarray(sd[f"{prefix}.{name}.weight"]).T.copy(),
                "bias": np.asarray(sd[f"{prefix}.{name}.bias"])}

    names = [k[len(prefix) + 1:] for k in sd if k.startswith(prefix + ".")]
    for first, second in (("linear_1", "linear_2"), ("proj.0", "proj.2"),
                          ("0", "2")):
        if any(n.startswith(first + ".") for n in names):
            out = {"linear_1": lin(first)}
            if any(n.startswith(second + ".") for n in names):
                out["linear_2"] = lin(second)
            return out
    raise KeyError(
        f"no {what} weights under {prefix!r} (saw {sorted(names)[:4]}...)"
    )


def slice_vocab_rows(arr: np.ndarray, vocab_size: int, what: str) -> np.ndarray:
    """Checkpoints often pad the embedding/unembedding tables past the
    logical vocab (alignment, reserved ids). Slice the leading rows down to
    ``vocab_size``; growing a table is NOT inferable and stays an error."""
    arr = np.asarray(arr)
    if arr.shape[0] < vocab_size:
        raise ValueError(
            f"{what}: checkpoint has {arr.shape[0]} vocab rows < configured "
            f"{vocab_size}"
        )
    if arr.shape[0] > vocab_size:
        import logging

        logging.getLogger("intact_tpu.hf_import").info(
            "%s: slicing %d checkpoint vocab rows to configured %d",
            what, arr.shape[0], vocab_size,
        )
        arr = arr[:vocab_size]
    return arr
