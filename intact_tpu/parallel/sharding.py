"""Parameter / activation sharding rules.

Rules are (regex over the "/"-joined param path) -> PartitionSpec, applied
first-match-wins. Specs are sanitized against actual shapes: any axis whose
mesh size does not divide the dimension is dropped (so the same rules work
for tiny test configs and full 3B models).

Layout strategy (megatron-style TP + ZeRO-3 fsdp):
  * matmul "in" kernels  [.., D_model, D_hidden] -> (fsdp, tensor)
  * matmul "out" kernels [.., D_hidden, D_model] -> (tensor, fsdp)
  * embeddings [vocab, D] -> (tensor, fsdp)
  * stacked blocks carry a leading layer axis (never sharded)
  * norms / biases / small projections -> replicated
Activations: batch axis over (data, fsdp), model dims unsharded (XLA
re-shards intermediates as needed around the TP collectives).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# first-match-wins; paths are "/"-joined key paths like
# "vlm/blocks/attn/q/kernel"
DEFAULT_RULES: list[tuple[str, P]] = [
    # embeddings (embedding_q/embed_scale: int8 serving form, same layout)
    (r".*embed/embedding(_q)?$", P("tensor", "fsdp")),
    (r".*embed/embed_scale$", P("tensor")),
    # AR unembedding (magma lm_head) — [D, V]: contraction over fsdp
    (r".*lm_head/kernel(_q)?$", P("fsdp", "tensor")),
    # attention projections (stacked: leading layer axis)
    (r".*blocks/attn/[qkv]/kernel(_q)?$", P(None, "fsdp", "tensor")),
    (r".*blocks/attn/o/kernel(_q)?$", P(None, "tensor", "fsdp")),
    (r".*blocks/attn/[qkvo]/bias$", P()),
    # gated / vit MLPs
    (r".*blocks/mlp/(gate|up|fc1)/kernel(_q)?$", P(None, "fsdp", "tensor")),
    (r".*blocks/mlp/(down|fc2)/kernel(_q)?$", P(None, "tensor", "fsdp")),
    (r".*blocks/mlp/fc1/bias$", P(None, "tensor")),
    # mvla expert self/cross pair stacks: same layout as blocks (leading
    # pair axis); previously fell to the replicated catch-all
    (r".*pairs/(self|cross)/attn/[qkv]/kernel(_q)?$", P(None, "fsdp", "tensor")),
    (r".*pairs/(self|cross)/attn/o/kernel(_q)?$", P(None, "tensor", "fsdp")),
    (r".*pairs/(self|cross)/mlp/(gate|up)/kernel(_q)?$", P(None, "fsdp", "tensor")),
    (r".*pairs/(self|cross)/mlp/down/kernel(_q)?$", P(None, "tensor", "fsdp")),
    # Glue projections (img_proj / time fusion / action heads): REPLICATED
    # on purpose. They are a few MB each, and tensor/fsdp-sharding their
    # contraction or output dims forces the SPMD partitioner to reshard the
    # batch-sharded activations around microscopic matmuls ("involuntary
    # full rematerialization" all-gathers in the jvp) — the collectives cost
    # more than the sharding saves.
    (r".*(img_proj|time_mlp_in|time_mlp_out)/kernel$", P()),
    (r".*(state_proj|action_in_proj|action_out_proj)/kernel$", P()),
    # conv patch embed: shard output channels
    (r".*patch_embed/kernel$", P(None, None, None, "tensor")),
    # everything else (norms, biases, pos_embed) replicated
    (r".*", P()),
]


def keystr(entry) -> str:
    """One pytree path entry -> plain string (DictKey/GetAttrKey/SequenceKey)."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _path_str(path) -> str:
    return "/".join(keystr(p) for p in path)


def _sanitize(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharded axes that don't divide the dimension (or overflow rank)."""
    if len(spec) > len(shape):
        spec = P(*spec[: len(shape)])
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        out.append(axis if dim % size == 0 else None)
    return P(*out)


def spec_for_path(path_str: str, shape, mesh: Mesh, rules=None) -> P:
    for pattern, spec in rules or DEFAULT_RULES:
        if re.match(pattern, path_str):
            return _sanitize(spec, tuple(shape), mesh)
    return P()


def param_shardings(params, mesh: Mesh, rules=None):
    """Param pytree -> matching tree of NamedSharding."""

    def to_sharding(path, leaf):
        spec = spec_for_path(_path_str(path), leaf.shape, mesh, rules)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def param_specs(params, mesh: Mesh, rules=None):
    """Param pytree -> matching tree of PartitionSpec (for orbax metadata)."""

    def to_spec(path, leaf):
        return spec_for_path(_path_str(path), leaf.shape, mesh, rules)

    return jax.tree_util.tree_map_with_path(to_spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over the combined (data, fsdp) axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global_batch(batch, sharding: NamedSharding):
    """This process's host-local batch rows -> one global device array.

    Single-process: a plain device_put. Multi-host: each process feeds ONLY
    its own rows (the data pipeline shards episodes by process and batches
    at micro_batch/process_count), and the global array is assembled from
    process-local data — no host ever decodes/tokenizes rows another host's
    devices will consume. Replaces the reference's DistributedSampler +
    per-rank DataLoader split (src/agent/trainer.py:144-163) without any
    cross-host gather: rows land directly on the local devices.
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def local_rows(global_array):
    """This process's rows of a batch-sharded global array (numpy),
    concatenated in global-position order (the order put_global_batch
    consumed the host batch). Deduplicates batch-replicated shards (e.g.
    the tensor axis).

    The array must be partitioned on the LEADING axis only — a jit output
    needs its out_shardings pinned to batch_sharding(mesh), since a
    compiler-chosen sharding may split a non-batch axis (which would make
    the start-of-batch dedup keep one arbitrary partial-feature block per
    row range). Raises in that case rather than returning truncated data.
    """
    import numpy as np

    shape = global_array.shape
    seen: dict[int, np.ndarray] = {}
    for s in global_array.addressable_shards:
        for d, sl in enumerate(s.index[1:], start=1):
            if (sl.start or 0) != 0 or (sl.stop is not None and sl.stop != shape[d]):
                raise ValueError(
                    f"local_rows needs batch-only sharding, but axis {d} is "
                    f"partitioned ({global_array.sharding}); pin the "
                    "producing jit's out_shardings to batch_sharding(mesh)"
                )
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)])
