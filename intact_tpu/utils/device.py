"""Host<->device utilities shared across serving and benchmarks."""

from __future__ import annotations

import numpy as np


def drain_device_queue(tree) -> None:
    """Force completion of all queued device work with ONE tiny host
    readback.

    Through the tunneled TPU, ``jax.block_until_ready`` can return before
    execution completes, and lowering a large jit while earlier programs
    (param init, batch generation) are still in flight hits a pathological
    slow path in the closed-over-constant readback (measured: lower()
    103.8 s with the queue busy vs 0.2 s drained — the round-2 "11x cold
    compile regression"). Reading back the SMALLEST leaf both blocks for
    real and keeps the transfer tiny (a full 3B leaf through the tunnel
    takes minutes). On real hardware this costs microseconds.
    """
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(min(leaves, key=lambda x: x.size))


def float_to_u8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float frames -> uint8, the exact inverse of
    ``native.normalize_u8`` (u8 * 2/255 - 1).

    Serving ships uint8 over the host->device transfer (4x fewer bytes;
    the jitted samplers normalize in-graph). For frames that entered the
    adapter as uint8 pixels — every cv2-resizing adapter resizes uint8 ->
    uint8 before normalizing — this round trip recovers the original pixels exactly (the re-normalize
    matches the host normalize to within 1 float32 ULP; the C fastops path
    may fuse multiply-add where XLA does not).
    Frames interpolated in float space (e.g. a resize after normalize)
    re-quantize with <= 1/255 per-channel rounding, at the noise floor of
    a chain whose source pixels were uint8 to begin with.
    """
    if img.dtype == np.uint8:
        return img
    return np.clip(
        np.round((img.astype(np.float32) + 1.0) * 127.5), 0, 255
    ).astype(np.uint8)
