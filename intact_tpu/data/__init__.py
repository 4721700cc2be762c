"""Input pipeline: RLDS-style trajectory data -> training batches.

Backends:
  rlds       tf.data over RLDS/TFRecord shards (host CPU, gated on tensorflow)
  synthetic  deterministic generated bridge-like episodes (tests, benches,
             and machines without the OXE datasets)

Batch schema (reference parity, `src/data/rlds_dataset.py` +
`agent/dataset.py`):
  observation/image_primary  uint8 [B, T, H, W, C]
  observation/proprio        float32 [B, T, D]
  observation/timestep_pad_mask  bool [B, T]
  task/language_instruction  bytes [B]
  action                     float32 [B, T, horizon, dim]
  action_pad_mask            bool [B, T, horizon, dim]
"""

from intact_tpu.data.dataset import InterleavedDataset

__all__ = ["InterleavedDataset"]
