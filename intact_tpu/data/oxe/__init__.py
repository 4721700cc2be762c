"""Open-X-Embodiment dataset registry: per-dataset schemas, mixes, and
standardization transforms (reference `src/data/oxe/*`, SURVEY.md §2.3)."""

from intact_tpu.data.oxe.registry import (
    OXE_DATASET_CONFIGS,
    OXE_NAMED_MIXES,
    make_oxe_dataset_kwargs_and_weights,
)

__all__ = [
    "OXE_DATASET_CONFIGS",
    "OXE_NAMED_MIXES",
    "make_oxe_dataset_kwargs_and_weights",
]
