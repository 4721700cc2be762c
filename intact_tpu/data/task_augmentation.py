"""Task (language) augmentation: instruction paraphrasing.

Reference parity (`src/data/utils/task_augmentation.py:53-97`): a paraphrase
table maps instructions to rephrasings; during training each frame keeps its
original instruction with probability 1 - rephrase_prob, otherwise samples a
paraphrase. The reference pulls a pickle from the HF hub
(`rail-berkeley/OXE_paraphrases`) into a tf StaticHashTable; here the table
loads from a local JSON (hub download optional/gated) and is applied either
in-graph (tf) or on numpy batches, both seeded.

`delete_task_conditioning` supports goal-image-only training by blanking
instructions with some probability.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


class Rephraser:
    def __init__(self, table: dict[str, list[str]] | str | Path,
                 rephrase_prob: float = 0.5, seed: int = 0):
        if isinstance(table, (str, Path)):
            with open(table) as f:
                table = json.load(f)
        self.table = {k: list(v) for k, v in table.items()}
        self.rephrase_prob = rephrase_prob
        self._rng = np.random.default_rng(seed)

    @classmethod
    def from_hub(cls, repo_id: str = "rail-berkeley/OXE_paraphrases", **kw):
        """Load the upstream paraphrase corpus (needs network + hub)."""
        import pickle

        from huggingface_hub import hf_hub_download

        path = hf_hub_download(repo_id=repo_id, filename="paraphrases_oxe.pkl",
                               repo_type="dataset")
        with open(path, "rb") as f:
            raw = pickle.load(f)
        return cls(raw, **kw)

    def rephrase(self, instruction: str) -> str:
        options = self.table.get(instruction)
        if not options or self._rng.uniform() >= self.rephrase_prob:
            return instruction
        return options[int(self._rng.integers(len(options)))]

    def rephrase_batch(self, instructions) -> np.ndarray:
        out = []
        for s in instructions:
            text = s.decode() if isinstance(s, bytes) else str(s)
            out.append(self.rephrase(text).encode())
        return np.asarray(out)

    def to_tf_table(self):
        """Flattened (instruction -> 'p1;p2;...') tf StaticHashTable for
        in-graph use; sampling happens with stateless tf randoms."""
        import tensorflow as tf

        keys = list(self.table.keys())
        values = [";".join(v) for v in self.table.values()]
        return tf.lookup.StaticHashTable(
            tf.lookup.KeyValueTensorInitializer(
                tf.constant(keys), tf.constant(values)
            ),
            default_value="",
        )


def rephrase_instruction_tf(frame: dict, table, rephrase_prob: float, seed) -> dict:
    """In-graph rephrasing (tf): pick a random paraphrase with prob p."""
    import tensorflow as tf

    instr = frame["task"]["language_instruction"]
    joined = table.lookup(instr)
    seeds = tf.unstack(tf.random.experimental.stateless_split(seed, num=2), num=2)

    def pick():
        options = tf.strings.split(joined, ";")
        n = tf.shape(options)[0]
        idx = tf.random.stateless_uniform([], seeds[0], 0, n, dtype=tf.int32)
        return options[idx]

    use = tf.logical_and(
        tf.strings.length(joined) > 0,
        tf.random.stateless_uniform([], seeds[1]) < rephrase_prob,
    )
    frame["task"]["language_instruction"] = tf.cond(use, pick, lambda: instr)
    return frame


def rephrase_instruction_traj_tf(traj: dict, table, rephrase_prob: float, seed) -> dict:
    """Trajectory-level rephrasing (reference `task_augmentation.py:53-97`):
    look up paraphrases of the trajectory's instruction, sample one option
    PER FRAME, and keep the originals with one prob-(1-p) coin per trajectory.
    Stateless (seeded), tf-graph safe."""
    import tensorflow as tf

    if "task" not in traj or "language_instruction" not in traj["task"]:
        return traj
    original = traj["task"]["language_instruction"]  # [T] strings
    joined = table.lookup(original[0])
    seeds = tf.unstack(tf.random.experimental.stateless_split(seed, num=2), num=2)

    def augmented():
        # options = original + its paraphrases
        options = tf.concat([[original[0]], tf.strings.split(joined, ";")], axis=0)
        n = tf.shape(options)[0]
        idx = tf.random.stateless_uniform(
            tf.shape(original), seeds[0], 0, n, dtype=tf.int32
        )
        sampled = tf.gather(options, idx)
        use = tf.random.stateless_uniform([], seeds[1]) < rephrase_prob
        return tf.where(use, sampled, original)

    traj["task"]["language_instruction"] = tf.cond(
        tf.strings.length(joined) > 0, augmented, lambda: original
    )
    return traj


def delete_task_conditioning(instructions, keep_prob: float, rng: np.random.Generator):
    """Blank instructions with prob 1-keep_prob (goal-image training mode)."""
    keep = rng.uniform(size=len(instructions)) < keep_prob
    return np.asarray([
        s if k else (b"" if isinstance(s, bytes) else "")
        for s, k in zip(instructions, keep)
    ])
