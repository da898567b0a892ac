"""Checkpoint / resume via orbax.

Reference parity (SURVEY.md C21, §5): the reference saves periodic
``tf.train.Saver`` ckpts and dumps computed codes as ``.npy``; resume is
manual. Here: orbax PyTree checkpoints of {encoder/gan state, step} with
retention, plus the packed gallery as a first-class checkpointable artifact
(ops-level uint32 array + labels). Data order replays deterministically on
resume because batches are step-seeded (data/pipeline.py), so a killed and
restarted run produces bit-identical code output — asserted in
tests/test_checkpoint.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


class CheckpointManager:
    def __init__(self, workdir: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(os.path.join(workdir, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))


def save_gallery(path: str, packed: np.ndarray, labels: np.ndarray,
                 bits: int) -> None:
    """Persist a packed gallery (the index IS an artifact: uint32 codes +
    labels + logical bit width)."""
    np.savez(path, packed=np.asarray(packed), labels=np.asarray(labels),
             bits=np.int32(bits))


def load_gallery(path: str, mmap: bool = False):
    """Load a gallery artifact. ``mmap=True`` memory-maps the packed codes
    (read without copying — for galleries larger than RAM, paired with the
    native CPU scanner in ops/native.py)."""
    z = np.load(path, mmap_mode="r" if mmap else None)
    return z["packed"], z["labels"], int(z["bits"])
