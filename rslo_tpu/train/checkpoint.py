"""Checkpoint store: orbax-backed with a json index.

The analog of the reference's json-index checkpoint manager
(/root/reference/rslo/torchplus/train/checkpoint.py:10-218): numbered
step checkpoints, ``latest`` resolution, max_to_keep pruning, and
resumable global step + optimizer state.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 8):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: Any, force: bool = False):
        if step in (self.mgr.all_steps() or []):
            return  # idempotent: resuming at a step that was just saved
        self.mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self.mgr.wait_until_finished()

    def latest_step(self):
        return self.mgr.latest_step()

    def preserve(self, step: int):
        """Copy a saved step into the pruning-immune ``ckpt_best/``
        sibling (best-checkpoint retention: max_to_keep prunes oldest
        steps, which on long leg-restarted runs can include the best
        periodic-val step).  Keeps exactly one preserved step."""
        import shutil
        src = self.dir / str(step)
        if not src.exists():
            return
        dst_root = self.dir.parent / "ckpt_best"
        tmp = self.dir.parent / ".ckpt_best.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        shutil.copytree(src, tmp / str(step))
        if dst_root.exists():
            shutil.rmtree(dst_root)
        tmp.rename(dst_root)

    @staticmethod
    def restore_raw_from(path: str) -> dict:
        """Restore another run's latest checkpoint as a raw pytree
        (no template — for warm-start param surgery across differing
        architectures).  ``path`` may be a model dir or its ckpt/."""
        p = Path(path)
        if (p / "ckpt").exists():
            p = p / "ckpt"
        mgr = ocp.CheckpointManager(p.resolve())
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {p}")
        return mgr.restore(step)

    def restore(self, state_template: Any, step: int | None = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        if step not in (self.mgr.all_steps() or []):
            alt = self.dir.parent / "ckpt_best"
            if (alt / str(step)).exists():
                mgr = ocp.CheckpointManager(alt.resolve())
                return mgr.restore(
                    step, args=ocp.args.StandardRestore(state_template))
        return self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
