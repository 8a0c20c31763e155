"""Checkpoint / resume with the reference's on-disk contract.

The reference saves per-epoch `checkpoint-{step}` dirs containing diffusers
subfolders `unet/ hypernet/ quantizer/` plus raw `quantizer_embeddings.pt`
(trainer.py:253-313), rotates to `checkpoints_total_limit` (:392-417) and
resumes "latest" by name sort (:419-454); fine-tuning copies
`arch_vector.pt` beside every checkpoint (:1656-1661). The pruning
checkpoint dir is the interface artifact between stages.

Here: orbax-checkpoint holds the actual state (params/opt/step) under
`state/`, and the interface artifacts (`quantizer_embeddings.pt`,
`arch_vector.pt`, `{ds}_{split}_mapped_indices.pt`) are written with
torch.save so the reference's downstream scripts read them unchanged.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import numpy as np
import jax


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def save_torch_artifact(obj, path: str) -> None:
    """torch.save for reference-format artifacts (.pt)."""
    import torch
    if isinstance(obj, (np.ndarray,)):
        obj = torch.from_numpy(np.asarray(obj))
    elif hasattr(obj, "dtype") and hasattr(obj, "shape"):  # jax array
        obj = torch.from_numpy(np.asarray(obj))
    torch.save(obj, path)


def load_torch_artifact(path: str) -> np.ndarray:
    import torch
    # weights_only=True: these artifacts are always plain tensors/containers;
    # never allow arbitrary-code unpickling.
    t = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(t, torch.Tensor):
        return t.numpy()
    return t


def latest_checkpoint_dir(root: str) -> Optional[str]:
    """Newest `checkpoint-{step}` subdir by STEP NUMBER (lexicographic sort
    would pick checkpoint-999 over checkpoint-1000). Returns None if absent."""
    steps = []
    for name in os.listdir(root):
        m = _CKPT_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    return os.path.join(root, f"checkpoint-{max(steps)}") if steps else None


class CheckpointManager:
    """Step-indexed checkpoints with rotation + 'latest' resume."""

    def __init__(self, root: str, total_limit: Optional[int] = 1):
        self.root = root
        self.total_limit = total_limit
        os.makedirs(root, exist_ok=True)

    # ---------------- listing ----------------

    def list_steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.root):
            m = _CKPT_RE.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.list_steps()
        return steps[-1] if steps else None

    def dir_for(self, step: int) -> str:
        return os.path.join(self.root, f"checkpoint-{step}")

    # ---------------- save / restore ----------------

    def save(self, step: int, state: Dict[str, Any],
             artifacts: Optional[Dict[str, Any]] = None) -> str:
        """state: pytree dict (params/opt_state/...); artifacts: name→array
        written as reference-format .pt files next to the orbax state."""
        path = self.dir_for(step)
        os.makedirs(path, exist_ok=True)
        ocp = _ocp()
        ckptr = ocp.StandardCheckpointer()
        state_host = jax.tree.map(np.asarray, state)
        ckptr.save(os.path.abspath(os.path.join(path, "state")), state_host, force=True)
        ckptr.wait_until_finished()
        for name, obj in (artifacts or {}).items():
            save_torch_artifact(obj, os.path.join(path, name))
        self._rotate()
        return path

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.root}")
        ocp = _ocp()
        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(os.path.join(self.dir_for(step), "state"))
        if template is not None:
            target = jax.tree.map(np.asarray, template)
            return ckptr.restore(path, target=target)
        return ckptr.restore(path)

    def _rotate(self) -> None:
        if not self.total_limit:
            return
        steps = self.list_steps()
        while len(steps) > self.total_limit:
            victim = steps.pop(0)
            shutil.rmtree(self.dir_for(victim), ignore_errors=True)
