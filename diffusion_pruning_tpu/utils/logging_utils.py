"""Run-directory layout + metrics tracking.

The reference logs scalars/heatmaps/images to wandb through accelerate
trackers (trainer.py:315-343, 938-955) and derives the logging dir from the
config path + run name (logging_utils.py:46-61). Here: a JSONL metrics
tracker (always available) with optional wandb passthrough when the package
exists, and PIL-based heatmap/grid rendering (no seaborn in this image).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("diffusion_pruning_tpu")


def init_logging(run_dir: str, level=logging.INFO) -> None:
    os.makedirs(run_dir, exist_ok=True)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(run_dir, "train.log"))],
        force=True,
    )


def make_run_dir(logging_dir: str, config_path: str, run_name: Optional[str]) -> str:
    base = os.path.splitext(os.path.basename(config_path))[0]
    name = run_name or f"{base}-{time.strftime('%Y%m%d-%H%M%S')}"
    run_dir = os.path.join(logging_dir, base, name)
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


class Tracker:
    """JSONL scalar tracker with optional wandb passthrough."""

    def __init__(self, run_dir: str, project: str = "diffusion-pruning-tpu",
                 run_name: Optional[str] = None, use_wandb: bool = False):
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, name=run_name, dir=run_dir)
            except Exception as e:  # wandb not installed / offline
                logger.warning("wandb unavailable (%s); JSONL tracking only", e)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        clean = {k: float(v) for k, v in metrics.items()
                 if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        self._fh.write(json.dumps({"step": step, **clean}) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def log_images(self, images: Dict[str, "object"], step: int) -> None:
        """Log named PIL images (heatmaps, sample grids) to wandb when live.

        The reference logs its seaborn heatmaps and validation grids via
        `tracker.log({name: wandb.Image(...)})` (trainer.py:938-955); local
        PNG copies are the callers' responsibility (log_heatmaps /
        validation already write them into the run dir).
        """
        if self._wandb is None:
            return
        import wandb
        self._wandb.log({k: wandb.Image(v) for k, v in images.items()},
                        step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def heatmap_image(matrix: np.ndarray, scale: int = 8):
    """Similarity-matrix heatmap as a PIL image (viridis-ish ramp) — the
    reference's seaborn heatmaps (logging_utils.py:8-43) for wandb."""
    from PIL import Image
    m = np.asarray(matrix, dtype=np.float64)
    lo, hi = m.min(), m.max()
    norm = (m - lo) / (hi - lo + 1e-12)
    # simple 3-stop colormap: dark blue → teal → yellow
    stops = np.array([[68, 1, 84], [33, 145, 140], [253, 231, 37]], dtype=np.float64)
    t = norm * 2
    c0 = np.clip(1 - t, 0, 1)[..., None] * stops[0]
    c1 = (1 - np.abs(t - 1)).clip(0, 1)[..., None] * stops[1]
    c2 = np.clip(t - 1, 0, 1)[..., None] * stops[2]
    rgb = np.clip(c0 + c1 + c2, 0, 255).astype(np.uint8)
    img = Image.fromarray(rgb).resize((m.shape[1] * scale, m.shape[0] * scale),
                                      Image.NEAREST)
    return img


def image_grid(images: np.ndarray, cols: int = 4):
    """uint8/float [0,1] NHWC array → single PIL grid image."""
    from PIL import Image
    arr = np.asarray(images)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    n, h, w, c = arr.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i in range(n):
        r, co = divmod(i, cols)
        grid[r * h:(r + 1) * h, co * w:(co + 1) * w] = arr[i]
    return Image.fromarray(grid)
