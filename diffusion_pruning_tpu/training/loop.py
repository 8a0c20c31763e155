"""Training orchestration: the loop around the jitted steps.

The reference `Pruner.train` (trainer.py:852-1024) / `FineTuner.train`
(:1559-1681) lifecycle, host-side: epoch iteration, the hypernet-pretraining
phase switch, NaN-skip accounting, periodic validation, checkpoint save /
rotation / resume (reference-compatible artifact layout), metric tracking.
The device work is entirely inside the jitted step functions
(training/pruner.py, training/finetuner.py); this file never traces.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_pruning_tpu.utils.checkpoint import CheckpointManager
from diffusion_pruning_tpu.utils.logging_utils import Tracker

logger = logging.getLogger("diffusion_pruning_tpu")


@dataclasses.dataclass
class LoopConfig:
    max_train_steps: int = 5000
    hypernet_pretraining_steps: int = 500
    validation_steps: int = 1000
    image_logging_steps: int = 1000
    checkpoint_steps: Optional[int] = None   # None = per epoch
    checkpoints_total_limit: int = 1
    log_every: int = 10
    resume_from: Optional[str] = None        # 'latest' or a step number


class PrunerLoop:
    """Stage-1 loop. Step functions are built lazily per phase (pretrain vs
    quantized) — the only retrace boundary in the run."""

    def __init__(self, mods, cfg, loop_cfg: LoopConfig, optimizer,
                 make_step: Callable, make_val: Callable,
                 trainable, frozen, run_dir: str, mesh=None,
                 tracker: Optional[Tracker] = None, seed: int = 43,
                 ema_decay: Optional[float] = None):
        self.mods, self.cfg, self.loop_cfg = mods, cfg, loop_cfg
        self.optimizer = optimizer
        self.mesh = mesh
        self.trainable, self.frozen = trainable, frozen
        self.opt_state = optimizer.init(trainable)
        self.q_state = mods.quantizer.init_state(trainable["quantizer"])
        self.step_fns = {
            True: make_step(mods, cfg, optimizer, mesh=mesh, pretrain=True, donate=True),
            False: make_step(mods, cfg, optimizer, mesh=mesh, pretrain=False, donate=True),
        }
        self.val_fn = make_val(mods, cfg, mesh=mesh)
        self.ckpt = CheckpointManager(run_dir, loop_cfg.checkpoints_total_limit)
        self.tracker = tracker or Tracker(run_dir)
        self.run_dir = run_dir
        self.image_logger: Optional[Callable] = None  # called every image_logging_steps
        self.export_reference_format = True
        self.export_unet_ref = None                   # (UNetConfig, params) to also export unet/
        self.global_step = 0
        self.key = jax.random.PRNGKey(seed)
        # EMA of the stage-1 trainables (hypernet + quantizer) — the
        # reference only offers EMA for stage-2 U-Nets; here it is cheap
        # (the trainables are a few MB) and steadies the router late in the run
        self.ema_decay = ema_decay
        self.ema_trainable = jax.tree.map(lambda x: x, trainable) if ema_decay else None
        self._ema_update = jax.jit(
            lambda e, p: jax.tree.map(
                lambda a, b: a * ema_decay + b.astype(a.dtype) * (1.0 - ema_decay), e, p)
        ) if ema_decay else None

    # ------------------------------------------------------------------

    def log_heatmaps(self, aux):
        """Codebook pairwise-similarity + per-prompt resource heatmaps (the
        reference's wandb panels, trainer.py:972-1001, logging_utils.py:8-43)."""
        import os
        from diffusion_pruning_tpu.utils.logging_utils import heatmap_image
        out = os.path.join(self.run_dir, "heatmaps")
        os.makedirs(out, exist_ok=True)
        codes = (np.asarray(self.q_state["embedding_gs"]) >= 0.5).astype(np.float32)
        codes = codes / (np.linalg.norm(codes, axis=1, keepdims=True) + 1e-9)
        sim_img = heatmap_image(codes @ codes.T)
        sim_img.save(os.path.join(out, f"codebook_sim_{self.global_step}.png"))
        ratios = np.asarray(aux["batch_resource_ratios"]).reshape(-1, 1)
        ratio_img = heatmap_image(ratios)
        ratio_img.save(
            os.path.join(out, f"batch_resource_ratios_{self.global_step}.png"))
        # wandb panels when the tracker is live (trainer.py:972-1001)
        self.tracker.log_images({"codebook_similarity": sim_img,
                                 "batch_resource_ratios": ratio_img},
                                self.global_step)

    def state_dict(self) -> Dict[str, Any]:
        state = {"trainable": self.trainable, "opt_state": self.opt_state,
                 "q_state": self.q_state, "step": np.asarray(self.global_step)}
        if self.ema_trainable is not None:
            state["ema_trainable"] = self.ema_trainable
        return state

    def save_checkpoint(self):
        artifacts = {
            # The reference saves the training-noise embedding_gs snapshot
            # itself (trainer.py:274) — the SAME tensor eval routing uses —
            # not a fixed-key gumbel re-realisation, which would flip
            # borderline gates and desync experts from the router.
            "quantizer_embeddings.pt": np.asarray(self.q_state["embedding_gs"]),
        }
        path = self.ckpt.save(self.global_step, self.state_dict(), artifacts)
        if self.export_reference_format:
            # diffusers-style hypernet/ + quantizer/ subfolders, the
            # reference's inter-stage interface (trainer.py:253-313). unet/
            # is opt-in via self.export_unet_ref = (cfg, params): the U-Net
            # is frozen in stage 1, so it equals the pretrained weights.
            try:
                from diffusion_pruning_tpu.utils.export import export_pruning_checkpoint
                ucfg, uparams = self.export_unet_ref or (None, None)
                export_pruning_checkpoint(
                    path, self.mods.hypernet, self.trainable["hypernet"],
                    self.mods.quantizer, self.trainable["quantizer"], self.q_state,
                    unet_cfg=ucfg, unet_params=uparams)
            except ImportError as e:  # safetensors unavailable
                logger.warning("reference-format export skipped: %s", e)
        logger.info("saved checkpoint %s", path)

    def maybe_resume(self):
        if self.loop_cfg.resume_from is None:
            return
        step = None if self.loop_cfg.resume_from == "latest" else int(self.loop_cfg.resume_from)
        restored = self.ckpt.restore(step, template=self.state_dict())
        self.trainable = restored["trainable"]
        self.opt_state = restored["opt_state"]
        self.q_state = restored["q_state"]
        if self.ema_trainable is not None:
            self.ema_trainable = restored["ema_trainable"]
        self.global_step = int(restored["step"])
        logger.info("resumed from step %d", self.global_step)

    # ------------------------------------------------------------------

    def train(self, train_batches: Callable[[int], Iterable[Dict[str, np.ndarray]]],
              val_batches: Optional[Callable[[], Iterable]] = None,
              place_batch: Optional[Callable] = None):
        """train_batches(epoch) yields host batches; place_batch shards them
        onto the mesh (parallel.shard_batch) when running SPMD."""
        lc = self.loop_cfg
        self.maybe_resume()
        epoch = 0
        t_last = time.perf_counter()
        while self.global_step < lc.max_train_steps:
            for batch in train_batches(epoch):
                if self.global_step >= lc.max_train_steps:
                    break
                pretrain = self.global_step < lc.hypernet_pretraining_steps
                if place_batch is not None:
                    batch = place_batch(batch)
                batch = {k: v for k, v in batch.items()
                         if k in ("pixel_values", "input_ids", "mpnet_embeddings",
                                  "latent_mean", "latent_logvar")}
                self.key, sub = jax.random.split(self.key)
                (self.trainable, self.opt_state, self.q_state,
                 metrics, aux) = self.step_fns[pretrain](
                    self.trainable, self.frozen, self.opt_state, batch, sub)
                if self.ema_trainable is not None:
                    self.ema_trainable = self._ema_update(self.ema_trainable,
                                                          self.trainable)
                self.global_step += 1

                if self.global_step % lc.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    now = time.perf_counter()
                    m["steps_per_sec"] = lc.log_every / (now - t_last)
                    t_last = now
                    # expert-usage histogram (router balance observability)
                    counts = np.bincount(np.asarray(aux["expert_indices"]),
                                         minlength=self.mods.quantizer.n_e)
                    for e, c in enumerate(counts):
                        m[f"expert_usage/{e}"] = int(c)
                    self.tracker.log(m, self.global_step)
                    logger.info("step %d loss %.4f ratio %.3f experts %s (%.2f it/s)",
                                self.global_step, m["loss"], m["resource_ratio"],
                                counts.tolist(), m["steps_per_sec"])

                if val_batches is not None and self.global_step % lc.validation_steps == 0:
                    self.validate(val_batches, place_batch)
                if lc.image_logging_steps and self.global_step % lc.image_logging_steps == 0:
                    self.log_heatmaps(aux)
                    if self.image_logger is not None:
                        self.image_logger(self)
                if lc.checkpoint_steps and self.global_step % lc.checkpoint_steps == 0:
                    self.save_checkpoint()
            epoch += 1
            if not lc.checkpoint_steps:
                self.save_checkpoint()
        self.save_checkpoint()

    def validate(self, val_batches, place_batch=None):
        agg: Dict[str, list] = {}
        for batch in val_batches():
            if place_batch is not None:
                batch = place_batch(batch)
            batch = {k: v for k, v in batch.items()
                     if k in ("pixel_values", "input_ids", "mpnet_embeddings",
                                  "latent_mean", "latent_logvar")}
            self.key, sub = jax.random.split(self.key)
            m = self.val_fn(self.trainable, self.frozen, batch, sub)
            for k, v in m.items():
                agg.setdefault(k, []).append(float(v))
        means = {f"val_{k}": float(np.mean(v)) for k, v in agg.items()}
        self.tracker.log(means, self.global_step)
        logger.info("validation @%d: %s", self.global_step,
                    {k: round(v, 4) for k, v in means.items()})
        return means


class FineTuneLoop:
    """Stage-2 loop (expert or baseline fine-tuning)."""

    def __init__(self, step_fn, val_fn, student_params, frozen, optimizer,
                 loop_cfg: LoopConfig, run_dir: str,
                 arch_vector: Optional[np.ndarray] = None,
                 tracker: Optional[Tracker] = None, seed: int = 43,
                 ema_decay: Optional[float] = None,
                 opt_state: Optional[Any] = None):
        self.step_fn, self.val_fn = step_fn, val_fn
        # copy: expert params share unsliced leaves with the frozen teacher
        # (slice_expert_params is zero-copy); a donating step would otherwise
        # delete the teacher's buffers
        self.params = jax.tree.map(jnp.copy, student_params)
        self.frozen = frozen
        # opt_state override: ZeRO-1 states come pre-sharded from
        # parallel.zero1.init_global_opt_state
        self.opt_state = opt_state if opt_state is not None else optimizer.init(self.params)
        self.loop_cfg = loop_cfg
        self.ckpt = CheckpointManager(run_dir, loop_cfg.checkpoints_total_limit)
        self.tracker = tracker or Tracker(run_dir)
        self.arch_vector = arch_vector
        self.global_step = 0
        self.key = jax.random.PRNGKey(seed)
        # EMA of student params (the reference's use_ema / EMAModel option)
        self.ema_decay = ema_decay
        self.ema_params = jax.tree.map(lambda x: x, student_params) if ema_decay else None
        self._ema_update = jax.jit(
            lambda e, p: jax.tree.map(
                lambda a, b: a * ema_decay + b.astype(a.dtype) * (1.0 - ema_decay), e, p)
        ) if ema_decay else None

    def save_checkpoint(self):
        artifacts = {}
        if self.arch_vector is not None:
            # fine-tuning copies arch_vector.pt beside every checkpoint
            # (trainer.py:1656-1661)
            artifacts["arch_vector.pt"] = np.asarray(self.arch_vector)
        state = {"params": self.params, "opt_state": self.opt_state,
                 "step": np.asarray(self.global_step)}
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        self.ckpt.save(self.global_step, state, artifacts)

    def maybe_resume(self):
        if self.loop_cfg.resume_from is None:
            return
        step = None if self.loop_cfg.resume_from == "latest" else int(self.loop_cfg.resume_from)
        template = {"params": self.params, "opt_state": self.opt_state,
                    "step": np.asarray(self.global_step)}
        if self.ema_params is not None:
            template["ema_params"] = self.ema_params
        restored = self.ckpt.restore(step, template=template)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        if self.ema_params is not None:
            self.ema_params = restored["ema_params"]
        self.global_step = int(restored["step"])

    def train(self, train_batches, place_batch=None):
        lc = self.loop_cfg
        self.maybe_resume()
        epoch = 0
        while self.global_step < lc.max_train_steps:
            for batch in train_batches(epoch):
                if self.global_step >= lc.max_train_steps:
                    break
                if place_batch is not None:
                    batch = place_batch(batch)
                batch = {k: v for k, v in batch.items()
                         if k in ("pixel_values", "input_ids", "latent_mean", "latent_logvar")}
                self.key, sub = jax.random.split(self.key)
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.frozen, self.opt_state, batch, sub)
                if self.ema_params is not None:
                    self.ema_params = self._ema_update(self.ema_params, self.params)
                self.global_step += 1
                if self.global_step % lc.log_every == 0:
                    self.tracker.log({k: float(v) for k, v in metrics.items()},
                                     self.global_step)
            epoch += 1
            if not lc.checkpoint_steps:
                self.save_checkpoint()
        self.save_checkpoint()
