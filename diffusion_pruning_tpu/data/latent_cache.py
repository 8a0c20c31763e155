"""Latent caching: precompute VAE latents once, train from them directly.

The reference re-encodes every image through the frozen VAE every step
(trainer.py:1097-1098) — at 256px/batch-64 that is a meaningful slice of the
step. Since the VAE is frozen, its latent *distribution parameters* are
deterministic per image: cache (mean, logvar) once (center-crop, no flip)
and sample fresh noise per step from the cache. Horizontal-flip augmentation
is preserved by flipping the latent spatially (the SD VAE is
convolutional, so flip(encode(x)) ≈ encode(flip(x)) up to edge effects).

Cache format: one .npz per shard: means/logvars (N, h, w, C), plus captions.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def build_latent_cache(
    pipeline_batches: Iterator[Dict[str, np.ndarray]],
    encode_moments: Callable[[jax.Array], tuple],
    out_dir: str,
    shard_size: int = 2048,
) -> List[str]:
    """encode_moments(pixels) -> (mean, logvar); batches must be
    deterministic (train=False pipeline). Returns shard paths."""
    os.makedirs(out_dir, exist_ok=True)
    shards, means, logvars, caps = [], [], [], []
    count = 0

    def flush():
        nonlocal means, logvars, caps
        if not means:
            return
        path = os.path.join(out_dir, f"latents_{len(shards):05d}.npz")
        np.savez(path,
                 mean=np.concatenate(means),
                 logvar=np.concatenate(logvars),
                 caption=np.asarray(
                     [c for chunk in caps for c in chunk], dtype=object))
        shards.append(path)
        means, logvars, caps = [], [], []

    for batch in pipeline_batches:
        m, lv = encode_moments(jnp.asarray(batch["pixel_values"]))
        means.append(np.asarray(m, np.float16))
        logvars.append(np.asarray(lv, np.float16))
        caps.append(list(batch["captions"]))
        count += len(batch["captions"])
        if count >= shard_size:
            flush()
            count = 0
    flush()
    return shards


class LatentPipeline:
    """Batches of cached latent moments (+ optional flip augmentation).

    Yields {'latent_mean', 'latent_logvar', 'captions'}; the train step
    samples z = mean + exp(logvar/2)·ε with its own PRNG and multiplies by
    the VAE scaling factor."""

    def __init__(self, cache_dir: str, batch_size: int, train: bool = True,
                 random_flip: bool = True, seed: int = 0,
                 tokenize_clip: Optional[Callable] = None,
                 tokenize_mpnet: Optional[Callable] = None):
        paths = sorted(os.path.join(cache_dir, f) for f in os.listdir(cache_dir)
                       if f.startswith("latents_") and f.endswith(".npz"))
        if not paths:
            raise FileNotFoundError(f"no latent shards in {cache_dir}")
        means, logvars, caps = [], [], []
        for p in paths:
            z = np.load(p, allow_pickle=True)
            means.append(z["mean"])
            logvars.append(z["logvar"])
            caps.extend(z["caption"].tolist())
        self.mean = np.concatenate(means)
        self.logvar = np.concatenate(logvars)
        self.captions = caps
        self.batch_size = batch_size
        self.train = train
        self.random_flip = random_flip
        self.seed = seed
        self.tokenize_clip = tokenize_clip
        self.tokenize_mpnet = tokenize_mpnet

    def __len__(self):
        return len(self.captions) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(len(self.captions))
        rng = np.random.RandomState(self.seed + epoch)
        if self.train:
            rng.shuffle(idx)
        for b in range(len(self)):
            sl = idx[b * self.batch_size:(b + 1) * self.batch_size]
            m = self.mean[sl].astype(np.float32)
            lv = self.logvar[sl].astype(np.float32)
            if self.train and self.random_flip:
                flips = rng.rand(len(sl)) < 0.5
                m[flips] = m[flips, :, ::-1, :]
                lv[flips] = lv[flips, :, ::-1, :]
            caps = [self.captions[i] for i in sl]
            out: Dict[str, np.ndarray] = {
                "latent_mean": m, "latent_logvar": lv,
                "captions": np.asarray(caps, dtype=object),
            }
            if self.tokenize_clip is not None:
                out["input_ids"] = self.tokenize_clip(caps)
            if self.tokenize_mpnet is not None:
                out.update(self.tokenize_mpnet(caps))
            yield out
