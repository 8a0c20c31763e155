"""Training losses.

Functional equivalents of /root/reference/pdm/losses/{resource_loss,
contrastive_loss}.py and the min-SNR weighting in pdm/utils/metric_utils.py
+ trainer.py:1197-1216. All pure jnp; jit/grad-safe (the resource loss's
branch is a `jnp.where`, not Python control flow).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def resource_loss(ratio: jax.Array, p: float, loss_type: str = "log") -> jax.Array:
    """Penalty on the mean resource ratio vs target keep-fraction p.

    log: symmetric |log(ratio/p)| (reference resource_loss.py:13-17),
    mae/mse: absolute / squared error.
    """
    if loss_type == "log":
        return jnp.abs(jnp.log(ratio) - jnp.log(p))
    if loss_type == "mae":
        return jnp.abs(ratio - p)
    if loss_type == "mse":
        return (ratio - p) ** 2
    raise ValueError(f"unknown resource loss type {loss_type!r}")


def contrastive_loss(
    prompt_embeddings: jax.Array,
    arch_vectors: jax.Array,
    prompt_temperature: float = 0.03,
    arch_temperature: float = 0.03,
):
    """BCE between the softmaxed self-similarity matrices of the (normalised)
    architecture vectors and prompt embeddings (contrastive_loss.py:11-22).

    Returns (loss, arch_similarity_matrix)."""
    a = arch_vectors / jnp.linalg.norm(arch_vectors, axis=1, keepdims=True)
    t = prompt_embeddings / jnp.linalg.norm(prompt_embeddings, axis=1, keepdims=True)
    a_sim = jax.nn.softmax((a @ a.T) / arch_temperature, axis=-1)
    t_sim = jax.nn.softmax((t @ t.T) / prompt_temperature, axis=-1)
    t_sim = jax.lax.stop_gradient(t_sim)
    eps = 1e-7
    a_c = jnp.clip(a_sim, eps, 1.0 - eps)
    bce = -(t_sim * jnp.log(a_c) + (1.0 - t_sim) * jnp.log(1.0 - a_c))
    return bce.mean(), a_sim


def snr_weights(
    alphas_cumprod: jax.Array,
    timesteps: jax.Array,
    snr_gamma: Optional[float],
    prediction_type: str = "v_prediction",
) -> jax.Array:
    """Min-SNR-γ loss weights (arXiv 2303.09556; trainer.py:1203-1212).

    For v-prediction the SNR is incremented by one before the min/ratio."""
    ac = alphas_cumprod[timesteps]
    snr = ac / (1.0 - ac)
    if snr_gamma is None:
        return jnp.ones_like(snr)
    if prediction_type == "v_prediction":
        snr = snr + 1.0
    return jnp.minimum(snr, snr_gamma) / snr


def diffusion_loss(
    model_pred: jax.Array,
    target: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample-weighted MSE denoising loss (trainer.py:1197-1216)."""
    err = (model_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_sample = err.mean(axis=tuple(range(1, err.ndim)))
    if weights is not None:
        per_sample = per_sample * weights
    return per_sample.mean()
