"""Synthetic-validation utilities for the APTP mechanism.

Convergence of the stage-1 router can be validated without pretrained SD
weights — but NOT with plain random weights: real pretrained U-Nets have
redundancy (the premise of pruning), while with fully random weights every
channel is equally "important", the dense point is the true optimum of the
distillation/block terms, and the codebook parks at ratio 1.0 (observed on
the 5k-step on-chip run, CONVERGENCE.md). Two ingredients restore the
property the mechanism needs:

1. `plant_redundancy` — damp a random fraction of gate units so pruning
   them is genuinely cheap (~eps² distillation cost);
2. `PrunerConfig.self_distill_target=True` — use the dense teacher's
   prediction as the diffusion target (a frozen random U-Net can't denoise
   anything, making the ε/v target pure gradient noise that drowns the
   resource signal).

Used by scripts/other/convergence_run.py (full-schedule on-chip evidence)
and tests/test_convergence_tiny.py (CI regression at miniature scale).
"""
from __future__ import annotations

import numpy as np
import jax


def plant_redundancy(spec, dense_unet, keep=0.5, eps=0.02, seed=123):
    """Damp a random `1-keep` fraction of gate units in the dense weights.

    Damping points mirror models/unet/pruned.py's slice map:
      resnet hidden groups → norm2.scale slabs (the gate sits between conv1
        and norm2, whose GroupNorm is scale-invariant per group — the
        learned γ is the group's true magnitude knob);
      attention heads → to_v columns (output contribution scales with v);
      GEGLU units → act.proj columns (both halves).

    Returns (damped_params, planted_prunable_fraction)."""
    from diffusion_pruning_tpu.models.unet.pruned import _expand_units, _module_name
    rng = np.random.RandomState(seed)
    kept_mask = rng.rand(spec.num_width) < keep
    # mimic the non-zero-width rescue: first unit of every site stays
    for sb in spec.subblocks:
        for site in sb.sites:
            kept_mask[site.start] = True

    def damp(tree):
        tree = jax.tree.map(lambda x: x, tree)  # shallow-copy containers
        for sb in spec.subblocks:
            mod = _module_name(sb.name)
            for site in sb.sites:
                dropped = np.nonzero(
                    ~kept_mask[site.start: site.start + site.width])[0]
                if len(dropped) == 0:
                    continue
                unit = site.channels // site.width
                ch = _expand_units(tuple(int(i) for i in dropped), unit)
                if sb.kind == "resnet":
                    p = tree[mod]["norm2"]
                    p["scale"] = p["scale"].at[ch].multiply(eps)
                else:
                    tb = tree[mod]["transformer_blocks_0"]
                    if site.kind in ("attn1", "attn2"):
                        p = tb[site.kind]["to_v"]
                        p["kernel"] = p["kernel"].at[:, ch].multiply(eps)
                    elif site.kind == "ff":
                        p = tb["ff"]["act"]["proj"]
                        ch2 = np.concatenate([ch, site.channels + ch])
                        p["kernel"] = p["kernel"].at[:, ch2].multiply(eps)
        return tree

    planted_prunable = float(kept_mask.mean())
    return jax.jit(damp)(dense_unet), planted_prunable
