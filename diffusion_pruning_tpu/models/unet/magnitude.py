"""Magnitude-pruning baseline.

The reference's `UNet2DConditionModelMagnitudePruned`
(/root/reference/pdm/models/unet/unet_2d_conditional.py:2474-2907) runs
torch_pruning's global `MagnitudePruner` (magnitude or random importance,
attention-head channel groups, FF + conv_out ignored). The TPU-native
equivalent ranks the SAME structural units the APTP gates control (resnet
norm-groups, attention heads, GEGLU groups) by the L2 norm of their weight
slices, globally across the network, and keeps the top fraction — emitting a
standard arch vector that drives `make_expert_plan`/`slice_expert_params`.
That reuses one materialisation path for APTP experts and all baselines.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from diffusion_pruning_tpu.core.structure import StructureSpec
from diffusion_pruning_tpu.models.unet.pruned import _module_name


def _unit_scores_resnet(params: dict, width: int) -> np.ndarray:
    conv1 = np.asarray(params["conv1"]["kernel"])      # (k,k,in,out)
    conv2 = np.asarray(params["conv2"]["kernel"])      # (k,k,out,out2)
    temb = np.asarray(params["time_emb_proj"]["kernel"])  # (temb,out)
    unit = conv1.shape[-1] // width
    scores = np.zeros(width)
    for g in range(width):
        sl = slice(g * unit, (g + 1) * unit)
        scores[g] = (np.linalg.norm(conv1[..., sl]) ** 2
                     + np.linalg.norm(temb[:, sl]) ** 2
                     + np.linalg.norm(conv2[:, :, sl, :]) ** 2) ** 0.5
    return scores / (np.sqrt(unit * (conv1.shape[2] + conv2.shape[-1] + temb.shape[0])))


def _unit_scores_attn(params: dict, heads: int) -> np.ndarray:
    q = np.asarray(params["to_q"]["kernel"])
    k = np.asarray(params["to_k"]["kernel"])
    v = np.asarray(params["to_v"]["kernel"])
    o = np.asarray(params["to_out_0"]["kernel"])
    hd = q.shape[-1] // heads
    scores = np.zeros(heads)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        scores[h] = (np.linalg.norm(q[:, sl]) ** 2 + np.linalg.norm(k[:, sl]) ** 2
                     + np.linalg.norm(v[:, sl]) ** 2 + np.linalg.norm(o[sl, :]) ** 2) ** 0.5
    return scores / np.sqrt(hd * (q.shape[0] + k.shape[0] + v.shape[0] + o.shape[1]))


def _unit_scores_ff(params: dict, width: int) -> np.ndarray:
    proj = np.asarray(params["act"]["proj"]["kernel"])  # (C, 2*inner)
    out = np.asarray(params["out"]["kernel"])           # (inner, C)
    inner = out.shape[0]
    unit = inner // width
    scores = np.zeros(width)
    for g in range(width):
        sl = slice(g * unit, (g + 1) * unit)
        sl2 = slice(inner + g * unit, inner + (g + 1) * unit)
        scores[g] = (np.linalg.norm(proj[:, sl]) ** 2 + np.linalg.norm(proj[:, sl2]) ** 2
                     + np.linalg.norm(out[sl, :]) ** 2) ** 0.5
    return scores / np.sqrt(unit * (2 * proj.shape[0] + out.shape[1]))


def magnitude_arch_vector(
    spec: StructureSpec,
    dense_params: dict,
    target_ratio: float,
    random: bool = False,
    seed: int = 0,
) -> np.ndarray:
    """Global top-`target_ratio` keep over all gate units; depth gates on.

    random=True replaces magnitude scores with uniform noise (the reference's
    `importance=RandomImportance` mode)."""
    rng = np.random.RandomState(seed)
    scores = np.zeros(spec.num_width)
    for sb in spec.subblocks:
        mod = dense_params[_module_name(sb.name)]
        for site in sb.sites:
            if random:
                s = rng.rand(site.width)
            elif site.kind == "resnet":
                s = _unit_scores_resnet(mod, site.width)
            elif site.kind in ("attn1", "attn2"):
                s = _unit_scores_attn(mod["transformer_blocks_0"][site.kind], site.width)
            else:
                s = _unit_scores_ff(mod["transformer_blocks_0"]["ff"], site.width)
            scores[site.start: site.start + site.width] = s

    n_keep = int(round(target_ratio * spec.num_width))
    order = np.argsort(-scores)
    arch = np.zeros(spec.vq_dim, dtype=np.float32)
    arch[order[:n_keep]] = 0.9
    # guarantee ≥1 unit per group (the quantizer's non_zero_width invariant)
    for sb in spec.subblocks:
        for site in sb.sites:
            sl = slice(site.start, site.start + site.width)
            if not (arch[sl] >= 0.5).any():
                arch[site.start + int(np.argmax(scores[sl]))] = 0.9
    arch[spec.num_width:] = 0.9
    return arch[None, :]
