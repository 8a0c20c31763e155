"""Physical expert materialisation: hard arch vector → smaller U-Net.

Replaces the reference's `UNet2DConditionModelPruned`
(/root/reference/pdm/models/unet/unet_2d_conditional.py:2184-2471), which
mutates a gated module tree with per-module `prune()` calls and THEN loads
the SD checkpoint with `ignore_mismatched_sizes=True` — leaving every sliced
tensor randomly initialised (SURVEY.md §2.1 quirk). Here we do the strictly
better thing the survey recommends: derive a static `ExpertPlan` from the
hard gates and *gather the pretrained weight slices* (`jnp.take` semantics)
from the dense parameters, so experts start from the teacher's weights.

The plan parameterises the same `GatedUNet` forward via per-subblock shape
overrides (kept groups / kept heads / kept FF units / dropped-subblock
identity), so pruned experts share one forward implementation with the
gated model and run with NO masking at all — real FLOP savings on TPU.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from diffusion_pruning_tpu.core.structure import StructureSpec, SubBlock


@dataclasses.dataclass(frozen=True)
class SiteKeep:
    kind: str
    kept: Tuple[int, ...]     # kept gate-unit indices (sorted)
    width: int                # original number of units
    channels: int             # original channels covered


@dataclasses.dataclass(frozen=True)
class SubBlockPlan:
    name: str
    kind: str
    dropped: bool             # depth gate off → identity
    sites: Tuple[SiteKeep, ...]

    def site(self, kind: str) -> Optional[SiteKeep]:
        for s in self.sites:
            if s.kind == kind:
                return s
        return None


@dataclasses.dataclass(frozen=True)
class ExpertPlan:
    subblocks: Tuple[SubBlockPlan, ...]

    def get(self, name: str) -> Optional[SubBlockPlan]:
        for sb in self.subblocks:
            if sb.name == name:
                return sb
        return None

    @property
    def by_name(self) -> Dict[str, SubBlockPlan]:
        return {sb.name: sb for sb in self.subblocks}


def make_expert_plan(spec: StructureSpec, arch_vector: np.ndarray) -> ExpertPlan:
    """Hard-threshold an arch vector (1D, vq_dim) into a static plan.

    Matches the reference thresholds: width unit kept iff gate >= 0.5
    (hard_concrete), subblock dropped iff its depth gate < 0.5."""
    arch = np.asarray(arch_vector).reshape(-1)
    assert arch.shape[0] == spec.vq_dim, (arch.shape, spec.vq_dim)
    plans = []
    for sb in spec.subblocks:
        dropped = False
        if sb.depth_index >= 0:
            dropped = arch[spec.num_width + sb.depth_index] < 0.5
        sites = []
        for site in sb.sites:
            g = arch[site.start: site.start + site.width] >= 0.5
            kept = tuple(int(i) for i in np.nonzero(g)[0])
            if not kept:  # the quantizer's non_zero_width rescue guarantees
                kept = (0,)  # ≥1 unit, but be safe with raw vectors
            sites.append(SiteKeep(site.kind, kept, site.width, site.channels))
        plans.append(SubBlockPlan(sb.name, sb.kind, bool(dropped), tuple(sites)))
    return ExpertPlan(tuple(plans))


# ---------------------------------------------------------------------------
# Parameter slicing (dense → expert)
# ---------------------------------------------------------------------------

def _expand_units(kept: Tuple[int, ...], unit: int) -> np.ndarray:
    return np.concatenate([np.arange(k * unit, (k + 1) * unit) for k in kept])


def _slice_resnet(params: dict, keep: SiteKeep) -> dict:
    unit = keep.channels // keep.width
    ch = _expand_units(keep.kept, unit)
    out = dict(params)
    out["conv1"] = {"kernel": params["conv1"]["kernel"][..., ch],
                    "bias": params["conv1"]["bias"][ch]}
    out["time_emb_proj"] = {"kernel": params["time_emb_proj"]["kernel"][:, ch],
                            "bias": params["time_emb_proj"]["bias"][ch]}
    out["norm2"] = {"scale": params["norm2"]["scale"][ch],
                    "bias": params["norm2"]["bias"][ch]}
    out["conv2"] = {"kernel": params["conv2"]["kernel"][:, :, ch, :],
                    "bias": params["conv2"]["bias"]}
    return out


def _slice_attn(params: dict, keep: SiteKeep) -> dict:
    head_dim = keep.channels // keep.width
    ch = _expand_units(keep.kept, head_dim)
    out = dict(params)
    for k in ("to_q", "to_k", "to_v"):
        out[k] = {"kernel": params[k]["kernel"][:, ch]}
    out["to_out_0"] = {"kernel": params["to_out_0"]["kernel"][ch, :],
                       "bias": params["to_out_0"]["bias"]}
    return out


def _slice_ff(params: dict, keep: SiteKeep) -> dict:
    unit = keep.channels // keep.width
    ch = _expand_units(keep.kept, unit)
    inner = keep.channels
    ch2 = np.concatenate([ch, inner + ch])  # both GEGLU halves
    out = dict(params)
    out["act"] = {"proj": {"kernel": params["act"]["proj"]["kernel"][:, ch2],
                           "bias": params["act"]["proj"]["bias"][ch2]}}
    out["out"] = {"kernel": params["out"]["kernel"][ch, :],
                  "bias": params["out"]["bias"]}
    return out


def _module_name(sb_name: str) -> str:
    """'down.0.resnet.1' -> 'down_blocks_0_resnets_1' etc."""
    parts = sb_name.split(".")
    if parts[0] in ("down", "up"):
        kind = "resnets" if parts[2] == "resnet" else "attentions"
        return f"{parts[0]}_blocks_{parts[1]}_{kind}_{parts[3]}"
    # mid.resnet.0 / mid.attn.0
    kind = "resnets" if parts[1] == "resnet" else "attentions"
    return f"mid_block_{kind}_{parts[2]}"


def slice_expert_params(dense_params: dict, plan: ExpertPlan) -> dict:
    """Gather the kept weight slices out of dense U-Net params.

    Dropped subblocks keep no params (their forward is identity)."""
    out = dict(dense_params)
    for sb in plan.subblocks:
        mod = _module_name(sb.name)
        if sb.dropped:
            out.pop(mod, None)
            continue
        p = dict(dense_params[mod])
        if sb.kind == "resnet":
            out[mod] = _slice_resnet(p, sb.sites[0])
        else:
            tb = dict(p["transformer_blocks_0"])
            a1 = sb.site("attn1")
            a2 = sb.site("attn2")
            ff = sb.site("ff")
            tb["attn1"] = _slice_attn(tb["attn1"], a1)
            tb["attn2"] = _slice_attn(tb["attn2"], a2)
            if ff is not None:
                tb["ff"] = _slice_ff(tb["ff"], ff)
            p["transformer_blocks_0"] = tb
            out[mod] = p
    return out


def expert_macs_ratio(spec: StructureSpec, plan: ExpertPlan) -> float:
    """Pruned/dense MACs ratio for logging (trainer.py:1466-1470)."""
    kept = spec.other_macs  # ungated modules always run
    for sb_spec, sb_plan in zip(spec.subblocks, plan.subblocks):
        if sb_plan.dropped:
            continue
        sub = sb_spec.nonprunable_macs
        for site_spec, site_plan in zip(sb_spec.sites, sb_plan.sites):
            sub += site_spec.prunable_macs * len(site_plan.kept) / site_plan.width
        kept += sub
    return kept / spec.total_macs
