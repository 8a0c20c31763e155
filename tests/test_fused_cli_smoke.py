"""Prune-CLI smoke with the fused norm→conv kernel enabled via YAML.

Pins the drive that caught the bf16 VJP dtype crash (the stage-1 backward
differentiates through the fused kernel's gate even with the U-Net frozen):
YAML `model.unet.fused_norm_conv: true` → factory → GatedUNet → a full
tiny training run through scripts/aptp/prune.py must write a checkpoint.
Marked slow (full CLI run with fresh compiles on the CPU host)."""
import glob
import os
import runpy
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_prune_smoke_with_fused_norm_conv(tmp_path, monkeypatch):
    cfg_text = open(os.path.join(ROOT, "configs/pruning/tiny_smoke.yaml")).read()
    cfg_text = cfg_text.replace("logging_dir: runs",
                                f"logging_dir: {tmp_path}/runs")
    cfg_text = cfg_text.replace("    gated_ff: true\n",
                                "    gated_ff: true\n"
                                "    fused_norm_conv: true\n", 1)
    cfg_path = tmp_path / "tiny_fnc.yaml"
    cfg_path.write_text(cfg_text)
    # fresh cache dir per run — no SIGILL-prone XLA:CPU executable reloads
    monkeypatch.setattr(sys, "argv", [
        "prune.py", "--base_config_path", str(cfg_path),
        "--pretrained_model_name_or_path", "",
        "--prompt_encoder_model_name_or_path", "",
        "--jax_cache_dir", str(tmp_path / "cache0")])
    runpy.run_path(os.path.join(ROOT, "scripts/aptp/prune.py"),
                   run_name="__main__")
    ckpts = glob.glob(f"{tmp_path}/runs/**/checkpoint-*", recursive=True)
    assert ckpts, "fused prune smoke wrote no checkpoint"
