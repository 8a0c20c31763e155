"""Contract: the synthetic-convergence recipe NEVER leaks into real training.

`self_distill_target` (training/pruner.py, training/finetuner.py) swaps the
true eps/v diffusion target for the dense teacher's prediction — valid ONLY
for the synthetic mechanism-level convergence proof (utils/synthetic.py),
where frozen random weights make the real target pure noise. Real APTP
training (reference pdm/training/trainer.py loss) must always use eps/v.

These tests pin that contract (VERDICT r3 next-round #9): the flag defaults
False in both dataclasses, no YAML config exposes it, and no production CLI
entry point ever passes it.
"""
import os

from diffusion_pruning_tpu.training.finetuner import FineTuneConfig
from diffusion_pruning_tpu.training.pruner import PrunerConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flag_defaults_false():
    assert PrunerConfig().self_distill_target is False
    assert FineTuneConfig().self_distill_target is False


def test_no_config_exposes_flag():
    for root, _, files in os.walk(os.path.join(REPO, "configs")):
        for f in files:
            if f.endswith((".yaml", ".yml")):
                text = open(os.path.join(root, f)).read()
                assert "self_distill" not in text, f"{f} leaks synthetic flag"


def test_production_clis_never_pass_flag():
    """Every scripts/ entry except the synthetic-convergence harness must not
    reference the flag; convergence_run.py may, but only gated behind its
    --real_target escape hatch (asserted by substring)."""
    allowed = {"convergence_run.py"}
    for root, _, files in os.walk(os.path.join(REPO, "scripts")):
        for f in files:
            if not f.endswith(".py"):
                continue
            text = open(os.path.join(root, f)).read()
            if f in allowed:
                assert "not args.real_target" in text
                continue
            assert "self_distill" not in text, (
                f"scripts/{f} must not use the synthetic-only target")
