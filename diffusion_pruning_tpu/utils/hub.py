"""Hugging Face Hub upload — the reference's push_to_hub contract.

Mirrors pdm/training/trainer.py:40,490-494 (create_repo at trainer init
when `training.hf_hub.push_to_hub`) and :1015-1021 / :1665-1671
(upload_folder of the run dir at end of training, ignoring rotation
dirs). `huggingface_hub` is imported lazily: on this no-egress dev image
the package may be absent, so the functions raise a clean RuntimeError
instead of failing at import time; the training loop only calls them when
the config opts in.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

logger = logging.getLogger(__name__)

#: rotation/step artifacts the reference excludes from the upload
DEFAULT_IGNORE = ("step_*", "epoch_*", "checkpoint-*/state/*")


def _hub_api():
    try:
        import huggingface_hub
    except ImportError as e:  # pragma: no cover - exercised via fake module
        raise RuntimeError(
            "training.hf_hub.push_to_hub=true requires the huggingface_hub "
            "package (not installed on this machine)") from e
    return huggingface_hub


def create_training_repo(run_dir: str, hub_model_id: Optional[str] = None,
                         token: Optional[str] = None) -> str:
    """Create (or reuse) the Hub repo for a training run; returns repo_id.

    Reference: create_repo(hub_model_id or Path(logging_dir).name,
    exist_ok=True, token=hub_token) at trainer.py:491-494.
    """
    hub = _hub_api()
    repo_id = hub_model_id or os.path.basename(os.path.normpath(run_dir))
    repo = hub.create_repo(repo_id=repo_id, exist_ok=True, token=token)
    return getattr(repo, "repo_id", repo_id)


def push_run_to_hub(run_dir: str, repo_id: str,
                    token: Optional[str] = None,
                    commit_message: str = "End of training",
                    ignore_patterns: Sequence[str] = DEFAULT_IGNORE) -> None:
    """Upload the run directory at end of training (trainer.py:1015-1021)."""
    hub = _hub_api()
    hub.upload_folder(repo_id=repo_id, folder_path=run_dir,
                      commit_message=commit_message,
                      ignore_patterns=list(ignore_patterns), token=token)
    logger.info("pushed %s to hub repo %s", run_dir, repo_id)


def maybe_push_to_hub(config, run_dir: str) -> Optional[str]:
    """End-of-training hook: honor `training.hf_hub.*` if present/enabled.

    Returns the repo_id on upload, None when disabled. Raises only when
    the config explicitly opted in but the upload cannot happen — a silent
    skip there would lose the user's artifacts contract.
    """
    hf = config.get_path("training.hf_hub", None) if hasattr(config, "get_path") else None
    if not hf or not hf.get("push_to_hub", False):
        return None
    token = hf.get("hub_token")
    repo_id = create_training_repo(run_dir, hf.get("hub_model_id"), token)
    push_run_to_hub(run_dir, repo_id, token)
    return repo_id
