"""Metric math: Fréchet distance, CMMD (RBF-MMD), CLIP-score.

VERDICT r2 missing #4: one wrong constant here silently invalidates every
future evaluation. Each metric is pinned three ways:
  * closed-form values on hand-built Gaussians (FID)
  * a literal torch port of the reference implementation on random features
    (CMMD — /root/reference/cmmd-pytorch/distance.py:28-64; CLIP-score —
    pdm/utils/clip_utils.py:141-170)
  * the scripts/metrics/fid.py native fallback executed end-to-end with a
    stub TorchScript feature extractor (the pluggable-extractor contract).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

from diffusion_pruning_tpu.metrics import metrics as M


# ---------------------------------------------------------------- Fréchet

def test_frechet_identical_gaussians_is_zero():
    rng = np.random.RandomState(0)
    feats = rng.randn(500, 16)
    mu, sigma = M.gaussian_stats(feats)
    assert abs(M.frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_diagonal_closed_form():
    """For commuting (diagonal) covariances:
    FID = |mu1-mu2|^2 + sum((sqrt(s1)-sqrt(s2))^2)."""
    rng = np.random.RandomState(1)
    d = 8
    mu1, mu2 = rng.randn(d), rng.randn(d)
    s1 = np.diag(rng.uniform(0.5, 2.0, d))
    s2 = np.diag(rng.uniform(0.5, 2.0, d))
    expected = float(((mu1 - mu2) ** 2).sum()
                     + ((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2).sum())
    got = M.frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_frechet_random_cov_vs_independent_eigh():
    """General PSD covariances: tr(sqrtm(S1 S2)) computed independently via
    the symmetric similarity tr(sqrtm(S1^1/2 S2 S1^1/2)) and eigh — no
    scipy.sqrtm involved."""
    rng = np.random.RandomState(2)
    d = 12
    a = rng.randn(d, d)
    b = rng.randn(d, d)
    s1 = a @ a.T / d + 0.1 * np.eye(d)
    s2 = b @ b.T / d + 0.1 * np.eye(d)
    mu1, mu2 = rng.randn(d), rng.randn(d)

    w1, v1 = np.linalg.eigh(s1)
    s1_half = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    inner = s1_half @ s2 @ s1_half
    tr_covmean = np.sqrt(np.clip(np.linalg.eigvalsh(inner), 0, None)).sum()
    expected = float(((mu1 - mu2) ** 2).sum() + np.trace(s1) + np.trace(s2)
                     - 2 * tr_covmean)
    got = M.frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_frechet_scales_with_mean_shift():
    d = 4
    mu = np.zeros(d)
    s = np.eye(d)
    got = M.frechet_distance(mu, s, mu + 3.0, s)
    np.testing.assert_allclose(got, d * 9.0, rtol=1e-8)


def test_frechet_rank_deficient_cov_matches_eigh():
    """The N < D regime (few generated images, wide features — exactly the
    replay chain's 8-image experts): np.cov is rank-deficient, sqrtm(S1 S2)
    goes complex, and clean-fid's legacy_pytorch mode takes `.real`. Pin our
    result against the independent symmetric-eigh evaluation there too."""
    rng = np.random.RandomState(7)
    n, d = 6, 16  # n-1 = 5 < d -> rank-5 covariances
    f1, f2 = rng.randn(n, d), rng.randn(n, d) + 0.5
    mu1, s1 = M.gaussian_stats(f1)
    mu2, s2 = M.gaussian_stats(f2)

    w1, v1 = np.linalg.eigh(s1)
    s1_half = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    tr_covmean = np.sqrt(np.clip(
        np.linalg.eigvalsh(s1_half @ s2 @ s1_half), 0, None)).sum()
    expected = float(((mu1 - mu2) ** 2).sum() + np.trace(s1) + np.trace(s2)
                     - 2 * tr_covmean)
    got = M.frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)


def test_gaussian_stats_rejects_single_sample():
    """Regression for the bug the on-chip replay chain caught (REPLAY.md):
    one routed validation image -> np.cov degenerates to a scalar -> shape
    error deep inside sqrtm. Must fail loudly at the stats step instead."""
    with pytest.raises(ValueError, match="N>=2"):
        M.gaussian_stats(np.ones((1, 8)))
    with pytest.raises(ValueError, match="N>=2"):
        M.gaussian_stats(np.ones(8))


# ---------------------------------------------------------------- CMMD

def _reference_mmd(x, y):
    """Literal port of /root/reference/cmmd-pytorch/distance.py:28-64."""
    _SIGMA, _SCALE = 10, 1000
    x = torch.from_numpy(x)
    y = torch.from_numpy(y)
    x_sqnorms = torch.diag(torch.matmul(x, x.T))
    y_sqnorms = torch.diag(torch.matmul(y, y.T))
    gamma = 1 / (2 * _SIGMA ** 2)
    k_xx = torch.mean(torch.exp(-gamma * (
        -2 * torch.matmul(x, x.T) + torch.unsqueeze(x_sqnorms, 1)
        + torch.unsqueeze(x_sqnorms, 0))))
    k_xy = torch.mean(torch.exp(-gamma * (
        -2 * torch.matmul(x, y.T) + torch.unsqueeze(x_sqnorms, 1)
        + torch.unsqueeze(y_sqnorms, 0))))
    k_yy = torch.mean(torch.exp(-gamma * (
        -2 * torch.matmul(y, y.T) + torch.unsqueeze(y_sqnorms, 1)
        + torch.unsqueeze(y_sqnorms, 0))))
    return float(_SCALE * (k_xx + k_yy - 2 * k_xy))


def test_cmmd_matches_reference_port():
    rng = np.random.RandomState(3)
    x = rng.randn(64, 32).astype(np.float64)
    y = (rng.randn(64, 32) * 1.2 + 0.3).astype(np.float64)
    np.testing.assert_allclose(M.cmmd(x, y), _reference_mmd(x, y), rtol=1e-9)


def test_cmmd_zero_for_identical_sets():
    rng = np.random.RandomState(4)
    x = rng.randn(32, 16)
    assert abs(M.cmmd(x, x.copy())) < 1e-9


def test_cmmd_positive_and_symmetric():
    rng = np.random.RandomState(5)
    x = rng.randn(48, 8)
    y = rng.randn(48, 8) + 1.0
    assert M.cmmd(x, y) > 0
    np.testing.assert_allclose(M.cmmd(x, y), M.cmmd(y, x), rtol=1e-12)


# ---------------------------------------------------------------- CLIP score

def _reference_clip_score(real_features, fake_features, logit_scale):
    """pdm/utils/clip_utils.py:141-170 semantics on precomputed features:
    normalize, elementwise-dot, accumulate sum over ALL pairs, divide by N."""
    real = torch.from_numpy(real_features)
    fake = torch.from_numpy(fake_features)
    real = real / real.norm(dim=1, keepdim=True).to(torch.float32)
    fake = fake / fake.norm(dim=1, keepdim=True).to(torch.float32)
    score_acc = (logit_scale * (fake * real).sum()).item()
    return score_acc / real.shape[0]


def test_clip_score_matches_reference_port():
    rng = np.random.RandomState(6)
    txt = rng.randn(40, 24).astype(np.float32)
    img = (0.5 * txt + rng.randn(40, 24)).astype(np.float32)
    got = M.clip_score(img, txt, logit_scale=100.0)
    np.testing.assert_allclose(got, _reference_clip_score(txt, img, 100.0),
                               rtol=1e-5)


def test_clip_score_perfect_alignment():
    rng = np.random.RandomState(7)
    f = rng.randn(10, 8).astype(np.float32)
    np.testing.assert_allclose(M.clip_score(f, f * 2.0), 100.0, rtol=1e-5)


# -------------------------------------------------- fid.py fallback e2e

def _load_fid_script():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "metrics",
                        "fid.py")
    spec = importlib.util.spec_from_file_location("fid_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _StubExtractor(torch.nn.Module):
    """Tiny deterministic 'InceptionV3': global mean/max pool per channel."""

    def forward(self, x):
        return torch.cat([x.mean(dim=(2, 3)), x.amax(dim=(2, 3))], dim=1)


def test_fid_script_fallback_executes(tmp_path, capsys, monkeypatch):
    fid_mod = _load_fid_script()
    stub = torch.jit.script(_StubExtractor())
    model_path = str(tmp_path / "stub_inception.pt")
    stub.save(model_path)

    rng = np.random.RandomState(8)
    gen_dir, ref_dir = tmp_path / "gen", tmp_path / "ref"
    gen_dir.mkdir(); ref_dir.mkdir()
    for i in range(8):
        np.save(gen_dir / f"g{i}.npy",
                rng.randint(0, 255, (16, 16, 3)).astype(np.uint8))
        np.save(ref_dir / f"r{i}.npy",
                rng.randint(0, 255, (16, 16, 3)).astype(np.uint8))

    # feature extraction honours the extractor contract (N, H, W, C) -> (N, D)
    feats = fid_mod.inception_features(str(gen_dir), model_path, batch_size=3)
    assert feats.shape == (8, 6)

    # end-to-end: main() with the stub, dir-vs-dir
    monkeypatch.setattr(sys, "argv", [
        "fid.py", str(gen_dir), "--ref_stats", str(ref_dir),
        "--inception", model_path])
    fid_mod.main()
    out = capsys.readouterr().out
    assert "FID:" in out
    val = float(out.strip().split("FID:")[1])
    assert np.isfinite(val) and val >= 0

    # npz ref-stats path too (the clean-fid custom-stats contract)
    ref_feats = fid_mod.inception_features(str(ref_dir), model_path)
    mu, sigma = M.gaussian_stats(ref_feats)
    np.savez(tmp_path / "ref.npz", mu=mu, sigma=sigma)
    monkeypatch.setattr(sys, "argv", [
        "fid.py", str(gen_dir), "--ref_stats", str(tmp_path / "ref.npz"),
        "--inception", model_path])
    fid_mod.main()
    assert "FID:" in capsys.readouterr().out
