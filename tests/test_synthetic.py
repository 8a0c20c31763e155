"""Unit tests for the synthetic-validation utilities (utils/synthetic.py).

plant_redundancy's invariants: the non-zero-width rescue unit of every gate
site survives at full magnitude, dropped units are damped by eps at the
documented parameter sites (norm2 scale slabs / to_v columns / GEGLU proj
columns), and everything else is untouched.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.utils.synthetic import plant_redundancy


def test_plant_redundancy_invariants():
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    spec = build_structure(ucfg)
    model = GatedUNet(ucfg)
    dense = model.init_params(jax.random.PRNGKey(0), batch=1)
    eps = 0.25
    damped, planted = plant_redundancy(spec, dense, keep=0.5, eps=eps, seed=7)

    # planted fraction ≈ keep (first-unit rescue biases it up slightly)
    assert 0.5 <= planted <= 0.75, planted

    # the trees have identical structure and identical leaves EXCEPT at the
    # documented damping sites, where values are scaled by exactly eps
    flat_d = dict(jax.tree_util.tree_flatten_with_path(dense)[0])
    flat_p = dict(jax.tree_util.tree_flatten_with_path(damped)[0])
    assert flat_d.keys() == flat_p.keys()
    n_touched = 0
    for k in flat_d:
        a, b = np.asarray(flat_d[k]), np.asarray(flat_p[k])
        if np.array_equal(a, b):
            continue
        n_touched += 1
        path = "/".join(str(p) for p in k)
        assert ("norm2" in path and "scale" in path) \
            or ("to_v" in path and "kernel" in path) \
            or ("ff" in path and "proj" in path and "kernel" in path), path
        # every changed entry is the original times eps; no other edits
        changed = a != b
        np.testing.assert_allclose(b[changed], a[changed] * eps, rtol=1e-6)
    assert n_touched > 0

    # the rescue unit: with keep=0 every site still keeps exactly its first
    # unit, so the planted fraction equals (#sites / #width-units)
    _, planted0 = plant_redundancy(spec, dense, keep=0.0, eps=0.0, seed=7)
    n_sites = sum(len(sb.sites) for sb in spec.subblocks)
    assert np.isclose(planted0, n_sites / spec.num_width, atol=1e-6), (
        planted0, n_sites, spec.num_width)
