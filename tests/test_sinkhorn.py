import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from diffusion_pruning_tpu.core import sinkhorn, sinkhorn_assign


def test_sinkhorn_rows_sum_to_one():
    key = jax.random.PRNGKey(0)
    scores = jax.random.normal(key, (64, 8))
    q = sinkhorn(scores, epsilon=0.05, iterations=3)
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), np.ones(64), rtol=1e-4)


def test_sinkhorn_balances_assignments():
    # cosine-scale clustered scores: without OT everything goes to one code;
    # with enough iterations the assignment is near-balanced. (Scores are
    # cosine similarities in [-1, 1] in the quantizer, so a 0.3 preference
    # gap is already a strong cluster at epsilon=0.05.)
    key = jax.random.PRNGKey(1)
    scores = jax.random.normal(key, (256, 8)) * 0.01
    scores = scores.at[:, 0].add(0.3)  # all samples prefer code 0
    greedy = np.bincount(np.asarray(jnp.argmax(scores, axis=1)), minlength=8)
    assert greedy[0] == 256  # sanity: cosine argmax collapses
    idx = sinkhorn_assign(scores, epsilon=0.05, iterations=30)
    counts = np.bincount(np.asarray(idx), minlength=8)
    assert counts.max() <= 2 * 256 // 8, counts


def test_distributed_sinkhorn_matches_single_device(devices):
    """psum-based multi-device Sinkhorn == single-device on the global batch."""
    key = jax.random.PRNGKey(2)
    scores = jax.random.normal(key, (64, 8))

    q_single = sinkhorn(scores, epsilon=0.05, iterations=3)

    mesh = Mesh(np.array(devices), ("data",))
    f = shard_map(
        lambda s: sinkhorn(s, epsilon=0.05, iterations=3, axis_name="data", axis_size=8),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
    )
    q_dist = f(scores)
    np.testing.assert_allclose(np.asarray(q_dist), np.asarray(q_single), rtol=1e-4, atol=1e-6)
