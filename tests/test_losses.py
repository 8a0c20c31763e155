import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pruning_tpu.losses import contrastive_loss, diffusion_loss, resource_loss, snr_weights


def test_resource_loss_log_symmetric():
    p = 0.6
    lo = float(resource_loss(jnp.asarray(0.3), p))
    hi = float(resource_loss(jnp.asarray(1.2), p))
    np.testing.assert_allclose(lo, np.log(0.6 / 0.3), rtol=1e-6)
    np.testing.assert_allclose(hi, np.log(1.2 / 0.6), rtol=1e-6)
    assert float(resource_loss(jnp.asarray(0.6), p)) < 1e-7


def test_resource_loss_other_types():
    np.testing.assert_allclose(float(resource_loss(jnp.asarray(0.8), 0.6, "mae")), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(resource_loss(jnp.asarray(0.8), 0.6, "mse")), 0.04, rtol=1e-5)


def test_contrastive_loss_prefers_matching_cluster_structure():
    key = jax.random.PRNGKey(0)
    u, v = jax.random.normal(key, (2, 32))
    # prompts form two clusters
    t = jnp.concatenate([jnp.tile(u, (8, 1)), jnp.tile(v, (8, 1))])
    a_good = jnp.concatenate(
        [jnp.tile(jax.random.normal(jax.random.PRNGKey(1), (1, 24)), (8, 1)),
         jnp.tile(jax.random.normal(jax.random.PRNGKey(2), (1, 24)), (8, 1))]
    )
    a_bad = jnp.tile(jax.random.normal(jax.random.PRNGKey(3), (1, 24)), (16, 1))
    good, _ = contrastive_loss(t, a_good, 1.0, 1.0)
    bad, _ = contrastive_loss(t, a_bad, 1.0, 1.0)
    # arch vectors that mirror the prompt clustering score lower
    assert float(good) < float(bad)


def test_contrastive_loss_matches_manual_bce():
    key = jax.random.PRNGKey(2)
    t = jax.random.normal(key, (8, 16))
    a = jax.random.normal(jax.random.PRNGKey(3), (8, 24))
    loss, sim = contrastive_loss(t, a, 0.03, 0.03)
    an = np.asarray(a) / np.linalg.norm(np.asarray(a), axis=1, keepdims=True)
    tn = np.asarray(t) / np.linalg.norm(np.asarray(t), axis=1, keepdims=True)

    def softmax(x):
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    asim = softmax(an @ an.T / 0.03)
    tsim = softmax(tn @ tn.T / 0.03)
    eps = 1e-7
    ac = np.clip(asim, eps, 1 - eps)
    want = -(tsim * np.log(ac) + (1 - tsim) * np.log(1 - ac)).mean()
    # float32 vs float64 softmax at T=0.03 → small relative noise
    np.testing.assert_allclose(float(loss), want, rtol=5e-3)


def test_snr_weights_v_prediction():
    ac = jnp.asarray([0.9, 0.5, 0.1])
    t = jnp.asarray([0, 1, 2])
    w = np.asarray(snr_weights(ac, t, snr_gamma=5.0, prediction_type="v_prediction"))
    snr = np.array([9.0, 1.0, 1.0 / 9.0])
    want = np.minimum(snr + 1, 5.0) / (snr + 1)
    np.testing.assert_allclose(w, want, rtol=1e-5)
    # epsilon prediction: no +1
    w_eps = np.asarray(snr_weights(ac, t, 5.0, "epsilon"))
    np.testing.assert_allclose(w_eps, np.minimum(snr, 5.0) / snr, rtol=1e-5)


def test_diffusion_loss_weighted():
    pred = jnp.ones((2, 4, 4, 3))
    target = jnp.zeros((2, 4, 4, 3))
    w = jnp.asarray([1.0, 3.0])
    np.testing.assert_allclose(float(diffusion_loss(pred, target, w)), 2.0, rtol=1e-6)
