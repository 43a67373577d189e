import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.bayes.mcdropout import log_prob_uncertain, sample_uncertain
from naz_tpu.flows import maf_flow
from naz_tpu.train import MLEConfig, train_mle


def _trained_dropout_flow(seed=0):
    key = jax.random.PRNGKey(seed)
    x = 0.6 * jax.random.normal(key, (2000, 2)) + jnp.array([1.0, 0.0])
    flow = maf_flow(2, n_layers=3, hidden_dims=(32,), seed=seed, dropout_rate=0.1)
    res = train_mle(
        flow,
        x,
        config=MLEConfig(
            lr=5e-3, max_epochs=120, batch_frac=0.25, patience=20, dropout=True
        ),
    )
    return flow, res.params, x


def test_dropout_changes_output_and_is_consistent_per_key():
    flow = maf_flow(2, n_layers=2, hidden_dims=(16,), seed=0, dropout_rate=0.3)
    params = flow.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    lp1 = flow.log_prob(params, x, dropout_key=k1)
    lp1b = flow.log_prob(params, x, dropout_key=k1)
    lp2 = flow.log_prob(params, x, dropout_key=k2)
    lp_off = flow.log_prob(params, x)
    np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp1b))
    assert not np.allclose(np.asarray(lp1), np.asarray(lp2))
    assert not np.allclose(np.asarray(lp1), np.asarray(lp_off))


def test_dropout_roundtrip_with_fixed_key():
    """forward/inverse stay exact inverses under a fixed dropout mask — the
    sequential inversion must see the same mask on every pass."""
    flow = maf_flow(3, n_layers=2, hidden_dims=(16,), seed=1, dropout_rate=0.25)
    t = flow.transforms[0]
    params = flow.init_params(jax.random.PRNGKey(0))["transforms"][0]
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    dk = jax.random.PRNGKey(5)
    z, ld_f = t.forward(params, x, dropout_key=dk)
    x2, ld_i = t.inverse(params, z, dropout_key=dk)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


def test_sample_uncertain_ensemble():
    flow, params, x = _trained_dropout_flow()
    ens = sample_uncertain(flow, params, jax.random.PRNGKey(0), niter=8, n=2000)
    assert ens.shape == (8, 2000, 2)
    means = np.asarray(jnp.mean(ens, axis=1))  # (8, 2)
    # every realization should still model the data roughly
    np.testing.assert_allclose(means.mean(0), [1.0, 0.0], atol=0.25)
    # realizations must differ (epistemic spread strictly positive)
    assert means.std(0).max() > 1e-4


def test_log_prob_uncertain():
    flow, params, x = _trained_dropout_flow()
    lps = log_prob_uncertain(flow, params, jax.random.PRNGKey(0), 8, x[:100])
    assert lps.shape == (8, 100)
    assert np.isfinite(np.asarray(lps)).all()
    assert np.asarray(lps).std(0).mean() > 1e-4
