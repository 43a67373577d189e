import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.flows import maf_flow
from naz_tpu.train import MLEConfig, train_mle


def test_mle_recovers_correlated_gaussian():
    key = jax.random.PRNGKey(0)
    n = 4000
    L = jnp.array([[1.0, 0.0], [0.8, 0.6]])
    x = jax.random.normal(key, (n, 2)) @ L.T + jnp.array([1.0, -0.5])

    flow = maf_flow(2, n_layers=4, hidden_dims=(32,), seed=0)
    cfg = MLEConfig(lr=5e-3, max_epochs=150, batch_frac=0.25, patience=20, verbose=False)
    result = train_mle(flow, x, config=cfg)

    s = flow.sample(result.params, jax.random.PRNGKey(1), 20000)
    mean = np.asarray(jnp.mean(s, 0))
    cov = np.cov(np.asarray(s).T)
    np.testing.assert_allclose(mean, [1.0, -0.5], atol=0.15)
    np.testing.assert_allclose(cov, np.asarray(L @ L.T), atol=0.25)
    # NLL should approach the analytic differential entropy
    entropy = 0.5 * np.log(np.linalg.det(np.asarray(L @ L.T))) + np.log(2 * np.pi) + 1
    assert result.val_losses[-1] < entropy + 0.25


def test_mle_conditional():
    key = jax.random.PRNGKey(0)
    n = 4000
    c = jax.random.uniform(key, (n, 1), minval=-2, maxval=2)
    x = c + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n, 2))

    flow = maf_flow(2, n_layers=3, hidden_dims=(32,), context_dim=1, seed=0)
    cfg = MLEConfig(lr=5e-3, max_epochs=150, batch_frac=0.25, patience=20)
    result = train_mle(flow, x, context=c, config=cfg)

    s = flow.sample(result.params, jax.random.PRNGKey(2), 10000, context=jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(jnp.mean(s, 0)), [1.0, 1.0], atol=0.12)
    np.testing.assert_allclose(np.asarray(jnp.std(s, 0)), [0.3, 0.3], atol=0.1)


def test_early_stop_and_plateau():
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 2))
    flow = maf_flow(2, n_layers=1, hidden_dims=(8,), seed=0)
    cfg = MLEConfig(
        lr=1e-2, min_lr=5e-3, lr_decay=0.5, patience=3, max_epochs=400, batch_frac=1.0
    )
    result = train_mle(flow, x, config=cfg)
    # must have stopped early once lr hit the floor and patience overran again
    assert result.epochs_run < 400
    assert len(result.train_losses) == result.epochs_run


def test_mle_custom_optimizer():
    import optax

    key = jax.random.PRNGKey(0)
    x = 0.5 * jax.random.normal(key, (1500, 2)) + jnp.array([1.0, -1.0])
    flow = maf_flow(2, 2, (16,), seed=0)
    res = train_mle(
        flow,
        x,
        config=MLEConfig(
            lr=5e-3, max_epochs=250, batch_frac=0.5, patience=40,
            optimizer=optax.adamw,
        ),
    )
    s = np.asarray(flow.sample(res.params, jax.random.PRNGKey(1), 8000))
    np.testing.assert_allclose(s.mean(0), [1.0, -1.0], atol=0.15)
