"""Aleatoric bootstrap MLE ensembles (reference train_mle_aleatoric.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naz_tpu.flows import maf_flow
from naz_tpu.train import (
    EnsembleConfig,
    MLEConfig,
    ensemble_log_prob,
    ensemble_sample,
    mixture_log_prob,
    train_mle_ensemble,
)
from naz_tpu.train.ensemble import _member_indices


def _toy_data(n=400, seed=0):
    rng = np.random.default_rng(seed)
    x = np.stack(
        [rng.normal(0.0, 1.0, n), rng.normal(1.0, 0.5, n)], axis=1
    ).astype(np.float32)
    return x


def _tiny_flow():
    return maf_flow(2, n_layers=2, hidden_dims=(16,), seed=0)


FAST = MLEConfig(max_epochs=40, batch_frac=0.25, patience=8, sync_every=20)


def test_member_indices_modes():
    rng = np.random.default_rng(0)
    thin = _member_indices(rng, 100, EnsembleConfig(fthin=10, resample="thin"))
    assert thin.shape == (10,) and len(np.unique(thin)) == 10
    boot = _member_indices(
        np.random.default_rng(0), 100, EnsembleConfig(fthin=2, resample="bootstrap")
    )
    assert boot.shape == (50,)
    full = _member_indices(
        np.random.default_rng(0), 100, EnsembleConfig(resample="none")
    )
    assert np.array_equal(full, np.arange(100))
    with pytest.raises(ValueError):
        _member_indices(rng, 10, EnsembleConfig(resample="jackknife"))


def test_sequential_ensemble_members_differ():
    flow = _tiny_flow()
    x = _toy_data()
    res = train_mle_ensemble(
        flow, x, config=EnsembleConfig(n_members=2, fthin=2, mle=FAST)
    )
    leaves = jax.tree.leaves(res.params)
    assert all(l.shape[0] == 2 for l in leaves)
    assert res.val_losses.shape == (2,) and np.all(np.isfinite(res.val_losses))
    # different seeds + subsamples -> different weights
    assert any(
        not np.allclose(np.asarray(l)[0], np.asarray(l)[1]) for l in leaves
    )
    lps = ensemble_log_prob(flow, res.params, jnp.asarray(x[:16]))
    assert lps.shape == (2, 16) and bool(jnp.all(jnp.isfinite(lps)))


def test_vmapped_ensemble_trains_and_matches_api():
    flow = _tiny_flow()
    x = _toy_data()
    res = train_mle_ensemble(
        flow,
        x,
        config=EnsembleConfig(n_members=3, fthin=2, vmapped=True, mle=FAST),
    )
    leaves = jax.tree.leaves(res.params)
    assert all(l.shape[0] == 3 for l in leaves)
    assert res.val_losses.shape == (3,)
    assert np.all(np.isfinite(res.val_losses))
    assert np.all(res.epochs_run >= 1) and np.all(res.epochs_run <= 40)
    # the fit should beat the near-identity init by a wide margin
    init_lp = flow.log_prob(flow.init_params(jax.random.PRNGKey(0)), x)
    fit_lp = mixture_log_prob(flow, res.params, jnp.asarray(x))
    assert float(jnp.mean(fit_lp)) > float(jnp.mean(init_lp))

    samples = ensemble_sample(flow, res.params, jax.random.PRNGKey(1), 32)
    assert samples.shape == (3, 32, 2)
    assert bool(jnp.all(jnp.isfinite(samples)))


def test_shared_subsample_reference_quirk():
    cfg = EnsembleConfig(n_members=2, fthin=4, shared_subsample=True)
    idx = [
        _member_indices(np.random.default_rng(cfg.base_seed), 100, cfg)
        for _ in range(2)
    ]
    assert np.array_equal(idx[0], idx[1])


def test_cli_train_ensemble(tmp_path):
    import os
    import json
    import subprocess
    import sys

    from naz_tpu.data import save_training_h5

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(0)
    lam = rng.uniform(-1, 1, (300, 2)).astype(np.float32)
    theta = (lam + 0.3 * rng.normal(size=(300, 2))).astype(np.float32)
    h5 = tmp_path / "toy.h5"
    save_training_h5(h5, theta, lam)

    out = tmp_path / "ens.npz"
    r = subprocess.run(
        [
            sys.executable, "-m", "naz_tpu", "train-ensemble",
            "--flow-type", "maf", "--layers", "2", "--hidden", "8",
            "--data", str(h5), "--members", "2", "--fthin", "2",
            "--vmapped", "--epochs", "30", "--batch-frac", "0.5",
            "--out", str(out),
        ],
        capture_output=True, text=True, cwd=repo, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(info["val_nll"]) == 2 and all(np.isfinite(info["val_nll"]))
    assert out.exists()


def test_mixture_log_prob_is_logsumexp():
    flow = _tiny_flow()
    key = jax.random.PRNGKey(0)
    params = jax.vmap(flow.init_params)(jax.random.split(key, 3))
    x = jnp.asarray(_toy_data(8))
    per = ensemble_log_prob(flow, params, x)
    mix = mixture_log_prob(flow, params, x)
    ref = jax.nn.logsumexp(per, axis=0) - jnp.log(3.0)
    np.testing.assert_allclose(np.asarray(mix), np.asarray(ref), rtol=1e-6)
