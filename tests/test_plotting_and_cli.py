import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.flows import maf_flow
from naz_tpu.stats.plotting import (
    grid_pdf_draws,
    plot_calibration,
    plot_contour_level,
    plot_marginal_bands,
)


def test_grid_pdf_draws_and_plots(tmp_path):
    flow = maf_flow(2, 2, (8,), seed=0)
    p0 = flow.init_params(jax.random.PRNGKey(0))
    draws = jax.tree.map(lambda a: jnp.stack([a + 0.01 * i for i in range(5)]), p0)
    g = np.linspace(-3, 3, 40)
    X, Y = np.meshgrid(g, g)
    pts = np.stack([X.ravel(), Y.ravel()], -1)
    pdfs = grid_pdf_draws(flow, draws, pts, batch=2)
    assert pdfs.shape == (5, 1600)
    assert np.isfinite(pdfs).all()

    # marginal bands on a 1-D slice
    ax = plot_marginal_bands(g, pdfs[:, :40], truth_pdf=pdfs[0, :40])
    ax.figure.savefig(tmp_path / "bands.png")

    ax = plot_contour_level(X, Y, pdfs[0].reshape(40, 40), mass=0.9)
    ax.figure.savefig(tmp_path / "contour.png")

    ax = plot_calibration(
        [0.1, 0.5, 0.9], [[0.12, 0.48, 0.88], [0.2, 0.6, 0.95]], labels=["a", "b"]
    )
    ax.figure.savefig(tmp_path / "cal.png")
    for f in ("bands.png", "contour.png", "cal.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_cli_help():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "naz_tpu", "--help"],
        capture_output=True,
        text=True,
        cwd=repo,
        timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo},
    )
    assert r.returncode == 0
    for cmd in ("train-mle", "hmc", "svi"):
        assert cmd in r.stdout


def test_cli_full_pipeline(tmp_path):
    """h5 -> train-mle -> hmc -> calibrate -> bic, the reference's whole
    2506.05657 pipeline through the CLI on a tiny problem."""
    from naz_tpu.data import save_training_h5

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(0)
    lam = rng.uniform(-1, 1, (600, 2)).astype(np.float32)
    theta = (lam + 0.3 * rng.normal(size=(600, 2))).astype(np.float32)
    # held-out point: truth thetas drawn AT the test lambda (parse_data.py)
    test_lam = np.full((400, 2), 0.2, np.float32)
    test_theta = (test_lam + 0.3 * rng.normal(size=(400, 2))).astype(np.float32)
    h5 = tmp_path / "toy.h5"
    save_training_h5(h5, theta, lam, test_theta=test_theta, test_lambda=test_lam)

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    flow_args = ["--flow-type", "maf", "--layers", "2", "--hidden", "8"]

    def run(*cmd):
        r = subprocess.run(
            [sys.executable, "-m", "naz_tpu", *cmd],
            capture_output=True, text=True, cwd=repo, timeout=900, env=env,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    mle = tmp_path / "mle.npz"
    run("train-mle", *flow_args, "--data", str(h5), "--epochs", "40",
        "--batch-frac", "0.5", "--lr", "5e-3", "--out", str(mle))
    assert mle.exists()

    post = tmp_path / "post.npz"
    run("hmc", *flow_args, "--data", str(h5), "--mle-params", str(mle),
        "--num-warmup", "30", "--num-samples", "30", "--num-chains", "2",
        "--sigma", "0.05", "--out", str(post))
    pz = np.load(post)
    assert pz["params_flat"].ndim >= 2 and np.isfinite(pz["log_likelihood"]).all()

    out = run(
        "calibrate", *flow_args, "--data", str(h5), "--posterior", str(post),
        "--nq", "16", "--n-samples", "4000", "--max-draws", "8",
        "--fthin", "2", "--draw-batch", "4", "--out", str(tmp_path / "cal"),
    )
    import json

    cov = json.loads(out.strip().splitlines()[-1])["16"]
    assert all(0.0 <= c <= 1.0 for c in cov)
    assert (tmp_path / "cal_nq16.txt").exists()

    out = run("bic", "--data", str(h5), "--posterior", str(post))
    bic = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(bic["bic"]) and bic["n_data"] == 600

    # predict: posterior-predictive + prior-predictive npz
    ppd = tmp_path / "ppd.npz"
    out = run(
        "predict", *flow_args, "--data", str(h5), "--posterior", str(post),
        "--prior-draws", "4", "--mle-params", str(mle), "--sigma", "0.05",
        "--n-samples", "500", "--max-draws", "6", "--draw-batch", "3",
        "--out", str(ppd),
    )
    z = np.load(ppd)
    assert z["ppd"].shape == (6, 500, 2) and np.isfinite(z["ppd"]).all()
    assert z["prior_ppd"].shape == (4, 500, 2)

    # plot: marginal bands (prior vs posterior vs truth) + contour
    out = run(
        "plot", *flow_args, "--data", str(h5), "--posterior", str(post),
        "--prior-draws", "4", "--mle-params", str(mle), "--sigma", "0.05",
        "--n-samples", "500", "--max-draws", "6", "--draw-batch", "3",
        "--grid-bins", "24", "--out", str(tmp_path / "fig"),
    )
    written = json.loads(out.strip().splitlines()[-1])["written"]
    assert len(written) == 3  # 2 marginals + 1 contour
    for f in written:
        assert os.path.getsize(f) > 0

    # kde-bands: the bayesian_amplification_kde.ipynb per-draw KDE + HPD band
    out = run(
        "kde-bands", "--ppd", str(ppd), "--feature", "1",
        "--data", str(h5), "--alpha", "0.1",
        "--out", str(tmp_path / "amp"),
    )
    kres = json.loads(out.strip().splitlines()[-1])
    assert kres["n_draws"] == 6 and kres["band_mean_width"] > 0
    tab = np.loadtxt(tmp_path / "amp_kde.txt")
    assert tab.shape == (100, 5)  # grid, lo, hi, median, truth
    assert np.all(tab[:, 1] <= tab[:, 2])
    # per-draw pdfs were trapezoid-normalized: median curve integrates ~1
    assert abs(np.trapezoid(tab[:, 3], tab[:, 0]) - 1.0) < 0.1


def test_cli_unconditional_bounded(tmp_path):
    """Unconditional flow on box-bounded samples via --bounds-low/high —
    the reference's train_mle_unsupervised.py workload (GW170817 q, Lambda-t
    posterior samples in a logit box)."""
    from naz_tpu.data import save_training_h5

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(1)
    theta = rng.beta(4, 4, size=(800, 2)).astype(np.float32)  # in (0, 1)^2
    h5 = tmp_path / "uncond.h5"
    save_training_h5(h5, theta)

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    out = tmp_path / "mle.npz"
    r = subprocess.run(
        [sys.executable, "-m", "naz_tpu", "train-mle",
         "--flow-type", "maf", "--layers", "2", "--hidden", "8",
         "--bounds-low", "0", "0", "--bounds-high", "1", "1",
         "--data", str(h5), "--epochs", "40", "--batch-frac", "0.5",
         "--lr", "5e-3", "--out", str(out)],
        capture_output=True, text=True, cwd=repo, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists()

    # mismatched bounds must fail fast with a clear message
    r = subprocess.run(
        [sys.executable, "-m", "naz_tpu", "train-mle",
         "--flow-type", "maf", "--layers", "2", "--hidden", "8",
         "--bounds-low", "0",
         "--data", str(h5), "--epochs", "1", "--out", str(out)],
        capture_output=True, text=True, cwd=repo, timeout=900, env=env,
    )
    assert r.returncode != 0
    assert "bounds" in (r.stderr + r.stdout)


def test_multihost_initialize_single_process():
    from naz_tpu.parallel.distributed import initialize_multihost

    info = initialize_multihost()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1


def test_phase_timer_and_grad_meter(capsys):
    from naz_tpu.utils import GradEvalMeter, phase_timer

    results = {}
    with phase_timer("unit-test-phase", results):
        jnp.ones((64, 64)).sum().block_until_ready()
    assert results["unit-test-phase"] > 0
    out = capsys.readouterr().out
    assert "unit-test-phase" in out

    m = GradEvalMeter()
    m.add(np.array([10, 20]), 2.0)
    m.add(np.array([30]), 1.0)
    assert m.evals == 60
    np.testing.assert_allclose(m.evals_per_s, 20.0)


def test_calibration_curve_small_flow():
    from naz_tpu.stats import calibration_curve
    from naz_tpu.train import MLEConfig, train_mle

    key = jax.random.PRNGKey(0)
    x = 0.8 * jax.random.normal(key, (3000, 2))
    flow = maf_flow(2, 2, (16,), seed=0)
    res = train_mle(
        flow, x, config=MLEConfig(lr=5e-3, max_epochs=100, batch_frac=0.5, patience=20)
    )
    # fake posterior: small jitters of the fitted params
    draws = jax.tree.map(
        lambda a: jnp.stack([a * (1 + 0.001 * i) for i in range(8)]), res.params
    )
    cs = [0.3, 0.6, 0.9]
    cov = np.asarray(
        calibration_curve(
            flow,
            draws,
            np.asarray(0.8 * jax.random.normal(jax.random.PRNGKey(9), (20000, 2))),
            jax.random.PRNGKey(1),
            nq=16,
            cs=cs,
            n_samples=20000,
            fthin=2,
            draw_batch=4,
        )
    )
    assert cov.shape == (3,) and np.isfinite(cov).all()
    assert (cov >= 0).all() and (cov <= 1).all()
