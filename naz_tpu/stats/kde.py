"""Gaussian kernel density estimation (weighted, bounded, vmappable).

Capability parity with the reference's KDE-based "amplification" analysis
notebooks (``/root/reference/examples/papers/2506.05657/
mle_amplification.ipynb`` and ``bayesian_amplification_kde.ipynb``), which
use ``scipy.stats.gaussian_kde`` per posterior-predictive draw (a Python
loop over 4400 draws) plus manual boundary reflection
(``y += kde.pdf(bounds[0] - X)``) and per-grid-point HPD bands.

Here the KDE is a pure jnp function:

* scipy-compatible N-D Gaussian KDE (Scott/Silverman factors, optional
  sample weights, full covariance bandwidth matrix),
* optional 1-D boundary reflection (lo/hi) as in the notebooks /
  pesummary's ``bounded_1d_kde``,
* ``ppd_kde_bands``: the whole per-draw loop as one vmapped+chunked
  program — per-draw KDE pdfs on a grid, trapezoid-normalized, reduced
  to HPD bands with ``hpd_vectorized``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.stats.statutils import hpd_vectorized


def scott_factor(n_eff, d: int, dtype=jnp.float32):
    """Scott's rule bandwidth factor, n_eff^(-1/(d+4)) (scipy default)."""
    return jnp.asarray(n_eff, dtype) ** (-1.0 / (d + 4))


def silverman_factor(n_eff, d: int, dtype=jnp.float32):
    """Silverman's rule factor, (n_eff (d+2)/4)^(-1/(d+4))."""
    return (jnp.asarray(n_eff, dtype) * (d + 2) / 4.0) ** (
        -1.0 / (d + 4)
    )


def _weighted_cov(samples, weights):
    # samples (n, d), weights (n,) summing to 1; scipy's bias-corrected
    # weighted covariance: cov / (1 - sum(w^2)). The correction term is 0
    # for n=1 (or one dominant weight) — n_eff <= 1 means no covariance
    # estimate exists; guard so the failure is loud NaNs-from-zero-div
    # replaced with an informative error at trace time when detectable.
    mu = jnp.sum(weights[:, None] * samples, axis=0)
    xc = samples - mu
    cov = jnp.einsum("n,ni,nj->ij", weights, xc, xc)
    denom = 1.0 - jnp.sum(weights**2)
    if samples.shape[0] <= 1:
        raise ValueError(
            "KDE needs more than one (effective) sample; got n="
            f"{samples.shape[0]}"
        )
    # a weight vector dominated by one sample (n_eff -> 1) makes the
    # bias correction divide by ~0 and every downstream pdf silently NaN;
    # raise when the weights are concrete (outside jit) instead
    if not isinstance(denom, jax.core.Tracer) and float(denom) <= 1e-6:
        raise ValueError(
            "KDE weights are degenerate: effective sample size "
            f"1/sum(w^2) = {1.0 / float(jnp.sum(weights ** 2)):.3f} <= 1 "
            "— no covariance estimate exists"
        )
    return cov / jnp.maximum(denom, jnp.finfo(cov.dtype).tiny)


# elementwise working-set budget for the (eval_chunk, n_samples, d)
# pairwise-difference tensor; keeps a 1e6-sample KDE under ~0.5 GB
_PAIRWISE_BUDGET = 1 << 27


def gaussian_kde_pdf(
    x_eval,
    samples,
    weights=None,
    bw: str | float = "scott",
    eval_chunk: Optional[int] = None,
):
    """Evaluate a Gaussian KDE of ``samples`` at ``x_eval``.

    ``samples``: (n,) or (n, d); ``x_eval``: (m,) or (m, d).
    ``weights``: optional (n,) nonnegative, normalized internally.
    ``bw``: "scott" | "silverman" | float multiplier of the data
    covariance (the scipy ``bw_method`` semantics). Returns (m,) pdf.

    Evaluation is chunked over ``x_eval`` with ``lax.map`` so a 1e6-sample
    PPD draw against a fine grid stays within memory on device; the chunk
    defaults to a fixed pairwise working-set budget.
    """
    samples = jnp.asarray(samples)
    x_eval = jnp.asarray(x_eval)
    squeeze = samples.ndim == 1
    if squeeze:
        samples = samples[:, None]
    if x_eval.ndim == 1:
        x_eval = x_eval[:, None] if squeeze else x_eval[None, :]
    n, d = samples.shape
    if x_eval.shape[-1] != d:
        raise ValueError(
            f"x_eval has {x_eval.shape[-1]} features, samples have {d}"
        )
    dtype = jnp.promote_types(samples.dtype, jnp.float32)
    samples = samples.astype(dtype)
    if weights is None:
        w = jnp.full((n,), 1.0 / n, dtype)
        n_eff = n
    else:
        w = jnp.asarray(weights, dtype)
        w = w / jnp.sum(w)
        n_eff = 1.0 / jnp.sum(w**2)

    if bw == "scott":
        factor = scott_factor(n_eff, d, dtype)
    elif bw == "silverman":
        factor = silverman_factor(n_eff, d, dtype)
    else:
        factor = jnp.asarray(float(bw), dtype)

    cov = _weighted_cov(samples, w) * factor**2
    # Cholesky whitening: pdf = sum_i w_i N(x; s_i, cov). The d x d inverse
    # factor is computed ONCE so the per-chunk work is a plain matmul —
    # a per-chunk triangular solve compiled ~25x slower on TPU (measured).
    # Subtract BEFORE whitening (whiten-then-subtract cancels catastrophically
    # under the MXU's bf16 passes) and force full f32 on the tiny d x d
    # contraction.
    chol = jnp.linalg.cholesky(cov + 1e-12 * jnp.eye(d, dtype=cov.dtype))
    chol_inv = jax.scipy.linalg.solve_triangular(
        chol, jnp.eye(d, dtype=cov.dtype), lower=True
    )
    log_norm = -0.5 * d * jnp.log(2 * jnp.pi) - jnp.sum(
        jnp.log(jnp.diagonal(chol))
    )

    def eval_chunk_fn(xc):
        # xc (c, d); whitened pairwise distances against all samples
        diff = xc[:, None, :] - samples[None, :, :]  # (c, n, d)
        if d == 1:  # scalar whitening; dodges a slow 1-wide einsum compile
            white = diff * chol_inv[0, 0]
        else:
            white = jnp.einsum(
                "cnd,ed->cne", diff, chol_inv,
                precision=jax.lax.Precision.HIGHEST,
            )
        logk = log_norm - 0.5 * jnp.sum(white**2, axis=-1)  # (c, n)
        return jnp.sum(w[None, :] * jnp.exp(logk), axis=-1)

    m = x_eval.shape[0]
    if eval_chunk is None:
        # budget-derived default: keep the (chunk, n, d) pairwise tensor
        # under _PAIRWISE_BUDGET elements
        eval_chunk = max(1, _PAIRWISE_BUDGET // max(1, n * d))
    c = min(eval_chunk, m)
    pad = (-m) % c
    xp = jnp.concatenate([x_eval, jnp.zeros((pad, d), x_eval.dtype)], 0)
    out = jax.lax.map(eval_chunk_fn, xp.reshape(-1, c, d)).reshape(-1)
    return out[:m]


def bounded_kde_pdf(
    x_eval,
    samples,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    weights=None,
    bw: str | float = "scott",
    eval_chunk: int = 4096,
):
    """1-D Gaussian KDE with boundary reflection at ``lo``/``hi``.

    The notebooks' ``kde.pdf(X) + kde.pdf(bounds[0] - X)`` move (and
    pesummary's ``bounded_1d_kde``): mass leaking past a bound is folded
    back, so the estimate does not vanish at a hard support edge. Points
    outside [lo, hi] get zero density.
    """
    x_eval = jnp.asarray(x_eval).ravel()
    pdf = gaussian_kde_pdf(x_eval, samples, weights, bw, eval_chunk)
    if lo is not None:
        pdf = pdf + gaussian_kde_pdf(
            2.0 * lo - x_eval, samples, weights, bw, eval_chunk
        )
    if hi is not None:
        pdf = pdf + gaussian_kde_pdf(
            2.0 * hi - x_eval, samples, weights, bw, eval_chunk
        )
    inside = jnp.ones_like(pdf, bool)
    if lo is not None:
        inside &= x_eval >= lo
    if hi is not None:
        inside &= x_eval <= hi
    return jnp.where(inside, pdf, 0.0)


def ppd_kde_bands(
    ppd_samples,
    grid,
    alpha: float = 0.1,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    bw: str | float = "scott",
    draw_chunk: int = 32,
    normalize: bool = True,
):
    """Per-draw KDE pdfs of a 1-D PPD ensemble + HPD band over draws.

    ``ppd_samples``: (n_draws, n_samples) — e.g. one feature of the
    posterior-predictive draws from ``stats.calibrate.posterior_predictive``.
    ``grid``: (m,) evaluation points. Each draw's pdf is trapezoid-
    normalized over the grid when ``normalize`` (the notebooks do this
    after reflection). Returns ``(pdfs (n_draws, m), band (2, m))`` —
    the "augmentation with UQ" fill-between of
    ``bayesian_amplification_kde.ipynb`` is ``band``.

    Replaces the reference's 4400-iteration Python KDE loop with one
    chunked-vmapped program.
    """
    ppd = jnp.asarray(ppd_samples)
    if ppd.ndim != 2:
        raise ValueError("ppd_samples must be (n_draws, n_samples)")
    grid = jnp.asarray(grid).ravel()

    def one(draw):
        if lo is not None or hi is not None:
            y = bounded_kde_pdf(grid, draw, lo=lo, hi=hi, bw=bw)
        else:
            y = gaussian_kde_pdf(grid, draw, bw=bw)
        if normalize:
            y = y / jnp.trapezoid(y, grid)
        return y

    n = ppd.shape[0]
    c = min(draw_chunk, n)
    pad = (-n) % c
    ppd_p = jnp.concatenate([ppd, ppd[:1].repeat(pad, 0)], 0) if pad else ppd
    pdfs = jax.lax.map(jax.vmap(one), ppd_p.reshape(-1, c, ppd.shape[1]))
    pdfs = pdfs.reshape(-1, grid.shape[0])[:n]
    band = hpd_vectorized(pdfs, alpha=alpha)
    return np.asarray(pdfs), np.asarray(band)
