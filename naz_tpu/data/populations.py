"""Population-synthesis dataset preparation.

Counterparts of the reference's astro pipelines, with the external-survey
specifics factored out so the numerical logic is testable without POSYDON/
COMPAS installed:

* :func:`extract_bbh_parameters` — the column-swap + quantile-clipped
  bounds extraction of ``/root/reference/src/naz/process_run_prod_time.py:10-32``
  (θ = (m1, m2, chi_eff[, time]) with m1 >= m2 enforced and a
  quantile-trimmed box);
* :func:`weighted_population_draws` — the weighted resampling used by
  ``examples/papers/2506.05657/parse_data.py`` to turn per-binary cosmic
  weights into equal-weight training draws (10^4 per grid point);
* :func:`load_posydon_population` — thin, import-gated loader that feeds
  a POSYDON ``TransientPopulation`` into the extraction (raises a clear
  error when posydon isn't installed, as in this image).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def extract_bbh_parameters(
    m1: np.ndarray,
    m2: np.ndarray,
    chi_eff: np.ndarray,
    time: Optional[np.ndarray] = None,
    quantile_clip: float = 0.001,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the training θ array with reference conventions.

    Enforces the mass ordering m1 >= m2 by swapping rows where needed
    (the reference's column swap), stacks (m1, m2, chi_eff[, time]), and
    returns ``(theta, low, high)`` with bounds at the (q, 1-q) quantiles
    per feature (the reference's quantile-clipped bounds).
    """
    m1 = np.asarray(m1, float)
    m2 = np.asarray(m2, float)
    swap = m2 > m1
    m1s = np.where(swap, m2, m1)
    m2s = np.where(swap, m1, m2)
    cols = [m1s, m2s, np.asarray(chi_eff, float)]
    if time is not None:
        cols.append(np.asarray(time, float))
    theta = np.stack(cols, axis=1)
    low = np.quantile(theta, quantile_clip, axis=0)
    high = np.quantile(theta, 1.0 - quantile_clip, axis=0)
    return theta, low, high


def weighted_population_draws(
    theta: np.ndarray,
    weights: np.ndarray,
    n_draws: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Resample an unequal-weight population into ``n_draws`` equal-weight
    rows (reference ``parse_data.py``'s 10^4 weighted draws per grid
    point)."""
    rng = rng or np.random.default_rng(0)
    w = np.asarray(weights, float)
    w = w / w.sum()
    idx = rng.choice(len(theta), size=n_draws, replace=True, p=w)
    return np.asarray(theta)[idx]


def build_grid_training_set(
    populations: Sequence[Tuple[np.ndarray, np.ndarray, Sequence[float]]],
    n_draws_each: int,
    held_out: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
):
    """Assemble a conditional training set from per-grid-point populations.

    ``populations``: list of (theta, weights, lambda_values). Returns
    ``(train_theta, train_lambda, test_theta, test_lambda)`` with one grid
    point optionally held out as the test set (the reference's 4x5 grid
    with one held-out point, ``parse_data.py:12-27``).
    """
    rng = rng or np.random.default_rng(0)
    train_t, train_l = [], []
    test_t = test_l = None
    for i, (theta, w, lam) in enumerate(populations):
        draws = weighted_population_draws(theta, w, n_draws_each, rng)
        lam_arr = np.tile(np.asarray(lam, float), (n_draws_each, 1))
        if held_out is not None and i == held_out:
            test_t, test_l = draws, np.asarray(lam, float)
            continue
        train_t.append(draws)
        train_l.append(lam_arr)
    return (
        np.concatenate(train_t),
        np.concatenate(train_l),
        test_t,
        test_l,
    )


def select_bbh_mergers(
    s1_state: np.ndarray,
    s2_state: np.ndarray,
    event: np.ndarray,
    co_state: str = "BH",
    merger_event: str = "CO_contact",
) -> np.ndarray:
    """Indices of binaries that merged as BH+BH.

    Array-level form of the selection mask in the reference's transient
    pipeline (``examples/papers/eposydon/transient.py:21-28``: rows with
    ``S1_state == 'BH' & S2_state == 'BH' & event == 'CO_contact'``),
    applicable to any population table's string columns.
    """
    s1 = np.asarray(s1_state)
    s2 = np.asarray(s2_state)
    ev = np.asarray(event)
    mask = (s1 == co_state) & (s2 == co_state) & (ev == merger_event)
    return np.flatnonzero(mask)


def load_posydon_population(path: str, **kwargs):
    """Load a POSYDON TransientPopulation and extract BBH parameters.

    Requires the ``posydon`` package (not bundled here); the numerical
    processing it feeds is :func:`extract_bbh_parameters`, which is fully
    tested without it.
    """
    try:
        from posydon.popsyn.synthetic_population import TransientPopulation
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "posydon is not installed; use extract_bbh_parameters on arrays "
            "exported from your population-synthesis tool instead"
        ) from e
    pop = TransientPopulation(path)  # pragma: no cover
    df = pop.population  # pragma: no cover
    return extract_bbh_parameters(  # pragma: no cover
        df["S1_mass"].to_numpy(),
        df["S2_mass"].to_numpy(),
        df["chi_eff"].to_numpy(),
        df.get("time"),
        **kwargs,
    )
