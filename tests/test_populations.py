import numpy as np

from naz_tpu.data.populations import (
    build_grid_training_set,
    extract_bbh_parameters,
    select_bbh_mergers,
    weighted_population_draws,
)


def test_select_bbh_mergers_mask():
    s1 = np.array(["BH", "NS", "BH", "BH"])
    s2 = np.array(["BH", "BH", "NS", "BH"])
    ev = np.array(["CO_contact", "CO_contact", "CO_contact", "detached"])
    idx = select_bbh_mergers(s1, s2, ev)
    assert idx.tolist() == [0]
    # custom states pass through
    idx = select_bbh_mergers(s1, s2, ev, co_state="NS", merger_event="CO_contact")
    assert idx.tolist() == []


def test_extract_bbh_parameters_swaps_and_clips():
    rng = np.random.default_rng(0)
    m1 = rng.uniform(5, 50, 5000)
    m2 = rng.uniform(5, 50, 5000)  # not ordered
    chi = rng.uniform(-1, 1, 5000)
    t = rng.exponential(1.0, 5000)
    theta, low, high = extract_bbh_parameters(m1, m2, chi, t)
    assert theta.shape == (5000, 4)
    assert (theta[:, 0] >= theta[:, 1]).all()  # mass ordering enforced
    assert (low < high).all()
    inside = ((theta >= low) & (theta <= high)).all(axis=1).mean()
    assert inside > 0.98  # quantile-clipped box holds the bulk


def test_weighted_draws_follow_weights():
    theta = np.array([[0.0], [1.0]])
    w = np.array([0.2, 0.8])
    draws = weighted_population_draws(theta, w, 20000, np.random.default_rng(1))
    frac_one = (draws[:, 0] == 1.0).mean()
    assert abs(frac_one - 0.8) < 0.02


def test_build_grid_training_set_with_holdout():
    rng = np.random.default_rng(2)
    pops = []
    for lam in [(0.0, 0.2), (0.1, 0.5), (0.2, 0.8)]:
        theta = rng.normal(size=(500, 2)) + lam[0]
        w = rng.uniform(0.1, 1.0, 500)
        pops.append((theta, w, lam))
    tr_t, tr_l, te_t, te_l = build_grid_training_set(
        pops, n_draws_each=300, held_out=1, rng=rng
    )
    assert tr_t.shape == (600, 2) and tr_l.shape == (600, 2)
    assert te_t.shape == (300, 2)
    np.testing.assert_array_equal(te_l, [0.1, 0.5])
    # held-out lambda must not appear in training conditions
    assert not (tr_l == np.array([0.1, 0.5])).all(axis=1).any()
