import numpy as np
import jax.numpy as jnp

from naz_tpu.ops.masks import made_degrees, made_masks, random_permutations


def test_degrees_identity_permutation():
    perm = np.arange(4)
    in_deg, hidden, var_deg = made_degrees(4, [8, 8], context_dim=2, permutation=perm)
    assert list(var_deg) == [1, 2, 3, 4]
    assert list(in_deg[:2]) == [0, 0]  # context first, degree 0
    assert all(0 <= d <= 3 for d in hidden[0])  # conditional: [0, dim-1]


def test_degrees_nontrivial_permutation():
    perm = np.array([2, 0, 1])
    _, _, var_deg = made_degrees(3, [4], context_dim=0, permutation=perm)
    # feature perm[k] has degree k+1
    assert var_deg[2] == 1 and var_deg[0] == 2 and var_deg[1] == 3


def test_mask_shapes():
    masks, skip = made_masks(3, 2, [16, 8], np.arange(3), n_params=2)
    assert masks[0].shape == (16, 5)
    assert masks[1].shape == (8, 16)
    assert masks[2].shape == (6, 8)
    assert skip.shape == (6, 5)


def test_autoregressive_property_of_masks():
    """Product of masks must give a strictly-lower-triangular dependency
    (in degree order): output block row i independent of inputs with degree >= i."""
    dim, ctx = 5, 3
    perm = np.random.default_rng(0).permutation(dim)
    masks, _ = made_masks(dim, ctx, [32, 32], perm, n_params=2)
    # connectivity = M_out @ M_h2 @ M_h1  (out x in)
    conn = np.asarray(masks[2])
    for m in reversed(masks[:-1]):
        conn = conn @ np.asarray(m)
    in_deg = np.concatenate([np.zeros(ctx), np.empty(dim)])
    in_deg[ctx + perm] = np.arange(1, dim + 1)
    out_deg = np.tile(in_deg[ctx:], 2)
    for i in range(conn.shape[0]):
        for j in range(conn.shape[1]):
            if conn[i, j] != 0:
                assert in_deg[j] < out_deg[i]


def test_unconditional_masks_have_live_first_degree():
    # the lowest-degree output must depend on NO inputs (pure bias)
    dim = 3
    masks, _ = made_masks(dim, 0, [8], np.arange(dim), n_params=1)
    conn = np.asarray(masks[1]) @ np.asarray(masks[0])
    assert conn[0].sum() == 0  # degree-1 output sees nothing
    assert conn[2].sum() > 0  # degree-3 output sees something


def test_random_permutations_reproducible():
    a = random_permutations(np.random.default_rng(7), 6, 4)
    b = random_permutations(np.random.default_rng(7), 6, 4)
    assert a.shape == (4, 6)
    assert (a == b).all()
    for row in a:
        assert sorted(row) == list(range(6))


def test_stochastic_masking_autoregressive_property():
    """simple_masking=False (the reference's sample_mask_indices
    simple=False knob, bflow_jax_maf.py:48-50): stochastic degree rounding
    must still satisfy the autoregressive property, both conditional and
    unconditional, and be reproducible from the rng."""
    dim, ctx = 5, 2
    perm = np.random.default_rng(3).permutation(dim)
    for context_dim in (ctx, 0):
        masks, _ = made_masks(
            dim, context_dim, [16, 16], perm, n_params=2,
            simple_masking=False, rng=np.random.default_rng(11),
        )
        conn = np.asarray(masks[-1])
        for m in reversed(masks[:-1]):
            conn = conn @ np.asarray(m)
        in_deg = np.concatenate(
            [np.zeros(context_dim), np.empty(dim)]
        )
        in_deg[context_dim + perm] = np.arange(1, dim + 1)
        out_deg = np.tile(in_deg[context_dim:], 2)
        assert all(
            in_deg[j] < out_deg[i]
            for i in range(conn.shape[0])
            for j in range(conn.shape[1])
            if conn[i, j] != 0
        )

    a, _ = made_masks(dim, ctx, [16], perm, simple_masking=False,
                      rng=np.random.default_rng(5))
    b, _ = made_masks(dim, ctx, [16], perm, simple_masking=False,
                      rng=np.random.default_rng(5))
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_stochastic_masking_flow_invertible():
    """A simple_masking=False MAF still inverts exactly (the masks define a
    valid triangular map whatever the rounding)."""
    import jax
    from naz_tpu.flows import maf_flow

    flow = maf_flow(3, 2, (12,), context_dim=2, seed=0, simple_masking=False)
    params = flow.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    c = jax.random.normal(jax.random.PRNGKey(2), (7, 2))
    lp = flow.log_prob(params, x, context=c)
    assert np.isfinite(np.asarray(lp)).all()
    s = flow.sample(params, jax.random.PRNGKey(3), 64, context=c[:1])
    assert np.isfinite(np.asarray(s)).all()
