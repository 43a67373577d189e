"""Parity with the reference's JAX MAF semantics.

A small NumPy oracle re-states the reference's math from its documented
behavior (``bflow_jax_maf.py:74-225``): masked-MLP conditioner
``x @ (W*M).T + b`` with tanh, output blocks [mean, log_scale(clipped to
[-5,3])], one-pass sampling ``y = mu + x*exp(s)`` layer 0..L-1, sequential
per-coordinate density inversion layer L-1..0 with ``logp = N(z) - sum s``.
Weights imported through ``flow_from_reference_arrays`` must reproduce it
exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.compat import flow_from_reference_arrays
from naz_tpu.ops.masks import made_masks


def _oracle_nn(x, layer_params, layer_masks, context):
    h = np.concatenate([context, x], axis=-1) if context is not None else x
    for (w, b), m in zip(layer_params[:-1], layer_masks[:-1]):
        h = np.tanh(h @ (w * m).T + b)
    w, b = layer_params[-1]
    out = h @ (w * layer_masks[-1]) .T + b
    dim = x.shape[-1]
    return out[..., :dim], np.clip(out[..., dim:], -5.0, 3.0)


def _oracle_log_prob(x, params, masks, perms, context):
    ld = np.zeros(x.shape[:-1])
    z = x.copy()
    for lp, lm, perm in zip(reversed(params), reversed(masks), reversed(perms)):
        out = np.zeros_like(z)
        for idx in perm:  # sequential per-coordinate inversion in degree order
            mu, s = _oracle_nn(out, lp, lm, context)
            out[..., idx] = (z[..., idx] - mu[..., idx]) * np.exp(-s[..., idx])
        _, s = _oracle_nn(out, lp, lm, context)
        ld += s.sum(-1)
        z = out
    logp = -0.5 * (z**2).sum(-1) - 0.5 * x.shape[-1] * np.log(2 * np.pi) - ld
    return logp, z


def _oracle_sample_map(z, params, masks, context):
    x = z.copy()
    for lp, lm in zip(params, masks):
        mu, s = _oracle_nn(x, lp, lm, context)
        x = mu + x * np.exp(s)
    return x


def _random_ref_flow(rng, dim, ctx, hidden, n_layers):
    params, masks, perms = [], [], []
    for _ in range(n_layers):
        perm = rng.permutation(dim)
        m, _ = made_masks(dim, ctx, hidden, perm, n_params=2)
        m = [np.asarray(mm) for mm in m]
        widths = [ctx + dim, *hidden, 2 * dim]
        lp = [
            (
                0.5 * rng.standard_normal((fo, fi)) / np.sqrt(fi),
                0.1 * rng.standard_normal(fo),
            )
            for fi, fo in zip(widths[:-1], widths[1:])
        ]
        params.append(lp)
        masks.append(m)
        perms.append(perm)
    return params, masks, perms


@pytest.mark.parametrize("ctx_dim", [0, 2])
def test_imported_flow_matches_oracle_log_prob(ctx_dim):
    rng = np.random.default_rng(0)
    dim, hidden, n_layers = 3, (8, 8), 2
    params, masks, perms = _random_ref_flow(rng, dim, ctx_dim, hidden, n_layers)

    flow, fp = flow_from_reference_arrays(params, masks, perms, context_dim=ctx_dim)
    x = rng.standard_normal((6, dim)).astype(np.float32)
    c = rng.standard_normal((6, ctx_dim)).astype(np.float32) if ctx_dim else None

    lp_ours = np.asarray(flow.log_prob(fp, jnp.asarray(x), context=c))
    lp_oracle, _ = _oracle_log_prob(
        x.astype(np.float64),
        params,
        masks,
        perms,
        None if c is None else c.astype(np.float64),
    )
    np.testing.assert_allclose(lp_ours, lp_oracle, rtol=1e-4, atol=1e-4)


def test_imported_flow_matches_oracle_sampling_direction():
    rng = np.random.default_rng(1)
    dim, hidden, n_layers = 2, (8,), 3
    params, masks, perms = _random_ref_flow(rng, dim, 0, hidden, n_layers)
    flow, fp = flow_from_reference_arrays(params, masks, perms)

    z = rng.standard_normal((5, dim)).astype(np.float32)
    t = flow.transforms[0]
    x_ours, _ = t.inverse(fp["transforms"][0], jnp.asarray(z))
    x_oracle = _oracle_sample_map(z.astype(np.float64), params, masks, None)
    np.testing.assert_allclose(np.asarray(x_ours), x_oracle, rtol=1e-4, atol=1e-4)


def test_import_shape_validation():
    rng = np.random.default_rng(2)
    params, masks, perms = _random_ref_flow(rng, 2, 1, (8,), 2)
    with pytest.raises(ValueError):
        flow_from_reference_arrays(params, masks, perms, context_dim=0)  # wrong ctx
    with pytest.raises(ValueError):
        flow_from_reference_arrays(params[:1], masks, perms, context_dim=1)
