"""Fused Pallas kernel vs the pure-jnp path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naz_tpu.flows.maf import MaskedAutoregressiveFlow
from naz_tpu.ops.pallas import fused_made_affine_layer


def _pair(ctx=2, dim=3, hidden=(16, 16), n_layers=2, seed=0):
    plain = MaskedAutoregressiveFlow.create(
        dim, n_layers, hidden, context_dim=ctx, seed=seed
    )
    fused = MaskedAutoregressiveFlow.create(
        dim, n_layers, hidden, context_dim=ctx, seed=seed,
        use_pallas=True, pallas_tile=8, pallas_bf16=False,
    )
    params = plain.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(1), p.shape), params
    )
    return plain, fused, params


def test_fused_kernel_forward_matches():
    plain, fused, params = _pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (21, 3))  # non-multiple of tile
    c = jax.random.normal(jax.random.PRNGKey(3), (21, 2))
    z_p, ld_p = plain.forward(params, x, context=c)
    z_f, ld_f = fused.forward(params, x, context=c)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_p), rtol=1e-5, atol=1e-5)


def test_fused_kernel_grads_match():
    plain, fused, params = _pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    c = jax.random.normal(jax.random.PRNGKey(3), (16, 2))

    def loss(t, params, x):
        z, ld = t.forward(params, x, context=c)
        return jnp.sum(z**2) + 2.0 * jnp.sum(ld)

    g_p = jax.grad(lambda p: loss(plain, p, x))(params)
    g_f = jax.grad(lambda p: loss(fused, p, x))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)

    gx_p = jax.grad(lambda x: loss(plain, params, x))(x)
    gx_f = jax.grad(lambda x: loss(fused, params, x))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p), rtol=2e-4, atol=2e-4)


def test_fused_kernel_unconditional_and_clip_boundary():
    plain, fused, params = _pair(ctx=0)
    # push log-scales outside the clip window to exercise the clip gradient
    params = jax.tree.map(lambda p: 3.0 * p, params)
    x = jax.random.normal(jax.random.PRNGKey(4), (12, 3))
    z_p, ld_p = plain.forward(params, x)
    z_f, ld_f = fused.forward(params, x)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_p), rtol=1e-4, atol=1e-4)

    g_p = jax.grad(lambda p: jnp.sum(plain.forward(p, x)[1]))(params)
    g_f = jax.grad(lambda p: jnp.sum(fused.forward(p, x)[1]))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_fused_kernel_under_vmap():
    """HMC vmaps over chains = over params; the kernel must batch."""
    plain, fused, params = _pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    c = jax.random.normal(jax.random.PRNGKey(3), (8, 2))
    batched = jax.tree.map(
        lambda p: jnp.stack([p, p + 0.01]), params
    )
    lp_p = jax.vmap(lambda p: plain.forward(p, x, context=c)[1])(batched)
    lp_f = jax.vmap(lambda p: fused.forward(p, x, context=c)[1])(batched)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_p), rtol=1e-4, atol=1e-4)


def test_per_layer_mode_matches():
    """pallas_mode='layer' (the production 4-param path where stacked
    weights outgrow VMEM): forward + grads match the jnp path."""
    plain, _, params = _pair()
    layered = MaskedAutoregressiveFlow.create(
        3, 2, (16, 16), context_dim=2, seed=0,
        use_pallas=True, pallas_mode="layer", pallas_tile=8, pallas_bf16=False,
    )
    assert layered._pallas_plan()[0] == "layer"
    x = jax.random.normal(jax.random.PRNGKey(2), (21, 3))
    c = jax.random.normal(jax.random.PRNGKey(3), (21, 2))
    z_p, ld_p = plain.forward(params, x, context=c)
    z_f, ld_f = layered.forward(params, x, context=c)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_p), rtol=1e-5, atol=1e-5)

    def loss(t, p):
        z, ld = t.forward(p, x, context=c)
        return jnp.sum(z**2) + 2.0 * jnp.sum(ld)

    g_p = jax.grad(lambda p: loss(plain, p))(params)
    g_f = jax.grad(lambda p: loss(layered, p))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_pallas_plan_auto_selection():
    """Auto mode: small stacks stay VMEM-resident; production 4-param
    shape (18x[512]^5, 75 MB of weights) switches to per-layer with a
    tile that fits the backward under 16 MB."""
    small = MaskedAutoregressiveFlow.create(
        2, 16, (150, 150, 150), context_dim=2, use_pallas=True
    )
    assert small._pallas_plan() == ("stack", small.pallas_tile)
    big = MaskedAutoregressiveFlow.create(
        4, 18, (512,) * 5, context_dim=2, use_pallas=True, pallas_tile=2048
    )
    mode, tile = big._pallas_plan()
    assert mode == "layer" and tile == 512


def test_sample_kernel_stack_matches():
    """Fused sampling (whole-stack): inverse + logdet match the jnp path,
    and forward(inverse(z)) round-trips. (Explicit pallas_mode="stack" —
    the auto plan only routes sampling through Pallas in layer mode.)"""
    plain, _, params = _pair()
    fused = MaskedAutoregressiveFlow.create(
        3, 2, (16, 16), context_dim=2, seed=0,
        use_pallas=True, pallas_mode="stack", pallas_tile=8, pallas_bf16=False,
    )
    z = jax.random.normal(jax.random.PRNGKey(5), (21, 3))
    c = jax.random.normal(jax.random.PRNGKey(6), (21, 2))
    x_p, ld_p = plain.inverse(params, z, context=c)
    x_f, ld_f = fused.inverse(params, z, context=c)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_p), rtol=1e-5, atol=1e-5)
    z2, ld2 = fused.forward(params, x_f, context=c)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld2), -np.asarray(ld_f), rtol=1e-4, atol=1e-4)


def test_sample_kernel_layer_and_unconditional():
    plain_u, _, params_u = _pair(ctx=0)
    layered = MaskedAutoregressiveFlow.create(
        3, 2, (16, 16), context_dim=0, seed=0,
        use_pallas=True, pallas_mode="layer", pallas_tile=8, pallas_bf16=False,
    )
    z = jax.random.normal(jax.random.PRNGKey(7), (13, 3))
    x_p, ld_p = plain_u.inverse(params_u, z)
    x_f, ld_f = layered.inverse(params_u, z)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_p), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_p), rtol=1e-5, atol=1e-5)


def test_sample_kernel_grad_fallback():
    """Differentiating through the pallas sampling path falls back to the
    jnp VJP and matches it."""
    plain, _, params = _pair()
    fused = MaskedAutoregressiveFlow.create(
        3, 2, (16, 16), context_dim=2, seed=0,
        use_pallas=True, pallas_mode="stack", pallas_tile=8, pallas_bf16=False,
    )
    z = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
    c = jax.random.normal(jax.random.PRNGKey(9), (8, 2))

    def loss(t, p):
        x, ld = t.inverse(p, z, context=c)
        return jnp.sum(x**2) + jnp.sum(ld)

    g_p = jax.grad(lambda p: loss(plain, p))(params)
    g_f = jax.grad(lambda p: loss(fused, p))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_layer_mode_under_vmap():
    """Layer-mode density AND sampling batch correctly under vmap over
    params — the HMC chain-execution pattern."""
    plain, _, params = _pair()
    layered = MaskedAutoregressiveFlow.create(
        3, 2, (16, 16), context_dim=2, seed=0,
        use_pallas=True, pallas_mode="layer", pallas_tile=8, pallas_bf16=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    c = jax.random.normal(jax.random.PRNGKey(3), (8, 2))
    batched = jax.tree.map(lambda p: jnp.stack([p, p + 0.01]), params)
    lp_p = jax.vmap(lambda p: plain.forward(p, x, context=c)[1])(batched)
    lp_f = jax.vmap(lambda p: layered.forward(p, x, context=c)[1])(batched)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_p), rtol=1e-4, atol=1e-4)
    z = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    xs_p = jax.vmap(lambda p: plain.inverse(p, z, context=c)[0])(batched)
    xs_f = jax.vmap(lambda p: layered.inverse(p, z, context=c)[0])(batched)
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_p), rtol=1e-4, atol=1e-4)


def test_fused_kernel_bf16_close():
    """bf16 MXU mode: same math at bf16 matmul tolerance."""
    plain, _, params = _pair()
    fused16 = MaskedAutoregressiveFlow.create(
        3, 2, (16, 16), context_dim=2, seed=0,
        use_pallas=True, pallas_tile=8, pallas_bf16=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    c = jax.random.normal(jax.random.PRNGKey(3), (16, 2))
    z_p, ld_p = plain.forward(params, x, context=c)
    z_f, ld_f = fused16.forward(params, x, context=c)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_p), rtol=0.05, atol=0.05)
    g_p = jax.grad(lambda p: jnp.sum(plain.forward(p, x, context=c)[1]))(params)
    g_f = jax.grad(lambda p: jnp.sum(fused16.forward(p, x, context=c)[1]))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0.1, atol=0.1)
