import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.ops.bounding import bounding_transform, inverse_bounding_transform


def test_roundtrip_and_logdet():
    low = jnp.array([-1.0, 0.0])
    high = jnp.array([2.0, 5.0])
    x = jnp.array([[0.3, 1.7], [-0.9, 4.9]])
    u, ld = bounding_transform(x, low, high)
    x2, ld_inv = inverse_bounding_transform(u, low, high)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)


def test_logdet_matches_autodiff():
    low = jnp.array([-1.0, 0.0])
    high = jnp.array([2.0, 5.0])
    x = jnp.array([0.3, 1.7])
    J = jax.jacfwd(lambda x: bounding_transform(x, low, high)[0])(x)
    _, ld = bounding_transform(x, low, high)
    sign, logdet = np.linalg.slogdet(np.asarray(J))
    assert sign == 1
    np.testing.assert_allclose(float(ld), logdet, rtol=1e-5)
