import numpy as np
import jax
import jax.numpy as jnp

from naz_tpu.nn import (
    AutoEncoder,
    AutoEncoderConfig,
    ConcatEmbedding,
    MLPEmbedding,
    ResAutoEncoder,
    ResNetEmbedding,
    SVDInitEmbedding,
    pca_features,
    train_autoencoder,
)
from naz_tpu.flows import maf_flow
from naz_tpu.train import MLEConfig, train_mle


def test_mlp_and_resnet_embedding_shapes():
    for emb in (MLPEmbedding(5, 3, (16,)), ResNetEmbedding(5, 3, width=16)):
        p = emb.init_params(jax.random.PRNGKey(0))
        y = emb.apply(p, jnp.ones((7, 5)))
        assert y.shape == (7, 3)


def test_svd_init_embedding_uses_principal_subspace():
    rng = np.random.default_rng(0)
    # data varies along two fixed directions in 6-D
    basis = np.linalg.qr(rng.normal(size=(6, 2)))[0].T
    data = rng.normal(size=(500, 2)) @ basis + 0.01 * rng.normal(size=(500, 6))
    emb = SVDInitEmbedding.from_data(data, out_dim=2, rank=2, hidden_dims=(8,))
    # initialized first stage should span the data's principal subspace
    v = np.asarray(emb.v_init)
    overlap = np.linalg.norm(v @ basis.T)
    assert overlap > 1.3  # ~sqrt(2) for perfect alignment
    p = emb.init_params(jax.random.PRNGKey(0))
    assert emb.apply(p, jnp.asarray(data[:5])).shape == (5, 2)


def test_concat_embedding():
    e = ConcatEmbedding(
        embeddings=(MLPEmbedding(2, 2, (8,)), MLPEmbedding(3, 1, (8,))),
        slices=((0, 2), (2, 5)),
    )
    p = e.init_params(jax.random.PRNGKey(0))
    y = e.apply(p, jnp.ones((4, 5)))
    assert y.shape == (4, 3)


def test_pca_features():
    rng = np.random.default_rng(1)
    basis = np.linalg.qr(rng.normal(size=(10, 3)))[0].T
    data = (rng.normal(size=(1000, 3)) * [5, 2, 1]) @ basis
    data = data + 0.01 * rng.normal(size=data.shape)
    proj, (mean, comps) = pca_features(data, variance=0.99, return_basis=True)
    assert proj.shape[1] <= 4  # 3 real directions (+ maybe 1 noise)
    assert comps.shape[1] == 10


def test_autoencoder_trains():
    rng = np.random.default_rng(2)
    basis = np.linalg.qr(rng.normal(size=(8, 2)))[0].T
    data = rng.normal(size=(2000, 2)) @ basis + 0.01 * rng.normal(size=(2000, 8))
    ae = AutoEncoder(8, 2, (32,))
    res = train_autoencoder(
        ae, data, config=AutoEncoderConfig(lr=3e-3, max_epochs=300, batch_frac=0.25)
    )
    rec = ae.reconstruct(res.params, jnp.asarray(data[:200], jnp.float32))
    mse = float(jnp.mean((rec - jnp.asarray(data[:200], jnp.float32)) ** 2))
    assert mse < 0.05, mse
    assert res.losses[-1] < res.losses[0]


def test_res_autoencoder_trains():
    """Residual variant (reference ``ResAutoEncoder``, autoencoder.py:97-117)
    learns the same planted 2-D subspace through the shared trainer."""
    rng = np.random.default_rng(3)
    basis = np.linalg.qr(rng.normal(size=(8, 2)))[0].T
    data = rng.normal(size=(2000, 2)) @ basis + 0.01 * rng.normal(size=(2000, 8))
    ae = ResAutoEncoder(8, 2, (32, 32))  # width 32, 2 residual blocks
    res = train_autoencoder(
        ae, data, config=AutoEncoderConfig(lr=3e-3, max_epochs=300, batch_frac=0.25)
    )
    x = jnp.asarray(data[:200], jnp.float32)
    mse = float(jnp.mean((ae.reconstruct(res.params, x) - x) ** 2))
    assert mse < 0.05, mse
    z = ae.encode(res.params, x)
    assert z.shape == (200, 2)


def test_flow_with_embedding_end_to_end():
    """Conditional MLE with an embedding net, mirroring the reference's
    embedding_net option (flow.py:76)."""
    key = jax.random.PRNGKey(0)
    n = 3000
    raw_ctx = jax.random.uniform(key, (n, 4), minval=-1, maxval=1)
    c_eff = raw_ctx[:, :1]  # only the first feature matters
    x = c_eff + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (n, 2))

    emb = MLPEmbedding(4, 2, (16,))
    flow = maf_flow(2, 2, (16,), context_dim=2, embedding=emb, seed=0)
    res = train_mle(
        flow,
        x,
        context=raw_ctx,
        config=MLEConfig(lr=5e-3, max_epochs=150, batch_frac=0.25, patience=20),
    )
    ctx = jnp.array([[0.8, 0.0, 0.0, 0.0]])
    s = flow.sample(res.params, jax.random.PRNGKey(2), 5000, context=ctx)
    np.testing.assert_allclose(np.asarray(jnp.mean(s, 0)), [0.8, 0.8], atol=0.15)
