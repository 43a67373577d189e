from naz_tpu.nn.embeddings import (
    MLPEmbedding,
    ResNetEmbedding,
    SVDInitEmbedding,
    ConcatEmbedding,
)
from naz_tpu.nn.autoencoder import (
    AutoEncoder,
    AutoEncoderConfig,
    ResAutoEncoder,
    pca_features,
    train_autoencoder,
)

__all__ = [
    "MLPEmbedding",
    "ResNetEmbedding",
    "SVDInitEmbedding",
    "ConcatEmbedding",
    "AutoEncoder",
    "AutoEncoderConfig",
    "ResAutoEncoder",
    "pca_features",
    "train_autoencoder",
]
