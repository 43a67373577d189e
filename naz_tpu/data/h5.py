"""HDF5 training-set IO, compatible with the reference's dataset layout.

The reference pipelines write ``train_theta / train_lambda / test_theta /
test_lambda`` datasets (``/root/reference/examples/papers/2506.05657/
parse_data.py:39-43``); population pipelines write plain ``theta`` arrays
(``src/naz/process_run_prod_time.py:10-32``). These helpers read/write that
layout so datasets produced for the reference drop straight in.
"""

from __future__ import annotations

import numpy as np


def save_training_h5(
    path: str,
    train_theta,
    train_lambda=None,
    test_theta=None,
    test_lambda=None,
    **extra,
) -> None:
    import h5py

    with h5py.File(path, "w") as hf:
        hf.create_dataset("train_theta", data=np.asarray(train_theta))
        if train_lambda is not None:
            hf.create_dataset("train_lambda", data=np.asarray(train_lambda))
        if test_theta is not None:
            hf.create_dataset("test_theta", data=np.asarray(test_theta))
        if test_lambda is not None:
            hf.create_dataset("test_lambda", data=np.asarray(test_lambda))
        for k, v in extra.items():
            hf.create_dataset(k, data=np.asarray(v))


def load_training_h5(path: str, thin: int = 1) -> dict:
    """Load a reference-layout training file; ``thin`` keeps every
    ``thin``-th row (the reference's ``--fthin`` dataset thinning)."""
    import h5py

    out = {}
    with h5py.File(path, "r") as hf:
        for k in hf.keys():
            out[k] = np.asarray(hf[k][()])
    if thin > 1:
        for k in ("train_theta", "train_lambda"):
            if k in out:
                out[k] = out[k][::thin]
    return out
