"""Pickle-free pytree checkpointing.

The reference checkpoints via ``pickle.dump(mcmc.last_state)``
(``/root/reference/src/naz/flows/bflow_jax_maf.py:329-331,365-369,393-397``)
— opaque and fragile across versions. Here a checkpoint is a plain ``.npz``
of the pytree leaves (flattened in deterministic ``tree_flatten`` order);
loading requires a template pytree with the same structure, which every
caller has (the state it would otherwise initialize). Atomic rename so a
crash mid-write never corrupts the previous checkpoint.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import jax


def save_pytree(path: str, tree) -> None:
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, template):
    """Load leaves saved by :func:`save_pytree` into ``template``'s structure."""
    data = np.load(path)
    treedef = jax.tree.structure(template)
    n = treedef.num_leaves
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    template_leaves = jax.tree.leaves(template)
    leaves = [
        np.asarray(l).astype(np.asarray(t).dtype).reshape(np.asarray(t).shape)
        for l, t in zip(leaves, template_leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)
