"""Device-mesh parallelism: chain sharding and data-sharded likelihood.

The reference's only multi-device axis is MCMC chains — numpyro pmaps chains
over ``CUDA_VISIBLE_DEVICES`` (``/root/reference/src/naz/flows/
bflow_jax_maf.py:322-324``, ``examples/papers/2506.05657/hmc_maf_exact.py:69``).
TPU-native equivalent (SURVEY.md §2.4):

* a 2-D ``Mesh(("chains", "data"))``;
* chains stay a **vmapped batch axis inside one jitted program**, sharded
  over the ``chains`` mesh axis with ``NamedSharding`` — GSPMD partitions
  the per-chain NUTS program so collectives ride ICI, no per-device Python;
* the likelihood is a plain sum over data points (``bflow_jax_maf.py:235``)
  — embarrassingly shardable: shard the training set over ``data`` and let
  the ``sum`` lower to a ``psum``;
* multi-host pods: call ``jax.distributed.initialize()`` before
  :func:`make_mesh`; everything else is unchanged (shardings are global).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_chain_shards: Optional[int] = None, num_data_shards: int = 1
) -> Mesh:
    """Build a ``(chains, data)`` mesh over all visible devices.

    Defaults to putting every device on the chain axis (the reference's
    one-chain-per-GPU layout, generalized).
    """
    n = jax.device_count()
    if num_chain_shards is None:
        num_chain_shards = n // num_data_shards
    if num_chain_shards * num_data_shards != n:
        raise ValueError(
            f"{num_chain_shards} x {num_data_shards} != device count {n}"
        )
    devices = np.asarray(jax.devices()).reshape(num_chain_shards, num_data_shards)
    return Mesh(devices, ("chains", "data"))


def shard_chain_state(tree, mesh: Mesh):
    """Place a per-chain pytree (leading axis = chains) on the mesh,
    sharded over the ``chains`` axis and replicated over ``data``."""

    def put(x):
        x = jnp.asarray(x)
        spec = P("chains") if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_data(x, mesh: Mesh):
    """Shard an (N, ...) data array over the ``data`` mesh axis (replicated
    over chains). N must divide by the data-axis size."""
    x = jnp.asarray(x)
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree
    )


def sharded_loglik(flow, x, context=None, mesh: Optional[Mesh] = None):
    """Like :func:`naz_tpu.bayes.make_flow_loglik` but with the dataset
    sharded over the ``data`` mesh axis. The per-datum log-prob map is
    elementwise over N, so XLA keeps it sharded and turns the downstream
    ``sum``/``mean`` into a psum over ICI."""
    x = jnp.asarray(x)
    if context is not None:
        context = jnp.asarray(context)
    if mesh is not None:
        x = shard_data(x, mesh)
        if context is not None:
            context = shard_data(context, mesh)
    return lambda params: flow.log_prob(params, x, context=context)


def shard_chees_state(state, mesh: Mesh):
    """Place a ``ChEESState`` on the mesh with semantically correct specs:
    per-chain leaves (``q``, ``U``, ``grad``, ``key`` — leading axis =
    chains) shard over the ``chains`` mesh axis; the cross-chain shared
    adaptation state (``step_size``, ``traj_len``, ``inv_mass``,
    ``iteration``) replicates. (``shard_chain_state`` would shard the
    (dim,) ``inv_mass`` over the chain axis — legal but a nonsense
    layout that forces an all-gather in every leapfrog.)"""
    from naz_tpu.mcmc.chees import ChEESState

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    return ChEESState(
        q=put(state.q, P("chains")),
        U=put(state.U, P("chains")),
        grad=put(state.grad, P("chains")),
        key=put(state.key, P("chains")),
        step_size=put(state.step_size, P()),
        traj_len=put(state.traj_len, P()),
        inv_mass=put(state.inv_mass, P()),
        iteration=put(state.iteration, P()),
    )
