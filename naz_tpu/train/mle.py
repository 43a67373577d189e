"""Maximum-likelihood flow training.

Capability parity with the reference trainers
(``/root/reference/src/naz/trainers/train_flows.py:73-242`` — minibatch NLL,
L1/L2, grad clipping, ReduceLROnPlateau, early stop, best-val restore — and
the JAX full-batch ``train_maf``, ``bflow_jax_maf.py:272-318``), redesigned
for XLA:

* the **whole epoch is one jitted program**: shuffle (on-device RNG), a
  ``lax.scan`` over minibatches, validation NLL, best-params snapshot
  (``jnp.where``-select, no host copies), plateau-decay and early-stop
  counters all live in a device-side carry;
* the host loop only reads back a scalar ``stop`` flag per epoch;
* dataset stays resident on device; batches are gathered by index so there
  is no per-epoch host->device traffic.

The plateau/early-stop policy follows the torch trainer: track best
validation NLL; after ``patience`` epochs without improvement multiply the
learning rate by ``lr_decay`` (and reset the counter); once the learning
rate would fall below ``min_lr``, a further patience overrun stops training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


@dataclasses.dataclass(frozen=True)
class MLEConfig:
    lr: float = 1e-3
    min_lr: float = 1e-9
    lr_decay: float = 0.75
    patience: int = 64
    max_epochs: int = 1024
    min_epochs: int = 0
    batch_frac: float = 0.05  # fraction of the training split per minibatch
    batch_size: Optional[int] = None  # overrides batch_frac if set
    val_frac: float = 0.11  # matches reference train_frac=0.89
    clip_norm: Optional[float] = 1.0  # global-norm clip (torch clip_grad_norm_)
    clip_val: Optional[float] = None  # elementwise clip (JAX train_maf)
    l1: float = 0.0
    weight_decay: float = 0.0
    seed: int = 0
    log_every: int = 100
    verbose: bool = False
    # train with dropout active (flows built with dropout_rate > 0): each
    # minibatch step draws a fresh dropout mask realization
    dropout: bool = False
    # optax optimizer factory taking learning_rate (e.g. optax.adamw,
    # optax.sgd); None -> adam. The plateau LR-decay schedule drives its
    # learning_rate through inject_hyperparams, replacing the reference's
    # hand-rolled Adam (trainers/coptimizer.py).
    optimizer: Optional[Any] = None
    # epochs executed per device program: the host only reads back the stop
    # flag once per chunk, so dispatch/transfer latency amortizes. Early stop
    # overshoots by < sync_every epochs (updates freeze once stop is set).
    sync_every: int = 25


class TrainResult(NamedTuple):
    params: Any  # best-validation params
    best_train_params: Any
    train_losses: np.ndarray
    val_losses: np.ndarray
    epochs_run: int


class _EpochState(NamedTuple):
    params: Any
    opt_state: Any
    best_params: Any
    best_train_params: Any
    best_val: jnp.ndarray
    best_train: jnp.ndarray
    n_no_improve: jnp.ndarray
    lr: jnp.ndarray
    key: jnp.ndarray
    epoch: jnp.ndarray
    stop: jnp.ndarray


def train_mle(
    flow, x, context=None, config: MLEConfig = MLEConfig(), mesh=None
) -> TrainResult:
    """Fit ``flow`` to samples ``x`` (optionally conditional on ``context``).

    With ``mesh`` (a ``naz_tpu.parallel.make_mesh`` mesh) the training and
    validation sets are sharded over the ``data`` axis; params stay
    replicated and XLA turns the NLL reduction into a psum over ICI —
    data-parallel training with zero changes elsewhere.
    """
    cfg = config
    x = jnp.asarray(x)
    n = x.shape[0]
    if context is not None:
        context = jnp.asarray(context)
        if context.shape[0] != n:
            raise ValueError("context must have the same leading dim as x")

    key = jax.random.PRNGKey(cfg.seed)
    key, k_split, k_init = jax.random.split(key, 3)

    # train/val split (on device, like sklearn train_test_split in the ref)
    perm = jax.random.permutation(k_split, n)
    n_val = max(1, int(round(cfg.val_frac * n))) if cfg.val_frac > 0 else 0
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    x_tr, x_val = x[train_idx], x[val_idx]
    c_tr = context[train_idx] if context is not None else None
    c_val = context[val_idx] if context is not None else None
    n_tr = int(x_tr.shape[0])

    if mesh is not None:
        from naz_tpu.parallel import shard_data

        n_shards = mesh.shape["data"]
        keep_tr = (n_tr // n_shards) * n_shards
        x_tr = shard_data(x_tr[:keep_tr], mesh)
        c_tr = shard_data(c_tr[:keep_tr], mesh) if c_tr is not None else None
        keep_val = max((n_val // n_shards) * n_shards, 0)
        if keep_val:
            x_val = shard_data(x_val[:keep_val], mesh)
            c_val = shard_data(c_val[:keep_val], mesh) if c_val is not None else None
            n_val = keep_val
        n_tr = keep_tr

    if cfg.batch_size is not None:
        batch = min(cfg.batch_size, n_tr)
    else:
        batch = max(1, int(round(cfg.batch_frac * n_tr)))
    n_batches = max(1, n_tr // batch)

    opt = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
        optax.clip(cfg.clip_val) if cfg.clip_val is not None else optax.identity(),
        optax.clip_by_global_norm(cfg.clip_norm) if cfg.clip_norm is not None else optax.identity(),
        optax.inject_hyperparams(cfg.optimizer or optax.adam)(learning_rate=cfg.lr),
    )

    params0 = flow.init_params(k_init)
    opt_state0 = opt.init(params0)

    def nll(params, xb, cb, dropout_key=None):
        lp = flow.log_prob(params, xb, context=cb, dropout_key=dropout_key)
        loss = -jnp.mean(lp)
        if cfg.l1:
            loss = loss + cfg.l1 * sum(
                jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(params)
            )
        return loss

    def set_lr(opt_state, lr):
        # inject_hyperparams is the last element of the chain
        inner = opt_state[-1]
        inner.hyperparams["learning_rate"] = lr
        return opt_state

    def epoch_fn(state: _EpochState) -> tuple[_EpochState, jnp.ndarray, jnp.ndarray]:
        key, k_shuf, k_drop = jax.random.split(state.key, 3)
        order = jax.random.permutation(k_shuf, n_tr)[: n_batches * batch]
        order = order.reshape(n_batches, batch)
        drop_keys = (
            jax.random.split(k_drop, n_batches) if cfg.dropout else None
        )

        opt_state = set_lr(state.opt_state, state.lr)

        def batch_step(carry, xs):
            idx, dk = xs
            params, opt_state = carry
            xb = x_tr[idx]
            cb = c_tr[idx] if c_tr is not None else None
            loss, grads = jax.value_and_grad(nll)(params, xb, cb, dk)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), batch_losses = lax.scan(
            batch_step, (state.params, opt_state), (order, drop_keys)
        )
        train_loss = jnp.mean(batch_losses)
        val_loss = (
            nll(params, x_val, c_val) if n_val > 0 else train_loss
        )

        improved = val_loss < state.best_val
        best_params = jax.tree.map(
            lambda b, p: jnp.where(improved, p, b), state.best_params, params
        )
        best_val = jnp.where(improved, val_loss, state.best_val)

        improved_tr = train_loss < state.best_train
        best_train_params = jax.tree.map(
            lambda b, p: jnp.where(improved_tr, p, b), state.best_train_params, params
        )
        best_train = jnp.where(improved_tr, train_loss, state.best_train)

        past_min = state.epoch >= cfg.min_epochs
        n_no_improve = jnp.where(improved | ~past_min, 0, state.n_no_improve + 1)

        overrun = n_no_improve > cfg.patience
        at_floor = state.lr <= cfg.min_lr
        lr = jnp.where(overrun & ~at_floor, state.lr * cfg.lr_decay, state.lr)
        stop = overrun & at_floor
        n_no_improve = jnp.where(overrun & ~at_floor, 0, n_no_improve)

        new_state = _EpochState(
            params=params,
            opt_state=opt_state,
            best_params=best_params,
            best_train_params=best_train_params,
            best_val=best_val,
            best_train=best_train,
            n_no_improve=n_no_improve,
            lr=lr,
            key=key,
            epoch=state.epoch + 1,
            stop=stop,
        )
        return new_state, train_loss, val_loss

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def chunk_fn(state: _EpochState, length: int):
        def body(state, _):
            def run(state):
                s, tr, vl = epoch_fn(state)
                return s, (tr, vl)

            def frozen(state):
                nan = jnp.full((), jnp.nan, dtype=jnp.float32)
                return state, (nan, nan)

            return lax.cond(state.stop, frozen, run, state)

        state, (tr, vl) = lax.scan(body, state, None, length=length)
        return state, tr, vl

    state = _EpochState(
        params=params0,
        opt_state=opt_state0,
        best_params=params0,
        best_train_params=params0,
        best_val=jnp.inf,
        best_train=jnp.inf,
        n_no_improve=jnp.array(0),
        lr=jnp.array(cfg.lr, dtype=jnp.float32),
        key=key,
        epoch=jnp.array(0),
        stop=jnp.array(False),
    )

    train_losses, val_losses = [], []
    n_chunks = -(-cfg.max_epochs // cfg.sync_every)
    for chunk in range(n_chunks):
        length = min(cfg.sync_every, cfg.max_epochs - chunk * cfg.sync_every)
        state, tr, vl = chunk_fn(state, length)
        train_losses.append(tr)
        val_losses.append(vl)
        if cfg.verbose:
            print(
                f"epoch {int(state.epoch)}: train {float(tr[-1]):.4f} "
                f"val {float(vl[-1]):.4f} lr {float(state.lr):.2e} "
                f"best_val {float(state.best_val):.4f}"
            )
        if bool(state.stop):
            break

    tr = np.asarray(jnp.concatenate(train_losses))[: cfg.max_epochs]
    vl = np.asarray(jnp.concatenate(val_losses))[: cfg.max_epochs]
    mask = ~np.isnan(tr)
    return TrainResult(
        params=state.best_params,
        best_train_params=state.best_train_params,
        train_losses=tr[mask],
        val_losses=vl[mask],
        epochs_run=int(mask.sum()),
    )
