"""Aleatoric bootstrap MLE ensembles.

Counterpart of the reference's aleatoric-variance pipeline
(``/root/reference/examples/papers/2506.05657/train_mle_aleatoric.py:20-78``):
repeated MLE fits of the same flow on thinned/resampled data with varying
training randomness. Downstream analysis treats the member-to-member spread
of predictive densities as the aleatoric (data-limited) uncertainty of the
MLE emulator (the paper's ``mle_amplification*.ipynb`` studies).

TPU-first redesign: the reference launches one SLURM array job per member
(``python train_mle_aleatoric.py $index $fthin``, re-seeding NumPy per
index). Here members train in-process:

* ``vmapped=False`` (default) — members run sequentially through the fully
  jitted :func:`naz_tpu.train.train_mle`; at production scale one member
  already saturates the chip (PERFORMANCE.md), and each member keeps the
  full plateau/early-stop policy.
* ``vmapped=True`` — all members train **simultaneously in one jitted
  program**, ``vmap``-ed over the member axis (init, shuffling, minibatch
  scan, plateau decay and per-member early-stop freezing all under the
  batch axis). For the small thinned fits this pipeline is built for
  (``fthin >= 10``), the member axis is what fills the MXU.

Subsampling follows the reference: each member sees ``n/fthin`` points.
``resample="thin"`` draws without replacement (the reference's
``np.random.choice(N, size=int(N/fthin))``), ``"bootstrap"`` with
replacement, ``"none"`` uses the full set (member randomness only).
``shared_subsample=True`` reproduces the reference quirk of re-seeding to a
fixed value before thinning (``train_mle_aleatoric.py:28-31`` seeds 69
regardless of the member index), so every member sees the *same* subsample
and only the training randomness varies.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from naz_tpu.train.mle import MLEConfig, train_mle


@dataclasses.dataclass(frozen=True)
class EnsembleConfig:
    n_members: int = 8
    fthin: int = 1
    resample: str = "thin"  # "thin" | "bootstrap" | "none"
    shared_subsample: bool = False
    base_seed: int = 69  # the reference's seed convention (69 + index)
    vmapped: bool = False
    mle: MLEConfig = MLEConfig()


class EnsembleResult(NamedTuple):
    params: Any  # pytree with a leading (n_members,) axis
    val_losses: np.ndarray  # (n_members,) best validation NLL per member
    epochs_run: np.ndarray  # (n_members,)


def _member_indices(rng: np.random.Generator, n: int, cfg: EnsembleConfig):
    n_sub = max(1, n // cfg.fthin)
    if cfg.resample == "none":
        return np.arange(n)
    if cfg.resample == "thin":
        return rng.choice(n, size=n_sub, replace=False)
    if cfg.resample == "bootstrap":
        return rng.choice(n, size=n_sub, replace=True)
    raise ValueError(f"unknown resample mode {cfg.resample!r}")


def train_mle_ensemble(
    flow, x, context=None, config: EnsembleConfig = EnsembleConfig()
) -> EnsembleResult:
    """Fit an ensemble of independently-trained MLE flows.

    Returns stacked best-validation params (leading member axis) ready for
    :func:`ensemble_log_prob` / :func:`ensemble_sample` / ``vmap``.
    """
    cfg = config
    x = np.asarray(x)
    n = x.shape[0]
    if context is not None:
        context = np.asarray(context)

    member_idx = []
    for i in range(cfg.n_members):
        # shared_subsample: re-seed to the same value for every member, so
        # all members draw the identical subsample (the reference quirk)
        rng = np.random.default_rng(
            cfg.base_seed if cfg.shared_subsample else cfg.base_seed + i
        )
        member_idx.append(_member_indices(rng, n, cfg))
    member_idx = np.stack(member_idx)  # (M, n_sub)

    if cfg.vmapped:
        x_m = jnp.asarray(x[member_idx])
        c_m = jnp.asarray(context[member_idx]) if context is not None else None
        seeds = jnp.arange(cfg.n_members) + cfg.base_seed
        params, best_val, epochs = _fit_many(flow, x_m, c_m, cfg.mle, seeds)
        return EnsembleResult(
            params=params,
            val_losses=np.asarray(best_val),
            epochs_run=np.asarray(epochs),
        )

    members, vals, epochs = [], [], []
    for i in range(cfg.n_members):
        idx = member_idx[i]
        res = train_mle(
            flow,
            x[idx],
            context=context[idx] if context is not None else None,
            config=dataclasses.replace(cfg.mle, seed=cfg.base_seed + i),
        )
        members.append(res.params)
        vals.append(float(res.val_losses.min()))
        epochs.append(res.epochs_run)
    params = jax.tree.map(lambda *ps: jnp.stack(ps), *members)
    return EnsembleResult(
        params=params,
        val_losses=np.asarray(vals),
        epochs_run=np.asarray(epochs),
    )


def _fit_many(flow, x_m, c_m, cfg: MLEConfig, seeds):
    """One jitted program training all members at once (fixed epoch budget).

    Mirrors ``train_mle``'s device-side epoch (shuffle -> minibatch scan ->
    val NLL -> best-params select -> plateau decay / early stop) with the
    member axis vmapped over the whole thing. Stopped members freeze via
    ``where``-selects (compute continues — the budget is the static
    ``max_epochs``), so all members share one trace and one compilation.
    """
    n = int(x_m.shape[1])
    n_val = max(1, int(round(cfg.val_frac * n))) if cfg.val_frac > 0 else 0
    n_tr = n - n_val
    if cfg.batch_size is not None:
        batch = min(cfg.batch_size, n_tr)
    else:
        batch = max(1, int(round(cfg.batch_frac * n_tr)))
    n_batches = max(1, n_tr // batch)

    opt = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay)
        if cfg.weight_decay
        else optax.identity(),
        optax.clip(cfg.clip_val) if cfg.clip_val is not None else optax.identity(),
        optax.clip_by_global_norm(cfg.clip_norm)
        if cfg.clip_norm is not None
        else optax.identity(),
        optax.inject_hyperparams(cfg.optimizer or optax.adam)(learning_rate=cfg.lr),
    )

    def nll(params, xb, cb, dropout_key=None):
        lp = flow.log_prob(params, xb, context=cb, dropout_key=dropout_key)
        loss = -jnp.mean(lp)
        if cfg.l1:
            loss = loss + cfg.l1 * sum(
                jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(params)
            )
        return loss

    def set_lr(opt_state, lr):
        inner = opt_state[-1]
        inner.hyperparams["learning_rate"] = lr
        return opt_state

    def fit_one(seed, x, c):
        key = jax.random.PRNGKey(seed)
        key, k_split, k_init = jax.random.split(key, 3)
        perm = jax.random.permutation(k_split, n)
        val_idx, tr_idx = perm[:n_val], perm[n_val:]
        x_tr, x_val = x[tr_idx], x[val_idx]
        c_tr = c[tr_idx] if c is not None else None
        c_val = c[val_idx] if c is not None else None

        params0 = flow.init_params(k_init)
        opt_state0 = opt.init(params0)

        def epoch(carry, xs):
            k_epoch, epoch_i = xs
            (params, opt_state, best_params, best_val, no_imp, lr, stop) = carry
            k_shuf, k_drop = jax.random.split(k_epoch)
            order = jax.random.permutation(k_shuf, n_tr)[: n_batches * batch]
            order = order.reshape(n_batches, batch)
            drop_keys = (
                jax.random.split(k_drop, n_batches) if cfg.dropout else None
            )
            opt_state = set_lr(opt_state, lr)

            def batch_step(carry, xs):
                idx, dk = xs
                params, opt_state = carry
                xb = x_tr[idx]
                cb = c_tr[idx] if c_tr is not None else None
                loss, grads = jax.value_and_grad(nll)(params, xb, cb, dk)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (new_params, new_opt), batch_losses = lax.scan(
                batch_step, (params, opt_state), (order, drop_keys)
            )
            # frozen members keep their state (same trace, no control flow)
            params = jax.tree.map(
                lambda old, new: jnp.where(stop, old, new), params, new_params
            )
            opt_state = jax.tree.map(
                lambda old, new: jnp.where(stop, old, new), opt_state, new_opt
            )

            val_loss = nll(params, x_val, c_val) if n_val > 0 else jnp.mean(batch_losses)
            improved = (val_loss < best_val) & ~stop
            best_params = jax.tree.map(
                lambda b, p: jnp.where(improved, p, b), best_params, params
            )
            best_val = jnp.where(improved, val_loss, best_val)
            past_min = epoch_i >= cfg.min_epochs
            no_imp = jnp.where(
                improved | stop | ~past_min, jnp.where(stop, no_imp, 0), no_imp + 1
            )

            overrun = no_imp > cfg.patience
            at_floor = lr <= cfg.min_lr
            new_lr = jnp.where(overrun & ~at_floor & ~stop, lr * cfg.lr_decay, lr)
            new_stop = stop | (overrun & at_floor)
            no_imp = jnp.where(overrun & ~at_floor, 0, no_imp)
            epochs_alive = ~stop
            return (
                (params, opt_state, best_params, best_val, no_imp, new_lr, new_stop),
                epochs_alive,
            )

        keys = (jax.random.split(key, cfg.max_epochs), jnp.arange(cfg.max_epochs))
        init = (
            params0,
            opt_state0,
            params0,
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(0),
            jnp.asarray(cfg.lr, jnp.float32),
            jnp.asarray(False),
        )
        (params, _, best_params, best_val, *_), alive = lax.scan(epoch, init, keys)
        return best_params, best_val, jnp.sum(alive)

    fit = jax.jit(jax.vmap(fit_one, in_axes=(0, 0, None if c_m is None else 0)))
    return fit(seeds, x_m, c_m)


# -- predictive ensemble helpers --------------------------------------------


def ensemble_log_prob(flow, member_params, x, context=None):
    """Per-member log-density: (n_members, n_points)."""
    return jax.vmap(lambda p: flow.log_prob(p, x, context=context))(member_params)


def mixture_log_prob(flow, member_params, x, context=None):
    """Equal-weight mixture density over the ensemble (the predictive)."""
    lps = ensemble_log_prob(flow, member_params, x, context=context)
    return jax.nn.logsumexp(lps, axis=0) - jnp.log(lps.shape[0])


def ensemble_sample(flow, member_params, key, n: int, context=None):
    """Per-member samples: (n_members, n, dim) — the PPD ensemble that feeds
    the aleatoric amplification/variance analysis (reference notebooks)."""
    n_members = jax.tree.leaves(member_params)[0].shape[0]
    keys = jax.random.split(key, n_members)
    return jax.vmap(
        lambda p, k: flow.sample(p, k, n, context=context)
    )(member_params, keys)
