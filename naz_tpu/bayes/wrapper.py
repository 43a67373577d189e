"""Bayesian posterior over flow weights.

Capability parity with ``bayesian_normalizing_flow``
(``/root/reference/src/naz/flows/bflow_jax_maf.py:227-268``): the posterior
is over *standardized* weights with the multiplicative reparameterization

    params = params_MLE * (1 + scale * standard),   standard ~ U(-1, 1)^P,

``scale`` either fixed at ``scale_max`` or ``~ U(0, scale_max)`` (scalar or
per-parameter when ``multi_scale``). The likelihood is ``sum`` (or ``mean``
when ``avg``) of the flow log-prob over the training set.

Where the reference hands this model to numpyro, here it compiles directly
to an unconstrained **potential function** for our NUTS/HMC/SVI kernels:
interval-constrained variables enter through a sigmoid reparameterization
with its log-Jacobian (what numpyro's transform machinery did implicitly).
Uniform priors contribute only that Jacobian term.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def make_flow_loglik(flow, x, context=None) -> Callable:
    """Per-datum log-likelihood closure: params -> (N,) log probs.

    Mirrors ``make_normalizing_flow(...)['lp']`` (``bflow_jax_maf.py:210-212``)
    binding the data (and optional context) at build time.
    """
    x = jnp.asarray(x)
    if context is not None:
        context = jnp.asarray(context)
    return lambda params: flow.log_prob(params, x, context=context)


def _interval(u, centered: bool = False):
    """(-1, 1) sigmoid reparameterization with per-coordinate log-Jacobian sum.

    ``centered=True`` returns the log-Jacobian RELATIVE to its value at
    u=0 (i.e. plus P*log 2): each summand 2*log2 - softplus(u) -
    softplus(-u) is then <= 0, O(u^2) near 0, so the sum stays O(P * u^2)
    instead of carrying the -P*log2 ~ -1.3e7 constant that swamps float32
    at production dimension (see ``BayesianFlow.potential_centered``)."""
    s = jax.nn.sigmoid(u)
    x = 2.0 * s - 1.0
    base = jnp.log(4.0) if centered else jnp.log(2.0)
    log_det = jnp.sum(base - jax.nn.softplus(u) - jax.nn.softplus(-u))
    return x, log_det


@dataclasses.dataclass(frozen=True, eq=False)
class BayesianFlow:
    """Posterior over flow weights around an MLE fit.

    Attributes mirror the reference's knobs (``bflow_jax_maf.py:227``):
    ``scale_max`` = sigma0; ``fixed_scale`` pins scale to ``scale_max``;
    ``multi_scale`` gives every weight its own scale; ``avg`` uses the mean
    instead of the summed log-likelihood.
    """

    loglik: Callable  # params-pytree -> (N,) per-datum log probs
    mle_params: object
    scale_max: float = 1.0
    fixed_scale: bool = True
    multi_scale: bool = False
    avg: bool = False
    # Prior family over the weights, mirroring the reference's pyro path
    # (``bflow.py:30-47``): "uniform" (the production multiplicative-box
    # prior), "normal" (N(mle, (scale*mle)^2)), "standard_normal"
    # (weights ~ N(0,1) directly), "truncnorm" (the normal, truncated to
    # the uniform box).
    prior: str = "uniform"

    _PRIORS = ("uniform", "normal", "standard_normal", "truncnorm")

    def __post_init__(self):
        if self.prior not in self._PRIORS:
            raise ValueError(f"prior must be one of {self._PRIORS}")
        flat, unravel = ravel_pytree(self.mle_params)
        object.__setattr__(self, "_flat_mle", flat)
        object.__setattr__(self, "_unravel", unravel)

    @property
    def num_weights(self) -> int:
        return int(self._flat_mle.size)

    @property
    def complexity(self) -> int:
        """Reference's printed "model complexity" (``bflow_jax_maf.py:231``)."""
        return self.num_weights * (2 if self.multi_scale else 1)

    @property
    def dim(self) -> int:
        """Dimension of the unconstrained sampling space."""
        if self.fixed_scale:
            return self.num_weights
        return self.num_weights + (self.num_weights if self.multi_scale else 1)

    # -- parameterization --------------------------------------------------

    def _split(self, u):
        P = self.num_weights
        if self.fixed_scale:
            return u, None
        return u[:P], u[P:]

    def constrain(self, u, centered: bool = False):
        """Unconstrained vector -> dict(standard, scale, params_flat,
        log_det, log_prior).

        ``log_det`` is the Jacobian of the unconstraining transform and
        ``log_prior`` the (non-constant part of the) prior density of the
        constrained variables; the potential is ``-(loglik + log_det +
        log_prior)``. ``centered=True`` drops the log-Jacobian's additive
        constant (its value at u=0) — see :meth:`potential_centered`.
        """
        u_std, u_scale = self._split(u)
        if self.prior in ("uniform", "truncnorm"):
            standard, ld_std = _interval(u_std, centered)
        else:  # normal / standard_normal: std unconstrained
            standard, ld_std = u_std, jnp.zeros(())

        if self.fixed_scale:
            scale = jnp.asarray(self.scale_max)
            log_det = ld_std
        else:
            s = jax.nn.sigmoid(u_scale)
            scale = self.scale_max * s
            if not self.multi_scale:
                scale = scale.reshape(())
            base = (
                jnp.log(4.0)
                if centered
                else jnp.log(self.scale_max)
            )
            ld_scale = jnp.sum(
                base - jax.nn.softplus(u_scale) - jax.nn.softplus(-u_scale)
            )
            log_det = ld_std + ld_scale

        if self.prior == "standard_normal":
            # weights drawn directly from N(0,1), ignoring the MLE center
            params_flat = standard
            log_prior = -0.5 * jnp.sum(standard * standard)
        else:
            params_flat = self._flat_mle * (1.0 + scale * standard)
            if self.prior == "uniform":
                log_prior = jnp.zeros(())
            elif self.prior == "normal":
                log_prior = -0.5 * jnp.sum(standard * standard)
            else:  # truncnorm: N(0,1) truncated to (-1, 1); normalizer const
                log_prior = -0.5 * jnp.sum(standard * standard)
        return {
            "standard": standard,
            "scale": scale,
            "params_flat": params_flat,
            "log_det": log_det,
            "log_prior": log_prior,
        }

    def constrain_host(self, u, centered: bool = False):
        """Numpy twin of :meth:`constrain` for batched host-side
        post-processing: at production scale shipping draws to the device
        just to apply an elementwise sigmoid costs ~15 s per 76 MB draw
        through the remote tunnel, while numpy does the whole posterior in
        seconds. Accepts any leading batch shape; returns the same dict
        with ``log_det``/``log_prior`` summed over the trailing axis.

        Matches the device path to float32 round-off (identical formulas,
        computed in float64 then cast); used by the lean (``thin_draws``)
        production path in ``naz_tpu.bayes.exact``.
        """
        import numpy as np

        u = np.asarray(u, np.float64)
        P = self.num_weights
        if self.fixed_scale:
            u_std, u_scale = u, None
        else:
            u_std, u_scale = u[..., :P], u[..., P:]

        def _sp(x):  # stable softplus
            return np.logaddexp(0.0, x)

        if self.prior in ("uniform", "truncnorm"):
            standard = 2.0 / (1.0 + np.exp(-u_std)) - 1.0
            base = np.log(4.0) if centered else np.log(2.0)
            ld_std = np.sum(base - _sp(u_std) - _sp(-u_std), axis=-1)
        else:
            standard, ld_std = u_std, np.zeros(u_std.shape[:-1])

        if self.fixed_scale:
            scale = np.full(u.shape[:-1], self.scale_max)
            log_det = ld_std
        else:
            s = 1.0 / (1.0 + np.exp(-u_scale))
            scale = self.scale_max * s
            if not self.multi_scale:
                scale = scale[..., 0]
            base = np.log(4.0) if centered else np.log(self.scale_max)
            log_det = ld_std + np.sum(
                base - _sp(u_scale) - _sp(-u_scale), axis=-1
            )

        if self.prior == "standard_normal":
            params_flat = standard
            log_prior = -0.5 * np.sum(standard * standard, axis=-1)
        else:
            mle = np.asarray(self._flat_mle, np.float64)
            s_b = scale if (self.multi_scale or np.ndim(scale) == 0) else scale[..., None]
            if self.fixed_scale:
                s_b = self.scale_max
            params_flat = mle * (1.0 + s_b * standard)
            if self.prior == "uniform":
                log_prior = np.zeros(u.shape[:-1])
            else:
                log_prior = -0.5 * np.sum(standard * standard, axis=-1)
        return {
            "standard": standard.astype(np.float32),
            "scale": np.asarray(scale, np.float32),
            "params_flat": params_flat.astype(np.float32),
            "log_det": log_det.astype(np.float32),
            "log_prior": log_prior.astype(np.float32),
        }

    def log_prior_standard(self, standard):
        """Normalized log prior density of the standardized weights (axis -1
        summed) — used by the importance-sampling evidence module, where
        normalization constants matter."""
        import math

        from jax.scipy.special import erf

        P = standard.shape[-1]
        if self.prior == "uniform":
            return jnp.full(standard.shape[:-1], -P * math.log(2.0))
        base = -0.5 * jnp.sum(standard * standard, axis=-1) - 0.5 * P * math.log(
            2.0 * math.pi
        )
        if self.prior in ("normal", "standard_normal"):
            return base
        # truncnorm: renormalize to (-1, 1)
        z = math.sqrt(0.5)
        mass = float(erf(jnp.asarray(z)))  # Phi(1) - Phi(-1)
        return base - P * math.log(mass)

    def params_flat_from(self, standard, scale):
        """Constrained (standard, scale) -> flat weights, for every prior
        family (standard_normal draws weights directly; the rest use the
        multiplicative reparameterization). Broadcasts over leading axes."""
        if self.prior == "standard_normal":
            return standard
        if self.multi_scale or jnp.ndim(scale) == 0:
            s = scale
        else:
            s = scale[..., None]
        return self._flat_mle * (1.0 + s * standard)

    def unravel(self, params_flat):
        return self._unravel(params_flat)

    def log_likelihood_flat(self, params_flat):
        ll = self.loglik(self._unravel(params_flat))
        return ll.mean() if self.avg else ll.sum()

    # -- potential for NUTS/HMC/SVI ---------------------------------------

    def potential(self, u):
        """-log posterior density in unconstrained space (up to a constant)."""
        c = self.constrain(u)
        ll = self.log_likelihood_flat(c["params_flat"])
        return -(ll + c["log_det"] + c["log_prior"])

    def potential_centered(self, u):
        """:meth:`potential` minus its additive log-Jacobian constant
        (``log_det`` at u=0) — the SAME density, shifted so the value is
        O(|loglik|) instead of O(P).

        Why a second entry point: the uniform-box reparameterization's
        log-Jacobian carries a -P*log2 constant (~ -1.3e7 at the 19M-weight
        production scale). In float32 the spacing at 1.3e7 is 1.0, so a
        Metropolis test on raw potentials absorbs O(1) nat of quantization
        noise per accept decision — the sampler silently targets a
        perturbed distribution. The constant cancels from every MCMC
        acceptance/weight algebraically; dropping it ELEMENTWISE (before
        the sum) cancels it numerically too. Samplers use this; SVI /
        importance / evidence keep :meth:`potential`, whose normalization
        constants they report.
        """
        c = self.constrain(u, centered=True)
        ll = self.log_likelihood_flat(c["params_flat"])
        return -(ll + c["log_det"] + c["log_prior"])

    def init_positions(self, key, num_chains: int, jitter: float = 0.1):
        """Chains start at the MLE (standard = 0 <-> u = 0), jittered."""
        return jitter * jax.random.normal(key, (num_chains, self.dim))

    def curvature_inv_mass(self, key, probes: int = 8, chunk: int = None):
        """Hutchinson estimate of 1/diag(Hessian U) at the MLE center —
        a curvature-informed initial diagonal (inverse) mass matrix.

        Each probe is one Hessian-vector product (2 grad evals) with a
        Rademacher vector v: diag(H) ~= E[v * Hv]. Warmup still adapts the
        mass from cross-chain Welford estimates; starting from curvature
        instead of the identity shortens the early windows (the step-size
        search and first mass window otherwise fight the MLE's local
        scales). Beyond-reference addition (the reference delegates warmup
        wholly to numpyro's identity-init schedule).

        The HVP is a central finite difference of the gradient,
        (g(u0+eps*v) - g(u0-eps*v)) / (2*eps), not forward-over-reverse
        ``jax.jvp(grad)``: the fused Pallas density kernels define custom
        VJPs only, and forward-mode through a ``custom_vjp`` cannot lower
        — same 2-grad-evals cost, exact on quadratics, and works for any
        potential (Pallas, bf16 twins, ...). eps is the classical central-
        difference optimum eps_f32^(1/3) ~ 5e-3 in unconstrained u-space
        (O(1) coordinates under the multiplicative reparam): truncation
        error grows as eps^2 while gradient round-off — severe when the
        potential is a sum over 10^5 data points — is amplified as 1/eps,
        and their balance sits at cbrt(machine eps) (ADVICE r2: the old
        fixed 1e-3 amplified f32 round-off ~5x more than necessary)."""
        if chunk is None:
            # vmapping probes batches the whole density program (a leading
            # batch dim on every weight tensor); the fused Pallas kernels
            # then stage (chunk x layer weights) in VMEM and the 512-wide
            # production shape blows the 16 MB scoped-VMEM limit at
            # chunk=4 (measured: compile-time OOM). Probe sequentially at
            # production scale — 8 probes x 2 grads is seconds either way.
            chunk = 1 if self.num_weights > 2_000_000 else 4
        g = jax.grad(self.potential)
        u0 = jnp.zeros(self.dim)
        eps = float(jnp.finfo(jnp.float32).eps) ** (1.0 / 3.0)  # ~4.9e-3

        def hvp(v):
            return (g(u0 + eps * v) - g(u0 - eps * v)) / (2.0 * eps)

        def probe_batch(k, n):
            vs = jax.random.rademacher(k, (n, self.dim), dtype=u0.dtype)
            if n == 1:
                # no vmap: even a unit batch dim batches the Pallas density
                # kernel and overflows scoped VMEM at the 512-wide shape
                return (vs[0] * hvp(vs[0]))[None]
            return jax.vmap(lambda v: v * hvp(v))(vs)

        keys = jax.random.split(key, -(-probes // chunk))
        fn = jax.jit(probe_batch, static_argnums=1)
        total = jnp.zeros(self.dim)
        done = 0
        for k in keys:
            n = min(chunk, probes - done)
            total = total + fn(k, n).sum(axis=0)
            done += n
        diag = jnp.abs(total / probes)
        # Robustify the noisy few-probe estimate: HMC's stable step is set
        # by the WORST coordinate of (true curvature x estimated inverse
        # mass), so a single coordinate whose curvature the Hutchinson
        # probes underestimate 100x forces the global eps down 10x
        # (measured: curvature-init at the 2-D production shape pinned eps
        # at 3e-4 vs 0.035 under identity). Clipping the estimate to a
        # band around its median bounds any coordinate's mis-scaling;
        # warmup's Welford windows refine from there.
        med = jnp.maximum(jnp.median(diag), 1e-30)
        diag = jnp.clip(diag, med / 100.0, med * 100.0)
        return 1.0 / diag

    # -- prior predictive --------------------------------------------------

    def sample_prior(self, key, num_samples: int):
        """Draws from the prior over weights (reference
        ``train_bayesian_flow_prior``, ``bflow_jax_maf.py:337-341``)."""
        P = self.num_weights
        k_std, k_scale = jax.random.split(key)
        if self.prior == "uniform":
            standard = jax.random.uniform(
                k_std, (num_samples, P), minval=-1.0, maxval=1.0
            )
        elif self.prior in ("normal", "standard_normal"):
            standard = jax.random.normal(k_std, (num_samples, P))
        else:  # truncnorm
            standard = jax.random.truncated_normal(k_std, -1.0, 1.0, (num_samples, P))
        if self.fixed_scale:
            scale = jnp.full((num_samples, 1), self.scale_max)
        elif self.multi_scale:
            scale = jax.random.uniform(k_scale, (num_samples, P), maxval=self.scale_max)
        else:
            scale = jax.random.uniform(k_scale, (num_samples, 1), maxval=self.scale_max)
        if self.prior == "standard_normal":
            params_flat = standard
        else:
            params_flat = self._flat_mle * (1.0 + scale * standard)
        return {
            "standard": standard,
            "scale": jnp.squeeze(scale, -1) if scale.shape[-1] == 1 else scale,
            "params_flat": params_flat,
            "params": jax.vmap(self._unravel)(params_flat),
        }

    # -- posterior post-processing ----------------------------------------

    def posterior_params(self, u_samples, chunk: int = None, lean: bool = False):
        """Map (..., dim) unconstrained draws to constrained posteriors.

        Returns dict with ``standard``, ``scale``, ``params_flat`` and
        ``params`` (unraveled pytree with the sample axes leading), the
        analogue of ``samples["params"] = vmap(unravel_fn)(...)``
        (``bflow_jax_maf.py:334``). Draws stream through the device in
        ``chunk``-sized slices and land as host (numpy) arrays — a full
        weight posterior (10^3 draws x 10^6 weights x several outputs) does
        not fit in HBM at once.

        ``lean=True`` returns only ``scale`` and ``params_flat``: at
        production scale each full-size output is gigabytes of
        device->host traffic (measured: the extra ``standard`` +
        unraveled ``params`` copies dominated a posterior run's wall
        clock on a remote-tunnel TPU), and everything downstream
        (sampling, log-likelihoods, checkpoints) consumes the flat
        layout; unravel on demand with ``self.unravel``.
        """
        import numpy as np

        if chunk is None:
            # in+out device buffers are chunk x dim x 4 B each; keep them
            # ~200 MB at the 4-param production shape (19M weights -> 2
            # rows), full 64-row chunks at the 2-D shape (746k weights)
            chunk = int(max(1, min(64, 48_000_000 // max(1, self.complexity))))
        u = np.asarray(u_samples)
        lead = u.shape[:-1]
        u2 = u.reshape((-1, u.shape[-1]))

        def _constrain(uu):
            c = jax.vmap(self.constrain)(uu)
            if lean:
                return {"scale": c["scale"], "params_flat": c["params_flat"]}, None
            return c, jax.vmap(self._unravel)(c["params_flat"])

        fn = jax.jit(_constrain)
        cs, ps = [], []
        for s in range(0, u2.shape[0], chunk):
            c, params = fn(jnp.asarray(u2[s : s + chunk]))
            cs.append(jax.tree.map(np.asarray, c))
            if not lean:
                ps.append(jax.tree.map(np.asarray, params))
        c = {
            k: np.concatenate([x[k] for x in cs], axis=0)
            for k in cs[0]
            if k not in ("log_det", "log_prior")
        }
        out = {
            "scale": c["scale"].reshape(lead + c["scale"].shape[1:]),
            "params_flat": c["params_flat"].reshape(lead + (-1,)),
        }
        if not lean:
            params = jax.tree.map(lambda *a: np.concatenate(a, axis=0), *ps)
            out["standard"] = c["standard"].reshape(lead + (-1,))
            out["params"] = jax.tree.map(
                lambda a: a.reshape(lead + a.shape[1:]), params
            )
        return out
