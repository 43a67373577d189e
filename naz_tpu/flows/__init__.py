import numpy as np

from naz_tpu.flows.flow import Flow
from naz_tpu.flows.maf import MaskedAutoregressiveFlow
from naz_tpu.flows.spline import SplineAutoregressiveFlow, SplineCoupling
from naz_tpu.flows.cnf import CNFTransform
from naz_tpu.flows.norms import ActNorm, BatchNorm


def maf_flow(
    dim: int,
    n_layers: int,
    hidden_dims,
    context_dim: int = 0,
    *,
    bounds=None,
    embedding=None,
    seed: int = 0,
    invert: bool = False,
    dropout_rate: float = 0.0,
    norm: str = "none",
    use_pallas: bool = False,
    pallas_mode=None,
    pallas_tile: int = 2048,
    pallas_bf16: bool = True,
    compute_dtype=None,
    remat: bool = True,
    simple_masking: bool = True,
    scan_unroll: int = 1,
) -> Flow:
    """Convenience factory mirroring the reference's ``flow_type="maf"``
    (``/root/reference/src/naz/flows/flow.py:21-42``): a Flow with a single
    stacked-MAF transform.

    ``norm="actnorm"`` / ``"batchnorm"`` interleaves a normalization layer
    after every MADE layer — the reference factory's ``batch_norm`` option
    (``transforms.py:147-151``). This splits the single stacked-layer scan
    into ``n_layers`` one-layer blocks (more programs to compile), so leave
    it off unless the deeper stack actually needs the conditioning help."""
    if norm == "none":
        t = MaskedAutoregressiveFlow.create(
            dim,
            n_layers,
            hidden_dims,
            context_dim,
            seed=seed,
            invert=invert,
            dropout_rate=dropout_rate,
            use_pallas=use_pallas,
            pallas_mode=pallas_mode,
            pallas_tile=pallas_tile,
            pallas_bf16=pallas_bf16,
            compute_dtype=compute_dtype,
            remat=remat,
            simple_masking=simple_masking,
            scan_unroll=scan_unroll,
        )
        return Flow(dim=dim, transforms=(t,), bounds=bounds, embedding=embedding)
    if norm not in ("actnorm", "batchnorm"):
        raise ValueError(f"norm must be 'none', 'actnorm' or 'batchnorm', got {norm!r}")
    from naz_tpu.ops.masks import random_permutations

    perms = random_permutations(np.random.default_rng(seed), dim, n_layers)
    norm_cls = ActNorm if norm == "actnorm" else BatchNorm
    transforms = []
    for l in range(n_layers):
        transforms.append(
            MaskedAutoregressiveFlow.create(
                dim,
                1,
                hidden_dims,
                context_dim,
                seed=seed,
                permutations=perms[l : l + 1],
                invert=invert,
                dropout_rate=dropout_rate,
                simple_masking=simple_masking,
            )
        )
        if l < n_layers - 1:
            transforms.append(norm_cls(dim))
    return Flow(
        dim=dim, transforms=tuple(transforms), bounds=bounds, embedding=embedding
    )


def nsa_flow(
    dim: int,
    n_layers: int,
    hidden_dims,
    context_dim: int = 0,
    *,
    count_bins: int = 8,
    bound: float = 5.0,
    order: str = "quadratic",
    bounds=None,
    embedding=None,
    seed: int = 0,
    invert: bool = False,
    dropout_rate: float = 0.0,
) -> Flow:
    """Neural-spline autoregressive flow (reference ``flow_type="nsa"``,
    ``/root/reference/src/naz/flows/transforms.py:165-198``; ``order``
    selects rational-quadratic or linear-rational elementwise maps as
    there)."""
    t = SplineAutoregressiveFlow.create(
        dim,
        n_layers,
        hidden_dims,
        context_dim,
        seed=seed,
        count_bins=count_bins,
        bound=bound,
        order=order,
        invert=invert,
        dropout_rate=dropout_rate,
    )
    return Flow(dim=dim, transforms=(t,), bounds=bounds, embedding=embedding)


def nsc_flow(
    dim: int,
    n_layers: int,
    hidden_dims,
    context_dim: int = 0,
    *,
    split_dim=None,
    count_bins: int = 8,
    bound: float = 5.0,
    order: str = "quadratic",
    bounds=None,
    embedding=None,
    seed: int = 0,
    dropout_rate: float = 0.0,
) -> Flow:
    """Neural-spline coupling flow (intended behavior of the reference's
    broken ``flow_type="nsc"``, ``transforms.py:201-236``)."""
    t = SplineCoupling.create(
        dim,
        n_layers,
        hidden_dims,
        context_dim,
        split_dim=split_dim,
        count_bins=count_bins,
        bound=bound,
        order=order,
        dropout_rate=dropout_rate,
        seed=seed,
    )
    return Flow(dim=dim, transforms=(t,), bounds=bounds, embedding=embedding)


def cnf_flow(
    dim: int,
    hidden_dims,
    context_dim: int = 0,
    *,
    num_blocks: int = 1,
    num_steps: int = 32,
    trace: str = "exact",
    solver: str = "rk4",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    bounds=None,
    embedding=None,
    seed: int = 0,
) -> Flow:
    """Continuous free-form flow (reference ``flow_type="cnf"``,
    ``/root/reference/src/naz/flows/continuous_transforms.py:124-139``)."""
    ts = tuple(
        CNFTransform.create(
            dim, hidden_dims, context_dim, num_steps=num_steps, trace=trace,
            solver=solver, rtol=rtol, atol=atol,
        )
        for _ in range(num_blocks)
    )
    return Flow(dim=dim, transforms=ts, bounds=bounds, embedding=embedding)


__all__ = [
    "BatchNorm",
    "Flow",
    "ActNorm",
    "CNFTransform",
    "cnf_flow",
    "MaskedAutoregressiveFlow",
    "SplineAutoregressiveFlow",
    "SplineCoupling",
    "maf_flow",
    "nsa_flow",
    "nsc_flow",
]
