from naz_tpu.flows.flow import Flow
from naz_tpu.flows.maf import MaskedAutoregressiveFlow


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
) -> Flow:
    """Convenience factory mirroring the reference's ``flow_type="maf"``
    (``/root/reference/src/naz/flows/flow.py:21-42``): a Flow with a single
    stacked-MAF transform."""
    t = MaskedAutoregressiveFlow.create(
        dim, n_layers, hidden_dims, context_dim, seed=seed, invert=invert
    )
    return Flow(dim=dim, transforms=(t,), bounds=bounds, embedding=embedding)


__all__ = ["Flow", "MaskedAutoregressiveFlow", "maf_flow"]
