"""Dataclass configuration + flow registry.

Replaces the reference's per-script argparse + hard-coded constants
(``/root/reference/examples/papers/2506.05657/hmc_maf_exact.py:33-52,62-69``
and the ``flow_makers`` registry in ``src/naz/flows/flow.py:21``) with one
typed config layer: a ``FlowSpec`` builds any of the four flow families,
and the trainer/sampler configs are the dataclasses from their modules
(``MLEConfig``, ``MCMCRunConfig``, ``SVIConfig``). Mesh layout included.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import numpy as np

from naz_tpu.flows import Flow, cnf_flow, maf_flow, nsa_flow, nsc_flow

FLOW_TYPES = ("maf", "nsa", "nsc", "cnf")


@dataclasses.dataclass(frozen=True)
class FlowSpec:
    """Mirror of the reference's ``NormalizingFlow(flow_type, bounds,
    theta_dim, lambda_dim, hidden_dims, num_layers, ...)`` signature
    (``flow.py:26-42``)."""

    flow_type: str = "maf"
    dim: int = 2
    context_dim: int = 0
    n_layers: int = 16
    hidden_dims: Tuple[int, ...] = (150, 150, 150)
    count_bins: int = 8  # spline flows
    spline_bound: float = 5.0
    spline_order: str = "quadratic"  # or "linear" (transforms.py:180-189)
    cnf_steps: int = 32
    cnf_solver: str = "rk4"  # "rk4" | "midpoint" | "dopri5" | "bosh3"
    bounds: Optional[Tuple[Sequence[float], Sequence[float]]] = None
    dropout_rate: float = 0.0
    seed: int = 0
    # conditioner matmul-operand dtype for MAF ("bfloat16" halves the HBM
    # bytes of the hot path — ~1.9x measured at production scale,
    # PERFORMANCE.md); None = f32
    compute_dtype: Optional[str] = None
    # fused Pallas density kernels for MAF (auto stack/per-layer by VMEM
    # fit; 1.5x over XLA f32 at the 18x[512]^5 shape — PERFORMANCE.md)
    use_pallas: bool = False
    # unroll factor for the MAF layer scan (static layer indices let XLA
    # fuse the backward's per-layer dW updates and carry copies)
    scan_unroll: int = 1

    def build(self, embedding=None) -> Flow:
        import jax.numpy as jnp

        bounds = None
        if self.bounds is not None:
            bounds = (jnp.asarray(self.bounds[0]), jnp.asarray(self.bounds[1]))
        common = dict(
            context_dim=self.context_dim,
            bounds=bounds,
            embedding=embedding,
            seed=self.seed,
        )
        if self.flow_type == "maf":
            return maf_flow(
                self.dim,
                self.n_layers,
                self.hidden_dims,
                dropout_rate=self.dropout_rate,
                compute_dtype=self.compute_dtype,
                use_pallas=self.use_pallas,
                scan_unroll=self.scan_unroll,
                **common,
            )
        if self.flow_type == "nsa":
            return nsa_flow(
                self.dim,
                self.n_layers,
                self.hidden_dims,
                count_bins=self.count_bins,
                bound=self.spline_bound,
                order=self.spline_order,
                dropout_rate=self.dropout_rate,
                **common,
            )
        if self.flow_type == "nsc":
            return nsc_flow(
                self.dim,
                self.n_layers,
                self.hidden_dims,
                count_bins=self.count_bins,
                bound=self.spline_bound,
                order=self.spline_order,
                dropout_rate=self.dropout_rate,
                **common,
            )
        if self.flow_type == "cnf":
            return cnf_flow(
                self.dim,
                self.hidden_dims,
                num_steps=self.cnf_steps,
                solver=self.cnf_solver,
                **common,
            )
        raise ValueError(f"unknown flow_type {self.flow_type!r}; expected {FLOW_TYPES}")


def spec_from_json(path_or_str: str) -> FlowSpec:
    try:
        d = json.loads(path_or_str)
    except json.JSONDecodeError:
        with open(path_or_str) as f:
            d = json.load(f)
    if "hidden_dims" in d:
        d["hidden_dims"] = tuple(d["hidden_dims"])
    if d.get("bounds") is not None:
        d["bounds"] = (tuple(d["bounds"][0]), tuple(d["bounds"][1]))
    return FlowSpec(**d)
