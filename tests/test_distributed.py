"""Multi-process `jax.distributed` smoke test (SURVEY.md §5.8).

Launches TWO real OS processes joined through a localhost coordinator —
the actual multi-host code path (`jax.distributed.initialize`), not a
virtual-device mesh — and exercises `make_mesh` + `sharded_loglik` with
the training data sharded across processes. Also covers the round-1
VERDICT fix: a misconfigured coordinator must raise, not silently
degrade to single-host.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from naz_tpu.parallel import initialize_multihost, make_mesh, sharded_loglik
    from naz_tpu.flows import maf_flow

    info = initialize_multihost(f"127.0.0.1:{port}", 2, proc_id)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info

    # 2 chains x 2 data shards over 4 global devices (2 per process)
    mesh = make_mesh(num_chain_shards=2, num_data_shards=2)

    flow = maf_flow(2, 2, (8,), context_dim=2, seed=0)
    params = flow.init_params(jax.random.PRNGKey(0))
    # identical global data on every process (global-array semantics)
    rng = np.random.default_rng(42)
    x = rng.normal(size=(64, 2)).astype(np.float32)
    c = rng.normal(size=(64, 2)).astype(np.float32)

    loglik = sharded_loglik(flow, x, context=c, mesh=mesh)
    total = jax.jit(lambda p: loglik(p).sum())(params)
    # process-local single-device reference value
    ref = float(np.asarray(flow.log_prob(params, jnp.asarray(x), context=jnp.asarray(c)).sum()))
    got = float(total)
    assert abs(got - ref) < 1e-2 * abs(ref), (got, ref)
    with open(out, "w") as f:
        f.write(f"{proc_id} {got:.6f}")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(tmp_path / f"out{i}")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    vals = [
        (tmp_path / f"out{i}").read_text().split() for i in range(2)
    ]
    # both processes computed the same global psum-reduced log-likelihood
    assert vals[0][1] == vals[1][1]


def test_unreachable_coordinator_fails_loudly():
    """Round-1 VERDICT #8: explicit-but-broken coordinator config must NOT
    silently degrade to single-host. (The coordination client terminates
    the process on a connect deadline — a loud failure, not an Exception.)"""
    code = textwrap.dedent(
        """
        import os
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from naz_tpu.parallel import initialize_multihost
        # process 1 = pure client; nothing listens on port 9 (discard)
        initialize_multihost("127.0.0.1:9", 2, 1, initialization_timeout=5)
        print("SILENT-SINGLE-HOST", jax.process_count())
        """
    )
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode != 0, (
        "broken coordinator silently degraded: " + r.stdout
    )
    assert "SILENT-SINGLE-HOST" not in r.stdout
    assert "DEADLINE_EXCEEDED" in r.stderr or "Deadline" in r.stderr, r.stderr


def test_no_coordinator_is_singlehost_noop():
    from naz_tpu.parallel.distributed import _coordinator_configured

    # in the test environment none of the coordinator env vars are set
    had = {
        v: os.environ.pop(v)
        for v in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "SLURM_JOB_ID",
            "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
            "OMPI_MCA_orte_hnp_uri",
        )
        if v in os.environ
    }
    try:
        assert not _coordinator_configured()
        from naz_tpu.parallel import initialize_multihost

        info = initialize_multihost()
        assert info["process_count"] == 1
    finally:
        os.environ.update(had)
