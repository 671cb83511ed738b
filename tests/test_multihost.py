"""Multi-host (multi-process) mesh training — SURVEY §5.8.

The reference has no multi-node story at all (`GPU_jobfile.sh:13` requests
one GPU); scaling past one host is net-new capability. These tests pin the
DCN-style entry point: ``parallel.distributed_init`` joins N processes into
one cluster, the GLOBAL device mesh spans them, and the sharded training
chunk produces the same numbers as the identical single-process mesh run —
the collectives merely ride a different transport (Gloo/TCP here, DCN on a
real pod).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from desmo_tpu import train
from desmo_tpu.models import desmo
from desmo_tpu.parallel import make_mesh, param_shardings, shard_batch, shard_state

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_cluster(nproc: int, tmp_path, timeout=420):
    """Start nproc worker processes; return their parsed result JSONs."""
    port = _free_port()
    env = dict(os.environ)
    # APPEND to PYTHONPATH — replacing it kills /root/.axon_site (CLAUDE.md)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(HERE)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    outs = [str(tmp_path / f"proc{i}.json") for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    results = []
    for path in outs:
        with open(path) as fh:
            results.append(json.load(fh))
    return results


def _single_process_reference(steps=60):
    """The same problem over this test process's own 8 local CPU devices —
    byte-for-byte the construction in multihost_worker.build_problem()."""
    from multihost_worker import build_problem

    cfg, spec, params, loss_fn, batch = build_problem()
    mesh = make_mesh(n_space=8, n_time=1)
    p_sh = param_shardings(params, mesh, cfg.m)
    chunk = train.make_train_chunk(
        loss_fn, desmo.param_groups(params), cfg, param_shardings=p_sh
    )
    state = shard_state(
        jax.tree.map(jnp.array, train.init_state(params, cfg)), mesh, cfg.m
    )
    state, metrics = chunk(state, shard_batch(batch, mesh), num_steps=steps)
    sums = {
        k: float(jnp.sum(jnp.abs(v))) for k, v in state.params.items()
    }
    return metrics, sums, np.asarray(state.params["c"])


def test_cli_multihost_flag_initializes_cluster(monkeypatch, capsys):
    """`--multihost HOST:PORT --num-processes N --process-id I` reaches
    jax.distributed.initialize before the command runs; a bare --multihost
    passes nothing (cluster-environment auto-detection). Exercised on the
    `bench` subcommand with its payload stubbed out."""
    from desmo_tpu import __main__ as cli

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    monkeypatch.setattr("runpy.run_path", lambda *a, **k: None)
    assert cli.main([
        "bench", "--multihost", "host0:1234",
        "--num-processes", "2", "--process-id", "1",
    ]) == 0
    capsys.readouterr()
    assert calls == [{
        "coordinator_address": "host0:1234",
        "num_processes": 2,
        "process_id": 1,
    }]
    calls.clear()
    assert cli.main(["bench", "--multihost"]) == 0
    capsys.readouterr()
    assert calls == [{}]


def test_two_process_cluster_matches_single_process(tmp_path):
    """2 processes x 4 local CPU devices = the same 8-device ('space',) mesh
    as the in-process CI runs; the full metrics trace, the replicated
    coefficient vector, and global checksums of every (sharded) parameter
    must match the single-process run."""
    results = _launch_cluster(2, tmp_path)
    assert [r["process_id"] for r in results] == [0, 1]
    for r in results:
        assert r["n_local_devices"] == 4
        assert r["n_global_devices"] == 8

    # both processes observe identical replicated outputs
    np.testing.assert_array_equal(results[0]["total"], results[1]["total"])
    np.testing.assert_array_equal(results[0]["c"], results[1]["c"])

    metrics, sums, c = _single_process_reference()
    np.testing.assert_allclose(
        np.asarray(metrics["total"]), results[0]["total"], rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(c, results[0]["c"], rtol=5e-5, atol=5e-6)
    for k, v in sums.items():
        np.testing.assert_allclose(
            v, results[0]["param_abs_sums"][k], rtol=5e-5, atol=5e-6,
            err_msg=k,
        )
