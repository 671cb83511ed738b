"""Driver entry points must keep working: compile check + multichip dry run."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_entry_forward_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (3961, 1001)
    assert np.isfinite(np.asarray(out[:2, :2])).all()


def test_dryrun_multichip_subprocess():
    """Run in a clean interpreter so the 8-device config can take effect."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import __graft_entry__ as ge; ge.dryrun_multichip(8)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


def test_nonfinite_loss_detection():
    """fit() must fail fast with a clear error when training diverges."""
    import jax.numpy as jnp

    from desmo_tpu import configs, train
    from desmo_tpu.models import desmo

    cfg = configs.RunConfig(
        name="blow",
        variant="desmo",
        n=16,
        m=8,
        r=2,
        poly_order=2,
        omega_init=1.0,
        lr_coef=1e30,  # guaranteed blow-up
        lr_z=1e30,
        num_epochs=50,
        patience=10,
        sched_every=1,
        log_every=100,
        checkpoint_every=100,
    )
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, 1.0)
    params = desmo.init_params(spec)
    x = jnp.ones((cfg.n, cfg.m)) * 1e20
    batch = {"x": x, "pod_modes": jnp.ones((cfg.n, cfg.r)) * 1e10}
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda)
    with __import__("pytest").raises(FloatingPointError, match="non-finite"):
        train.fit(
            loss_fn, desmo.param_groups(params), cfg, params, batch, log=None, chunk_size=50
        )
