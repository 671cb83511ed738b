"""End-to-end training-trajectory parity vs. a from-spec PyTorch oracle.

Runs the full training stack (model forward, composite loss, grouped Adamax,
plateau scheduler with the every-10-epochs cadence) for a few hundred steps on
identical synthetic data and identical initialization, in both frameworks.
fp32 round-off makes trajectories diverge exponentially, so early steps are
compared tightly and later steps loosely — but any semantic mismatch in the
optimizer/loss/scheduler stack shows up immediately and grossly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import configs, train
from desmo_tpu.models import desmo

torch = pytest.importorskip("torch")


def torch_training_trajectory(x, pod_modes, r, poly_order, beta, lam, steps, sched_every, patience):
    """From-spec vectorized torch implementation of the reference training
    semantics (SURVEY §2.5-2.6): returns the per-step total-loss trajectory."""
    import itertools

    n, m = x.shape
    terms = [()]
    for d in range(1, poly_order + 1):
        terms.extend(itertools.combinations_with_replacement(range(r), d))
    T = len(terms)

    phi = torch.nn.Parameter(torch.ones(r, n))
    c = torch.nn.Parameter(torch.ones(T))
    z = torch.nn.Parameter(torch.ones(T, m))
    z_trig = torch.nn.Parameter(torch.ones(3, r, m))
    c_trig = torch.nn.Parameter(torch.ones(3, r))
    omega = torch.nn.Parameter(torch.ones(3, r))

    xt = torch.tensor(x)
    pm = torch.tensor(pod_modes)

    opt = torch.optim.Adamax(
        [
            {"params": [c, c_trig], "lr": 1e-2},
            {"params": [phi], "lr": 1e-3},
            {"params": [z, z_trig], "lr": 1e-2},
            {"params": [omega], "lr": 1.0},
        ],
        weight_decay=0.0,
    )
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", patience=patience, factor=0.1, min_lr=1e-6
    )

    funcs = [torch.sin, torch.cos, torch.tanh]
    losses = []
    for epoch in range(steps):
        latent = pm * phi.T  # (n, r)
        cols = [torch.ones(n)]
        for tup in terms[1:]:
            col = torch.ones(n)
            for v in tup:
                col = col * latent[:, v]
            cols.append(col)
        theta = torch.stack(cols, dim=1)
        recon = (c * theta) @ z
        for i in range(r):
            for k in range(3):
                recon = recon + c_trig[k, i] * torch.outer(
                    funcs[k](omega[k, i] * latent[:, i]), z_trig[k, i]
                )
        rec = torch.mean((recon - xt) ** 2)
        ortho = torch.zeros(())
        for i in range(r):
            for j in range(i + 1, r):
                ortho = ortho + torch.abs(latent[:, i] @ latent[:, j])
        l1 = torch.sum(torch.abs(c)) + torch.sum(torch.abs(c_trig))
        total = rec + beta * ortho + lam * l1
        opt.zero_grad()
        total.backward()
        opt.step()
        if epoch % sched_every == 0:
            sched.step(total.item())
        losses.append(float(total))
    return np.array(losses)


def test_training_trajectory_matches_torch():
    rng = np.random.default_rng(0)
    n, m, r, P = 60, 40, 2, 2
    s = np.linspace(0, 2 * np.pi, n)
    t = np.linspace(0, 6 * np.pi, m)
    x = (np.outer(np.sin(s), np.sin(t)) + 0.5 * np.outer(np.cos(s), np.cos(t))).astype(np.float32)
    x -= x.mean(axis=1, keepdims=True)
    q, _ = np.linalg.qr(rng.standard_normal((n, r)))
    pod_modes = q.astype(np.float32)

    beta, lam, steps, sched_every, patience = 1e-3, 1e-4, 300, 10, 20
    ref = torch_training_trajectory(x, pod_modes, r, P, beta, lam, steps, sched_every, patience)

    cfg = configs.RunConfig(
        name="parity",
        variant="desmo",
        n=n,
        m=m,
        r=r,
        poly_order=P,
        omega_init=1.0,
        lr_omega=1.0,
        beta=beta,
        l1_lambda=lam,
        num_epochs=steps,
        patience=patience,
        sched_every=sched_every,
        log_every=1000,
        checkpoint_every=10_000,
    )
    spec = desmo.DesmoSpec(n, m, r, P, omega_init=1.0)
    params = desmo.init_params(spec)
    loss_fn = desmo.build_loss(spec, beta, lam, method="factored")
    batch = {"x": jnp.asarray(x), "pod_modes": jnp.asarray(pod_modes)}
    chunk = train.make_train_chunk(loss_fn, desmo.param_groups(params), cfg)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    state, metrics = chunk(state, batch, num_steps=steps)
    ours = np.asarray(metrics["total"])

    # early steps: tight agreement (semantics identical, only fp noise)
    np.testing.assert_allclose(ours[:20], ref[:20], rtol=2e-4)
    # full horizon: same trajectory up to accumulated fp divergence
    np.testing.assert_allclose(ours, ref, rtol=0.05)
    # both converge to the same loss scale
    assert abs(ours[-1] - ref[-1]) / ref[-1] < 0.05
