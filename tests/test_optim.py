"""Adamax and ReduceLROnPlateau parity against PyTorch (CPU oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from desmo_tpu import optim

torch = pytest.importorskip("torch")


def test_adamax_matches_torch_quadratic():
    """Run 50 steps minimizing a fixed quadratic; trajectories must match."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(7).astype(np.float32)
    a = rng.standard_normal((7, 7)).astype(np.float32)
    target = rng.standard_normal(7).astype(np.float32)

    # torch reference
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    at = torch.tensor(a)
    tt = torch.tensor(target)
    opt = torch.optim.Adamax([wt], lr=3e-2, weight_decay=0.0)
    torch_traj = []
    for _ in range(50):
        opt.zero_grad()
        loss = torch.sum((at @ wt - tt) ** 2)
        loss.backward()
        opt.step()
        torch_traj.append(wt.detach().numpy().copy())

    # ours
    params = {"w": jnp.asarray(w0)}
    state = optim.adamax_init(params)
    lr_tree = {"w": jnp.float32(3e-2)}

    def loss_fn(p):
        return jnp.sum((jnp.asarray(a) @ p["w"] - jnp.asarray(target)) ** 2)

    ours_traj = []
    for _ in range(50):
        g = jax.grad(loss_fn)(params)
        upd, state = optim.adamax_update(g, state, lr_tree)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        ours_traj.append(np.asarray(params["w"]))

    np.testing.assert_allclose(
        np.stack(ours_traj), np.stack(torch_traj), rtol=2e-5, atol=2e-6
    )


def test_adamax_per_group_lrs():
    """Two groups with different LRs must match two torch param groups."""
    w0 = np.array([1.0, -2.0], np.float32)
    v0 = np.array([0.5], np.float32)

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    vt = torch.nn.Parameter(torch.tensor(v0.copy()))
    opt = torch.optim.Adamax(
        [{"params": [wt], "lr": 1e-2}, {"params": [vt], "lr": 2.0}], weight_decay=0.0
    )
    for _ in range(20):
        opt.zero_grad()
        loss = torch.sum(wt**2) + torch.sum(torch.sin(vt))
        loss.backward()
        opt.step()

    params = {"w": jnp.asarray(w0), "v": jnp.asarray(v0)}
    state = optim.adamax_init(params)
    lr_tree = {"w": jnp.float32(1e-2), "v": jnp.float32(2.0)}

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2) + jnp.sum(jnp.sin(p["v"]))

    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        upd, state = optim.adamax_update(g, state, lr_tree)
        params = jax.tree.map(lambda p, u: p + u, params, upd)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["v"]), vt.detach().numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("patience", [0, 2, 5])
def test_plateau_matches_torch(patience):
    """Feed an adversarial loss sequence; LR trajectories must match torch."""
    rng = np.random.default_rng(42)
    # mix of improvements, tiny (sub-threshold) improvements, and increases
    seq = np.abs(rng.standard_normal(200)).astype(np.float32)
    seq[::7] = seq[::7] * 0.5  # occasional strong improvements

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adamax([{"params": [p], "lr": 1e-2}])
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", patience=patience, factor=0.1, min_lr=1e-6
    )
    torch_lrs = []
    for v in seq:
        sched.step(float(v))
        torch_lrs.append(opt.param_groups[0]["lr"])

    state = optim.plateau_init(jnp.asarray([1e-2]))
    ours_lrs = []
    for v in seq:
        state = optim.plateau_step(state, jnp.float32(v), patience=patience)
        ours_lrs.append(float(state.lrs[0]))

    np.testing.assert_allclose(np.asarray(ours_lrs), np.asarray(torch_lrs), rtol=1e-6)


def test_plateau_min_lr_clamp():
    state = optim.plateau_init(jnp.asarray([1e-2, 1e3]))
    for i in range(5000):
        state = optim.plateau_step(state, jnp.float32(1.0 + i * 1e-9), patience=3)
    lrs = np.asarray(state.lrs)
    assert lrs[0] >= 1e-6 - 1e-12
    assert np.isclose(lrs[0], 1e-6)
    assert lrs[1] >= 1e-6
