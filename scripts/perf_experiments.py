"""Same-window perf experiments for the cylinder step (time-shared chip: only
within-run comparisons are meaningful).

1. kernel-only scan: current dual kernel vs transposed-operand variant
   (standard (M,K)@(K,N) contractions — no in-kernel transposes of B).
2. full fused step: scan unroll 1 / 2 / 4 / 8.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed_scan(fn, carry, steps, reps=5):
    import jax

    run = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=steps))
    carry = run(carry)[0]
    _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        carry = run(carry)[0]
        _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / steps


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from desmo_tpu import configs, pod, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import dual_gemm

    cfg = configs.get("cylinder")
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    n, m = cfg.n, cfg.m
    K = spec.num_poly_terms + 3 * spec.r
    x = synthetic.cylinder_wake(n, m, seed=0)
    xd = jnp.asarray(x)
    x_hi, x_lo = dual_gemm.split_snapshots(xd)
    n_pad, m_pad = x_hi.shape
    k_pad = 128
    steps = 2000

    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((n, K)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((K, m)), jnp.float32)

    # --- kernel-only: current layout -------------------------------------
    def body_cur(carry, _):
        a, b = carry
        ax, xb = dual_gemm.dual_contractions_split(a, b, x_hi, x_lo, False)
        a = a + 1e-12 * xb
        b = b + 1e-12 * ax
        return (a, b), None

    t_cur = timed_scan(body_cur, (a0, b0), steps)

    # --- kernel-only: transposed operands ---------------------------------
    BN = 512

    def _split(v):
        hi = v.astype(jnp.bfloat16)
        return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def kernel_t(at_ref, bt_ref, xhi_ref, xlo_ref, ax_ref, xb_ref):
        i = pl.program_id(0)
        at_hi, at_lo = _split(at_ref[:])
        bt_hi, bt_lo = _split(bt_ref[:])
        xh, xl = xhi_ref[:], xlo_ref[:]

        def d(u, v):
            return jax.lax.dot_general(
                u, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        part = d(at_hi, xh) + d(at_hi, xl) + d(at_lo, xh)

        @pl.when(i == 0)
        def _():
            ax_ref[:] = part

        @pl.when(i > 0)
        def _():
            ax_ref[:] = ax_ref[:] + part

        xb_ref[:] = d(xh, bt_hi) + d(xh, bt_lo) + d(xl, bt_hi)

    @jax.jit
    def dual_t(at, bt):
        grid = (n_pad // BN,)
        return _dual_t_call(at, bt, x_hi, x_lo, grid)

    def _dual_t_call(at, bt, xh, xl, grid):
        return pl.pallas_call(
            kernel_t,
            grid=grid,
            in_specs=[
                pl.BlockSpec((k_pad, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((k_pad, m_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=12 * n_pad * m_pad * k_pad,
                bytes_accessed=(2 * n_pad * m_pad + n_pad * k_pad + k_pad * m_pad) * 4,
                transcendentals=0,
            ),
        )(at, bt, xh, xl)

    at0 = jnp.pad(a0, ((0, n_pad - n), (0, k_pad - K))).T.copy()
    bt0 = jnp.pad(b0, ((0, k_pad - K), (0, m_pad - m))).T.copy()

    def body_t(carry, _):
        at, bt = carry
        ax, xb = dual_t(at, bt)
        at = at + 1e-12 * xb.T
        bt = bt + 1e-12 * ax.T
        return (at, bt), None

    t_tr = timed_scan(body_t, (at0, bt0), steps)

    # correctness of the transposed variant
    ax_c, xb_c = dual_gemm.dual_contractions_split(a0, b0, x_hi, x_lo, False)
    ax_t, xb_t = dual_t(at0, bt0)
    err_ax = float(jnp.max(jnp.abs(ax_t[:K, :m] - ax_c)))
    err_xb = float(jnp.max(jnp.abs(xb_t[:n, :K] - xb_c)))

    print(f"kernel current     {t_cur * 1e6:8.2f} us/step")
    print(f"kernel transposed  {t_tr * 1e6:8.2f} us/step  (max dev ax {err_ax:.2e}, xb {err_xb:.2e})")

    # --- full fused step: unroll sweep ------------------------------------
    p = pod.pod(x, cfg.r)
    params = desmo.init_params(spec)
    batch = {
        "x": xd,
        "pod_modes": p.modes,
        "x_sq": jnp.sum(xd * xd),
        "x_hi": x_hi,
        "x_lo": x_lo,
    }
    loss = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="fused")
    groups = desmo.param_groups(params)
    for unroll in (1, 2, 4, 8):
        chunk = train.make_train_chunk(loss, groups, cfg, unroll=unroll)
        st = jax.tree.map(jnp.array, train.init_state(params, cfg))
        st, mets = chunk(st, batch, num_steps=steps)
        _ = float(np.asarray(mets["rec"])[-1])
        ts = []
        for _i in range(5):
            t0 = time.perf_counter()
            st, mets = chunk(st, batch, num_steps=steps)
            _ = float(np.asarray(mets["rec"])[-1])
            ts.append(time.perf_counter() - t0)
        tt = sorted(ts)[len(ts) // 2] / steps
        print(f"full fused unroll={unroll}  {tt * 1e6:8.2f} us/step  {1 / tt:8.0f} steps/s")


if __name__ == "__main__":
    main()
