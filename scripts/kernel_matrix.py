"""Kernel microbench matrix: where do the ~34 us above the MXU floor go?

Variants of the dual-contraction kernel timed in one process/window:
  cur        : shipped 3-pass kernel (splits a,b in-kernel each block)
  presplit   : a_hi/a_lo/b_hi/b_lo split ONCE outside, kernel dots only
  1pass      : single-pass bf16 (accuracy floor ~2e-3) — pipeline cost probe
  ax_only    : only the A^T X product (3-pass)
  xb_only    : only the X B^T product (3-pass)
Each also at BN=1024 (half the grid steps).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from desmo_tpu import configs
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import dual_gemm

    cfg = configs.get("cylinder")
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    n, m = cfg.n, cfg.m
    K = spec.num_poly_terms + 3 * spec.r
    x = synthetic.cylinder_wake(n, m, seed=0)
    x_hi, x_lo = dual_gemm.split_snapshots(jnp.asarray(x))
    n_pad, m_pad = x_hi.shape
    k_pad = 128
    steps = 2000
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((n_pad, k_pad)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((k_pad, m_pad)), jnp.float32)

    def timed(fn, carry, reps=5):
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

    def split(v):
        hi = v.astype(jnp.bfloat16)
        return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def make_kernel(mode):
        def kern(*refs):
            if mode == "presplit":
                ah_r, al_r, bh_r, bl_r, xh_r, xl_r, ax_r, xb_r = refs
                a_hi, a_lo, b_hi, b_lo = ah_r[:], al_r[:], bh_r[:], bl_r[:]
            else:
                a_r, b_r, xh_r, xl_r, ax_r, xb_r = refs
                if mode == "1pass":
                    a_hi = a_r[:].astype(jnp.bfloat16)
                    b_hi = b_r[:].astype(jnp.bfloat16)
                else:
                    a_hi, a_lo = split(a_r[:])
                    b_hi, b_lo = split(b_r[:])
            i = pl.program_id(0)
            xh, xl = xh_r[:], xl_r[:]

            def d(u, v, dims):
                return jax.lax.dot_general(
                    u, v, dimension_numbers=dims, preferred_element_type=jnp.float32
                )

            axd = (((0,), (0,)), ((), ()))
            xbd = (((1,), (1,)), ((), ()))
            if mode == "1pass":
                part = d(a_hi, xh, axd)
                xb = d(xh, b_hi, xbd)
            elif mode == "xb_only":
                part = None
                xb = d(xh, b_hi, xbd) + d(xh, b_lo, xbd) + d(xl, b_hi, xbd)
            else:
                part = d(a_hi, xh, axd) + d(a_hi, xl, axd) + d(a_lo, xh, axd)
                if mode == "ax_only":
                    xb = None
                else:
                    xb = d(xh, b_hi, xbd) + d(xh, b_lo, xbd) + d(xl, b_hi, xbd)
            if part is not None:
                @pl.when(i == 0)
                def _():
                    ax_r[:] = part

                @pl.when(i > 0)
                def _():
                    ax_r[:] = ax_r[:] + part
            else:
                ax_r[:] = jnp.zeros_like(ax_r)
            if xb is not None:
                xb_r[:] = xb
            else:
                xb_r[:] = jnp.zeros_like(xb_r)

        return kern

    def build(mode, BN):
        grid = (n_pad // BN,)
        a_spec = pl.BlockSpec((BN, k_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
        x_spec = pl.BlockSpec((BN, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if mode == "presplit":
            in_specs = [a_spec, a_spec, b_spec, b_spec, x_spec, x_spec]
        else:
            in_specs = [a_spec, b_spec, x_spec, x_spec]
        call = pl.pallas_call(
            make_kernel(mode),
            grid=grid,
            in_specs=in_specs,
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
                bytes_accessed=(2 * n_pad * m_pad) * 2 + (n_pad * k_pad + k_pad * m_pad) * 4,
                transcendentals=0,
            ),
        )
        return call

    for BN in (512, 1024):
        for mode in ("cur", "presplit", "1pass", "ax_only", "xb_only"):
            call = build(mode, BN)
            if mode == "presplit":
                ah, al = split(a0)
                bh, bl = split(b0)

                def body(carry, _):
                    ah, al, bh, bl = carry
                    ax, xb = call(ah, al, bh, bl, x_hi, x_lo)
                    ah = (ah.astype(jnp.float32) + 1e-12 * xb).astype(jnp.bfloat16)
                    bh = (bh.astype(jnp.float32) + 1e-12 * ax).astype(jnp.bfloat16)
                    return (ah, al, bh, bl), None

                t = timed(body, (ah, al, bh, bl))
            else:
                def body(carry, _):
                    a, b = carry
                    ax, xb = call(a, b, x_hi, x_lo)
                    a = a + 1e-12 * xb
                    b = b + 1e-12 * ax
                    return (a, b), None

                t = timed(body, (a0, b0))
            print(f"BN={BN:5d} {mode:10s} {t * 1e6:8.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
