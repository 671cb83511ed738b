"""Characterize pallas_call economics on this runtime:

1. noop kernel in a scan            -> fixed per-call overhead
2. grid=(G,) dots on a CONSTANT-index full-VMEM X, G in {1, 8, 32}
   -> per-grid-step cost with X resident (slope) + call overhead (intercept)

If the slope is ~MXU-only, a whole-training-chunk-in-one-kernel design
amortizes the ~45us call overhead over hundreds of steps.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad, m_pad, k_pad = 4096, 1024, 128
    rng = np.random.default_rng(0)
    x_hi = jnp.asarray(rng.standard_normal((n_pad, m_pad)), jnp.bfloat16)
    a0 = jnp.asarray(rng.standard_normal((n_pad, k_pad)), jnp.float32)
    steps = 2000

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

    # 1. noop kernel
    def noop_kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] + 1.0

    noop = pl.pallas_call(
        noop_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    def body_noop(carry, _):
        return noop(carry), None

    z = jnp.zeros((8, 128), jnp.float32)
    print(f"noop pallas      {timed(body_noop, z) * 1e6:8.2f} us/call", flush=True)

    # 2. resident-X dots, G grid steps per call
    for G in (1, 8, 32):
        def kern(a_ref, x_ref, out_ref):
            i = pl.program_id(0)
            part = jax.lax.dot_general(
                a_ref[:], x_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(i == 0)
            def _():
                out_ref[:] = part

            @pl.when(i > 0)
            def _():
                out_ref[:] = out_ref[:] + part

        call = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((n_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k_pad, m_pad), jnp.float32),
        )

        def body2(carry, _):
            a = carry
            out = call(a.astype(jnp.bfloat16), x_hi)
            return a + 1e-12 * jnp.sum(out) , None

        t = timed(body2, a0)
        print(f"resident G={G:3d}    {t * 1e6:8.2f} us/call  ({t / G * 1e6:7.2f} us per grid step)", flush=True)


if __name__ == "__main__":
    main()
