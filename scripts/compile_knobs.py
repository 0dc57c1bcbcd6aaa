"""Micro-experiment: compile-time levers for the cold-start problem.

Times the compile of the two dominant modules (acc_j-alike and a fused
rest-alike) at a given steps size under optional XLA effort knobs, on a
fresh (uncached) basis: pass a steps size the remote compile service has
not seen this boot, or FLAGS=... to change the HLO env.

    STEPS=8192 python scripts/compile_knobs.py
    STEPS=8192 EFFORT=-1 python scripts/compile_knobs.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax

eff = os.environ.get("EFFORT")
if eff is not None:
    try:
        jax.config.update("jax_exec_time_optimization_effort", float(eff))
        jax.config.update("jax_memory_fitting_effort", float(eff))
        print(f"effort knobs set to {eff}")
    except Exception as e:
        print(f"effort knobs unavailable: {e}")

import jax.numpy as jnp

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import modmath as mm
from stark_tpu.protocol import kernels


def timed(name, fn, *args):
    t0 = time.time()
    lo = fn.lower(*args)
    t_l = time.time() - t0
    t0 = time.time()
    lo.compile()
    t_c = time.time() - t0
    print(f"  {name:28s} lower {t_l:6.2f}s compile {t_c:7.2f}s", flush=True)


def main():
    steps = int(os.environ.get("STEPS", 8192))
    L = spec.num_limbs
    S = lambda sh, dt=jnp.uint32: jax.ShapeDtypeStruct(sh, dt)
    col = S((L, steps))

    @jax.jit
    def acc_like(idx, perm, s, r):
        vn, vd = kernels.rand_combination(spec, r, idx, perm, s)
        return kernels.accumulator_mini(spec, vn, vd)

    @jax.jit
    def prefix_only(v):
        return mm.prefix_prod(spec, v)

    @jax.jit
    def minv_only(v):
        return mm.multi_inv(spec, v)

    @jax.jit
    def mmul_only(a, b):
        return mm.mmul(spec, a, b)

    print(f"steps={steps} backend={jax.default_backend()}", flush=True)
    timed("mmul", mmul_only, col, col)
    timed("prefix_prod", prefix_only, col)
    timed("multi_inv", minv_only, col)
    timed("acc_like", acc_like, col, col, col, S((L, 3)))


if __name__ == "__main__":
    main()
