"""FFT points/sec on the current backend (BASELINE.json's named metric).

Times the forward NTT at the production domain size and the full LDE
(steps -> precision) on one field column, for both engines where they
apply, and prints one JSON line per measurement:

    {"metric": "ntt_points_per_s", "n": ..., "engine": ..., "value": ...}

    NTT_LOG=20 STEPS_LOG=17 python scripts/bench_ntt.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import mxu_ntt
from stark_tpu.ops import ntt as nttm


def _column(n: int):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64).astype(object)
    vals = [int(v) ** 5 % spec.p for v in vals]
    return mm.to_mont(spec, jnp.asarray(mm.ints_to_limbs_np(vals, spec)))


def _time(fn, *args, iters=None):
    iters = iters or int(os.environ.get("ITERS", 5))
    out = np.asarray(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        out = np.asarray(fn(*args))
    return (time.time() - t0) / iters, out


def _report(metric, n, engine, secs):
    print(
        json.dumps(
            {
                "metric": metric,
                "n": n,
                "engine": engine,
                "backend": jax.default_backend(),
                "seconds": round(secs, 5),
                "value": round(n / secs, 1),
                "unit": "points/s",
            }
        ),
        flush=True,
    )


def main():
    n = 1 << int(os.environ.get("NTT_LOG", 20))
    steps = 1 << int(os.environ.get("STEPS_LOG", 17))
    g2 = spec.root_of_unity(n)
    g1 = pow(g2, n // steps, spec.p)

    # forward NTT at the big domain (butterfly engine; the prover's
    # best_fft(g2) shape, fft.rs:327-357)
    col = _column(n)
    w_half = nttm.forward_table(spec, g2, n)
    fwd = jax.jit(lambda t, w: nttm.ntt(spec, t, w))
    secs, _ = _time(fwd, col, w_half)
    _report("ntt_points_per_s", n, "butterfly", secs)

    # full LDE steps -> n, both engines
    tr = _column(steps)
    bplan = nttm.make_lde_plan(spec, g1, g2, steps, n)
    ldeb = jax.jit(lambda t, pl: nttm.lde(spec, t, pl))
    secs, want = _time(ldeb, tr, bplan)
    _report("lde_points_per_s", n, "butterfly", secs)

    if os.environ.get("SKIP_MXU") != "1":
        inv_plan, big_plan = mxu_ntt.make_lde_plans(spec, g1, g2, steps, n)
        ldem = jax.jit(lambda t, ip, bp: mxu_ntt.lde_mxu(ip, bp, t))
        secs, got = _time(ldem, tr, inv_plan, big_plan)
        _report("lde_points_per_s", n, "crt_mxu", secs)
        print(f"# engines agree: {np.array_equal(np.asarray(got), np.asarray(want))}",
              flush=True)


if __name__ == "__main__":
    main()
