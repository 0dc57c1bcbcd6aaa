"""Hardware discriminator for the three-level MXU LDE (precision > 2^20).

Compares `lde_mxu` through `MxuNttPlan3` against the butterfly LDE on the
same random column at production scale, on the current backend. Run on TPU
before enabling STARK_TPU_MXU=1 above 2^20 (the two-level engine's dbg3
table only covers <= 2^20).

    STEPS_LOG=19 PREC_LOG=22 python scripts/dbg_mxu3.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import os
import time

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import mxu_ntt
from stark_tpu.ops import ntt as nttm


def main():
    steps = 1 << int(os.environ.get("STEPS_LOG", 19))
    precision = 1 << int(os.environ.get("PREC_LOG", 22))
    p = spec.p
    g2 = spec.root_of_unity(precision)
    g1 = pow(g2, precision // steps, p)

    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 1 << 62, size=steps, dtype=np.uint64).astype(object))
    vals = [int(v) ** 5 % p for v in vals]
    tr = mm.to_mont(spec, jnp.asarray(mm.ints_to_limbs_np(vals, spec)))

    print(f"steps=2^{steps.bit_length()-1} precision=2^{precision.bit_length()-1}",
          flush=True)

    t0 = time.time()
    inv_plan, big_plan = mxu_ntt.make_lde_plans(spec, g1, g2, steps, precision)
    assert isinstance(big_plan, mxu_ntt.MxuNttPlan3), type(big_plan)
    print(f"plans built in {time.time()-t0:.1f}s", flush=True)

    lde3 = jax.jit(lambda t, ip, bp: mxu_ntt.lde_mxu(ip, bp, t))
    t0 = time.time()
    out3 = np.asarray(lde3(tr, inv_plan, big_plan))
    print(f"mxu3 LDE (compile+run) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out3 = np.asarray(lde3(tr, inv_plan, big_plan))
    mxu_s = time.time() - t0

    ref_plan = nttm.make_lde_plan(spec, g1, g2, steps, precision)
    ldeb = jax.jit(lambda t, pl: nttm.lde(spec, t, pl))
    t0 = time.time()
    want = np.asarray(ldeb(tr, ref_plan))
    print(f"butterfly LDE (compile+run) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    want = np.asarray(ldeb(tr, ref_plan))
    bf_s = time.time() - t0

    eq = np.array_equal(out3, want)
    print(
        f"MXU3_DISCRIMINATOR equal={eq} mxu3={mxu_s*1e3:.1f}ms "
        f"butterfly={bf_s*1e3:.1f}ms",
        flush=True,
    )
    if not eq:
        bad = np.argwhere(out3 != want)
        print(f"first mismatches (limb, idx): {bad[:5].tolist()}")


if __name__ == "__main__":
    main()
