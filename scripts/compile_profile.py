"""Per-executable compile-cost profile for one circuit size.

Lowers + compiles every warm target serially WITHOUT the persistent cache
and prints per-target wall times, so cold-start work can attack the
dominant modules instead of guessing.

    N=21845 python scripts/compile_profile.py          # steps 2^16
    N=21845 THREADS=8 python scripts/compile_profile.py  # parallel total
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

# NO persistent cache: measure true compile cost
import jax

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.protocol.params import derive_params
from stark_tpu.protocol.warmup import warmup_targets
from stark_tpu.r1cs.arithmetize import arithmetize
from stark_tpu.r1cs.synth import squaring_chain


def main():
    n = int(os.environ.get("N", 21845))
    threads = int(os.environ.get("THREADS", 0))
    r1cs, wb = squaring_chain(n)
    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    targets = warmup_targets(
        spec, params.steps, params.precision, arith.original_steps,
        n_pub=2, n_wires=r1cs.header.n_wires,
    )
    print(f"steps={params.steps} precision={params.precision} "
          f"targets={len(targets)} backend={jax.default_backend()}", flush=True)

    t_all = time.time()
    if threads:
        from concurrent.futures import ThreadPoolExecutor

        def one(ta):
            fn, args = ta
            t0 = time.time()
            fn.lower(*args).compile()
            return time.time() - t0

        with ThreadPoolExecutor(max_workers=threads) as ex:
            times = list(ex.map(one, targets))
        for (fn, _), dt in zip(targets, times):
            print(f"  {getattr(fn, '__name__', fn)!s:40s} {dt:8.2f}s", flush=True)
    else:
        for fn, args in targets:
            t0 = time.time()
            lowered = fn.lower(*args)
            t_lower = time.time() - t0
            t0 = time.time()
            lowered.compile()
            t_compile = time.time() - t0
            name = getattr(fn, "__name__", None) or str(fn)[:40]
            print(f"  {name:40s} lower {t_lower:7.2f}s  compile {t_compile:8.2f}s",
                  flush=True)
    print(f"TOTAL {time.time() - t_all:.1f}s (threads={threads})", flush=True)


if __name__ == "__main__":
    main()
