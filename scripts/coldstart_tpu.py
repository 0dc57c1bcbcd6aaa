"""Cold-start measurement: parallel warmup + first prove on a FRESH cache.

Times `warmup_prover` (parallel compiles) and the first full prove for a
circuit size, with the persistent cache pointed at a throwaway dir so
nothing is reused locally. Compare against the serial cold numbers in
BASELINE.md (826 s first prove / 2,352 s setup at steps 2^17).

    N=21845 python scripts/coldstart_tpu.py            # steps 2^16
    N=21845 WARMUP=0 python scripts/coldstart_tpu.py   # serial baseline
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import json
import os
import tempfile
import time

import jax

cache = os.environ.get("CACHE_DIR") or tempfile.mkdtemp(prefix="stark_cold_")
jax.config.update("jax_compilation_cache_dir", cache)
# GPU-only XLA cache paths would otherwise be derived from the
# cache dir and folded into every cache KEY, making cached
# executables non-portable across cache locations (cache-pack)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.protocol import runner
from stark_tpu.protocol.params import derive_params
from stark_tpu.protocol.warmup import warmup_prover
from stark_tpu.r1cs.arithmetize import arithmetize
from stark_tpu.r1cs.synth import squaring_chain


def main():
    n = int(os.environ.get("N", 21845))
    # WARMUP=0: serial cold prove (no warmup). WARMUP=1: blocking foreground
    # warmup, then prove. default/auto: the production path -- the prover's
    # background auto-warmup races the first prove (protocol/warmup.py).
    mode = os.environ.get("WARMUP", "auto")
    os.environ["STARK_TPU_WARMUP"] = "0" if mode == "0" else (
        "1" if mode == "1" else "auto"
    )
    r1cs, wb = squaring_chain(n)
    n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs

    warm_s = None
    if mode == "1":
        h = r1cs.header
        arith = arithmetize(spec, r1cs.constraints, None, h.n_wires, n_pub)
        params = derive_params(spec, arith.original_steps)
        t0 = time.time()
        n_targets = warmup_prover(
            spec,
            params.steps,
            params.precision,
            arith.original_steps,
            len(arith.public_first_indices),
            n_wires=(h.n_wires if runner._device_arith() else 0),
        )
        warm_s = time.time() - t0
        print(f"warmup: {n_targets} targets in {warm_s:.1f}s", flush=True)

    t_start = time.time()
    proof = runner.prove_with_witness(r1cs, wb)
    first_prove_s = time.time() - t_start
    t0 = time.time()
    verified = runner.verify_with_witness(r1cs, wb[:n_pub], proof)
    first_verify_s = time.time() - t0
    to_first_verified_s = time.time() - t_start
    t0 = time.time()
    runner.prove_with_witness(r1cs, wb)
    second_prove_s = time.time() - t0

    print(
        "MEASURE "
        + json.dumps(
            {
                "kind": "coldstart",
                "mode": mode,
                "n_constraints": n,
                "warmup_s": None if warm_s is None else round(warm_s, 1),
                "first_prove_s": round(first_prove_s, 1),
                "first_verify_s": round(first_verify_s, 1),
                "to_first_verified_s": round(to_first_verified_s, 1),
                "verified": bool(verified),
                "second_prove_s": round(second_prove_s, 1),
                "cache_dir": cache,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
