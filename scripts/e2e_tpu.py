"""Full-proof wall-clock + memory measurement on the current backend.

Measures the COMPLETE prover (arithmetize + LDEs + commits + Fiat-Shamir +
branches + FRI + JSON-able proof) and the verifier on a synthetic squaring
chain, with peak device memory (when the backend reports it) and host RSS.
Prints one MEASURE json line; run twice in one process for cold vs warm
numbers.

    N=43690 python scripts/e2e_tpu.py         # steps 2^17, precision 2^20
    N=43690 REPEAT=2 python scripts/e2e_tpu.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import json
import os
import resource
import time

os.environ.setdefault("STARK_TPU_TRACE", "1")
import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stark_tpu.protocol import proof as proof_mod
from stark_tpu.protocol import runner
from stark_tpu.r1cs.synth import squaring_chain


def device_mem():
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats is None:  # tunneled/remote devices return None
            return {"error": "memory_stats() is None on this backend"}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        }
    except Exception as e:  # not all backends expose memory stats
        return {"error": str(e)[:80]}


def main():
    n = int(os.environ.get("N", 43690))
    repeat = int(os.environ.get("REPEAT", 1))
    r1cs, wb = squaring_chain(n)
    backend = jax.default_backend()

    for it in range(repeat):
        t0 = time.time()
        proof = runner.prove_with_witness(r1cs, wb)
        prove_s = time.time() - t0

        t0 = time.time()
        pj = proof_mod.to_json(proof)
        json_s = time.time() - t0

        t0 = time.time()
        ok = runner.verify_with_witness(r1cs, [wb[0], wb[1]], proof)
        verify_s = time.time() - t0

        out = {
            "kind": "e2e",
            "iter": it,
            "backend": backend,
            "n_constraints": n,
            "prove_s": round(prove_s, 2),
            "verify_s": round(verify_s, 2),
            "proof_json_bytes": len(pj),
            "json_s": round(json_s, 2),
            "verified": bool(ok),
            "host_peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            // 1024,
            "device_mem": device_mem(),
        }
        print("MEASURE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
