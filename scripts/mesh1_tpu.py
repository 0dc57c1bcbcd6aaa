"""Certify the mesh prover carries single-chip performance (VERDICT r2 #1).

Runs the UNIFIED prover twice on the real chip at the benchmark size
(steps 2^17, precision 2^20): once through the plain path
(`runner.prove_with_witness`) and once through the mesh path
(`runner.prove_with_witness(..., mesh=Mesh([chip]))` — the exact code the
multi-chip prover runs, with the `columns` stage in its d=1 degenerate
form). Asserts the proofs are byte-identical and prints both warm walls;
the mesh/plain ratio is the certification number (target <= 1.2).

    python scripts/mesh1_tpu.py
    N=174762 python scripts/mesh1_tpu.py     # steps 2^19 / precision 2^22
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
from jax.sharding import Mesh

from stark_tpu.protocol import proof as proof_mod
from stark_tpu.protocol import runner
from stark_tpu.r1cs.synth import squaring_chain


def main():
    n = int(os.environ.get("N", 43690))
    repeat = int(os.environ.get("REPEAT", 3))
    r1cs, wb = squaring_chain(n)
    mesh = Mesh(np.array(jax.devices()[:1]), ("d",))

    walls = {"plain": [], "mesh1": []}
    proofs = {}
    for it in range(repeat):
        for kind, m in (("plain", None), ("mesh1", mesh)):
            t0 = time.time()
            proof = runner.prove_with_witness(r1cs, wb, mesh=m)
            pj = proof_mod.to_json(proof)
            walls[kind].append(round(time.time() - t0, 3))
            proofs[kind] = pj
        assert proofs["mesh1"] == proofs["plain"], "mesh1 proof != plain proof"

    warm_plain = min(walls["plain"][1:] or walls["plain"])
    warm_mesh = min(walls["mesh1"][1:] or walls["mesh1"])
    print(
        "MEASURE "
        + json.dumps(
            {
                "kind": "mesh1_certification",
                "backend": jax.default_backend(),
                "n_constraints": n,
                "walls_plain_s": walls["plain"],
                "walls_mesh1_s": walls["mesh1"],
                "warm_plain_s": warm_plain,
                "warm_mesh1_s": warm_mesh,
                "ratio": round(warm_mesh / warm_plain, 3),
                "byte_identical": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
