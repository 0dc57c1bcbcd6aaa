"""Host RSS attribution for a prove (VERDICT r4 #5).

The reference's one published perf fact is host memory behavior
(`/root/reference/packages/r1cs-stark/README.md:50`: OOM on a 32 GB host
at ~30k constraints). Round 4 recorded 7.7 GB at steps 2^17 and 20.2 GB
at 2^23 without saying what holds it; this script attributes the peak:

* milestone RSS: after imports / backend init / circuit build / stage
  build+warm / first prove / repeat prove,
* per-phase RSS deltas (STARK_TPU_RSS=1 threads VmRSS through the phase
  tracer),
* optional tracemalloc top allocation sites (RSS_TRACEMALLOC=1; ~2x
  slower, python allocations only -- jax/XLA native buffers do not show).

    N=43690 python scripts/host_rss_tpu.py          # steps 2^17
    N=349525 python scripts/host_rss_tpu.py         # steps 2^20 (2^23 dom)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import json
import os
import resource
import time

os.environ.setdefault("STARK_TPU_RSS", "1")
os.environ.setdefault("STARK_TPU_TRACE", "1")

TRACEMALLOC = os.environ.get("RSS_TRACEMALLOC", "0") == "1"
if TRACEMALLOC:
    import tracemalloc

    tracemalloc.start(12)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024
    return 0.0


def peak_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


milestones = {}


def mark(name):
    milestones[name] = {"rss_mb": round(rss_mb()), "peak_mb": round(peak_mb())}
    print(f"RSS {name}: {milestones[name]}", flush=True)


mark("start")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
mark("after_import")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_ = np.asarray(jax.jit(lambda: jnp.zeros((), jnp.uint32) + 1)())
mark("after_backend_init")

from stark_tpu.protocol import runner  # noqa: E402
from stark_tpu.r1cs.synth import squaring_chain  # noqa: E402

n = int(os.environ.get("N", 43690))
r1cs, wb = squaring_chain(n)
mark("after_circuit_build")

t0 = time.time()
proof = runner.prove_with_witness(r1cs, wb)
print(f"first prove: {time.time() - t0:.1f}s", flush=True)
del proof
mark("after_first_prove")

if TRACEMALLOC:
    snap = tracemalloc.take_snapshot()
    print("tracemalloc top sites (python allocations only):", flush=True)
    for st in snap.statistics("lineno")[:12]:
        print(f"  {st.size / 2**20:8.1f} MB  {st.traceback}", flush=True)

import gc  # noqa: E402

gc.collect()
mark("after_gc")

t0 = time.time()
proof = runner.prove_with_witness(r1cs, wb)
print(f"repeat prove: {time.time() - t0:.1f}s", flush=True)
mark("after_repeat_prove")

n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
ok = runner.verify_with_witness(r1cs, wb[:n_pub], proof)
mark("after_verify")

print(
    "MEASURE "
    + json.dumps(
        {
            "kind": "host_rss",
            "n_constraints": n,
            "verified": bool(ok),
            "milestones": milestones,
        }
    ),
    flush=True,
)
