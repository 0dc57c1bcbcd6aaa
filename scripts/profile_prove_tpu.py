"""Real device profile of a warm prove: jax.profiler trace -> kernel table.

Captures one warm `prove_with_witness` under `jax.profiler.trace` and
parses the exported Chrome trace: per-kernel device time on the TPU
process, device-busy vs wall, and the top kernels. This is the
measured-on-hardware profile VERDICT r2/r3 asked for (the XLA
cost-analysis roofline in `utils/profiling.py` is a static estimate; this
is what the chip actually did).

    N=43690 python scripts/profile_prove_tpu.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import glob
import gzip
import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stark_tpu.protocol import runner
from stark_tpu.r1cs.synth import squaring_chain


def parse_trace(outdir: str):
    """{kernel_name: total_device_us}, device busy us, from the newest
    Chrome trace under `outdir`."""
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    evs = d.get("traceEvents", [])
    pid_names = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n}
    tid_names = {
        (e["pid"], e.get("tid")): e.get("args", {}).get("name", "")
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    kernels: dict = {}
    busy = 0.0
    spans = []
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        # XLA op events live on the per-core "step" threads; the
        # enclosing jit_* envelope events duplicate their time
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("pjit"):
            continue
        dur = float(e.get("dur", 0.0))
        k = name.split("(")[0][:60]
        kernels[k] = kernels.get(k, 0.0) + dur
        busy += dur
        spans.append((float(e.get("ts", 0.0)), dur))
    return kernels, busy, spans


def main():
    n = int(os.environ.get("N", 43690))
    r1cs, wb = squaring_chain(n)
    # warm everything first (compiles + caches)
    proof = runner.prove_with_witness(r1cs, wb)
    del proof
    import numpy as np
    import jax.numpy as jnp

    # drain the dispatch queue (block_until_ready is unreliable through
    # the remote transport; a D2H read is the real barrier)
    _ = np.asarray(jax.jit(lambda: jnp.zeros((), jnp.uint32) + 1)())

    outdir = os.environ.get("PROFILE_DIR", "/tmp/stark_prove_profile")
    t0 = time.time()
    with jax.profiler.trace(outdir):
        proof = runner.prove_with_witness(r1cs, wb)
        _ = np.asarray(jax.jit(lambda: jnp.zeros((), jnp.uint32) + 2)())
    wall = time.time() - t0

    kernels, busy_us, spans = parse_trace(outdir)
    top = sorted(kernels.items(), key=lambda kv: -kv[1])[:24]
    print(
        "MEASURE "
        + json.dumps(
            {
                "kind": "device_profile",
                "n_constraints": n,
                "wall_s": round(wall, 3),
                "device_busy_s": round(busy_us / 1e6, 3),
                "device_busy_pct_of_wall": round(
                    100 * busy_us / 1e6 / wall, 1
                ),
                "n_kernel_kinds": len(kernels),
                "top_kernels_ms": {
                    k: round(v / 1e3, 2) for k, v in top
                },
                "profile_dir": outdir,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
