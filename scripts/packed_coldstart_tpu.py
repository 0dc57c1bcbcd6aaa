"""Restored-cold-start measurement: cache-pack -> wipe -> unpack -> prove.

Validates the deployment story for the reference's zero-warmup standing
start (`/root/reference/packages/r1cs-stark/src/main.rs:4-11` runs an
AOT-compiled binary): a warmed host packs its persistent compile cache +
NTT plan tables (`cli cache-pack`), a new host restores them
(`cli cache-unpack`), and its first prove skips the XLA/Mosaic compile
wall entirely -- only per-process jit lowering (host tracing) and
execution remain.

Three fresh subprocesses, each with its OWN throwaway cache dirs:
  phase A  build: prove+verify against an empty cache (fills it)
  pack     tar the phase-A caches (no jax involved)
  phase B  restored: unpack into empty dirs, then prove+verify

    N=21845 python scripts/packed_coldstart_tpu.py     # steps 2^16
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

_CHILD = r"""
import json, logging, os, sys, time
sys.path.insert(0, %(repo)r)
logging.basicConfig(level=logging.WARNING)
# count persistent-cache hits/misses (parent greps the saved log); the
# logger level does NOT feed the cache key (verified: same key with and
# without it)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["STARK_TPU_CACHE"])
# GPU-only XLA cache paths would otherwise be derived from the
# cache dir and folded into every cache KEY, making cached
# executables non-portable across cache locations (cache-pack)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from stark_tpu.protocol import runner
from stark_tpu.r1cs.synth import squaring_chain

n = int(os.environ.get("N", 21845))
r1cs, wb = squaring_chain(n)
n_pub = 1 + r1cs.header.n_public_inputs + r1cs.header.n_public_outputs
t_start = time.time()
proof = runner.prove_with_witness(r1cs, wb)
first_prove_s = time.time() - t_start
verified = runner.verify_with_witness(r1cs, wb[:n_pub], proof)
to_first_verified_s = time.time() - t_start
t0 = time.time()
runner.prove_with_witness(r1cs, wb)
second_prove_s = time.time() - t0
print("CHILD " + json.dumps({
    "first_prove_s": round(first_prove_s, 1),
    "to_first_verified_s": round(to_first_verified_s, 1),
    "second_prove_s": round(second_prove_s, 2),
    "verified": bool(verified),
}), flush=True)
"""


def _run_child(cache, plans, aot, extra_env=None, log=None):
    env = dict(os.environ)
    env["STARK_TPU_CACHE"] = cache
    env["STARK_TPU_PLANS_CACHE"] = plans
    # per-phase AOT dir: phase B must get its blobs ONLY via the unpacked
    # archive, never by sharing phase A's directory
    env["STARK_TPU_AOT_CACHE"] = aot
    env.update(extra_env or {})
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-u", "-c", _CHILD % {"repo": REPO}],
        capture_output=True, text=True, env=env,
    )
    wall = time.time() - t0
    if log:
        with open(log, "w") as f:
            f.write(out.stdout + "\n--- stderr ---\n" + out.stderr)
    for line in out.stdout.splitlines():
        if line.startswith("CHILD "):
            d = json.loads(line[6:])
            d["process_wall_s"] = round(wall, 1)
            return d
    raise RuntimeError(
        f"child failed (rc={out.returncode}):\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def main():
    base = tempfile.mkdtemp(prefix="stark_packed_cold_")
    a_cache, a_plans, a_aot = f"{base}/a_cache", f"{base}/a_plans", f"{base}/a_aot"
    b_cache, b_plans, b_aot = f"{base}/b_cache", f"{base}/b_plans", f"{base}/b_aot"
    archive = f"{base}/warm.tar.gz"
    for d in (a_cache, a_plans, a_aot, b_cache, b_plans, b_aot):
        os.makedirs(d)

    print("phase A: build cache from empty (cold compiles)...", flush=True)
    a = _run_child(a_cache, a_plans, a_aot, log="/tmp/packed_cold_a.log")
    print("A " + json.dumps(a), flush=True)

    t0 = time.time()
    env = dict(os.environ, STARK_TPU_CACHE=a_cache, STARK_TPU_PLANS_CACHE=a_plans,
               STARK_TPU_AOT_CACHE=a_aot)
    subprocess.run(
        [sys.executable, "-m", "stark_tpu.cli", "cache-pack", archive],
        check=True, env=env, cwd=REPO,
    )
    pack_s = time.time() - t0
    mb = os.path.getsize(archive) / 2**20

    t0 = time.time()
    env = dict(os.environ, STARK_TPU_CACHE=b_cache, STARK_TPU_PLANS_CACHE=b_plans,
               STARK_TPU_AOT_CACHE=b_aot)
    subprocess.run(
        [sys.executable, "-m", "stark_tpu.cli", "cache-unpack", archive],
        check=True, env=env, cwd=REPO,
    )
    unpack_s = time.time() - t0

    print("phase B: restored cold start (unpacked cache, fresh process)...",
          flush=True)
    # keep the auto-warmup ON: with a restored cache its threads LOAD the
    # cached executables in parallel (RPC releases the GIL), which a
    # 1-vCPU host needs -- warmup-off measured 45 s slower here
    b = _run_child(b_cache, b_plans, b_aot, log="/tmp/packed_cold_b.log")

    print(
        "MEASURE "
        + json.dumps(
            {
                "kind": "packed_coldstart",
                "n_constraints": int(os.environ.get("N", 21845)),
                "build_to_first_verified_s": a["to_first_verified_s"],
                "archive_mb": round(mb, 1),
                "pack_s": round(pack_s, 1),
                "unpack_s": round(unpack_s, 1),
                "restored_first_prove_s": b["first_prove_s"],
                "restored_to_first_verified_s": b["to_first_verified_s"],
                "restored_second_prove_s": b["second_prove_s"],
                "verified": b["verified"],
                "tmpdir": base,
            }
        ),
        flush=True,
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
