"""Device-time profile + roofline/MFU figures for the warm prover.

Two measurements at one circuit size (default steps 2^17):

1. A warm prove with per-phase device barriers (STARK_TPU_SYNC_PHASES) —
   wall time attributed to the phase that launched the device work.
2. XLA cost analysis of every compiled prover stage (flops + bytes
   accessed, as the compiler counts them), summed per phase
   (`stark_tpu/utils/profiling.py`).

Combining the two gives per-phase achieved FLOP/s and HBM GB/s against the
chip's peaks — the roofline statement VERDICT r2 #4 asks for. Caveats
printed with the numbers: XLA's "flops" counts vector integer lane ops as
flops (this prover is u32-limb arithmetic; the MXU engine's bf16 dots are
real MACs), and phase walls include the remote-transport dispatch latency,
so the utilization figures are LOWER bounds on what the device kernels
achieve.

    python scripts/profile_tpu.py
    N=174762 python scripts/profile_tpu.py     # steps 2^19 / 2^22
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

os.environ.setdefault("STARK_TPU_TRACE", "1")
os.environ.setdefault("STARK_TPU_SYNC_PHASES", "1")
os.environ.setdefault("STARK_TPU_WARMUP", "0")  # measure, don't race compiles

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark")
)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.protocol import runner
from stark_tpu.protocol.params import derive_params
from stark_tpu.r1cs.synth import squaring_chain
from stark_tpu.utils import tracing
from stark_tpu.utils.profiling import (
    PEAK_FLOPS,
    PEAK_HBM,
    phase_cost_sums,
    phase_walls,
)


def main():
    n = int(os.environ.get("N", 43690))
    r1cs, wb = squaring_chain(n)

    # warm everything once, then measure a phase-synced prove
    runner.prove_with_witness(r1cs, wb)
    tracing.reset()
    t0 = time.time()
    runner.prove_with_witness(r1cs, wb)
    wall = time.time() - t0
    phases = phase_walls()

    from stark_tpu.r1cs.arithmetize import arithmetize

    witness = [spec.from_bytes_le(w) for w in wb]
    arith = arithmetize(spec, r1cs.constraints, witness, r1cs.header.n_wires, 2)
    params = derive_params(spec, arith.original_steps)
    sums, details = phase_cost_sums(
        spec, params.steps, params.precision, arith.original_steps,
        n_pub=2, n_wires=r1cs.header.n_wires,
    )
    print("\nper-stage XLA cost analysis:")
    for name, ph, flops, byts, err in details:
        txt = err or f"{flops/1e9:9.2f} GF {byts/1e9:8.2f} GB"
        print(f"  {name:24s} -> {str(ph):10s} {txt}")

    print("\nphase                wall(ms)   XLA-flops   XLA-bytes  "
          "FLOP/s(%peak)  GB/s(%HBM)")
    out_phases = {}
    for ph_name, t in sorted(phases.items(), key=lambda kv: -kv[1]):
        f, b = sums.get(ph_name, (0.0, 0.0))
        fl = f / t if t > 0 else 0.0
        bw = b / t if t > 0 else 0.0
        print(
            f"  {ph_name:16s} {t*1e3:9.1f}  {f/1e9:9.2f}G  {b/1e9:9.2f}G"
            f"  {fl/1e12:6.2f}T ({100*fl/PEAK_FLOPS:4.1f}%)"
            f"  {bw/1e9:6.1f} ({100*bw/PEAK_HBM:4.1f}%)"
        )
        out_phases[ph_name] = {
            "wall_s": round(t, 4),
            "xla_flops": f,
            "xla_bytes": b,
        }

    total_f = sum(f for f, _ in sums.values())
    total_b = sum(b for _, b in sums.values())
    dev_wall = sum(phases.get(k, 0.0) for k in
                   ("traces", "a_tree", "columns", "commits", "branches",
                    "fri", "materialize"))
    mfu = total_f / dev_wall / PEAK_FLOPS if dev_wall else 0.0
    hbm = total_b / dev_wall / PEAK_HBM if dev_wall else 0.0
    print(
        f"\nwhole prove: wall {wall:.2f}s, phase-synced device-attributed "
        f"{dev_wall:.2f}s, XLA {total_f/1e12:.2f} TFLOP {total_b/1e9:.1f} GB"
        f" -> {100*mfu:.1f}% of bf16 peak, {100*hbm:.1f}% of HBM peak"
    )
    try:
        stats = jax.local_devices()[0].memory_stats()
        peak_bytes = None if stats is None else stats.get("peak_bytes_in_use")
    except Exception:
        peak_bytes = None
    print(
        "MEASURE "
        + json.dumps(
            {
                "kind": "profile",
                "n_constraints": n,
                "steps": params.steps,
                "precision": params.precision,
                "warm_prove_synced_s": round(wall, 3),
                "phases": out_phases,
                "xla_total_flops": total_f,
                "xla_total_bytes": total_b,
                "flops_util_pct": round(100 * mfu, 2),
                "hbm_util_pct": round(100 * hbm, 2),
                "device_peak_bytes": peak_bytes,
                "caveat": "XLA flops count u32 vector lane ops; walls "
                "include remote dispatch latency -> utilization is a "
                "lower bound",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
