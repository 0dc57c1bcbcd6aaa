"""XLA cost-analysis aggregation for the prover's compiled stages.

Sums the compiler's own flops / bytes-accessed estimates per prover phase,
so measured phase walls (from :mod:`stark_tpu.utils.tracing` with
STARK_TPU_SYNC_PHASES) convert into achieved-FLOP/s and HBM-GB/s roofline
figures. Used by `bench.py` and `scripts/profile_tpu.py`.

Caveats (print them with any derived number): XLA's "flops" counts vector
integer lane ops as flops (this prover is u32-limb arithmetic; only the
MXU engine's bf16 dots are real MACs), and phase walls include remote
dispatch latency, so derived utilization is a LOWER bound.
"""

from __future__ import annotations

# v5e public peaks
PEAK_FLOPS = 197e12  # bf16
PEAK_HBM = 819e9  # bytes/s

# stage-function name -> prover phase attribution (None = not in a prove)
PHASE_OF = {
    "wit_traces_j": "traces",
    "traces_j": None,  # legacy upload path (native arithmetizer replaces it)
    "v_cols_j": None,  # verifier-side
    "a_root_j": "a_tree",
    "acc_j": "columns",
    "rest_a_j": "columns",
    "lde_many_j": "columns",  # the fused multi-column CRT/MXU LDE batch
    "lde_butterfly_j": "columns",  # the per-column butterfly-engine LDE
    "commit_chain_j": "commits",
    "pos_gather_j": "branches",
    "m_commit_stream_j": "commits",
    "m_gather_j": "branches",
    "inv_zb2_j": None,  # per-circuit, not per-prove
    "m_commit_j": "commits",
    "linc_base_j": "commits",
    "l_commit_j": "commits",
    "r_j": "a_tree",
    "k_j": "commits",
    "pos_j": "branches",
    "_gather_flat_j": "branches",
    "_commit_j": "fri",
    "_fold_j": "fri",
    "_sx_j": "fri",
    "_ys_j": "fri",
}


def phase_cost_sums(spec, steps, precision, original_steps, n_pub, n_wires):
    """{phase: (xla_flops, xla_bytes)} summed over every prover stage, plus
    a per-stage detail list. Compiles hit the persistent cache when warm."""
    from stark_tpu.protocol.warmup import warmup_targets

    targets = warmup_targets(
        spec, steps, precision, original_steps, n_pub=n_pub, n_wires=n_wires
    )
    sums: dict = {}
    details = []
    for fn, args in targets:
        name = getattr(fn, "__name__", None) or str(fn)[:30]
        ph = PHASE_OF.get(name, name)
        if ph is None:
            continue
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops = float(ca.get("flops", 0.0))
            byts = float(ca.get("bytes accessed", 0.0))
        except Exception as e:  # backend may not expose cost analysis
            details.append((name, ph, None, None, str(e)[:60]))
            continue
        f, b = sums.get(ph, (0.0, 0.0))
        sums[ph] = (f + flops, b + byts)
        details.append((name, ph, flops, byts, None))
    return sums, details


def phase_walls(top_only: bool = True):
    """{phase_name: seconds} from the tracing tree.

    top_only sums only the root's direct children (the prover's phases);
    a parent phase's elapsed already contains its children, so flattening
    every level would double-count nested spans."""
    from stark_tpu.utils import tracing

    phases: dict = {}

    def walk(node):
        for c in node.children.values():
            phases[c.name] = phases.get(c.name, 0.0) + c.elapsed
            if not top_only:
                walk(c)

    walk(tracing._root)
    return phases


def parse_device_trace(outdir: str, phase_names=None):
    """Parse the newest Chrome trace under `outdir` into device-timeline
    numbers: total device-busy seconds, per-kernel totals, MXU (dot/conv)
    kernel time, and -- when `phase_names` is given and the trace came from
    a STARK_TPU_SYNC_PHASES=1 run -- per-phase device time, segmented at
    the named `stark_phase_barrier` envelopes the tracing barrier emits."""
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    evs = d.get("traceEvents", [])
    pid_names = {
        e["pid"]: e.get("args", {}).get("name", "")
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n}
    kernels: dict = {}
    busy = 0.0
    mxu_us = 0.0
    spans = []
    barriers = []
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
        if "stark_phase_barrier" in name:
            barriers.append(ts + dur)
            continue
        if name.startswith("jit_") or name.startswith("pjit"):
            continue
        k = name.split("(")[0][:60]
        kernels[k] = kernels.get(k, 0.0) + dur
        busy += dur
        if "dot" in k or "conv" in k or "matmul" in k.lower():
            mxu_us += dur
        spans.append((ts, dur))
    out = {
        "device_busy_s": round(busy / 1e6, 4),
        "mxu_kernel_s": round(mxu_us / 1e6, 4),
        "top_kernels_ms": {
            k: round(v / 1e3, 2)
            for k, v in sorted(kernels.items(), key=lambda kv: -kv[1])[:12]
        },
    }
    if phase_names and barriers:
        barriers.sort()
        spans.sort()
        per = [0.0] * (len(barriers) + 1)
        bi = 0
        for ts, dur in spans:
            while bi < len(barriers) and ts >= barriers[bi]:
                bi += 1
            per[bi] += dur
        # one barrier fires at the END of each phase, in order
        dev_phases = {}
        for i, name in enumerate(phase_names[: len(barriers)]):
            dev_phases[name] = dev_phases.get(name, 0.0) + per[i] / 1e6
        if per[len(barriers)]:
            dev_phases["(after_last_barrier)"] = per[len(barriers)] / 1e6
        out["phase_device_s"] = {
            k: round(v, 4)
            for k, v in sorted(dev_phases.items(), key=lambda kv: -kv[1])
        }
    return out


def stage_memory_peaks(spec, steps, precision, original_steps, n_pub, n_wires):
    """{stage: XLA peak_memory_in_bytes} per compiled prover stage.

    The axon remote transport exposes no runtime device memory telemetry
    (`device.memory_stats()` returns None and
    `jax.profiler.device_memory_profile()` aborts the process), so the
    compiler's buffer-assignment peak per executable is the device-exact
    substitute: it bounds each dispatch's live HBM (arguments + outputs +
    temps). It does NOT include arrays held resident BETWEEN dispatches
    (the domain tables and m-tree columns); callers add that accounting
    separately."""
    from stark_tpu.protocol.warmup import warmup_targets

    targets = warmup_targets(
        spec, steps, precision, original_steps, n_pub=n_pub, n_wires=n_wires
    )
    peaks: dict = {}
    for fn, args in targets:
        name = getattr(fn, "__name__", None) or str(fn)[:30]
        try:
            ma = fn.lower(*args).compile().memory_analysis()
            peaks[name] = max(peaks.get(name, 0), int(ma.peak_memory_in_bytes))
        except Exception:
            continue
    return peaks
