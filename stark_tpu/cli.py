"""Command-line interface.

`python -m stark_tpu.cli <r1cs> <wtns> <proof.json>` mirrors the reference's
CLI (`/root/reference/packages/r1cs-stark/src/main.rs:4-11`: prove then
verify). Subcommands `prove`/`verify`/`run` expose the individual file-path
entry points (`run.rs:528-625`).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _enable_persistent_cache() -> None:
    """Point JAX at the on-disk compilation cache (same settings as the
    test conftest) so repeat CLI invocations skip the multi-minute cold
    compile. Opt out with STARK_TPU_CACHE=0; override the dir by path."""
    cache = os.environ.get(
        "STARK_TPU_CACHE", os.path.expanduser("~/.cache/jax_stark")
    )
    if cache in ("", "0"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(argv=None) -> int:
    _enable_persistent_cache()
    from stark_tpu.protocol import runner

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] not in ("prove", "verify", "run", "warmup", "serve"):
        argv = ["run"] + argv  # bare 3-arg form, like `cargo run a b c`

    parser = argparse.ArgumentParser(prog="stark-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("prove", "verify", "run"):
        sp = sub.add_parser(name)
        sp.add_argument("r1cs")
        sp.add_argument("wtns")
        sp.add_argument("proof_json")
        sp.add_argument(
            "--digest", choices=("blake2s", "poseidon"), default="blake2s",
            help="tree digest (the reference's H: Digest parameter); "
            "poseidon commits the l/FRI trees (see core.build_proof_stages)",
        )
    wp = sub.add_parser(
        "warmup",
        help="precompile every prover/verifier executable for a circuit "
        "(parallel; fills the persistent cache so the first prove is fast)",
    )
    wp.add_argument("r1cs")
    wp.add_argument("--threads", type=int, default=None)
    sub.add_parser(
        "serve",
        help="long-lived proving worker: line-delimited JSON-RPC on stdio "
        "(warm caches across calls; used by packages/node)",
    )
    args = parser.parse_args(argv)

    if args.cmd == "serve":
        from stark_tpu.serve import serve

        return serve()

    t0 = time.time()
    if args.cmd == "warmup":
        from stark_tpu.protocol.params import derive_params
        from stark_tpu.protocol.warmup import warmup_prover
        from stark_tpu.r1cs.arithmetize import arithmetize
        from stark_tpu.r1cs.reader import read_r1cs

        with open(args.r1cs, "rb") as f:
            r1cs = read_r1cs(f.read())
        spec = runner._spec_for(r1cs)
        h = r1cs.header
        n_pub = 1 + h.n_public_inputs + h.n_public_outputs
        arith = arithmetize(spec, r1cs.constraints, None, h.n_wires, n_pub)
        params = derive_params(spec, arith.original_steps)
        n = warmup_prover(
            spec,
            params.steps,
            params.precision,
            arith.original_steps,
            len(arith.public_first_indices),
            threads=args.threads,
            n_wires=(h.n_wires if runner._device_arith() else 0),
        )
        print(f"warmed {n} executables (steps={params.steps})")
    elif args.cmd == "prove":
        runner.prove_with_file_path(
            args.r1cs, args.wtns, args.proof_json, digest=args.digest
        )
    elif args.cmd == "verify":
        runner.verify_with_file_path(
            args.r1cs, args.wtns, args.proof_json, digest=args.digest
        )
        print("Done proof verification")
    else:
        runner.run_with_file_path(
            args.r1cs, args.wtns, args.proof_json, digest=args.digest
        )
        print("Done proof verification")
    print(f"{args.cmd}: {time.time() - t0:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
