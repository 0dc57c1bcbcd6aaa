"""Command-line interface.

`python -m stark_tpu.cli <r1cs> <wtns> <proof.json>` mirrors the reference's
CLI (`/root/reference/packages/r1cs-stark/src/main.rs:4-11`: prove then
verify). Subcommands `prove`/`verify`/`run` expose the individual file-path
entry points (`run.rs:528-625`).
"""

from __future__ import annotations

import argparse
import sys
import time

from stark_tpu.protocol import runner


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] not in ("prove", "verify", "run"):
        argv = ["run"] + argv  # bare 3-arg form, like `cargo run a b c`

    parser = argparse.ArgumentParser(prog="stark-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("prove", "verify", "run"):
        sp = sub.add_parser(name)
        sp.add_argument("r1cs")
        sp.add_argument("wtns")
        sp.add_argument("proof_json")
    args = parser.parse_args(argv)

    t0 = time.time()
    if args.cmd == "prove":
        runner.prove_with_file_path(args.r1cs, args.wtns, args.proof_json)
    elif args.cmd == "verify":
        runner.verify_with_file_path(args.r1cs, args.wtns, args.proof_json)
        print("Done proof verification")
    else:
        runner.run_with_file_path(args.r1cs, args.wtns, args.proof_json)
        print("Done proof verification")
    print(f"{args.cmd}: {time.time() - t0:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
