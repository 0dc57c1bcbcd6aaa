/**
 * Node.js binding for the TPU STARK framework.
 *
 * Mirrors the reference's N-API package surface
 * (`/root/reference/packages/napi/src/index.ts:8-48`: prove / verify /
 * proveWithFilePath / verifyWithFilePath) but delegates to the Python CLI
 * (`python -m stark_tpu.cli`) instead of an in-process native module -- the
 * heavy lifting runs on the TPU either way, and the reference's neon binding
 * is bit-rotted against its own crates (SURVEY.md section 2.6).
 */
"use strict";

const { execFileSync } = require("child_process");
const fs = require("fs");
const os = require("os");
const path = require("path");

const PYTHON = process.env.STARK_TPU_PYTHON || "python3";

function run(args) {
  execFileSync(PYTHON, ["-m", "stark_tpu.cli", ...args], {
    stdio: ["ignore", "inherit", "inherit"],
    env: { ...process.env, PYTHONPATH: path.join(__dirname, "..", "..") },
  });
}

/** Prove from file paths; writes the proof JSON to proofJsonPath. */
function proveWithFilePath(r1csPath, wtnsPath, proofJsonPath) {
  run(["prove", r1csPath, wtnsPath, proofJsonPath]);
}

/** Verify a proof JSON against the circuit + witness file paths. */
function verifyWithFilePath(r1csPath, wtnsPath, proofJsonPath) {
  run(["verify", r1csPath, wtnsPath, proofJsonPath]);
}

/** Prove from in-memory buffers; returns the proof JSON as a string. */
function prove(r1csBuffer, wtnsBuffer) {
  const dir = fs.mkdtempSync(path.join(os.tmpdir(), "stark-tpu-"));
  try {
    const r1cs = path.join(dir, "c.r1cs");
    const wtns = path.join(dir, "c.wtns");
    const out = path.join(dir, "proof.json");
    fs.writeFileSync(r1cs, r1csBuffer);
    fs.writeFileSync(wtns, wtnsBuffer);
    proveWithFilePath(r1cs, wtns, out);
    return fs.readFileSync(out, "utf8");
  } finally {
    fs.rmSync(dir, { recursive: true, force: true });
  }
}

/** Verify an in-memory proof JSON string; returns true or throws. */
function verify(r1csBuffer, wtnsBuffer, proofJson) {
  const dir = fs.mkdtempSync(path.join(os.tmpdir(), "stark-tpu-"));
  try {
    const r1cs = path.join(dir, "c.r1cs");
    const wtns = path.join(dir, "c.wtns");
    const out = path.join(dir, "proof.json");
    fs.writeFileSync(r1cs, r1csBuffer);
    fs.writeFileSync(wtns, wtnsBuffer);
    fs.writeFileSync(out, proofJson);
    verifyWithFilePath(r1cs, wtns, out);
    return true;
  } finally {
    fs.rmSync(dir, { recursive: true, force: true });
  }
}

/** Precompile every prover/verifier executable for a circuit (parallel;
 * fills the persistent compile cache ahead of serving traffic). */
function warmup(r1csPath) {
  run(["warmup", r1csPath]);
}

module.exports = { prove, verify, proveWithFilePath, verifyWithFilePath, warmup };
