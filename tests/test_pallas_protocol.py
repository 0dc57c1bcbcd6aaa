"""TPU differential tests: every fused Pallas protocol kernel must equal
its XLA twin bit-for-bit on device.

These cover exactly the code paths that produce the benchmark numbers
(`protocol/pallas_kernels.py`, `ops/pallas_blake2s.py`, the Pallas
prefix-product scan in `ops/modmath.py`) — the CPU suite routes away from
them, so this file is the only correctness coverage they have.

Run on the TPU host with:

    STARK_TPU_TEST_TPU=1 python -m pytest tests/test_pallas_protocol.py -q
"""

import hashlib
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import blake2s as b2
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import quartic

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused pallas kernels are TPU-only (slow interpret on CPU)",
)

N = 2048  # TILE-aligned domain


def _rand_mont(rng, n=N):
    vals = [rng.randrange(spec.p) for _ in range(n)]
    return mm.to_mont(spec, jnp.asarray(mm.ints_to_limbs_np(vals, spec))), vals


def _ints(arr_mont):
    return mm.limbs_to_ints_np(np.asarray(mm.from_mont(spec, arr_mont)), spec)


def _pkm():
    from stark_tpu.protocol import pallas_kernels

    return pallas_kernels


def _xla(monkeypatch):
    monkeypatch.setenv("STARK_TPU_PALLAS", "0")


def _eq(a, b):
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_rand_combination(monkeypatch):
    from stark_tpu.protocol import kernels

    rng = random.Random(11)
    idx, _ = _rand_mont(rng)
    perm, _ = _rand_mont(rng)
    s, _ = _rand_mont(rng)
    r_mont = mm.mont_consts(spec, [rng.randrange(spec.p) for _ in range(3)])
    got = _pkm().rand_combination(spec, r_mont, idx, perm, s)
    _xla(monkeypatch)
    want = kernels.rand_combination(spec, r_mont, idx, perm, s)
    _eq(got[0], want[0])
    _eq(got[1], want[1])


def test_q1_q2_q3(monkeypatch):
    from stark_tpu.protocol import kernels

    rng = random.Random(12)
    s, _ = _rand_mont(rng)
    k, _ = _rand_mont(rng)
    p, _ = _rand_mont(rng)
    f0, _ = _rand_mont(rng)
    f1, _ = _rand_mont(rng)
    f2, _ = _rand_mont(rng)
    a, _ = _rand_mont(rng)
    nmr, _ = _rand_mont(rng)
    dnm, _ = _rand_mont(rng)
    skips, kshift = 8, 40
    got1 = _pkm().q1_eval(spec, s, k, p, f0, f1, skips)
    got2 = _pkm().q2_eval(spec, p, f2, kshift)
    got3 = _pkm().q3_eval(spec, a, nmr, dnm, skips)
    _xla(monkeypatch)
    _eq(got1, kernels.q1_eval(spec, s, k, p, f0, f1, skips))
    _eq(got2, kernels.q2_eval(spec, p, f2, kshift))
    _eq(got3, kernels.q3_eval(spec, a, nmr, dnm, skips))


def test_linear_combination(monkeypatch):
    from stark_tpu.protocol import kernels

    rng = random.Random(13)
    cols = [_rand_mont(rng)[0] for _ in range(9)]
    k_mont = mm.mont_consts(spec, [1] + [rng.randrange(spec.p) for _ in range(10)])
    got = _pkm().linear_combination(spec, k_mont, *cols)
    _xla(monkeypatch)
    want = kernels.linear_combination(spec, k_mont, *cols)
    _eq(got, want)


def test_mpow_scalar(monkeypatch):
    """The fused scalar exponentiation kernel == python pow, including
    the Fermat-inversion exponent and the zero operand."""
    from stark_tpu.ops import pallas_field as pfm

    rng = random.Random(23)
    vals = [rng.randrange(spec.p) for _ in range(3)] + [0]
    a = mm.to_mont(spec, jnp.asarray(mm.ints_to_limbs_np(vals, spec)))
    for e in (spec.p - 2, 65537):
        got = mm.limbs_to_ints_np(
            np.asarray(mm.from_mont(spec, pfm.mpow_scalar(spec, a, e))), spec
        )
        assert got == [pow(v, e, spec.p) for v in vals]
    # and the mpow dispatcher routes scalars through it on TPU
    got = mm.limbs_to_ints_np(
        np.asarray(mm.from_mont(spec, mm.minv(spec, a))), spec
    )
    assert got == [pow(v, spec.p - 2, spec.p) for v in vals]


def test_shoup_mul_periodic(monkeypatch):
    """Shoup periodic-constant multiply == Montgomery multiply by the
    tiled table, bit-for-bit (canonical outputs)."""
    from stark_tpu.ops.pallas_field import TILE
    from stark_tpu.protocol import kernels

    rng = random.Random(17)
    skips = 8
    scalars = [rng.randrange(spec.p) for _ in range(skips)]
    x, _ = _rand_mont(rng)
    pats = mm.shoup_consts(spec, scalars * (TILE // skips))
    got = _pkm().shoup_mul_periodic(spec, pats[0], pats[1], x)
    _xla(monkeypatch)
    table = jnp.tile(mm.mont_consts(spec, scalars), (1, N // skips))
    want = kernels.mmul_ev(spec, x, table)
    _eq(got, want)


def test_linear_combination_shoup(monkeypatch):
    """The Shoup-x^steps fused linear combination == the XLA kernel with
    the tiled x^steps table."""
    from stark_tpu.ops.pallas_field import TILE
    from stark_tpu.protocol import kernels

    rng = random.Random(19)
    skips = 8
    pow_scalars = [rng.randrange(spec.p) for _ in range(skips)]
    cols = [_rand_mont(rng)[0] for _ in range(8)]
    k_mont = mm.mont_consts(spec, [1] + [rng.randrange(spec.p) for _ in range(10)])
    pats = mm.shoup_consts(spec, pow_scalars * (TILE // skips))
    got = _pkm().linear_combination_shoup(spec, k_mont, pats[0], pats[1], *cols)
    _xla(monkeypatch)
    x2s = jnp.tile(mm.mont_consts(spec, pow_scalars), (1, N // skips))
    want = kernels.linear_combination(spec, k_mont, x2s, *cols)
    _eq(got, want)


def test_horner_and_vanishing(monkeypatch):
    from stark_tpu.protocol import kernels

    rng = random.Random(14)
    xs, _ = _rand_mont(rng)
    coeffs = mm.mont_consts(spec, [rng.randrange(spec.p) for _ in range(5)])
    pts = mm.mont_consts(spec, [rng.randrange(spec.p) for _ in range(3)])
    got_h = _pkm().horner_eval(spec, coeffs, xs)
    got_v = _pkm().vanishing_eval(spec, xs, pts)
    _xla(monkeypatch)
    _eq(got_h, kernels.horner_eval(spec, coeffs, xs))
    _eq(got_v, kernels.vanishing_eval(spec, xs, pts))


def test_sub_mul():
    rng = random.Random(15)
    a, _ = _rand_mont(rng)
    b, _ = _rand_mont(rng)
    c, _ = _rand_mont(rng)
    got = _pkm().sub_mul(spec, a, b, c)
    want = mm.mmul(spec, mm.msub(spec, a, b), c)
    _eq(got, want)


def test_from_mont_pack_words():
    from stark_tpu.protocol.core import _leaves_to_words

    rng = random.Random(16)
    col, vals = _rand_mont(rng)
    got = np.asarray(_pkm().from_mont_pack_words(spec, col))
    # ground truth: canonical LE bytes as uint32 words
    want = np.zeros((8, N), np.uint32)
    for i, v in enumerate(vals):
        b = v.to_bytes(32, "little")
        want[:, i] = np.frombuffer(b, "<u4")
    assert np.array_equal(got, want)
    # and the XLA twin used when pallas is off
    xla_words = np.asarray(_leaves_to_words(spec, [col]))[:8]
    assert np.array_equal(xla_words, want)


def test_fri_fold_pre_post_matches_quartic():
    rng = random.Random(17)
    q = N // 4
    xs, _ = _rand_mont(rng)
    ys, _ = _rand_mont(rng)
    sxv = rng.randrange(spec.p)
    sx = mm.mont_consts(spec, [sxv])
    L = xs.shape[0]
    xs4 = xs.reshape(L, 4, q)
    ys4 = ys.reshape(L, 4, q)
    eqs, dens = _pkm().fri_fold_pre(spec, xs4)
    invs = mm.multi_inv(spec, dens.reshape(L, 4 * q)).reshape(L, 4, q)
    got = _pkm().fri_fold_post(spec, sx, eqs, ys4, invs)
    # XLA twin (the sub-2^14 FRI path)
    xsets = jnp.moveaxis(xs4, 1, 2)
    ysets = jnp.moveaxis(ys4, 1, 2)
    polys = quartic.multi_interp_4(spec, xsets, ysets)
    want = quartic.eval_quartic_batch(
        spec, polys, jnp.broadcast_to(sx.reshape(L, 1), (L, q))
    )
    _eq(got, want)


def test_pallas_blake2s_matches_hashlib():
    from stark_tpu.ops import pallas_blake2s as pb

    rng = random.Random(18)
    for msg_len in (32, 64, 256):
        n = max(pb.TILE, N)
        msgs = np.frombuffer(
            bytes(rng.randrange(256) for _ in range(n * msg_len)), np.uint8
        ).reshape(n, msg_len)
        words = jnp.asarray(b2.bytes_to_words_np(msgs, msg_len))
        got = np.asarray(pb.blake2s_words(words, msg_len))  # (8, n) u32
        xla = np.asarray(b2.blake2s_words(words, msg_len))
        assert np.array_equal(got, xla)
        for i in range(0, n, 257):  # spot-check against hashlib
            want = hashlib.blake2s(msgs[i].tobytes()).digest()
            assert got[:, i].tobytes() == want


def test_prefix_prod_pallas_scan(monkeypatch):
    rng = random.Random(19)
    vals = [rng.randrange(1, spec.p) for _ in range(N)]
    v = mm.to_mont(spec, jnp.asarray(mm.ints_to_limbs_np(vals, spec)))
    monkeypatch.setenv("STARK_TPU_PALLAS", "1")
    got = mm.prefix_prod(spec, v)
    got_inv = mm.multi_inv(spec, v)
    monkeypatch.setenv("STARK_TPU_PALLAS", "0")
    want = mm.prefix_prod(spec, v)
    want_inv = mm.multi_inv(spec, v)
    _eq(got, want)
    _eq(got_inv, want_inv)
    # ground truth for the prefix product
    acc, truth = 1, []
    for x in vals:
        acc = acc * x % spec.p
        truth.append(acc)
    assert _ints(got) == truth


def test_full_prover_on_tpu_matches_golden(tmp_path, monkeypatch):
    """Capstone: the whole prover on TPU (fused Pallas kernels active at
    precision 65536) emits JSON byte-identical to the committed oracle
    golden for poseidon3_test."""
    from stark_tpu.protocol import runner

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    out = str(tmp_path / "poseidon3_tpu.json")
    runner.prove_with_file_path(
        os.path.join(fixtures, "poseidon3_test.r1cs"),
        os.path.join(fixtures, "poseidon3_test.wtns"),
        out,
    )
    with open(out) as f:
        got = f.read()
    with open(os.path.join(fixtures, "poseidon3_proof_golden.json")) as f:
        assert got == f.read()
