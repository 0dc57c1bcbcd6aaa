"""Device Fiat-Shamir transcript vs the host (python-int) transcript.

Every challenge class is asserted byte/value-equal for multiple seeds;
any deviation here would silently change every proof, so this runs in
the default CPU suite.
"""

import hashlib

import jax.numpy as jnp
import numpy as np

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import modmath as mm
from stark_tpu.protocol import device_transcript as dt
from stark_tpu.protocol import transcript as ts

import pytest

pytestmark = pytest.mark.quick

SEEDS = [hashlib.blake2s(bytes([i])).digest() for i in range(5)]


def _words(seed: bytes):
    return jnp.asarray(np.frombuffer(seed, "<u4").copy())


def _mont_ints(arr):
    return mm.limbs_to_ints_np(np.asarray(mm.from_mont(spec, arr)), spec)


def test_pseudorandom_indices_match_host():
    for seed in SEEDS:
        for modulus, count, excl in [(2048, 80, 8), (65536, 40, 8), (7, 5, 0), (2**20, 24, 0)]:
            want = ts.get_pseudorandom_indices(seed, modulus, count, excl)
            got = np.asarray(
                dt.pseudorandom_indices(_words(seed), modulus, count, excl)
            ).tolist()
            assert got == want, (modulus, count, excl)


def test_special_x_matches_host():
    for seed in SEEDS:
        want = spec.from_bytes_le(seed)  # fri.rs:135
        got = _mont_ints(dt.digest_le_int_mont(spec, _words(seed)))[0]
        assert got == want


def test_seed_to_field_matches_host():
    for seed in SEEDS:
        want = int(ts.mk_seed([seed])) % spec.p
        digest = hashlib.blake2s(seed).digest()
        got = _mont_ints(dt.digest_be_int_mont(spec, _words(digest)))[0]
        assert got == want


def test_random_ff_values_match_host():
    for seed in SEEDS:
        for modulus, size, excl in [(2048, 3, 0), (2**20, 3, 0)]:
            want = ts.get_random_ff_values(spec, seed, modulus, size, excl)
            got = _mont_ints(dt.random_ff_mont(spec, _words(seed), modulus, size, excl))
            assert got == want


def test_k_coeffs_match_host():
    for seed in SEEDS:
        want = [1] + [
            ts.seed_to_field(spec, [seed, bytes([i])]) for i in range(1, 11)
        ]
        got = _mont_ints(dt.k_coeffs_mont(spec, _words(seed)))
        assert got == want
