"""Pallas kernel correctness vs the XLA limb implementations.

TPU-only: interpret mode is semantically correct on CPU but XLA-CPU
compilation of the interpreted kernels is pathologically slow (minutes for
one small kernel), so the CPU suite skips these. Run on a TPU host with
`JAX_PLATFORMS= python -m pytest tests/test_pallas.py`; the driver's bench
exercises the same path end to end."""

import random

import jax
import numpy as np
import pytest

from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import pallas_field as pf

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas kernels are TPU-only (slow interpret)"
)


def _mont(vals):
    return mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))


def _ints(arr):
    return mm.limbs_to_ints_np(np.asarray(mm.from_mont(spec, arr)), spec)


def test_pallas_mmul_matches_xla():
    rng = random.Random(5)
    n = 64
    a_i = [rng.randrange(spec.p) for _ in range(n)]
    b_i = [rng.randrange(spec.p) for _ in range(n)]
    a, b = _mont(a_i), _mont(b_i)
    got = np.asarray(pf.mmul(spec, a, b))
    want = np.asarray(mm.mmul(spec, a, b))
    assert np.array_equal(got, want)


def test_pallas_ntt_matches_xla(monkeypatch):
    from stark_tpu.ops import ntt as nttm

    monkeypatch.setenv("STARK_TPU_PALLAS", "1")
    rng = random.Random(6)
    n = 64  # several fused stages in one block
    vals = [rng.randrange(spec.p) for _ in range(n)]
    root = spec.root_of_unity(n)
    a = _mont(vals)
    w_half = nttm.forward_table(spec, root, n)
    plan = nttm.NttPlan(spec, root, n, "dif")
    assert plan.pallas
    got = np.asarray(nttm._dif_fast(spec, a, plan))
    want = np.asarray(nttm._dif_core(spec, a, w_half))
    assert np.array_equal(got, want)

    plan_dit = nttm.NttPlan(spec, root, n, "dit")
    got = np.asarray(nttm._dit_fast(spec, a, plan_dit))
    want = np.asarray(nttm._dit_core(spec, a, w_half))
    assert np.array_equal(got, want)


def test_pallas_stage_partition(monkeypatch):
    """Sizes large enough to exercise the strided single-stage kernels
    (l >= TILE) alongside the fused tail, at the production TILE.

    (A tiny-TILE override would shrink the kernel's last block dimension
    below Mosaic's 128-lane divisibility requirement -- a configuration
    the production dispatcher never generates.)"""
    from stark_tpu.ops import ntt as nttm

    monkeypatch.setenv("STARK_TPU_PALLAS", "1")
    rng = random.Random(7)
    n = 4 * pf.TILE  # stages l=2*TILE, TILE standalone; l<TILE fused
    vals = [rng.randrange(spec.p) for _ in range(n)]
    root = spec.root_of_unity(n)
    a = _mont(vals)
    w_half = nttm.forward_table(spec, root, n)
    for direction, core in (("dif", nttm._dif_core), ("dit", nttm._dit_core)):
        plan = nttm.NttPlan(spec, root, n, direction)
        got = np.asarray(nttm._run_pallas(spec, a, plan))
        want = np.asarray(core(spec, a, w_half))
        assert np.array_equal(got, want), direction

