"""NTT/LDE tests: reference F7 KATs (host recursive FFT) plus device NTT
checked against a naive python DFT and round-trips over BN254."""

import random

import numpy as np
import pytest

from stark_tpu.fields.field import BN254_FR, F7
from stark_tpu.ops import modmath as mm
from stark_tpu.ops import ntt as nttmod
from stark_tpu.utils import poly_host as ph


def test_simple_ft_f7_kats():
    # fft.rs:84-99
    assert ph.simple_ft(F7, [1, 2, 0], [1, 2, 4]) == [3, 5, 2]
    assert ph.simple_ft(F7, [0, 1, 1, 0], [1, 2, 4]) == [2, 6, 6]


def test_fft_recursive_f7_kats():
    # fft.rs:253-266 (commented-out but exact semantics of fft())
    roots = ph.expand_root_of_unity(F7, F7.generator)
    assert roots == [1, 3, 2, 6, 4, 5]
    assert ph.fft_recursive(F7, [1, 0, 0, 0, 0, 0], roots) == [1, 1, 1, 1, 1, 1]
    assert ph.fft_recursive(F7, [1, 0, 2, 1, 0, 1], roots) == [5, 2, 0, 1, 1, 4]


def test_mul_polys_host_kat():
    # poly_utils.rs:215-226 (schoolbook KAT)
    assert ph.mul_polys(F7, [4, 2, 0, 1], [6, 1, 2]) == [3, 2, 3, 3, 1, 2]


def test_host_poly_kats():
    # poly_utils.rs assorted KATs
    assert ph.eval_poly_at(F7, [1, 2, 0, 1], 2) == 6
    assert ph.add_polys(F7, [4, 2, 0, 1], [6, 1, 2]) == [3, 3, 2, 1]
    assert ph.sub_polys(F7, [4, 2, 0, 1], [6, 1, 2]) == [5, 1, 5, 1]
    assert ph.mul_by_const(F7, [4, 2, 0, 1], 5) == [6, 3, 0, 5]
    assert ph.div_polys(F7, [3, 2, 3, 3, 1, 2], [6, 1, 2]) == [4, 2, 0, 1]
    assert ph.zpoly(F7, [0, 1, 2]) == [0, 2, 4, 1]
    assert ph.zpoly(F7, [1, 2, 3, 4, 5, 6]) == [6, 0, 0, 0, 0, 0, 1]
    # lagrange through (1,2),(2,5),(3,10) -> x^2+1 over big field
    poly = ph.lagrange_interp(BN254_FR, [1, 2, 3], [2, 5, 10])
    assert poly == [1, 0, 1]


def _naive_dft(spec, values, w):
    n = len(values)
    return [
        sum(values[j] * pow(w, i * j, spec.p) for j in range(n)) % spec.p
        for i in range(n)
    ]


@pytest.mark.parametrize("n", [2, 8, 32])
def test_device_ntt_matches_naive_dft(n):
    spec = BN254_FR
    rng = random.Random(n)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    w = spec.root_of_unity(n)
    table = nttmod.forward_table(spec, w, n)
    vm = mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))
    out = mm.limbs_to_ints_np(mm.from_mont(spec, nttmod.ntt(spec, vm, table)), spec)
    assert out == _naive_dft(spec, vals, w)


def test_device_intt_roundtrip():
    spec = BN254_FR
    n = 256
    rng = random.Random(42)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    w = spec.root_of_unity(n)
    fwd = nttmod.forward_table(spec, w, n)
    inv = nttmod.inverse_table(spec, w, n)
    vm = mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))
    back = nttmod.intt(spec, nttmod.ntt(spec, vm, fwd), inv)
    assert mm.limbs_to_ints_np(mm.from_mont(spec, back), spec) == vals


def test_lde_extends_low_degree():
    # iNTT on the small domain then NTT on the 8x domain must agree with
    # direct evaluation of the interpolated polynomial (prove.rs:100-124)
    spec = BN254_FR
    steps, ext = 8, 8
    precision = steps * ext
    rng = random.Random(1)
    trace = [rng.randrange(spec.p) for _ in range(steps)]
    g2 = spec.root_of_unity(precision)
    g1 = pow(g2, ext, spec.p)
    plan = nttmod.make_lde_plan(spec, g1, g2, steps, precision)
    tm = mm.to_mont(spec, mm.ints_to_limbs_np(trace, spec))
    ext_evals = mm.limbs_to_ints_np(
        mm.from_mont(spec, nttmod.lde(spec, tm, plan)), spec
    )
    # strided positions recover the original trace
    assert ext_evals[::ext] == trace
    # cross-check a few off-stride points against host interpolation
    poly = ph.lagrange_interp(
        spec, [pow(g1, i, spec.p) for i in range(steps)], trace
    )
    for j in [1, 3, 13, 57]:
        assert ext_evals[j] == ph.eval_poly_at(spec, poly, pow(g2, j, spec.p))


def test_multi_interp_4_matches_host_lagrange():
    from stark_tpu.ops import quartic

    spec = BN254_FR
    rng = random.Random(3)
    Q = 8
    xs = [[rng.randrange(1, spec.p) for _ in range(4)] for _ in range(Q)]
    ys = [[rng.randrange(spec.p) for _ in range(4)] for _ in range(Q)]
    xm = mm.to_mont(
        spec, mm.ints_to_limbs_np([v for row in xs for v in row], spec)
    ).reshape(spec.num_limbs, Q, 4)
    ym = mm.to_mont(
        spec, mm.ints_to_limbs_np([v for row in ys for v in row], spec)
    ).reshape(spec.num_limbs, Q, 4)
    polys = quartic.multi_interp_4(spec, xm, ym)
    flat = mm.limbs_to_ints_np(
        mm.from_mont(spec, polys.reshape(spec.num_limbs, Q * 4)), spec
    )
    for q in range(Q):
        expect = ph.lagrange_interp(spec, xs[q], ys[q])
        assert flat[q * 4 : q * 4 + 4] == expect, q
    # and evaluation consistency
    x0 = rng.randrange(spec.p)
    x0m = mm.to_mont(spec, mm.ints_to_limbs_np([x0], spec))
    from stark_tpu.ops.quartic import eval_quartic_batch

    evals = mm.limbs_to_ints_np(
        mm.from_mont(spec, eval_quartic_batch(spec, polys, x0m)), spec
    )
    for q in range(Q):
        expect = ph.eval_quartic(spec, ph.lagrange_interp(spec, xs[q], ys[q]), x0)
        assert evals[q] == expect


def test_two_level_matches_single_level():
    # the n1*n2 decomposed pipeline (used for every large transform) must
    # agree with the direct single-level cores on both directions
    spec = BN254_FR
    n = 2048  # > _SMALL_NTT -> two-level path
    rng = random.Random(7)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    root = spec.root_of_unity(n)
    a = mm.to_mont(spec, mm.ints_to_limbs_np(vals, spec))
    w_half = nttmod.forward_table(spec, root, n)

    plan = nttmod.NttPlan(spec, root, n, "dif")
    assert not plan.small
    got = np.asarray(nttmod._dif_fast(spec, a, plan))
    want = np.asarray(nttmod._dif_core(spec, a, w_half))
    assert np.array_equal(got, want)

    plan_dit = nttmod.NttPlan(spec, root, n, "dit")
    got = np.asarray(nttmod._dit_fast(spec, a, plan_dit))
    want = np.asarray(nttmod._dit_core(spec, a, w_half))
    assert np.array_equal(got, want)


def test_reduction_poly_f7_kats():
    # poly_utils.rs:187-200
    assert ph.reduction_poly(F7, [4, 2, 0, 1, 3, 2], 4) == [0, 4, 0, 1]
    assert ph.reduction_poly(F7, [4, 2], 4) == [4, 2, 0, 0]


def test_mod_polys_f7_kats():
    # poly_utils.rs:297-327
    assert ph.mod_polys(F7, [5, 4, 3, 3, 1, 2], [6, 1, 2]) == [2, 2]
    assert ph.mod_polys(F7, [5, 2, 3, 3, 1, 2], [6, 1, 2]) == [2, 0]
    assert ph.mod_polys(F7, [3, 2, 3, 3, 1, 2], [6, 1, 2]) == [0, 0]


def test_sparse_f7_kats():
    # poly_utils.rs:338-358
    assert ph.sparse(F7, {1: 3, 5: 1}) == [0, 3, 0, 0, 0, 1]
    assert ph.sparse(F7, {1: 3, 5: 1, 6: 0}) == [0, 3, 0, 0, 0, 1, 0]


def test_poly_scale():
    assert ph.poly_scale(F7, [4, 2], 2) == [0, 0, 4, 2]
