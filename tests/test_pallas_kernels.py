"""Pallas kernel parity tests (interpret mode on CPU).

On TPU the fused CTU kernels produce bitwise-identical NS trajectories vs
the jnp path; here the kernel math is checked per direction against the
jnp reference implementations under the Pallas interpreter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from somar_tpu.ops.pallas_kernels import ctu_corr3_pallas, ppm_predict_pallas
from somar_tpu.physics.godunov import (
    AdvectionParams, _cc_deriv, _normal_predict_fullpad, _riemann, face_avg,
    shift_p)


def _jnp_p1(sp, up, ax, dtdx, coef_dx, limiting):
    params = AdvectionParams(normal_pred_order=2, use_limiting=limiting)
    lo, hi = _normal_predict_fullpad(sp, up, ax, 4, 1.0, dtdx, params)
    rie = _riemann(lo, hi, face_avg(up, ax))
    corr2 = -coef_dx * up * _cc_deriv(rie, ax, 1.0)
    return lo, hi, corr2


@pytest.mark.parametrize("ax", [0, 1, 2])
@pytest.mark.parametrize("limiting", [True, False])
def test_ppm_pallas_matches_jnp(ax, limiting):
    rng = np.random.default_rng(ax)
    shape = (24, 16, 40)
    sp = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dtdx = jnp.asarray(0.3, jnp.float32)

    refs = _jnp_p1(sp, up, ax, dtdx, 0.1, limiting)
    got = ppm_predict_pallas(sp, up, dtdx, ax, limiting,
                             corr_coef_over_dx=0.1, interpret=True)

    def crop(a):
        sl = [slice(None)] * 3
        sl[ax] = slice(3, -3)
        return np.asarray(a[tuple(sl)])

    for name, a, b in zip(("lo", "hi", "corr2"), got, refs):
        err = np.abs(crop(a) - crop(b)).max()
        assert err < 1e-5, (ax, name, err)


def test_ppm_pallas_2d():
    rng = np.random.default_rng(7)
    shape = (24, 40)
    sp = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dtdx = jnp.asarray(0.2, jnp.float32)
    for ax in (0, 1):
        refs = _jnp_p1(sp, up, ax, dtdx, 0.15, True)
        got = ppm_predict_pallas(sp, up, dtdx, ax, True,
                                 corr_coef_over_dx=0.15, interpret=True)
        sl = [slice(None)] * 2
        sl[ax] = slice(3, -3)
        for name, a, b in zip(("lo", "hi", "corr2"), got, refs):
            err = np.abs(np.asarray(a[tuple(sl)]) -
                         np.asarray(b[tuple(sl)])).max()
            assert err < 1e-5, (ax, name, err)


def test_ppm_pallas_lane_padded_path(monkeypatch):
    """z-direction predictor at production sizes: lanes not a multiple of
    128 and sublane tiling alone cannot fit the VMEM budget -> the lane
    axis is tiled with a masked partial tail block (no stencil along
    lanes, no input padding)."""
    import somar_tpu.ops.pallas_kernels as pk
    rng = np.random.default_rng(3)
    shape = (24, 16, 200)   # lanes 200: not a multiple of 128
    sp = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dtdx = jnp.asarray(0.3, jnp.float32)
    # force the budget below what sublane tiling alone can reach
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 24 * 8 * 128 * 4)
    got = pk.ppm_predict_pallas(sp, up, dtdx, 0, True,
                                corr_coef_over_dx=0.1, interpret=True)
    assert got is not None, "lane-tiled blocking should be feasible"
    assert got[0].shape == (24, 16, 200)
    refs = _jnp_p1(sp, up, 0, dtdx, 0.1, True)

    def crop(a):
        return np.asarray(a[3:-3])

    for name, a, b in zip(("lo", "hi", "corr2"), got, refs):
        err = np.abs(crop(a) - crop(b)).max()
        assert err < 1e-5, (name, err)


@pytest.mark.parametrize("ax", [0, 1, 2])
def test_corr3_pallas_matches_jnp(ax):
    """P2 cross-correction kernel vs the jnp stage-2+3 formulas."""
    rng = np.random.default_rng(10 + ax)
    shape = (24, 16, 40)
    lo1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    hi1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c2a = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    c2b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dt2dx = jnp.asarray(0.25, jnp.float32)

    got = ctu_corr3_pallas(lo1, hi1, up, [c2a, c2b], dt2dx, ax,
                           interpret=True)
    assert got is not None

    def ref(c2):
        lo_c = lo1 + c2
        hi_c = hi1 + shift_p(c2, ax)
        rie2 = _riemann(lo_c, hi_c, face_avg(up, ax))
        return -dt2dx * up * _cc_deriv(rie2, ax, 1.0)

    def crop(a):
        sl = [slice(None)] * 3
        sl[ax] = slice(3, -3)
        return np.asarray(a[tuple(sl)])

    for name, a, b in zip(("c3a", "c3b"), got, (ref(c2a), ref(c2b))):
        err = np.abs(crop(a) - crop(b)).max()
        assert err < 1e-5, (ax, name, err)


def test_ctu_final_want_div():
    """P3 want_div output == (rie*adv)[c] - (rie*adv)[c-1] of the
    want_rie output."""
    from somar_tpu.ops.pallas_kernels import ctu_final_pallas
    from somar_tpu.ops.stencil import shift_m
    rng = np.random.default_rng(11)
    shape = (24, 16, 32)
    lo1, hi1, adv, c3a, c3b, src = (
        jnp.asarray(rng.standard_normal(shape), jnp.float32)
        for _ in range(6))
    for ax in range(3):
        rie, = ctu_final_pallas(lo1, hi1, adv, [c3a, c3b], src, 0.05,
                                ax, interpret=True)
        div, = ctu_final_pallas(lo1, hi1, adv, [c3a, c3b], src, 0.05,
                                ax, want_div=True, interpret=True)
        F = np.asarray(rie) * np.asarray(adv)
        want = F - np.asarray(shift_m(jnp.asarray(F), ax))
        got = np.asarray(div)
        sl = [slice(None)] * 3
        sl[ax] = slice(1, None)   # first entry along ax is junk
        err = np.abs(got[tuple(sl)] - want[tuple(sl)]).max()
        assert err < 1e-5, (ax, err)


def test_riemann_fluxdiv_pallas():
    """P4 fused re-upwinding + flux difference vs the jnp reference."""
    from somar_tpu.ops.pallas_kernels import riemann_fluxdiv_pallas
    from somar_tpu.physics.godunov import _riemann
    from somar_tpu.ops.stencil import shift_m
    rng = np.random.default_rng(12)
    shape = (24, 16, 32)
    adv = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    pairs = [tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32)
                   for _ in range(2)) for _ in range(3)]
    for ax in range(3):
        got = riemann_fluxdiv_pallas(pairs, adv, ax, interpret=True)
        assert got is not None and len(got) == 3
        for (lo, hi), g in zip(pairs, got):
            F = _riemann(lo, hi, adv) * adv
            want = np.asarray(F - shift_m(F, ax))
            arr = np.asarray(g)
            sl = [slice(None)] * 3
            sl[ax] = slice(1, None)
            err = np.abs(arr[tuple(sl)] - want[tuple(sl)]).max()
            assert err < 1e-5, (ax, err)
