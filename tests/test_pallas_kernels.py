"""Pallas kernel parity tests (interpret mode on CPU).

On TPU the fused PPM predictor produced bitwise-identical 5-step NS
trajectories vs the jnp path; here the kernel math is checked per
direction against _normal_predict_fullpad under the Pallas interpreter.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from somar_tpu.ops.pallas_kernels import ppm_predict_pallas
from somar_tpu.ops.stencil import avg_along
from somar_tpu.physics.godunov import (
    AdvectionParams, _normal_predict_fullpad, _riemann)


@pytest.mark.parametrize("ax", [0, 1, 2])
@pytest.mark.parametrize("limiting", [True, False])
def test_ppm_pallas_matches_jnp(ax, limiting):
    rng = np.random.default_rng(ax)
    shape = (24, 16, 40)
    sp = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dtdx = jnp.asarray(0.3, jnp.float32)
    params = AdvectionParams(normal_pred_order=2, use_limiting=limiting)

    lo_ref, hi_ref = _normal_predict_fullpad(sp, up, ax, 4, 1.0, dtdx, params)
    rie_ref = _riemann(lo_ref, hi_ref, avg_along(up, ax))
    lo, hi, rie = ppm_predict_pallas(sp, up, dtdx, ax, limiting,
                                     interpret=True)

    def crop(a):
        sl = [slice(None)] * 3
        sl[ax] = slice(3, -3)
        return np.asarray(a[tuple(sl)])

    for name, a, b in [("lo", lo, lo_ref), ("hi", hi, hi_ref),
                       ("rie", rie, rie_ref)]:
        err = np.abs(crop(a) - crop(b)).max()
        assert err < 1e-5, (ax, name, err)


def test_ppm_pallas_2d():
    rng = np.random.default_rng(7)
    shape = (24, 40)
    sp = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dtdx = jnp.asarray(0.2, jnp.float32)
    params = AdvectionParams(normal_pred_order=2, use_limiting=True)
    for ax in (0, 1):
        lo_ref, hi_ref = _normal_predict_fullpad(sp, up, ax, 4, 1.0, dtdx,
                                                 params)
        lo, hi, rie = ppm_predict_pallas(sp, up, dtdx, ax, True,
                                         interpret=True)
        sl = [slice(None)] * 2
        sl[ax] = slice(3, -3)
        err = np.abs(np.asarray(lo[tuple(sl)]) -
                     np.asarray(lo_ref[tuple(sl)])).max()
        assert err < 1e-5, (ax, err)


def test_ppm_pallas_lane_padded_path(monkeypatch):
    """z-direction predictor at production sizes: lanes not a multiple of
    128 and sublane tiling alone cannot fit the VMEM budget -> the kernel
    pads the lane axis to 128k and tiles it (no stencil along lanes)."""
    import somar_tpu.ops.pallas_kernels as pk
    rng = np.random.default_rng(3)
    shape = (24, 16, 200)   # lanes 200: not a multiple of 128
    sp = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    up = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    dtdx = jnp.asarray(0.3, jnp.float32)
    params = AdvectionParams(normal_pred_order=2, use_limiting=True)
    # force the budget below what sublane tiling alone can reach
    monkeypatch.setattr(pk, "_VMEM_BUDGET", 24 * 8 * 128 * 4)
    got = pk.ppm_predict_pallas(sp, up, dtdx, 0, True, interpret=True)
    assert got is not None, "lane-padded blocking should be feasible"
    lo, hi, rie = got
    assert lo.shape == (23, 16, 200)
    lo_ref, hi_ref = _normal_predict_fullpad(sp, up, 0, 4, 1.0, dtdx, params)
    rie_ref = _riemann(lo_ref, hi_ref, avg_along(up, 0))

    def crop(a):
        return np.asarray(a[3:-3])

    for name, a, b in [("lo", lo, lo_ref), ("hi", hi, hi_ref),
                       ("rie", rie, rie_ref)]:
        err = np.abs(crop(a) - crop(b)).max()
        assert err < 1e-5, (name, err)
