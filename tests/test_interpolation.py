"""Interpolation utility tests."""

import numpy as np
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.ops.interpolation import (
    bilinear_sample, cc_to_fc_4th, hermite_sample_1d, node_interp_linear)


def test_cc_to_fc_4th_beats_2pt_average():
    """The 7/12 - 1/12 face formula is 4th-order on cell AVERAGES (the FV
    sense PPM uses); as a point interpolant its constant is 3x smaller
    than the 2-pt average: theta^2/24 vs theta^2/8."""
    n = 16
    g = Grid(nx=(n, 4), dx=(1.0 / n, 0.25), periodic=(True, True))
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    k = 2 * np.pi
    x = g.coords()[0]
    f = jnp.asarray(np.sin(k * x) * np.ones(g.shape))
    fc = cc_to_fc_4th(f, 0, g, bcs)
    xf = g.coords((1, 0))[0]
    exact = np.sin(k * np.asarray(xf)) * np.ones(g.fc_shape(0))
    err4 = np.max(np.abs(np.asarray(fc) - exact))
    theta = k / n
    assert err4 < 1.2 * theta**2 / 24, err4
    # and genuinely better than the 2-pt average
    from somar_tpu.ops.stencil import cc_to_fc
    err2 = np.max(np.abs(np.asarray(cc_to_fc(f, 0, g, bcs)) - exact))
    assert err4 < 0.5 * err2, (err4, err2)


def test_bilinear_sample_linear_exact():
    g = Grid(nx=(8, 8), dx=(0.125, 0.125))
    x, z = g.coords()
    f = jnp.asarray(2.0 * x + 3.0 * z)
    pts = np.array([[0.3, 0.4], [0.61, 0.22], [0.5, 0.5]])
    out = np.asarray(bilinear_sample(f, g, pts))
    expect = 2.0 * pts[:, 0] + 3.0 * pts[:, 1]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_hermite_matches_cubic():
    n = 16
    dx = 1.0 / n
    xc = (np.arange(n) + 0.5) * dx
    f = jnp.asarray(xc**3)
    df = jnp.asarray(3 * xc**2)
    xq = np.array([0.31, 0.55, 0.72])
    out = np.asarray(hermite_sample_1d(f, df, 0.0, dx, xq))
    np.testing.assert_allclose(out, xq**3, atol=1e-5)


def test_node_interp_shape():
    g = Grid(nx=(8, 4), dx=(1.0, 1.0), periodic=(True, True))
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    f = jnp.ones(g.shape)
    nodes = node_interp_linear(f, g, bcs)
    assert nodes.shape == (5, 9)
    np.testing.assert_allclose(np.asarray(nodes), 1.0)


def test_timer_report():
    from somar_tpu.utils.timers import TimerRegistry
    import time as _t
    reg = TimerRegistry()
    with reg("outer"):
        with reg("inner"):
            _t.sleep(0.01)
    rep = reg.report()
    assert "outer" in rep and "inner" in rep
