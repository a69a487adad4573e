"""Host (C++/XLA:CPU) vs device-op parity.

The parity numpy API runs on the host: three operators use native C++
kernels (csrc/gridpp_kernels.cpp) and the rest run the jitted ops on
XLA:CPU. The same jitted ops are the device entry points, so these tests
pin the two implementations against each other on NaN-laden random fields
(the reference's own cross-implementation strategy,
tests/test_neighbourhood.py:76-127 there).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gridpp_tpu as gridpp
from gridpp_tpu import native
from gridpp_tpu.constants import Statistic, Extrapolation
from gridpp_tpu.ops import neighbourhood as nops
from gridpp_tpu.ops import curves as cops
from gridpp_tpu.ops import search as sops


def _field(shape, seed=0, nan_frac=0.15):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 10, shape).astype(np.float32)
    x[rng.random(shape) < nan_frac] = np.nan
    return x


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if native.get_lib() is None:
        pytest.skip("native engine unavailable")


class TestNbBrute:
    @pytest.mark.parametrize("stat", [Statistic.Mean, Statistic.Min,
                                      Statistic.Median, Statistic.Max,
                                      Statistic.Std, Statistic.Variance,
                                      Statistic.Sum, Statistic.Count])
    @pytest.mark.parametrize("h", [0, 1, 3])
    def test_2d(self, stat, h):
        x = _field((17, 23), seed=int(stat) + h)
        host = native.nb_brute(x, h, int(stat))
        dev = np.asarray(nops.neighbourhood_brute_force(
            jnp.asarray(x), h, int(stat)))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
    def test_quantile_2d(self, q):
        x = _field((19, 13), seed=42)
        host = native.nb_brute(x, 2, int(Statistic.Quantile), q)
        dev = np.asarray(nops.neighbourhood_quantile(jnp.asarray(x), q, 2))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    def test_quantile_3d(self):
        x = _field((9, 11, 4), seed=3)
        host = native.nb_brute(x, 2, int(Statistic.Quantile), 0.4)
        dev = np.asarray(nops.neighbourhood_quantile_ens(
            jnp.asarray(x), 0.4, 2))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    def test_3d_stat(self):
        x = _field((9, 11, 4), seed=4)
        host = native.nb_brute(x, 1, int(Statistic.Mean))
        dev = np.asarray(nops.neighbourhood_brute_force_ens(
            jnp.asarray(x), 1, int(Statistic.Mean)))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    def test_all_nan_window(self):
        x = np.full((5, 5), np.nan, np.float32)
        host = native.nb_brute(x, 1, int(Statistic.Mean))
        assert np.isnan(host).all()
        host = native.nb_brute(x, 1, int(Statistic.Count))
        np.testing.assert_array_equal(host, np.zeros((5, 5)))


class TestApplyCurve:
    @pytest.mark.parametrize("pb", [Extrapolation.OneToOne,
                                    Extrapolation.MeanSlope,
                                    Extrapolation.NearestSlope,
                                    Extrapolation.Zero,
                                    Extrapolation.Unchanged])
    def test_policies(self, pb):
        rng = np.random.default_rng(int(pb))
        cf = np.sort(rng.random(40).astype(np.float32))
        cr = rng.random(40).astype(np.float32)
        f = np.concatenate([rng.random(500).astype(np.float32) * 2 - 0.5,
                            [np.nan, cf[0], cf[-1]]]).astype(np.float32)
        host = native.apply_curve(f, cr, cf, int(pb), int(pb))
        dev = np.asarray(cops.apply_curve(jnp.asarray(f), jnp.asarray(cr),
                                          jnp.asarray(cf), int(pb), int(pb)))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-6)

    def test_repeated_x_flat_rules(self):
        cf = np.array([0.0, 1.0, 1.0, 2.0, 2.0, 2.0, 3.0], np.float32)
        cr = np.array([0.0, 2.0, 4.0, 5.0, 6.0, 7.0, 8.0], np.float32)
        f = np.array([0.5, 1.0, 2.0, 2.5, 0.0, 3.0], np.float32)
        host = native.apply_curve(f, cr, cf, 0, 0)
        dev = np.asarray(cops.apply_curve(jnp.asarray(f), jnp.asarray(cr),
                                          jnp.asarray(cf), 0, 0))
        np.testing.assert_allclose(host, dev, rtol=1e-6)

    def test_percell_curves(self):
        rng = np.random.default_rng(7)
        ny, nx, c = 6, 5, 9
        cf = np.sort(rng.random((ny, nx, c)).astype(np.float32), axis=-1)
        cr = rng.random((ny, nx, c)).astype(np.float32)
        f = rng.random((ny, nx)).astype(np.float32) * 1.4 - 0.2
        host = native.apply_curve(f, cr, cf, 0, 0)
        dev = np.asarray(cops.apply_curve(jnp.asarray(f), jnp.asarray(cr),
                                          jnp.asarray(cf), 0, 0))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-6)

    def test_single_point_curve(self):
        cf = np.array([1.0], np.float32)
        cr = np.array([5.0], np.float32)
        f = np.array([0.5, 1.0, 1.5], np.float32)
        host = native.apply_curve(f, cr, cf, int(Extrapolation.MeanSlope),
                                  int(Extrapolation.MeanSlope))
        dev = np.asarray(cops.apply_curve(
            jnp.asarray(f), jnp.asarray(cr), jnp.asarray(cf),
            int(Extrapolation.MeanSlope), int(Extrapolation.MeanSlope)))
        np.testing.assert_allclose(host, dev, rtol=1e-6)


class TestNbSearch:
    def test_random(self):
        a = _field((30, 40), seed=1, nan_frac=0.1)
        s = _field((30, 40), seed=2, nan_frac=0.1)
        s = np.clip(s / 10 + 0.5, -1, 2).astype(np.float32)
        host = native.nb_search(a, s, 3, 0.4, 0.8, 0.05, None)
        dev = np.asarray(sops.neighbourhood_search(
            jnp.asarray(a), jnp.asarray(s), 3, 0.4, 0.8, 0.05,
            jnp.zeros(a.shape, jnp.int32), False))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)

    def test_apply_mask(self):
        a = _field((20, 20), seed=5, nan_frac=0.0)
        s = np.clip(_field((20, 20), seed=6, nan_frac=0.0) / 20 + 0.5,
                    0, 1).astype(np.float32)
        mask = (np.random.default_rng(8).random((20, 20)) < 0.5)
        mask_f = mask.astype(np.float32)
        host = native.nb_search(a, s, 2, 0.3, 0.7, 0.1, mask_f)
        dev = np.asarray(sops.neighbourhood_search(
            jnp.asarray(a), jnp.asarray(s), 2, 0.3, 0.7, 0.1,
            jnp.asarray(mask.astype(np.int32)), True))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)


class TestNbMeansum:
    @pytest.mark.parametrize("stat", [Statistic.Mean, Statistic.Sum,
                                      Statistic.Count])
    @pytest.mark.parametrize("h", [0, 1, 4, 30])
    def test_vs_device(self, stat, h):
        x = _field((23, 37), seed=int(stat) * 7 + h)
        host = native.nb_meansum(x, h, int(stat))
        dev = np.asarray(nops.neighbourhood(jnp.asarray(x), h, int(stat)))
        np.testing.assert_allclose(host, dev, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("stat", [Statistic.Std, Statistic.Variance])
    @pytest.mark.parametrize("h", [1, 4, 30])
    def test_vs_device_variance(self, stat, h):
        """Looser tolerance: XLA emits an FMA for mean2 - mean*mean (the
        product stays exact inside the FMA) while the reference's C++ -
        and this kernel - round the product first. At var ~= 0 the device
        can even go slightly negative (NaN std), so h=0 single-cell
        windows are exercised in test_neighbourhood's fast-vs-brute
        checks instead."""
        x = _field((23, 37), seed=int(stat) * 7 + h)
        host = native.nb_meansum(x, h, int(stat))
        dev = np.asarray(nops.neighbourhood(jnp.asarray(x), h, int(stat)))
        np.testing.assert_allclose(host, dev, rtol=1e-3, atol=1e-2)

    def test_all_nan(self):
        x = np.full((6, 7), np.nan, np.float32)
        assert np.isnan(native.nb_meansum(x, 2, int(Statistic.Mean))).all()
        np.testing.assert_array_equal(
            native.nb_meansum(x, 2, int(Statistic.Count)), np.zeros((6, 7)))


class TestWindowRun:
    @pytest.mark.parametrize("stat", [Statistic.Mean, Statistic.Sum,
                                      Statistic.Count])
    @pytest.mark.parametrize("before", [False, True])
    @pytest.mark.parametrize("flags", [(False, False), (True, False),
                                       (False, True), (True, True)])
    def test_vs_device(self, stat, before, flags):
        keep_missing, missing_edges = flags
        from gridpp_tpu.ops.window import window as window_op
        x = _field((7, 40), seed=int(stat) + before)
        length = 5
        host = native.window_run(x, length, int(stat), before,
                                 keep_missing, missing_edges)
        dev = np.asarray(window_op(jnp.asarray(x), length, int(stat),
                                   before, keep_missing, missing_edges))
        np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)


class TestPaint:
    def test_fill_matches_scipy_loop(self):
        import gridpp_tpu as gridpp
        rng = np.random.default_rng(3)
        n = 40
        lats, lons = np.meshgrid(np.linspace(55, 58, n),
                                 np.linspace(5, 8, n), indexing="ij")
        grid = gridpp.Grid(lats, lons)
        p = 30
        pts = gridpp.Points(rng.uniform(55, 58, p), rng.uniform(5, 8, p),
                            np.zeros(p), np.zeros(p))
        field = rng.normal(0, 1, (n, n)).astype(np.float32)
        radii = rng.uniform(5000, 40000, p)
        out = gridpp.fill(grid, field, pts, radii, 7.5, False)
        # scipy reference loop
        expected = field.copy().reshape(-1)
        tree = grid.index.tree
        from gridpp_tpu.core.coords import convert_coordinates_np
        x, y, z = convert_coordinates_np(pts.lats, pts.lons,
                                         grid.get_coordinate_type())
        q = np.stack([x, y, z], axis=-1)
        for i in range(p):
            expected[tree.query_ball_point(q[i], r=float(radii[i]))] = 7.5
        np.testing.assert_array_equal(out.reshape(-1), expected)


class TestApiUsesHost:
    """The public API must produce the same results as before (it now
    routes through the native kernels when available)."""

    def test_neighbourhood_quantile_api(self):
        x = _field((25, 25), seed=11)
        out = gridpp.neighbourhood_quantile(x, 0.5, 3)
        dev = np.asarray(nops.neighbourhood_quantile(jnp.asarray(x), 0.5, 3))
        np.testing.assert_allclose(out, dev, rtol=1e-5, atol=1e-5)

    def test_apply_curve_api(self):
        rng = np.random.default_rng(12)
        cf = np.sort(rng.random(20).astype(np.float32))
        cr = np.sort(rng.random(20).astype(np.float32))
        f = rng.random((10, 10)).astype(np.float32)
        out = gridpp.apply_curve(f, cr, cf, gridpp.OneToOne, gridpp.OneToOne)
        dev = np.asarray(cops.apply_curve(jnp.asarray(f), jnp.asarray(cr),
                                          jnp.asarray(cf), 0, 0))
        np.testing.assert_allclose(out, dev, rtol=1e-5, atol=1e-6)


class TestCalcGradientLR:
    """Native fused LR-gradient kernel vs the pure-JAX five-filter path."""

    @pytest.mark.parametrize("h,min_num,min_range", [
        (1, 2, gridpp.MV), (3, 2, gridpp.MV), (3, 6, gridpp.MV),
        (2, 2, 5.0), (5, 0, 0.0)])
    def test_vs_jax_path(self, h, min_num, min_range):
        rng = np.random.default_rng(42)
        base = _field((40, 37), seed=1, nan_frac=0.2)
        values = 2.5 * np.nan_to_num(base) + \
            rng.normal(0, 1, base.shape).astype(np.float32)
        values[rng.random(base.shape) < 0.1] = np.nan

        got = native.calc_gradient_lr(
            np.where(np.isfinite(base) & np.isfinite(values), base, np.nan),
            np.where(np.isfinite(base) & np.isfinite(values), values,
                     np.nan),
            h, min_num, min_range, bool(np.isfinite(min_range)), -9.0)

        from gridpp_tpu.constants import GradientType
        from gridpp_tpu.ops import neighbourhood as nops2
        both = np.isfinite(base) & np.isfinite(values)
        base0 = np.where(both, base, np.nan).astype(np.float32)
        values0 = np.where(both, values, np.nan).astype(np.float32)
        mean_x = nops2.neighbourhood(jnp.asarray(base0), h,
                                     int(Statistic.Mean))
        mean_y = nops2.neighbourhood(jnp.asarray(values0), h,
                                     int(Statistic.Mean))
        mean_xx = nops2.neighbourhood(jnp.asarray(base0 * base0), h,
                                      int(Statistic.Mean))
        mean_xy = nops2.neighbourhood(jnp.asarray(base0 * values0), h,
                                      int(Statistic.Mean))
        count = nops2.neighbourhood(
            jnp.asarray(both.astype(np.float32)), h, int(Statistic.Sum))
        var = mean_xx - mean_x * mean_x
        grad = (mean_xy - mean_x * mean_y) / jnp.where(var == 0, 1, var)
        ok = ((count >= min_num) & jnp.isfinite(mean_xx)
              & jnp.isfinite(mean_xy) & jnp.isfinite(mean_x) & (var != 0))
        if np.isfinite(min_range):
            rngv = jnp.sqrt(var)
            ok = ok & jnp.isfinite(rngv) & (rngv >= min_range)
        want = np.asarray(jnp.where(ok, grad, -9.0), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_api_routes_native(self):
        base = _field((30, 30), seed=3, nan_frac=0.1)
        values = (1.5 * np.nan_to_num(base)).astype(np.float32)
        out = gridpp.calc_gradient(base, values, gridpp.LinearRegression,
                                   3, 2, gridpp.MV, 0.0)
        assert out.shape == base.shape
        assert np.isfinite(out).all()


class TestNbQuantileFastNative:
    """Native fused threshold-CDF quantile kernel vs the jitted XLA op."""

    @pytest.mark.parametrize("h", [0, 1, 4])
    @pytest.mark.parametrize("q", [0.0, 0.1, 0.5, 1.0])
    def test_scalar_q(self, h, q):
        x = _field((45, 38), seed=11, nan_frac=0.2)
        thr = np.linspace(-20, 20, 9).astype(np.float32)
        got = native.nb_quantile_fast(x, h, thr, None, q)
        want = np.asarray(nops.neighbourhood_quantile_fast(
            jnp.asarray(x), jnp.float32(q), h, jnp.asarray(thr)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   equal_nan=True)

    def test_quantile_field(self):
        x = _field((30, 30), seed=12, nan_frac=0.1)
        thr = np.linspace(-20, 20, 7).astype(np.float32)
        rng = np.random.default_rng(5)
        qf = rng.random((30, 30)).astype(np.float32)
        qf[0, 0] = np.nan
        got = native.nb_quantile_fast(x, 2, thr, qf, 0.0)
        want = np.asarray(nops.neighbourhood_quantile_fast(
            jnp.asarray(x), jnp.asarray(qf), 2, jnp.asarray(thr)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   equal_nan=True)

    def test_api_routes_native(self):
        x = _field((25, 25), seed=6, nan_frac=0.1)
        thr = np.linspace(-20, 20, 11).astype(np.float32)
        out = gridpp.neighbourhood_quantile_fast(x, 0.5, 2, thr)
        want = np.asarray(nops.neighbourhood_quantile_fast(
            jnp.asarray(x), jnp.float32(0.5), 2, jnp.asarray(thr)))
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6,
                                   equal_nan=True)
