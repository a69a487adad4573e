"""Operational OI calibrator option families (client/oi_calibrator.py vs
reference src/client/Calibrator/Oi.cpp).

Each test pins one option family's semantics: ensemble mode against the
library EnSI, single-member mode against the library OI, Box-Cox
transforms, bias/delta state variables, cross-validation, elevation
gradient, station screening (maxElevDiff/landOnly), minRho localization,
saveDiff/numVariable outputs and the soar rho type.
"""
import numpy as np
import pytest

import gridpp_tpu as gridpp
from gridpp_tpu.client.file import File
from gridpp_tpu.client.options import Options
from gridpp_tpu.client.schemes import CalibratorOi


class SpatialParams:
    """Minimal spatial parameter-file stand-in."""

    def __init__(self, lats, lons, elevs, params):
        self._points = gridpp.Points(lats, lons, elevs)
        self._params = np.asarray(params, np.float64)
        self.spatial = True

    def is_location_dependent(self):
        return True

    def to_points(self, time=None):
        return self._points, self._params


def make_file(field, elevs=None, lafs=None, lat0=55.0, dlat=0.05):
    """Bare File around a (T, Y, X, E) field on a small geodetic grid."""
    nt, ny, nx, ne = field.shape
    lats, lons = np.meshgrid(
        np.linspace(lat0, lat0 + dlat * (ny - 1), ny),
        np.linspace(9.0, 9.0 + dlat * (nx - 1), nx), indexing="ij")
    if elevs is None:
        elevs = np.zeros((ny, nx))
    if lafs is None:
        lafs = np.ones((ny, nx))
    f = File()
    f.grid = gridpp.Grid(lats, lons, elevs, lafs)
    f.times = np.zeros(nt)
    f.num_ens = ne
    f.add_field("t2m", np.asarray(field, np.float32))
    return f


def _problem(ny=14, nx=14, ne=6, n_obs=7, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    field = (280 + rng.normal(0, spread, (1, ny, nx, ne))).astype(
        np.float32)
    f = make_file(field)
    lats = np.asarray(f.grid.lats)
    lons = np.asarray(f.grid.lons)
    st_lats = rng.uniform(lats.min() + 0.06, lats.max() - 0.06, n_obs)
    st_lons = rng.uniform(lons.min() + 0.06, lons.max() - 0.06, n_obs)
    st_elevs = np.zeros(n_obs)
    obs = 280 + rng.normal(0, 2, n_obs)
    return f, st_lats, st_lons, st_elevs, obs


def test_ensemble_mode_matches_library_ensi():
    """Default ensemble mode with flat terrain == the library EnSI with
    a Barnes structure (the calibrator's ETKF is the reference's origin
    of optimal_interpolation_ensi; Oi.cpp:678-1010)."""
    f, la, lo, el, obs = _problem(ne=6)
    par = SpatialParams(la, lo, el, obs[:, None])
    cal = CalibratorOi("t2m", Options("d=30000"))
    before = f.get_field("t2m").copy()
    cal.calibrate(f, par)
    got = f.get_field("t2m")[0]

    bg = before[0]
    pts = gridpp.Points(la, lo, el)
    idx = f.grid.nearest_map(pts.lats, pts.lons)
    pback = bg.reshape(-1, bg.shape[-1])[idx]
    want = gridpp.optimal_interpolation_ensi(
        f.grid, bg, pts, obs.astype(np.float32),
        np.ones(len(obs), np.float32), pback,
        gridpp.BarnesStructure(30000.0), 20)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)
    assert not np.allclose(got, bg)  # the update actually moved values


def test_single_member_mode_matches_library_oi():
    """useEns=0 (or too few members) falls back to kriging with static
    correlations == the library deterministic OI with ratios=epsilon^2
    (Oi.cpp:562-676)."""
    f, la, lo, el, obs = _problem(ne=1)
    par = SpatialParams(la, lo, el, obs[:, None])
    before = f.get_field("t2m").copy()
    cal = CalibratorOi("t2m", Options("d=30000 useEns=0 epsilon=0.5"))
    cal.calibrate(f, par)
    got = f.get_field("t2m")[0, :, :, 0]

    bg = before[0, :, :, 0]
    pts = gridpp.Points(la, lo, el)
    idx = f.grid.nearest_map(pts.lats, pts.lons)
    pback = bg.reshape(-1)[idx]
    want = gridpp.optimal_interpolation(
        f.grid, bg, pts, obs.astype(np.float32),
        np.full(len(obs), 0.25, np.float32), pback,
        gridpp.BarnesStructure(30000.0), 20)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)
    assert not np.allclose(got, bg)


def test_cross_validate_single_obs_keeps_background():
    """crossValidate=1 drops the best-rho obs per gridpoint; with a
    single observation nothing remains and the background is returned
    (Oi.cpp:477-499)."""
    f, la, lo, el, obs = _problem(n_obs=1)
    par = SpatialParams(la, lo, el, obs[:1, None])
    before = f.get_field("t2m").copy()
    cal = CalibratorOi("t2m", Options("d=30000 crossValidate=1"))
    cal.calibrate(f, par)
    np.testing.assert_allclose(f.get_field("t2m"), before, atol=1e-5)


def test_elev_gradient_zeroes_innovation():
    """With obs = background@NN + gradient * elevDiff the innovation is
    zero and the analysis equals the background (Oi.cpp:383-397)."""
    ny = nx = 12
    ne = 6
    elevs = np.linspace(0, 800, ny * nx).reshape(ny, nx)
    field = np.full((1, ny, nx, ne), 285.0, np.float32)
    f = make_file(field, elevs=elevs)
    rng = np.random.default_rng(1)
    lats = np.asarray(f.grid.lats)
    lons = np.asarray(f.grid.lons)
    la = rng.uniform(lats.min() + 0.06, lats.max() - 0.06, 5)
    lo = rng.uniform(lons.min() + 0.06, lons.max() - 0.06, 5)
    el = rng.uniform(0, 800, 5)
    pts_nn = f.grid.nearest_map(la, lo)
    nn_elev = elevs.reshape(-1)[pts_nn]
    grad = -0.0065
    obs = 285.0 + grad * (el - nn_elev)
    par = SpatialParams(la, lo, el, obs[:, None])
    cal = CalibratorOi("t2m", Options("d=30000 elevGradient=-0.0065 "
                                      "h=-999 maxElevDiff=10000"))
    cal.calibrate(f, par)
    np.testing.assert_allclose(f.get_field("t2m"), 285.0, atol=1e-4)


def test_max_elev_diff_screens_station():
    """A station whose elevation is far from its grid cell is removed
    (Oi.cpp:262-268); default maxElevDiff=200."""
    f, la, lo, el, obs = _problem(n_obs=1)
    el = np.array([5000.0])
    obs = np.array([260.0])  # would pull hard if used
    par = SpatialParams(la, lo, el, obs[:, None])
    before = f.get_field("t2m").copy()
    cal = CalibratorOi("t2m", Options("d=30000"))
    cal.calibrate(f, par)
    np.testing.assert_allclose(f.get_field("t2m"), before, atol=1e-5)


def test_land_only_screens_sea_station():
    """landOnly=1 removes stations whose nearest cell has laf == 0
    (Oi.cpp:270-276)."""
    ny = nx = 12
    field = np.full((1, ny, nx, 6), 280.0, np.float32)
    lafs = np.zeros((ny, nx))  # all sea
    f = make_file(field, lafs=lafs)
    rng = np.random.default_rng(2)
    lats = np.asarray(f.grid.lats)
    lons = np.asarray(f.grid.lons)
    la = rng.uniform(lats.min() + 0.06, lats.max() - 0.06, 3)
    lo = rng.uniform(lons.min() + 0.06, lons.max() - 0.06, 3)
    par = SpatialParams(la, lo, np.zeros(3),
                        np.full((3, 1), 260.0))
    before = f.get_field("t2m").copy()
    cal = CalibratorOi("t2m", Options("d=30000 landOnly=1 w=-999"))
    cal.calibrate(f, par)
    np.testing.assert_allclose(f.get_field("t2m"), before, atol=1e-5)


def test_boxcox_transform_identity_when_obs_equal_background():
    """transform=boxcox round-trips: zero innovation in transformed
    space leaves the (positive) field unchanged (Oi.cpp:1149-1177)."""
    ny = nx = 12
    ne = 6
    field = np.full((1, ny, nx, ne), 4.0, np.float32)
    f = make_file(field)
    rng = np.random.default_rng(3)
    lats = np.asarray(f.grid.lats)
    lons = np.asarray(f.grid.lons)
    la = rng.uniform(lats.min() + 0.06, lats.max() - 0.06, 4)
    lo = rng.uniform(lons.min() + 0.06, lons.max() - 0.06, 4)
    par = SpatialParams(la, lo, np.zeros(4), np.full((4, 1), 4.0))
    cal = CalibratorOi("t2m", Options("d=30000 transform=boxcox "
                                      "lambda=0.5"))
    cal.calibrate(f, par)
    np.testing.assert_allclose(f.get_field("t2m"), 4.0, atol=1e-3)


def test_boxcox_rejects_unknown_transform():
    with pytest.raises(RuntimeError):
        CalibratorOi("t2m", Options("transform=bogus"))
    with pytest.raises(RuntimeError):
        CalibratorOi("t2m", Options("rhoType=bogus"))


def test_bias_variable_updates_and_shifts_yhat():
    """biasVariable: yhat is reduced by mu*bias (larger innovation) and
    the updated bias is written back; with gamma=0 the new bias equals
    mu * old bias (Oi.cpp:339-353, 986-994)."""
    f, la, lo, el, obs = _problem(ne=6)
    bias0 = np.full_like(f.get_field("t2m")[:, :, :, :1], 0.8)
    f.add_field("bias", np.repeat(bias0, f.num_ens, axis=3))
    par = SpatialParams(la, lo, el, obs[:, None])
    cal0 = CalibratorOi("t2m", Options("d=30000"))
    fa, *_ = _problem(ne=6)  # identical copy for the no-bias run
    cal0.calibrate(fa, par)
    plain = fa.get_field("t2m").copy()

    cal = CalibratorOi("t2m", Options("d=30000 biasVariable=bias "
                                      "gamma=0"))
    cal.calibrate(f, par)
    got = f.get_field("t2m")
    assert not np.allclose(got, plain)  # bias changed the innovations
    newbias = f.get_field("bias")
    np.testing.assert_allclose(newbias[0, :, :, 0], 0.9 * 0.8,
                               atol=1e-5)


def test_delta_variable_written_with_calc_delta():
    """deltaVariable: the evolved delta follows calcDelta's weighted
    blend of old delta and the variance-ratio evidence
    (Oi.cpp:1093-1121)."""
    f, la, lo, el, obs = _problem(ne=6)
    delta0 = np.full((1,) + f.get_field("t2m").shape[1:3] + (f.num_ens,),
                     1.2, np.float32)
    f.add_field("delta", delta0)
    par = SpatialParams(la, lo, el, obs[:, None])
    cal = CalibratorOi("t2m", Options("d=30000 deltaVariable=delta "
                                      "c=1.4 newDeltaVar=2 sigma=1 "
                                      "epsilon=0.5"))
    before = f.get_field("t2m").copy()
    cal.calibrate(f, par)
    newdelta = f.get_field("delta")[0, 0, 0, 0]

    # expected: trace of member variances at station NN points
    bg = before[0]
    idx = f.grid.nearest_map(la, lo)
    fb = bg.reshape(-1, bg.shape[-1])[idx]
    anom = fb - fb.mean(axis=1, keepdims=True)
    var = (anom ** 2).sum(axis=1) / (fb.shape[1] - 1)
    evidence = (1.0 / 0.25) / var.mean()
    w_old = 1.4 - 1
    expect = (1.2 * 2 + evidence * w_old) / (w_old + 2)
    np.testing.assert_allclose(newdelta, expect, rtol=1e-5)


def test_num_variable_reports_station_counts():
    f, la, lo, el, obs = _problem(ne=6)
    f.add_field("num", np.zeros_like(f.get_field("t2m")))
    par = SpatialParams(la, lo, el, obs[:, None])
    cal = CalibratorOi("t2m", Options("d=100000 numVariable=num"))
    cal.calibrate(f, par)
    num = f.get_field("num")[0, :, :, 0]
    assert num.max() == len(la)  # wide radius: all stations seen
    assert num.min() >= 0


def test_save_diff_is_increment():
    """saveDiff=1 writes the (pre-clamp) increment; with extrapolate=1
    analysis == ensMean + increment, so analysis - saveDiff == ensMean
    (Oi.cpp:928-977)."""
    f1, la, lo, el, obs = _problem(ne=6)
    f2, *_ = _problem(ne=6)
    par = SpatialParams(la, lo, el, obs[:, None])
    CalibratorOi("t2m", Options("d=30000 extrapolate=1")).calibrate(
        f1, par)
    CalibratorOi("t2m", Options("d=30000 extrapolate=1 saveDiff=1")
                 ).calibrate(f2, par)
    f3, *_ = _problem(ne=6)
    ens_mean = f3.get_field("t2m")[0].mean(axis=-1)
    full = f1.get_field("t2m")[0]
    diff = f2.get_field("t2m")[0]
    ok = np.isfinite(diff)
    np.testing.assert_allclose(
        (full - diff)[ok], np.broadcast_to(ens_mean[:, :, None],
                                           full.shape)[ok], atol=2e-3)
    # gridpoints with no stations in range are blanked under saveDiff
    assert np.isnan(diff).any() or ok.all()


def test_min_rho_shrinks_influence():
    f1, la, lo, el, obs = _problem(ne=6)
    f2, *_ = _problem(ne=6)
    par = SpatialParams(la, lo, el, obs[:, None])
    before = f1.get_field("t2m").copy()
    CalibratorOi("t2m", Options("d=30000")).calibrate(f1, par)
    CalibratorOi("t2m", Options("d=30000 minRho=0.9")).calibrate(f2, par)
    changed1 = np.sum(~np.isclose(f1.get_field("t2m"), before))
    changed2 = np.sum(~np.isclose(f2.get_field("t2m"), before))
    assert changed2 < changed1


def test_rho_type_soar_differs():
    f1, la, lo, el, obs = _problem(ne=6)
    f2, *_ = _problem(ne=6)
    par = SpatialParams(la, lo, el, obs[:, None])
    CalibratorOi("t2m", Options("d=30000")).calibrate(f1, par)
    CalibratorOi("t2m", Options("d=30000 rhoType=soar")).calibrate(
        f2, par)
    assert not np.allclose(f1.get_field("t2m"), f2.get_field("t2m"))
    assert np.isfinite(f2.get_field("t2m")).all()


def test_radar_parameters_run():
    """Three-parameter files (obs, ci, radar fraction) route radar
    points through the correlated-error R block (Oi.cpp:744-806)."""
    f, la, lo, el, obs = _problem(ne=6)
    params = np.stack([obs, np.ones(len(obs)),
                       (np.arange(len(obs)) % 2).astype(float)], axis=1)
    par = SpatialParams(la, lo, el, params)
    before = f.get_field("t2m").copy()
    CalibratorOi("t2m", Options("d=30000 dc=10000 sigmaC=1")).calibrate(
        f, par)
    out = f.get_field("t2m")
    assert np.isfinite(out).all()
    assert not np.allclose(out, before)


def test_cli_end_to_end_transform_and_cross_validate(tmp_path):
    """Full CLI run exercising transform=boxcox + crossValidate=1
    (the reference production invocation shape, Driver/Gridpp.cpp)."""
    import os
    import shutil
    from gridpp_tpu.client import main
    fixtures = "/root/reference/tests/files"
    if not os.path.isdir(fixtures):
        pytest.skip("reference fixtures unavailable")
    src = str(tmp_path / "in.nc")
    dst = str(tmp_path / "out.nc")
    shutil.copy(os.path.join(fixtures, "10x10.nc"), src)
    shutil.copy(os.path.join(fixtures, "10x10.nc"), dst)
    rc = main([src, dst, "-v", "air_temperature_2m",
               "-d", "nearest",
               "-c", "oi", "d=200000", "transform=boxcox", "lambda=0.5",
               "crossValidate=1", "maxElevDiff=100000",
               "-p", os.path.join(fixtures, "parametersKriging.txt")])
    assert rc == 0
    from gridpp_tpu.client.file import FileNetcdf
    out = FileNetcdf(dst).get_field("air_temperature_2m")
    ref = FileNetcdf(os.path.join(
        fixtures, "10x10.nc")).get_field("air_temperature_2m")
    assert np.isfinite(out).any()
    # cross-validation with several stations still produces an analysis
    # different from the raw background
    assert not np.array_equal(out, ref)


def test_too_many_parameters_rejected():
    f, la, lo, el, obs = _problem()
    params = np.tile(obs[:, None], (1, 4))
    par = SpatialParams(la, lo, el, params)
    with pytest.raises(RuntimeError):
        CalibratorOi("t2m", Options("d=30000")).calibrate(f, par)
