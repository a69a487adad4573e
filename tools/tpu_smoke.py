"""On-TPU all-API smoke gate.

Calls EVERY public gridpp_tpu function once (plus the statistic/variant
axes that have burned us: neighbourhood per-statistic, 2-D and 3-D) on
the process's real default backend - no JAX_PLATFORMS override, so on a
TPU machine the host-pinned parity API runs exactly as a user's would.
The round-3 Pallas routing regression (neighbourhood Min/Max and
neighbourhood_score crashing on TPU machines while the CPU suite stayed
green) is the class of bug this catches: the CPU test suite structurally
cannot see backend-dispatch breakage.

Run before committing perf claims:  python tools/tpu_smoke.py
Exit code 0 = every call passed and every public function was covered
(or explicitly waived below).

Also exercises the device entry points (ops on device arrays, Pipeline,
EnsiPipeline) since those trace for the accelerator.
"""
from __future__ import annotations

import os
import sys
import time
import traceback
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_registry(g, jnp):
    rng = np.random.default_rng(0)
    ny, nx = 16, 20
    lats, lons = np.meshgrid(np.linspace(55, 58, ny),
                             np.linspace(5, 8, nx), indexing="ij")
    elevs = rng.uniform(0, 500, (ny, nx)).astype(np.float32)
    lafs = rng.uniform(0, 1, (ny, nx)).astype(np.float32)
    grid = g.Grid(lats, lons, elevs, lafs)
    olats, olons = np.meshgrid(np.linspace(55.1, 57.9, 2 * ny),
                               np.linspace(5.1, 7.9, 2 * nx), indexing="ij")
    ogrid = g.Grid(olats, olons)
    npts = 12
    plats = rng.uniform(55.2, 57.8, npts)
    plons = rng.uniform(5.2, 7.8, npts)
    points = g.Points(plats, plons, rng.uniform(0, 400, npts),
                      rng.uniform(0, 1, npts))
    field = rng.normal(280, 5, (ny, nx)).astype(np.float32)
    field3 = rng.normal(280, 5, (ny, nx, 3)).astype(np.float32)
    pobs = rng.normal(280, 5, npts).astype(np.float32)
    ratios = np.full(npts, 0.1, np.float32)
    structure = g.BarnesStructure(50000.0, 100.0, 0.5)
    curve_x = np.linspace(270, 290, 9).astype(np.float32)
    curve_y = (curve_x + 1.5).astype(np.float32)
    thresholds = np.linspace(270, 290, 7).astype(np.float32)
    vec = rng.normal(0, 1, 20).astype(np.float32)
    ref_b = (rng.random(40) > 0.5).astype(np.float32) * 2
    fcst_b = ref_b + rng.normal(0, 0.5, 40).astype(np.float32)
    pback = g.nearest(grid, points, field)
    bg_ens = rng.normal(280, 5, (ny, nx, 4)).astype(np.float32)
    pbg_ens = np.stack([g.nearest(grid, points, bg_ens[:, :, e])
                        for e in range(4)], axis=1)
    bratios = np.full((ny, nx), 0.1, np.float32)

    def _pt(lat, lon):
        return g.Point(lat, lon, 0.0, 0.0)

    stats_all = [g.Mean, g.Min, g.Median, g.Max, g.Std, g.Variance,
                 g.Sum, g.Count]

    R = {}

    def reg(name, *thunks):
        R[name] = list(thunks)

    # --- core classes ---------------------------------------------------
    reg("Grid", lambda: grid.get_nearest_neighbour(56.0, 6.0),
        lambda: grid.to_points().size())
    reg("Points", lambda: points.get_closest_neighbours(56.0, 6.0, 3),
        lambda: points.subset([0, 1, 2]).size())
    reg("Point", lambda: _pt(56.0, 6.0).lat)
    reg("KDTree", lambda: g.KDTree(plats, plons).size())
    reg("BarnesStructure", lambda: structure.corr(_pt(56, 6), _pt(56, 6.1)))
    reg("CressmanStructure",
        lambda: g.CressmanStructure(5e4).corr(_pt(56, 6), _pt(56, 6.1)))
    reg("SoarStructure",
        lambda: g.SoarStructure(5e4).corr(_pt(56, 6), _pt(56, 6.1)))
    reg("ToarStructure",
        lambda: g.ToarStructure(5e4).corr(_pt(56, 6), _pt(56, 6.1)))
    reg("PowerlawStructure",
        lambda: g.PowerlawStructure(5e4).corr(_pt(56, 6), _pt(56, 6.1)))
    reg("LinearStructure",
        lambda: g.LinearStructure(1.0).corr(_pt(56, 6), _pt(56, 6.1)))
    reg("MultipleStructure",
        lambda: g.MultipleStructure(
            g.BarnesStructure(5e4), g.BarnesStructure(5e4),
            g.BarnesStructure(5e4)).corr(_pt(56, 6), _pt(56, 6.1)))
    reg("CrossValidation",
        lambda: g.CrossValidation(structure, 1000.0).corr_background(
            _pt(56, 6), _pt(56, 6.1)))
    reg("StructureFunction", lambda: structure.localization_distance)
    reg("Transform", lambda: g.Identity().forward(1.0))
    reg("Identity", lambda: g.Identity().backward(np.float32(2.0)))
    reg("Log", lambda: g.Log().backward(g.Log().forward(2.0)))
    reg("BoxCox", lambda: g.BoxCox(0.5).forward(field))
    reg("StartedBoxCox", lambda: g.StartedBoxCox(0.5, 1.0).forward(field))
    reg("Gamma", lambda: g.Gamma(2.0, 1.5).forward(np.float32(1.0)))

    # --- downscaling ----------------------------------------------------
    field_t3 = np.stack([field, field + 1, field + 2])  # vec3 = (T, Y, X)
    reg("nearest", lambda: g.nearest(grid, ogrid, field),
        lambda: g.nearest(grid, points, field_t3))
    reg("bilinear", lambda: g.bilinear(grid, ogrid, field))
    reg("downscaling", lambda: g.downscaling(grid, ogrid, field, g.Nearest),
        lambda: g.downscaling(grid, points, field, g.Bilinear))
    reg("simple_gradient",
        lambda: g.simple_gradient(grid, ogrid, field, -0.0065))
    reg("full_gradient",
        lambda: g.full_gradient(grid, ogrid, field, np.full(
            (ny, nx), -0.0065, np.float32)))
    reg("full_gradient_debug",
        lambda: g.full_gradient_debug(grid, ogrid, field, np.full(
            (ny, nx), -0.0065, np.float32)))
    reg("calc_gradient",
        lambda: g.calc_gradient(elevs, field, g.LinearRegression, 3),
        lambda: g.calc_gradient(elevs, field, g.MinMax, 3))
    reg("downscale_probability",
        lambda: g.downscale_probability(grid, ogrid, field3,
                                        np.full((2 * ny, 2 * nx), 280,
                                                np.float32), g.Gt))
    reg("mask_threshold_downscale_consensus",
        lambda: g.mask_threshold_downscale_consensus(
            grid, ogrid, field3, field3 + 1, field3,
            np.full((2 * ny, 2 * nx), 280, np.float32), g.Gt, g.Mean))
    reg("mask_threshold_downscale_quantile",
        lambda: g.mask_threshold_downscale_quantile(
            grid, ogrid, field3, field3 + 1, field3,
            np.full((2 * ny, 2 * nx), 280, np.float32), g.Gt, 0.5))

    # --- neighbourhood (the round-3 regression axis) --------------------
    reg("neighbourhood",
        *[(lambda s: lambda: g.neighbourhood(field, 3, s))(s)
          for s in stats_all],
        *[(lambda s: lambda: g.neighbourhood(field3, 3, s))(s)
          for s in stats_all],
        lambda: g.neighbourhood(field, 0, g.Mean))
    reg("neighbourhood_brute_force",
        lambda: g.neighbourhood_brute_force(field, 2, g.Mean),
        lambda: g.neighbourhood_brute_force(field3, 2, g.Max))
    reg("neighbourhood_ens",
        lambda: g.neighbourhood_ens(field3, 2, g.Mean))
    reg("neighbourhood_quantile",
        lambda: g.neighbourhood_quantile(field, 0.5, 2),
        lambda: g.neighbourhood_quantile(field3, 0.9, 2))
    reg("neighbourhood_quantile_ens",
        lambda: g.neighbourhood_quantile_ens(field3, 0.5, 2))
    reg("neighbourhood_quantile_fast",
        lambda: g.neighbourhood_quantile_fast(field, 0.5, 3, thresholds),
        lambda: g.neighbourhood_quantile_fast(field3, 0.5, 3, thresholds),
        lambda: g.neighbourhood_quantile_fast(
            field, np.full((ny, nx), 0.5, np.float32), 3, thresholds))
    reg("neighbourhood_quantile_ens_fast",
        lambda: g.neighbourhood_quantile_ens_fast(field3, 0.5, 2,
                                                  thresholds))
    reg("get_neighbourhood_thresholds",
        lambda: g.get_neighbourhood_thresholds(field, 11))
    reg("neighbourhood_search",
        lambda: g.neighbourhood_search(field, field, 2, 279, 281, 0.1))
    reg("window",
        lambda: g.window(field, 5, g.Mean, False, False, True),
        lambda: g.window(field, 4, g.Max, True, True, False))
    reg("neighbourhood_score",
        *[(lambda m: lambda: g.neighbourhood_score(
            grid, points, field, pobs, 3, m, 280.0))(m)
          for m in (g.Ets, g.Ts, g.Kss, g.Pc, g.Bias, g.Hss)])

    # --- calibration ----------------------------------------------------
    reg("apply_curve",
        lambda: g.apply_curve(field, curve_y, curve_x, g.OneToOne,
                              g.MeanSlope))
    reg("monotonize_curve", lambda: g.monotonize_curve(curve_y, curve_x))
    reg("quantile_mapping_curve",
        lambda: g.quantile_mapping_curve(vec, vec + 1))
    reg("metric_optimizer_curve",
        lambda: g.metric_optimizer_curve(ref_b, fcst_b,
                                         np.array([0.5, 1.5], np.float32),
                                         g.Ets))
    reg("get_optimal_threshold",
        lambda: g.get_optimal_threshold(ref_b, fcst_b, 1.0, g.Ets))
    reg("calc_score",
        lambda: g.calc_score(10.0, 3.0, 2.0, 25.0, g.Ets),
        lambda: g.calc_score(ref_b, fcst_b, 1.0, g.Pc))

    # --- OI family ------------------------------------------------------
    reg("optimal_interpolation",
        lambda: g.optimal_interpolation(grid, field, points, pobs, ratios,
                                        pback, structure, 5))
    reg("optimal_interpolation_full",
        lambda: g.optimal_interpolation_full(
            grid, field, np.ones((ny, nx), np.float32), points, pobs,
            np.full(npts, 0.1, np.float32), pback,
            np.ones(npts, np.float32), structure, 5))
    reg("optimal_interpolation_ensi",
        lambda: g.optimal_interpolation_ensi(
            grid, bg_ens, points, pobs, np.full(npts, 1.5, np.float32),
            pbg_ens, structure, 5))
    pobs_e = (pobs[:, None] + rng.normal(0, 0.5, (npts, 4))).astype(
        np.float32)  # perturbed obs (S, E)
    reg("optimal_interpolation_ensi_multi_ebe",
        lambda: g.optimal_interpolation_ensi_multi_ebe(
            grid, bratios, bg_ens, bg_ens, points, pobs_e, ratios, pbg_ens,
            pbg_ens, structure, 5))
    reg("optimal_interpolation_ensi_multi_ebesc",
        lambda: g.optimal_interpolation_ensi_multi_ebesc(
            grid, bratios, bg_ens, points, pobs_e, ratios, pbg_ens,
            structure, 5))
    reg("optimal_interpolation_ensi_multi_utem",
        lambda: g.optimal_interpolation_ensi_multi_utem(
            grid, bratios, bg_ens, bg_ens, points, pobs, ratios, pbg_ens,
            pbg_ens, structure, 5))  # utem takes pobs as vec (S,)
    reg("local_distribution_correction",
        lambda: g.local_distribution_correction(
            grid, np.abs(field - 275), points, np.abs(pobs - 275),
            np.abs(pback - 275), structure, 0.1, 0.9))
    reg("staticcorr_points",
        lambda: g.staticcorr_points(points, points, structure, 5))
    reg("smart", lambda: g.smart(grid, ogrid, field, 3, structure))

    # --- gridding / fill ------------------------------------------------
    reg("gridding",
        lambda: g.gridding(grid, points, pobs, 20000.0, 1, g.Mean))
    reg("gridding_nearest",
        lambda: g.gridding_nearest(grid, points, pobs, 1, g.Mean))
    reg("count", lambda: g.count(points, grid, 20000.0),
        lambda: g.count(grid, points, 20000.0))
    reg("distance", lambda: g.distance(grid, points, 1),
        lambda: g.distance(points, grid, 2))
    reg("fill",
        lambda: g.fill(grid, field, points, np.full(npts, 1e4, np.float32),
                       260.0, False))
    reg("fill_missing",
        lambda: g.fill_missing(np.where(field > 282, np.nan, field)))
    reg("doping_square",
        lambda: g.doping_square(grid, field, points, pobs,
                                np.ones(npts, np.int32)))
    reg("doping_circle",
        lambda: g.doping_circle(grid, field, points, pobs,
                                np.full(npts, 1e4, np.float32)))

    # --- diagnostics ----------------------------------------------------
    reg("dewpoint", lambda: g.dewpoint(283.0, 0.8),
        lambda: g.dewpoint(field, np.full_like(field, 0.8)))
    reg("relative_humidity", lambda: g.relative_humidity(283.0, 280.0))
    reg("wetbulb", lambda: g.wetbulb(283.0, 101325.0, 0.8))
    reg("pressure", lambda: g.pressure(100.0, 50.0, 101325.0, 288.0))
    reg("sea_level_pressure",
        lambda: g.sea_level_pressure(101325.0, 100.0, 288.0, 0.8))
    reg("qnh", lambda: g.qnh(101325.0, 100.0),
        lambda: g.qnh(np.full(3, 101325.0, np.float32),
                      np.full(3, 100.0, np.float32)))
    reg("wind_speed", lambda: g.wind_speed(3.0, 4.0),
        lambda: g.wind_speed(field, field))
    reg("wind_direction", lambda: g.wind_direction(3.0, 4.0))
    reg("gamma_inv", lambda: g.gamma_inv(0.5, 2.0, 1.5))

    # --- util -----------------------------------------------------------
    reg("calc_statistic",
        *[(lambda s: lambda: g.calc_statistic(vec, s))(s)
          for s in stats_all])
    reg("calc_quantile", lambda: g.calc_quantile(vec, 0.5),
        lambda: g.calc_quantile(field, 0.9))
    reg("calc_even_quantiles", lambda: g.calc_even_quantiles(vec, 5))
    reg("interpolate", lambda: g.interpolate(0.5, curve_x, curve_y))
    reg("get_lower_index", lambda: g.get_lower_index(275.0, curve_x))
    reg("get_upper_index", lambda: g.get_upper_index(275.0, curve_x))
    reg("compatible_size", lambda: g.compatible_size(field, field3))
    reg("convert_coordinates", lambda: g.convert_coordinates(plats, plons))
    reg("is_valid", lambda: g.is_valid(1.0) and not g.is_valid(np.nan))
    reg("is_valid_lat", lambda: g.is_valid_lat(56.0))
    reg("is_valid_lon", lambda: g.is_valid_lon(5.0))
    reg("num_missing_values",
        lambda: g.num_missing_values(np.where(field > 282, np.nan, field)))
    reg("point_in_rectangle",
        lambda: g.point_in_rectangle(_pt(0, 0), _pt(0, 1), _pt(1, 1),
                                     _pt(1, 0), _pt(0.5, 0.5)))
    reg("init_vec2", lambda: g.init_vec2(2, 3))
    reg("init_vec3", lambda: g.init_vec3(2, 3, 4, 1.0))
    reg("init_ivec2", lambda: g.init_ivec2(2, 3, 0))
    reg("init_ivec3", lambda: g.init_ivec3(2, 3, 4, 0))
    reg("get_statistic", lambda: g.get_statistic("mean"))
    reg("version", lambda: g.version())
    reg("clock", lambda: g.clock())
    reg("set_omp_threads", lambda: g.set_omp_threads(4))
    reg("get_omp_threads", lambda: g.get_omp_threads())
    reg("initialize_omp", lambda: g.initialize_omp())
    reg("set_debug_level", lambda: g.set_debug_level(0))
    reg("get_debug_level", lambda: g.get_debug_level())
    reg("KDTree_calc_distance",
        lambda: g.KDTree_calc_distance(56.0, 6.0, 56.1, 6.1))
    reg("KDTree_calc_distance_fast",
        lambda: g.KDTree_calc_distance_fast(56.0, 6.0, 56.1, 6.1))
    reg("KDTree_calc_straight_distance",
        lambda: g.KDTree_calc_straight_distance(_pt(56.0, 6.0),
                                                _pt(56.1, 6.1)),
        lambda: g.KDTree_calc_straight_distance(0.0, 0.0, 0.0,
                                                1.0, 2.0, 2.0))
    reg("KDTree_deg2rad", lambda: g.KDTree_deg2rad(180.0))
    reg("KDTree_rad2deg", lambda: g.KDTree_rad2deg(np.pi))

    # --- binding-parity shims -------------------------------------------
    reg("test_vec_input", lambda: g.test_vec_input(vec))
    reg("test_ivec_input", lambda: g.test_ivec_input([1, 2, 3]))
    reg("test_vec2_input", lambda: g.test_vec2_input(field))
    reg("test_vec3_input", lambda: g.test_vec3_input(field3))
    reg("test_vec_output", lambda: g.test_vec_output())
    reg("test_vec2_output", lambda: g.test_vec2_output())
    reg("test_vec3_output", lambda: g.test_vec3_output())
    reg("test_ivec_output", lambda: g.test_ivec_output())
    reg("test_ivec2_output", lambda: g.test_ivec2_output())
    reg("test_ivec3_output", lambda: g.test_ivec3_output())
    reg("test_vec_argout", lambda: g.test_vec_argout())
    reg("test_vec2_argout", lambda: g.test_vec2_argout())
    reg("test_array", lambda: g.test_array(vec))

    def _expect_raises(fn, exc):
        try:
            fn()
        except exc:
            return True
        raise AssertionError(f"expected {exc.__name__}")

    reg("test_not_implemented_exception",
        lambda: _expect_raises(g.test_not_implemented_exception,
                               NotImplementedError))
    reg("error", lambda: _expect_raises(lambda: g.error("smoke"),
                                        RuntimeError))
    reg("debug", lambda: g.debug("smoke"))
    reg("warning", lambda: g.warning("smoke"))
    reg("future_deprecation_warning",
        lambda: g.future_deprecation_warning("smoke"))

    # --- device entry points (trace for the accelerator) ----------------
    def _pipeline():
        import jax
        pipe = g.Pipeline(grid, points, structure, halfwidth=3,
                          statistic=g.Mean, max_points=5, ratios=ratios)
        out = pipe.run_device(jnp.asarray(field), jnp.asarray(pobs))
        jax.block_until_ready(out)
        outg = pipe.run_device(jnp.asarray(field), jnp.asarray(pobs),
                               path="general")
        jax.block_until_ready(outg)
        return np.isfinite(np.asarray(out)).all()

    def _ensi_pipeline():
        import jax
        ep = g.EnsiPipeline(grid, points, structure, max_points=5)
        out, _ = ep.run_device(jnp.asarray(bg_ens), jnp.asarray(pobs),
                               jnp.asarray(np.full(npts, 1.5, np.float32)))
        jax.block_until_ready(out)
        return np.isfinite(np.asarray(out)).all()

    def _device_ops():
        import jax
        from gridpp_tpu.ops import neighbourhood as nops
        xd = jnp.asarray(field)
        for s in stats_all:
            jax.block_until_ready(nops.neighbourhood(xd, 3, int(s)))
        jax.block_until_ready(nops.neighbourhood_quantile_fast(
            xd, 0.5, 3, jnp.asarray(thresholds)))
        return True

    def _multi_pipeline():
        import jax
        pratios_d = jnp.asarray(ratios)
        pobs_e = jnp.asarray(
            (pobs[:, None] + rng.normal(0, 0.5, (npts, 4))).astype(
                np.float32))
        bg_d = jnp.asarray(bg_ens)
        for variant in ("ebesc", "utem", "ebe"):
            mp = g.MultiEnsiPipeline(grid, points, structure,
                                     variant=variant, max_points=5)
            ob = jnp.asarray(pobs) if variant == "utem" else pobs_e
            bc = None if variant == "ebesc" else bg_d
            out, _ = mp.run_device(bg_d, ob, pratios_d,
                                   background_corr=bc)
            jax.block_until_ready(out)
        return True

    reg("Pipeline", _pipeline)
    reg("EnsiPipeline", _ensi_pipeline)
    reg("MultiEnsiPipeline", _multi_pipeline)
    reg("ops_device", _device_ops)

    return R


# Public names with no meaningful standalone smoke. Keep short and
# justified: the enum families are plain IntEnums consumed as arguments
# by nearly every registered call above.
WAIVED = {
    "Statistic", "Metric", "Extrapolation", "CorrectionType",
    "CoordinateType", "GradientType", "Downscaler", "ComparisonOperator",
}


def main():
    import jax
    import jax.numpy as jnp

    t_start = time.time()
    np.asarray(jnp.ones(1))  # device init + first (slow) D2H
    import gridpp_tpu as g

    backend = jax.default_backend()
    registry = build_registry(g, jnp)

    public = set()
    for name, obj in vars(g).items():
        if name.startswith("_"):
            continue
        if isinstance(obj, types.FunctionType) or isinstance(obj, type):
            public.add(name)
    uncovered = sorted(public - set(registry) - WAIVED)

    failures = []
    npass = 0
    for name in sorted(registry):
        for k, thunk in enumerate(registry[name]):
            try:
                thunk()
                npass += 1
            except Exception:
                failures.append((name, k, traceback.format_exc(limit=8)))

    dt = time.time() - t_start
    print(f"backend={backend}  calls={npass + len(failures)}  "
          f"pass={npass}  fail={len(failures)}  "
          f"functions={len(registry)}  elapsed={dt:.1f}s")
    if uncovered:
        print(f"UNCOVERED public names ({len(uncovered)}): "
              f"{', '.join(uncovered)}")
    for name, k, tb in failures:
        print(f"\n--- FAIL {name}[{k}] ---\n{tb}")
    ok = not failures and not uncovered
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
