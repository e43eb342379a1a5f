"""Composable fused-render builder vs the unfused XLA path (interpret mode).

The builder (ops/pallas/fused_builder.py) must reproduce the unfused
profile-by-profile render — values AND parameter gradients — for every
supported composition, including the patterns the specialized benchmark
kernel refuses (shapelet sources, SIS deflectors, baked constants, lstsq
component stacks). Reference behavioral counterpart: the unfused chain in
``src/gigalens/jax/simulator.py:96-130`` and the stacked lstsq render at
``:150-191``.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gigalens_tpu import PhysicalModel, SimulatorConfig
from gigalens_tpu.ops.pallas import fused_builder as fb
from gigalens_tpu.profiles.light.sersic import CoreSersic, Sersic, SersicEllipse
from gigalens_tpu.profiles.light.shapelets import Shapelets
from gigalens_tpu.profiles.mass.epl import EPL
from gigalens_tpu.profiles.mass.shear import Shear
from gigalens_tpu.profiles.mass.sie import SIE, SIS
from gigalens_tpu.simulator import LensSimulator

BS = 5
NPIX = 300


def _rand_params(phys, bs, rng):
    out = {"lens_mass": [], "lens_light": [], "source_light": []}
    groups = [
        ("lens_mass", phys.lenses, phys.lenses_constants),
        ("lens_light", phys.lens_light, phys.lens_light_constants),
        ("source_light", phys.source_light, phys.source_light_constants),
    ]
    for g, profs, consts in groups:
        for prof, cc in zip(profs, consts):
            d = {}
            for name in prof.params:
                if name in cc:
                    continue
                if name in ("theta_E", "R_sersic"):
                    v = rng.uniform(0.5, 1.5, bs)
                elif name == "beta":
                    v = rng.uniform(0.15, 0.35, bs)
                elif name == "gamma" and g == "lens_mass":
                    v = rng.uniform(1.8, 2.2, bs)
                elif name in ("e1", "e2", "gamma1", "gamma2"):
                    v = rng.uniform(-0.2, 0.2, bs)
                elif name == "n_sersic":
                    v = rng.uniform(1.0, 4.0, bs)
                elif name == "Rs":
                    v = rng.uniform(5.0, 15.0, bs)
                elif name == "alpha_Rs":
                    v = rng.uniform(1.0, 4.0, bs)
                elif name == "Rb":
                    v = rng.uniform(0.05, 0.2, bs)
                elif name == "alpha":
                    v = rng.uniform(1.5, 3.0, bs)
                elif name == "Ie":
                    v = rng.uniform(50.0, 200.0, bs)
                elif name.startswith("amp"):
                    v = rng.uniform(-1.0, 1.0, bs)
                else:
                    v = rng.uniform(-0.3, 0.3, bs)
                d[name] = jnp.asarray(v, jnp.float32)
            out[g].append(d)
    return out


def _unfused_flat(phys, params, x, y, stacked=False):
    bx, by = x, y
    for lens, p, c in zip(phys.lenses, params["lens_mass"], phys.lenses_constants):
        fx, fy = lens.deriv(x, y, **{k: v[..., None] for k, v in p.items()}, **c)
        bx, by = bx - fx, by - fy
    vals = []
    for prof, p, c in zip(phys.lens_light, params["lens_light"],
                          phys.lens_light_constants):
        vals.append(prof.light(x, y, **{k: v[..., None] for k, v in p.items()}, **c))
    for prof, p, c in zip(phys.source_light, params["source_light"],
                          phys.source_light_constants):
        vals.append(prof.light(bx, by, **{k: v[..., None] for k, v in p.items()}, **c))
    if stacked:
        bs = next(iter(params["lens_mass"][0].values())).shape[0]
        return jnp.concatenate(
            [jnp.broadcast_to(v, (v.shape[0], bs, x.shape[0])) for v in vals], 0
        )
    return sum(vals)


MODELS = {
    "legacy_pattern": lambda: PhysicalModel(
        [EPL(18), Shear()], [SersicEllipse()], [SersicEllipse()]),
    "sie_sersic_shapelets": lambda: PhysicalModel(
        [SIE(), Shear()], [Sersic()], [Shapelets(4)]),
    "shapelet_source_only": lambda: PhysicalModel(
        [EPL(18), Shear()], [], [Shapelets(5)]),
    "sis_coresersic": lambda: PhysicalModel(
        [SIS()], [CoreSersic()], [SersicEllipse()]),
    "baked_constant_gamma": lambda: PhysicalModel(
        [EPL(18), Shear()], [SersicEllipse()], [SersicEllipse()],
        lenses_constants=[dict(gamma=2.0), {}]),
    "nfw_ellipse_halo": lambda: _nfw_model(),
}

# NFW's special functions use mathematically-identical but differently-rounded
# kernel-safe forms (log-form arccosh, polynomial atan2); deflections of
# O(several arcsec) into a steep Sersic amplify those f32 op-ordering ulps
TOL = {"nfw_ellipse_halo": (5e-4, 5e-3)}


def _nfw_model():
    from gigalens_tpu.profiles.mass.nfw import NFW, NFW_ELLIPSE

    return PhysicalModel([NFW_ELLIPSE(), NFW(), Shear()], [],
                         [SersicEllipse()])


@pytest.mark.parametrize("name", sorted(MODELS))
def test_sum_matches_unfused(name):
    phys = MODELS[name]()
    spec = fb.build_spec(phys)
    assert spec is not None
    rng = np.random.default_rng(0)
    params = _rand_params(phys, BS, rng)
    x = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)
    got = fb.fused_render_sum(spec.pack(params), x, y, (), spec, True)
    want = _unfused_flat(phys, params, x, y)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=TOL.get(name, (2e-5, 0))[0] * scale, rtol=0)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_grad_matches_unfused(name):
    phys = MODELS[name]()
    spec = fb.build_spec(phys)
    rng = np.random.default_rng(1)
    params = _rand_params(phys, BS, rng)
    x = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)

    # a LINEAR functional of the render: a nonlinear one (e.g. sin) of
    # O(100) brightness values would amplify f32 ulp differences between
    # the two evaluation orders into O(1) gradient chaos
    ct = jnp.asarray(rng.normal(size=(BS, NPIX)), jnp.float32)
    g_fused = jax.grad(
        lambda pk: jnp.sum(ct * fb.fused_render_sum(pk, x, y, (), spec, True))
    )(spec.pack(params))
    g_ref = jax.grad(
        lambda pr: jnp.sum(ct * _unfused_flat(phys, pr, x, y))
    )(params)
    cols, mask = [], []
    for s in spec.pack_cols:
        if isinstance(s, tuple):
            g, i, nm = s
            cols.append(jnp.reshape(g_ref[g][i][nm], (-1,)))
            mask.append(1.0)
        else:
            cols.append(jnp.zeros(BS))
            mask.append(0.0)  # constant column: fused grad is discarded by pack
    g_ref_m = jnp.stack(cols, -1)
    mask = jnp.asarray(mask)
    scale = float(jnp.max(jnp.abs(g_ref_m)))
    np.testing.assert_allclose(
        np.asarray(g_fused * mask), np.asarray(g_ref_m * mask),
        atol=TOL.get(name, (0, 5e-5))[1] * scale, rtol=0,
    )


def test_components_stacked_lstsq():
    phys = PhysicalModel(
        [EPL(18), Shear()], [SersicEllipse(use_lstsq=True)],
        [Shapelets(4, use_lstsq=True)],
    )
    spec = fb.build_spec(phys)
    assert spec is not None and spec.all_lstsq and spec.depth == 16
    rng = np.random.default_rng(2)
    params = _rand_params(phys, BS, rng)
    x = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)
    got = fb.fused_render_components(spec.pack(params), x, y, (), spec, True)
    want = _unfused_flat(phys, params, x, y, stacked=True)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * scale, rtol=0)
    # gradients through the stacked render (the lstsq-HMC path)
    ct = jnp.asarray(rng.normal(size=(spec.depth, BS, NPIX)), jnp.float32)
    g_fused = jax.grad(lambda pk: jnp.sum(
        ct * fb.fused_render_components(pk, x, y, (), spec, True)))(spec.pack(params))
    g_ref = jax.grad(lambda pr: jnp.sum(
        ct * _unfused_flat(phys, pr, x, y, stacked=True)))(params)
    cols = [jnp.reshape(g_ref[s[0]][s[1]][s[2]], (-1,)) for s in spec.pack_cols]
    g_ref_m = jnp.stack(cols, -1)
    scale = float(jnp.max(jnp.abs(g_ref_m)))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref_m),
                               atol=3e-5 * scale, rtol=0)


def test_unsupported_returns_none():
    from gigalens_tpu.profiles.mass.multipole import Multipole

    assert fb.build_spec(
        PhysicalModel([Multipole()], [], [SersicEllipse()])) is None
    # mixed lstsq / sampled amplitudes stay unfused
    assert fb.build_spec(PhysicalModel(
        [EPL(18)], [SersicEllipse(use_lstsq=True)], [SersicEllipse()])) is None


def test_series_stage_matches_series_eval():
    """MassSeries stage: the kernel's in-tile polynomial must reproduce the
    profile's own MXU series evaluation (and its gradients) on the grid."""
    from gigalens_tpu.profiles.mass.dpie import DPIE
    from gigalens_tpu.profiles.mass.series import MassSeries

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)
    y = jnp.asarray(rng.uniform(-2, 2, NPIX), jnp.float32)

    series = MassSeries(DPIE(), "r_cut", "theta_E", order=3)
    series.set_constants(dict(r_cut=1.5, r_core=0.08, e1=0.05, e2=-0.03,
                              center_x=0.1, center_y=-0.2, theta_E=1.0))
    series.set_grid(x, y)
    series.set_deriv()

    phys = PhysicalModel([series, Shear()], [], [SersicEllipse()])
    spec = fb.build_spec(phys)
    assert spec is not None and len(spec.extra_providers) == 1
    extras = spec.gather_extras(x, y)
    assert extras is not None

    params = _rand_params(phys, BS, rng)
    params["lens_mass"][0] = dict(
        r_cut=jnp.asarray(rng.uniform(1.3, 1.7, BS), jnp.float32),
        theta_E=jnp.asarray(rng.uniform(0.5, 1.5, BS), jnp.float32),
    )
    got = fb.fused_render_sum(spec.pack(params), x, y, extras, spec, True)
    want = _unfused_flat(phys, params, x, y)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5 * scale, rtol=0)

    ct = jnp.asarray(rng.normal(size=(BS, NPIX)), jnp.float32)
    g_fused = jax.grad(lambda pk: jnp.sum(
        ct * fb.fused_render_sum(pk, x, y, extras, spec, True)))(spec.pack(params))
    g_ref = jax.grad(lambda pr: jnp.sum(ct * _unfused_flat(phys, pr, x, y)))(params)
    cols, mask = [], []
    for s_ in spec.pack_cols:
        if isinstance(s_, tuple):
            cols.append(jnp.reshape(g_ref[s_[0]][s_[1]][s_[2]], (-1,)))
            mask.append(1.0)
        else:
            cols.append(jnp.zeros(BS))
            mask.append(0.0)
    g_ref_m = jnp.stack(cols, -1)
    mask = jnp.asarray(mask)
    scale = float(jnp.max(jnp.abs(g_ref_m)))
    np.testing.assert_allclose(np.asarray(g_fused * mask),
                               np.asarray(g_ref_m * mask),
                               atol=5e-5 * scale, rtol=0)


def test_simulator_dispatch_and_full_pipeline():
    """End-to-end through LensSimulator: fused spec render == unfused render
    after PSF + pooling, for both summed and lstsq modes."""
    psf = np.ones((5, 5), np.float32) / 25.0
    cfg_f = SimulatorConfig(delta_pix=0.065, num_pix=40, supersample=2,
                            kernel=psf, use_fused_render=True)
    cfg_u = dataclasses.replace(cfg_f, use_fused_render=False)
    rng = np.random.default_rng(3)

    phys = PhysicalModel([EPL(18), Shear()], [SersicEllipse()], [Shapelets(4)])
    sf = LensSimulator(phys, cfg_f, bs=BS)
    su = LensSimulator(phys, cfg_u, bs=BS)
    assert sf._fused_spec is not None
    params = _rand_params(phys, BS, rng)
    a, b = sf.simulate(params), su.simulate(params)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4 * float(jnp.max(jnp.abs(b))), rtol=0)

    phys2 = PhysicalModel([EPL(18), Shear()], [SersicEllipse(use_lstsq=True)],
                          [Shapelets(4, use_lstsq=True)])
    sf2 = LensSimulator(phys2, cfg_f, bs=BS)
    su2 = LensSimulator(phys2, cfg_u, bs=BS)
    params2 = _rand_params(phys2, BS, rng)
    obs = np.abs(rng.normal(1, 0.5, (40, 40))).astype(np.float32)
    err = np.full((40, 40), 0.1, np.float32)
    a2 = sf2.lstsq_simulate(params2, obs, err)
    b2 = su2.lstsq_simulate(params2, obs, err)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                               atol=5e-4 * float(jnp.max(jnp.abs(b2))), rtol=0)


def test_cluster_scene_through_simulator():
    """The flagship cluster composition — NFW_ELLIPSE halo + series-expanded
    member population + shapelet source — renders fused after the member
    precompute, matching the unfused path (reference counterpart:
    ``scaling_relation.py:50-108`` + series kernels)."""
    from gigalens_tpu.profiles.mass.dpie_subhalo import DPIESubhaloSeries
    from gigalens_tpu.profiles.mass.nfw import NFW_ELLIPSE

    rng = np.random.default_rng(7)
    G = 12
    catalogue = dict(
        lum=rng.uniform(0.3, 3.0, G).astype(np.float32),
        center_x=rng.normal(0, 8.0, G).astype(np.float32),
        center_y=rng.normal(0, 8.0, G).astype(np.float32),
        e1=rng.uniform(-0.2, 0.2, G).astype(np.float32),
        e2=rng.uniform(-0.2, 0.2, G).astype(np.float32),
    )
    members = DPIESubhaloSeries(lum_star=1.0, galaxy_catalogue=catalogue,
                                chunk_size=G)
    phys = PhysicalModel([NFW_ELLIPSE(), members], [], [Shapelets(3)])
    cfg_f = SimulatorConfig(delta_pix=0.2, num_pix=32, supersample=2,
                            use_fused_render=True)
    cfg_u = dataclasses.replace(cfg_f, use_fused_render=False)
    sf = LensSimulator(phys, cfg_f, bs=BS)
    su = LensSimulator(phys, cfg_u, bs=BS)
    assert sf._fused_spec is not None and len(sf._fused_spec.extra_providers) == 1

    params = _rand_params(phys, BS, rng)
    params["lens_mass"][1] = dict(
        theta_E=jnp.asarray(rng.uniform(0.2, 0.4, BS), jnp.float32),
        r_cut=jnp.asarray(rng.uniform(1.2, 1.8, BS), jnp.float32),
    )
    members.set_constants(dict(theta_E=0.3, r_core=0.08, r_cut=1.5))
    # before precompute the provider returns None -> unfused (exact) fallback
    assert sf._fused_spec.gather_extras(sf.img_x, sf.img_y) is None
    a0 = sf.simulate(params)

    members.set_grid(sf.img_x, sf.img_y)
    members.set_deriv()
    assert sf._fused_spec.gather_extras(sf.img_x, sf.img_y) is not None

    a = sf.simulate(params)
    b = su.simulate(params)
    scale = float(jnp.max(jnp.abs(b)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-3 * scale, rtol=0)
    # the pre-precompute (unfused-fallback) render agrees too
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b),
                               atol=1e-3 * scale, rtol=0)
