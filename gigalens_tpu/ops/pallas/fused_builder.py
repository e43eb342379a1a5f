"""Composable fused-render kernel builder (Pallas TPU).

Generalizes the hand-tuned benchmark kernel (:mod:`.fused_render`, which
remains the fast path for its exact [EPL|SIE, Shear] + Sersic pattern) to
arbitrary compositions of supported profiles: the builder walks a
``PhysicalModel``, assigns each profile a column range in one packed
``(bs, n_cols)`` parameter matrix, and assembles per-profile *tile
functions* into a single Pallas kernel computing

    alpha = sum of mass-stage deflections        (EPL series, SIE, SIS, shear)
    beta  = x - alpha
    out   = sum lens-light(x) + sum source-light(beta)

for an (8-sample, pixel-tile) grid cell held in VMEM — one HBM write per
output element, like the specialized kernel (reference counterpart of the
unfused chain: ``src/gigalens/jax/simulator.py:96-130``).

Two output modes:

* **summed** (all profiles carry their own amplitudes): one ``(bs, P)``
  surface-brightness array — drop-in for ``LensSimulator._flat_light``.
* **stacked** (all light profiles ``use_lstsq``): ``depth`` per-component
  arrays for the weighted-least-squares amplitude solve
  (``LensSimulator.lstsq_simulate``; reference ``jax/simulator.py:150-191``).

Gradients: a generic custom VJP whose backward kernel recomputes the tile
forward under ``jax.vjp``. The EPL angular series crosses a custom-VJP
boundary (:func:`gigalens_tpu.profiles.mass.epl._omega_cs_bwd`) so its
backward is the O(1)-memory regeneration loop, not an unrolled-transpose —
without this the VJP of a 20-60x unrolled series would materialize every
iterate per tile and blow VMEM. Unlike the specialized kernel there are no
Omega residual outputs; the recompute costs one extra series loop in the
backward kernel and saves 2x ``(bs, P)`` of HBM round-trip.

Fixed constants are baked as extra packed columns (broadcast at pack time),
so models with frozen parameters fuse too; their gradient columns are
computed and discarded by the packing VJP.

Everything here is inverse-trig-free and uses only Mosaic-lowerable
primitives (see :mod:`._math`).
"""
from __future__ import annotations

import functools
import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gigalens_tpu.ops.pallas._math import (
    atan2 as _atan2,
    half_angle as _half_angle,
    powp as _powp,
)
from gigalens_tpu.profiles.mass.epl import _omega_cs_bwd, _omega_cs_impl

S_BLK = 8        # samples per block: one native f32 sublane tile
_LANE = 128      # params row padded to whole lane vectors
_VMEM_BUDGET = 6 * 1024 * 1024  # working-set target per grid cell (of ~16MB)


@functools.lru_cache(maxsize=None)
def _omega_unrolled(niter: int):
    """EPL angular series with full loop unroll and the O(1)-memory VJP.

    Kernel-local variant of ``epl._omega_cs``: Mosaic supports only
    ``unroll=1`` or full, and full keeps the loop carries in vector
    registers (measured 2.2x on v5e)."""
    unroll = max(niter - 1, 1)

    @jax.custom_vjp
    def om(ct, st, f, t):
        return _omega_cs_impl(ct, st, f, t, niter, unroll=unroll)

    def fwd(ct, st, f, t):
        return om(ct, st, f, t), (ct, st, f, t)

    def bwd(res, ct_out):
        return _omega_cs_bwd(niter, res, ct_out, unroll=unroll)

    om.defvjp(fwd, bwd)
    return om


def _cols(p, off, n):
    """n consecutive (S_BLK, 1) parameter columns starting at ``off``."""
    return [p[:, off + i: off + i + 1] for i in range(n)]


# ---------------------------------------------------------------------------
# mass tile stages: (params_block, x, y) -> (alpha_x, alpha_y)
# ---------------------------------------------------------------------------

def _epl_deflect(p, x, y, *, off, niter):
    te, gam, e1, e2, cx, cy = _cols(p, off, 6)
    cp, sp = _half_angle(e1, e2)
    c = jnp.minimum(jnp.sqrt(e1**2 + e2**2 + 1e-24), 1.0)
    q = (1.0 - c) / (1.0 + c)
    dx, dy = x - cx, y - cy
    xr = dx * cp + dy * sp
    yr = -dx * sp + dy * cp
    R = jnp.clip(jnp.sqrt((q * xr) ** 2 + yr**2), 1e-10, 1e10)
    t = gam - 1.0
    ox, oy = _omega_unrolled(niter)(q * xr / R, yr / R, (1.0 - q) / (1.0 + q), t)
    b = te * jnp.sqrt(q)
    pref = (2.0 * b) / (1.0 + q) * _powp(b / R, t - 1.0)
    ax_r, ay_r = pref * ox, pref * oy
    return ax_r * cp - ay_r * sp, ax_r * sp + ay_r * cp


def _sis_deflect(p, x, y, *, off):
    te, cx, cy = _cols(p, off, 3)
    dx, dy = x - cx, y - cy
    R = jnp.clip(jnp.sqrt(dx**2 + dy**2), 1e-10, 1e10)
    return te * dx / R, te * dy / R


def _shear_deflect(p, x, y, *, off):
    g1, g2 = _cols(p, off, 2)
    return g1 * x + g2 * y, g2 * x - g1 * y


def _nfw_g_tile(x):
    """Kernel-safe Wright & Brainerd g(x): arccosh(1/x) = log((1+sqrt(1-x^2))/x)
    for x < 1, arccos(1/x) = atan2(sqrt(x^2-1), 1) for x > 1, and the
    two-sided Taylor series inside the float32 cancellation band at the
    branch point (coefficients from profiles/mass/nfw.py)."""
    x = jnp.maximum(x, 1e-6)
    near = jnp.abs(x - 1.0) < 0.03
    small = x < 0.05  # f32 cancellation region, see profiles/mass/nfw.py
    x_lo = jnp.where(x < 1, x, 0.5)
    x_hi = jnp.where(x > 1, x, 2.0)
    s_lo = jnp.sqrt(jnp.maximum(1.0 - x_lo**2, 1e-12))
    lo = jnp.log(x / 2.0) + jnp.log((1.0 + s_lo) / x_lo) / s_lo
    s_hi = jnp.sqrt(jnp.maximum(x_hi**2 - 1.0, 1e-12))
    hi = jnp.log(x / 2.0) + _atan2(s_hi, jnp.ones_like(s_hi)) / s_hi
    t = x - 1.0
    series = 0.30685281944005469 + t * (
        1 / 3 + t * (-1 / 30 + t * (-1 / 105 + t * (17 / 1260))))
    L = jnp.log(2.0 / x)
    small_series = x**2 * (0.5 * L - 0.25) + x**4 * (0.375 * L - 7.0 / 32.0)
    return jnp.where(
        small, small_series, jnp.where(near, series, jnp.where(x < 1, lo, hi))
    )


def _nfw_alpha_radial(R, Rs, rho0, ax_x, ax_y):
    R = jnp.maximum(R, 1e-7)
    Rs = jnp.maximum(Rs, 1e-7)
    xh = R / Rs
    a = 4.0 * rho0 * Rs * _nfw_g_tile(xh) / xh**2
    return a * ax_x, a * ax_y


def _nfw_deflect(p, x, y, *, off):
    Rs, alpha_Rs, cx, cy = _cols(p, off, 4)
    rho0 = alpha_Rs / (4.0 * Rs**2 * (1.0 - float(np.log(2.0))))
    dx, dy = x - cx, y - cy
    R = jnp.sqrt(dx**2 + dy**2)
    return _nfw_alpha_radial(R, Rs, rho0, dx, dy)


def _nfw_e_deflect(p, x, y, *, off):
    """NFW_ELLIPSE: coordinate-stretched spherical NFW
    (profiles/mass/nfw.py:152-163), inverse-trig-free."""
    Rs, alpha_Rs, e1, e2, cx, cy = _cols(p, off, 6)
    rho0 = alpha_Rs / (4.0 * Rs**2 * (1.0 - float(np.log(2.0))))
    cp, sp = _half_angle(e1, e2)
    c = jnp.minimum(jnp.sqrt(e1**2 + e2**2 + 1e-24), 0.9999)
    q = (1.0 - c) / (1.0 + c)
    e = jnp.abs(1.0 - q**2) / (1.0 + q**2)
    dx, dy = x - cx, y - cy
    xr = dx * cp + dy * sp
    yr = -dx * sp + dy * cp
    xs, ys = xr * jnp.sqrt(1.0 - e), yr * jnp.sqrt(1.0 + e)
    R = jnp.sqrt(xs**2 + ys**2)
    fx, fy = _nfw_alpha_radial(R, Rs, rho0, xs, ys)
    fx = fx * jnp.sqrt(1.0 - e)
    fy = fy * jnp.sqrt(1.0 + e)
    return fx * cp - fy * sp, fx * sp + fy * cp


def _series_deflect(p, x, y, extra, *, off, order):
    """Taylor-series deflection: amp * sum_n dv^n/n! * G_n(pixel tile).

    ``extra``: (rows, PIX_BLK) tile of the precomputed coefficient grids,
    rows [0:order+1] = alpha_x coefficients, [order+1:2(order+1)] = alpha_y
    (padded to a sublane multiple). The dv = var - var0 shift is computed at
    pack time so var0 (a device scalar) never enters the kernel."""
    dv, amp = _cols(p, off, 2)
    k = order + 1
    ax = jnp.zeros_like(x * dv)
    ay = jnp.zeros_like(ax)
    wn = jnp.ones_like(dv)
    for n in range(k):
        if n:
            wn = wn * dv / float(n)
        ax = ax + wn * extra[n: n + 1, :]
        ay = ay + wn * extra[k + n: k + n + 1, :]
    return amp * ax, amp * ay


# ---------------------------------------------------------------------------
# light tile stages: (params_block, x, y) -> tuple of (S_BLK, PIX_BLK)
# components (one per linear depth; amplitude-scaled total when not lstsq)
# ---------------------------------------------------------------------------

def _sersic_shape(x, y, R_s, n_s, e1, e2, cx, cy):
    cp, sp = _half_angle(e1, e2)
    c = jnp.sqrt(e1**2 + e2**2 + 1e-24)
    q = (1.0 - c) / (1.0 + c)
    dx, dy = x - cx, y - cy
    xt1 = (cp * dx + sp * dy) * jnp.sqrt(q)
    xt2 = (-sp * dx + cp * dy) / jnp.sqrt(q)
    R = jnp.sqrt(xt1**2 + xt2**2)
    bn = 1.9992 * n_s - 0.3271
    return jnp.exp(-bn * (_powp(R / R_s, 1.0 / n_s) - 1.0))


def _sersic_e_light(p, x, y, *, off, lstsq):
    R_s, n_s, e1, e2, cx, cy = _cols(p, off, 6)
    shape = _sersic_shape(x, y, R_s, n_s, e1, e2, cx, cy)
    if lstsq:
        return (shape,)
    Ie = p[:, off + 6: off + 7]
    return (Ie * shape,)


def _sersic_light(p, x, y, *, off, lstsq):
    R_s, n_s, cx, cy = _cols(p, off, 4)
    z = jnp.zeros_like(R_s)
    shape = _sersic_shape(x, y, R_s, n_s, z, z, cx, cy)
    if lstsq:
        return (shape,)
    Ie = p[:, off + 4: off + 5]
    return (Ie * shape,)


def _core_sersic_light(p, x, y, *, off, lstsq):
    R_s, n_s, Rb, alpha, gamma, e1, e2, cx, cy = _cols(p, off, 9)
    cp, sp = _half_angle(e1, e2)
    c = jnp.sqrt(e1**2 + e2**2 + 1e-24)
    q = (1.0 - c) / (1.0 + c)
    dx, dy = x - cx, y - cy
    xt1 = (cp * dx + sp * dy) * jnp.sqrt(q)
    xt2 = (-sp * dx + cp * dy) / jnp.sqrt(q)
    R = jnp.clip(jnp.sqrt(xt1**2 + xt2**2), 1e-10, 1e10)
    bn = 1.9992 * n_s - 0.3271
    u = (_powp(R, alpha) + _powp(Rb, alpha)) / _powp(R_s, alpha)
    shape = _powp(1.0 + _powp(Rb / R, alpha), gamma / alpha) * jnp.exp(
        -bn * (_powp(u, 1.0 / (alpha * n_s)) - 1.0)
    )
    if lstsq:
        return (shape,)
    Ie = p[:, off + 9: off + 10]
    return (Ie * shape,)


def _shapelet_components(p, x, y, *, off, n_max, prefactor, n1, n2, lstsq):
    """Cartesian shapelet basis via the Hermite recurrence, unrolled in
    Python (n_max static) so every H_n tile stays a register/VMEM value."""
    beta, cx, cy = _cols(p, off, 3)
    u = (x - cx) / beta
    v = (y - cy) / beta
    gauss = jnp.exp(-(u**2 + v**2) / 2.0)

    def hermites(w):
        hs = [jnp.ones_like(w)]
        if n_max >= 1:
            hs.append(2.0 * w)
        for n in range(1, n_max):
            hs.append(2.0 * (w * hs[n] - n * hs[n - 1]))
        return [float(prefactor[k]) * h for k, h in enumerate(hs)]

    hu, hv = hermites(u), hermites(v)
    comps = tuple(gauss * hu[a] * hv[b] for a, b in zip(n1, n2))
    if lstsq:
        return comps
    L = len(comps)
    total = 0.0
    for k in range(L):
        total = total + p[:, off + 3 + k: off + 4 + k] * comps[k]
    return (total,)


# ---------------------------------------------------------------------------
# spec construction
# ---------------------------------------------------------------------------

class FusedSpec:
    """A compiled plan: column layout + tile functions for one model.

    Hashed by identity (one instance is built and cached per simulator);
    the pallas_call closures treat it as a static argument.
    """

    def __init__(self, mass_fns, light_fns, pack_cols, n_cols, depth,
                 all_lstsq, any_lstsq, label, extra_providers=()):
        # mass_fns: [(fn, extra_idx | None)]; fn(p, x, y[, extra_tile])
        self.mass_fns = mass_fns
        self.light_fns = light_fns        # [(is_source, fn(p, x, y) -> comps)]
        # pack_cols: [(group, prof_idx, name) | float |
        #             (group, prof_idx, name, transform)]
        self.pack_cols = pack_cols
        self.n_cols = n_cols
        self.n_pad = -(-n_cols // _LANE) * _LANE
        self.depth = depth                # total stacked components
        self.all_lstsq = all_lstsq
        self.any_lstsq = any_lstsq
        self.label = label
        # per-stage runtime pixel grids (e.g. Taylor coefficient grids whose
        # values exist only after the profile's precompute): callables
        # (img_x, img_y) -> (rows, npix) f32 array, or None when not ready
        # (the dispatch site then falls back to the unfused path)
        self.extra_providers = list(extra_providers)
        # pixel tile sized to keep the (deeper) backward working set in
        # VMEM: ~constant live tiles for geometry + one per component
        est_tiles = 24 + 2 * depth
        blk = int(_VMEM_BUDGET / (est_tiles * S_BLK * 4))
        self.pix_blk = max(256, min(2560, (blk // _LANE) * _LANE))

    def gather_extras(self, img_x, img_y):
        """Evaluate every provider; returns a tuple of arrays or None if any
        stage's grids are unavailable (caller falls back to unfused)."""
        out = []
        for prov in self.extra_providers:
            arr = prov(img_x, img_y)
            if arr is None:
                return None
            out.append(jnp.asarray(arr, jnp.float32))
        return tuple(out)

    # -- packing -----------------------------------------------------------
    def pack(self, params_dict):
        """Packed (bs, n_cols) matrix from the standard nested params dict
        (constants appear as baked float columns)."""
        groups = {
            "lens_mass": params_dict.get("lens_mass", []),
            "lens_light": params_dict.get("lens_light", []),
            "source_light": params_dict.get("source_light", []),
        }
        cols = []
        bs_leaf = None
        for spec in self.pack_cols:
            if isinstance(spec, tuple):
                g, i, name = spec[:3]
                leaf = jnp.reshape(jnp.asarray(groups[g][i][name]), (-1,))
                if len(spec) == 4:  # column transform (e.g. series dv shift)
                    leaf = spec[3](leaf)
                bs_leaf = leaf
                cols.append(leaf)
            else:
                cols.append(spec)  # float placeholder, broadcast below
        assert bs_leaf is not None
        cols = [
            jnp.broadcast_to(jnp.asarray(c, jnp.float32), bs_leaf.shape)
            if not hasattr(c, "shape") or c.shape != bs_leaf.shape else c
            for c in cols
        ]
        return jnp.stack(cols, axis=-1)

    def tile_forward(self, p, x, y, extras=()):
        """(S_BLK, n_pad) params x (1, PIX_BLK) coords -> component tuple."""
        ax = ay = 0.0
        for fn, eidx in self.mass_fns:
            if eidx is None:
                dax, day = fn(p, x, y)
            else:
                dax, day = fn(p, x, y, extras[eidx])
            ax, ay = ax + dax, ay + day
        bx, by = x - ax, y - ay
        comps = []
        for is_source, fn in self.light_fns:
            comps.extend(fn(p, bx, by) if is_source else fn(p, x, y))
        return tuple(comps)


def build_spec(phys_model) -> Optional[FusedSpec]:
    """Assemble a FusedSpec for ``phys_model``, or None when any profile
    (or model feature: multi-plane) has no tile stage."""
    from gigalens_tpu.profiles.light.sersic import CoreSersic, Sersic, SersicEllipse
    from gigalens_tpu.profiles.light.shapelets import Shapelets
    from gigalens_tpu.profiles.mass.epl import EPL
    from gigalens_tpu.profiles.mass.nfw import NFW, NFW_ELLIPSE
    from gigalens_tpu.profiles.mass.series import MassSeries
    from gigalens_tpu.profiles.mass.shear import Shear
    from gigalens_tpu.profiles.mass.sie import SIE, SIS

    if getattr(phys_model, "mp_factors", None) is not None:
        return None

    pack_cols: list = []
    mass_fns: list = []
    light_fns: list = []
    extra_providers: list = []
    names = []

    def add_cols(group, idx, prof, constants, param_names):
        """Column per param name: fit params reference the dict, constants
        bake their float value. Returns the starting offset."""
        off = len(pack_cols)
        for name in param_names:
            if name in constants:
                pack_cols.append(float(constants[name]))
            else:
                pack_cols.append((group, idx, name))
        return off

    for i, (prof, consts) in enumerate(
        zip(phys_model.lenses, phys_model.lenses_constants)
    ):
        if type(prof) is EPL:
            off = add_cols("lens_mass", i, prof, consts,
                           ["theta_E", "gamma", "e1", "e2", "center_x", "center_y"])
            mass_fns.append((functools.partial(
                _epl_deflect, off=off, niter=prof.niter), None))
        elif type(prof) is SIE:
            # exact EPL special case at gamma = 2 (constant column)
            off = len(pack_cols)
            pack_cols.append(("lens_mass", i, "theta_E"))
            pack_cols.append(2.0)
            for nm in ["e1", "e2", "center_x", "center_y"]:
                pack_cols.append(
                    float(consts[nm]) if nm in consts else ("lens_mass", i, nm))
            niter = EPL.recommended_niter(q_min=0.43, tol=1e-8)
            mass_fns.append((functools.partial(
                _epl_deflect, off=off, niter=niter), None))
        elif type(prof) is SIS:
            off = add_cols("lens_mass", i, prof, consts,
                           ["theta_E", "center_x", "center_y"])
            mass_fns.append((functools.partial(_sis_deflect, off=off), None))
        elif type(prof) is Shear:
            off = add_cols("lens_mass", i, prof, consts, ["gamma1", "gamma2"])
            mass_fns.append((functools.partial(_shear_deflect, off=off), None))
        elif type(prof) is NFW:
            off = add_cols("lens_mass", i, prof, consts,
                           ["Rs", "alpha_Rs", "center_x", "center_y"])
            mass_fns.append((functools.partial(_nfw_deflect, off=off), None))
        elif type(prof) is NFW_ELLIPSE:
            off = add_cols("lens_mass", i, prof, consts,
                           ["Rs", "alpha_Rs", "e1", "e2", "center_x", "center_y"])
            mass_fns.append((functools.partial(_nfw_e_deflect, off=off), None))
        elif isinstance(prof, MassSeries):
            # Taylor-series stage (cluster members etc.): the dv = var - var0
            # shift happens at pack time (var0 is profile state), the
            # coefficient grids arrive as a runtime pixel input — available
            # only after set_grid/set_deriv, checked per dispatch
            if prof.series_param in consts or prof.amplitude_param in consts:
                return None
            off = len(pack_cols)
            pack_cols.append((
                "lens_mass", i, prof.series_param,
                (lambda v, prof=prof: v - prof._series_var_0),
            ))
            pack_cols.append(("lens_mass", i, prof.amplitude_param))
            k = prof.order + 1

            def _coef_provider(img_x, img_y, prof=prof, k=k):
                if prof._deriv_coefs is None or not prof._on_grid(img_x):
                    return None
                # (k, 2, npix) -> (2, k, npix) -> rows [0:k]=alpha_x coefs,
                # [k:2k]=alpha_y coefs, as _series_deflect expects
                g = jnp.reshape(
                    jnp.swapaxes(prof._deriv_coefs, 0, 1), (k * 2, -1))
                rows = -(-2 * k // S_BLK) * S_BLK
                if rows != 2 * k:
                    g = jnp.pad(g, ((0, rows - 2 * k), (0, 0)))
                return g

            extra_providers.append(_coef_provider)
            mass_fns.append((
                functools.partial(_series_deflect, off=off, order=prof.order),
                len(extra_providers) - 1,
            ))
        else:
            return None
        names.append(type(prof).__name__)

    depth = 0
    lstsq_flags = []

    def add_light(group, idx, prof, consts, is_source):
        nonlocal depth
        lstsq = bool(prof.use_lstsq)
        lstsq_flags.append(lstsq)
        if type(prof) is SersicEllipse:
            pnames = ["R_sersic", "n_sersic", "e1", "e2", "center_x", "center_y"]
            if not lstsq:
                pnames.append("Ie")
            off = add_cols(group, idx, prof, consts, pnames)
            light_fns.append((is_source, functools.partial(
                _sersic_e_light, off=off, lstsq=lstsq)))
            depth += 1
        elif type(prof) is Sersic:
            pnames = ["R_sersic", "n_sersic", "center_x", "center_y"]
            if not lstsq:
                pnames.append("Ie")
            off = add_cols(group, idx, prof, consts, pnames)
            light_fns.append((is_source, functools.partial(
                _sersic_light, off=off, lstsq=lstsq)))
            depth += 1
        elif type(prof) is CoreSersic:
            pnames = ["R_sersic", "n_sersic", "Rb", "alpha", "gamma",
                      "e1", "e2", "center_x", "center_y"]
            if not lstsq:
                pnames.append("Ie")
            off = add_cols(group, idx, prof, consts, pnames)
            light_fns.append((is_source, functools.partial(
                _core_sersic_light, off=off, lstsq=lstsq)))
            depth += 1
        elif type(prof) is Shapelets:
            pnames = ["beta", "center_x", "center_y"]
            if not lstsq:
                pnames = pnames + list(prof._amp_names)
            off = add_cols(group, idx, prof, consts, pnames)
            pf = np.asarray(prof._prefactor, np.float64)
            light_fns.append((is_source, functools.partial(
                _shapelet_components, off=off, n_max=prof.n_max,
                prefactor=tuple(pf), n1=tuple(int(v) for v in prof._n1),
                n2=tuple(int(v) for v in prof._n2), lstsq=lstsq)))
            depth += prof.n_layers
        else:
            return False
        names.append(type(prof).__name__ + ("[lstsq]" if lstsq else ""))
        return True

    for i, (prof, consts) in enumerate(
        zip(phys_model.lens_light, phys_model.lens_light_constants)
    ):
        if not add_light("lens_light", i, prof, consts, False):
            return None
    for i, (prof, consts) in enumerate(
        zip(phys_model.source_light, phys_model.source_light_constants)
    ):
        if not add_light("source_light", i, prof, consts, True):
            return None

    if not light_fns:
        return None
    all_lstsq = all(lstsq_flags)
    any_lstsq = any(lstsq_flags)
    if any_lstsq and not all_lstsq:
        # mixed linear/sampled amplitudes never reach the stacked solver
        # as one batch; keep the unfused path for clarity
        return None
    return FusedSpec(mass_fns, light_fns, pack_cols, len(pack_cols), depth,
                     all_lstsq, any_lstsq, "+".join(names),
                     extra_providers=extra_providers)


# ---------------------------------------------------------------------------
# pallas dispatch
# ---------------------------------------------------------------------------

def _prep(spec, params, x, y, extras=()):
    bs = params.shape[0]
    if params.shape[1] != spec.n_pad:
        params = jnp.pad(params, ((0, 0), (0, spec.n_pad - params.shape[1])))
    n_sblk = -(-bs // S_BLK)
    bs_p = n_sblk * S_BLK
    if bs_p != bs:
        params = jnp.concatenate(
            [params, jnp.broadcast_to(params[-1:], (bs_p - bs, spec.n_pad))]
        )
    P = x.shape[0]
    blk = spec.pix_blk
    n_tiles = -(-P // blk)
    Pp = n_tiles * blk
    if Pp != P:
        # pad far from any plausible profile center (see fused_render._prep:
        # a zero-radius padded pixel NaN-poisons the backward reduction)
        x = jnp.pad(x, (0, Pp - P), constant_values=1e6)
        y = jnp.pad(y, (0, Pp - P), constant_values=1e6)
        # runtime grids pad with zeros: their stages contribute 0 there
        extras = tuple(jnp.pad(e, ((0, 0), (0, Pp - P))) for e in extras)
    return (bs, bs_p, n_sblk, P, n_tiles, Pp, x.reshape(1, Pp),
            y.reshape(1, Pp), params, extras)


def _extra_specs(extras, blk):
    return [
        pl.BlockSpec((e.shape[0], blk), lambda b, p: (0, p),
                     memory_space=pltpu.VMEM)
        for e in extras
    ]


def _fwd_call(spec, params_p, xp, yp, extras_p, n_sblk, n_tiles, bs_p, Pp,
              interpret, summed):
    blk = spec.pix_blk
    n_out = 1 if summed else spec.depth
    n_extra = len(extras_p)

    def kernel(params_ref, x_ref, y_ref, *refs):
        extra_refs, out_refs = refs[:n_extra], refs[n_extra:]
        p, x, y = params_ref[:], x_ref[:], y_ref[:]
        comps = spec.tile_forward(p, x, y, tuple(r[:] for r in extra_refs))
        if summed:
            total = 0.0
            for c in comps:
                total = total + c
            out_refs[0][:] = total
        else:
            for r, c in zip(out_refs, comps):
                r[:] = c

    ob = pl.BlockSpec((S_BLK, blk), lambda b, p: (b, p), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_sblk, n_tiles),
        in_specs=[
            pl.BlockSpec((S_BLK, spec.n_pad), lambda b, p: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, p: (0, p), memory_space=pltpu.VMEM),
        ] + _extra_specs(extras_p, blk),
        out_specs=[ob] * n_out,
        out_shape=[jax.ShapeDtypeStruct((bs_p, Pp), jnp.float32)] * n_out,
        interpret=interpret,
    )(params_p, xp, yp, *extras_p)
    return out


def _bwd_call(spec, params_p, xp, yp, extras_p, cts_p, n_sblk, n_tiles, bs_p,
              Pp, interpret, summed):
    blk = spec.pix_blk
    n_out = 1 if summed else spec.depth
    n_extra = len(extras_p)

    def kernel(params_ref, x_ref, y_ref, *refs):
        extra_refs = refs[:n_extra]
        ct_refs, gp_ref = refs[n_extra:-1], refs[-1]
        p, x, y = params_ref[:], x_ref[:], y_ref[:]
        extras = tuple(r[:] for r in extra_refs)

        def f(pp):
            comps = spec.tile_forward(pp, x, y, extras)
            if summed:
                total = 0.0
                for c in comps:
                    total = total + c
                return (total,)
            return comps

        _, vjp = jax.vjp(f, p)
        (gp,) = vjp(tuple(r[:] for r in ct_refs))
        gp_ref[:] = gp

    ob = pl.BlockSpec((S_BLK, blk), lambda b, p: (b, p), memory_space=pltpu.VMEM)
    gp = pl.pallas_call(
        kernel,
        grid=(n_sblk, n_tiles),
        in_specs=[
            pl.BlockSpec((S_BLK, spec.n_pad), lambda b, p: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, p: (0, p), memory_space=pltpu.VMEM),
        ] + _extra_specs(extras_p, blk) + [ob] * n_out,
        # per-tile parameter gradients; the tile sum happens outside the
        # kernel (revisited-block accumulation miscompiled on real hardware
        # — see fused_render._bwd_kernel)
        out_specs=pl.BlockSpec((S_BLK, spec.n_pad), lambda b, p: (b, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs_p, n_tiles * spec.n_pad), jnp.float32),
        interpret=interpret,
    )(params_p, xp, yp, *extras_p, *cts_p)
    return gp.reshape(bs_p, n_tiles, spec.n_pad).sum(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_render_sum(params, x, y, extras, spec: FusedSpec,
                     interpret: bool = False):
    """Total surface brightness via the composed kernel.

    params: (bs, spec.n_cols); x, y: (P,); extras: tuple of runtime pixel
    grids from ``spec.gather_extras`` -> (bs, P)."""
    (bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, pp, ex) = _prep(
        spec, params, x, y, extras)
    (out,) = _fwd_call(spec, pp, xp, yp, ex, n_sblk, n_tiles, bs_p, Pp,
                       interpret, summed=True)
    return out[:bs, :P]


def _sum_fwd(params, x, y, extras, spec, interpret):
    return (fused_render_sum(params, x, y, extras, spec, interpret),
            (params, x, y, extras))


def _sum_bwd(spec, interpret, res, ct):
    params, x, y, extras = res
    (bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, pp, ex) = _prep(
        spec, params, x, y, extras)
    ct_p = jnp.zeros((bs_p, Pp), ct.dtype).at[:bs, :P].set(ct)
    gp = _bwd_call(spec, pp, xp, yp, ex, [ct_p], n_sblk, n_tiles, bs_p, Pp,
                   interpret, summed=True)
    # coefficient grids are precomputed constants of the sampled parameters
    return (gp[:bs, :spec.n_cols], jnp.zeros_like(x), jnp.zeros_like(y),
            jax.tree_util.tree_map(jnp.zeros_like, extras))


fused_render_sum.defvjp(_sum_fwd, _sum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_render_components(params, x, y, extras, spec: FusedSpec,
                            interpret: bool = False):
    """Stacked per-component render for the lstsq amplitude solve.

    params: (bs, spec.n_cols); x, y: (P,) -> (depth, bs, P)."""
    (bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, pp, ex) = _prep(
        spec, params, x, y, extras)
    outs = _fwd_call(spec, pp, xp, yp, ex, n_sblk, n_tiles, bs_p, Pp,
                     interpret, summed=False)
    return jnp.stack([o[:bs, :P] for o in outs])


def _comp_fwd(params, x, y, extras, spec, interpret):
    return (fused_render_components(params, x, y, extras, spec, interpret),
            (params, x, y, extras))


def _comp_bwd(spec, interpret, res, ct):
    params, x, y, extras = res
    (bs, bs_p, n_sblk, P, n_tiles, Pp, xp, yp, pp, ex) = _prep(
        spec, params, x, y, extras)
    cts_p = [
        jnp.zeros((bs_p, Pp), ct.dtype).at[:bs, :P].set(ct[k])
        for k in range(spec.depth)
    ]
    gp = _bwd_call(spec, pp, xp, yp, ex, cts_p, n_sblk, n_tiles, bs_p, Pp,
                   interpret, summed=False)
    return (gp[:bs, :spec.n_cols], jnp.zeros_like(x), jnp.zeros_like(y),
            jax.tree_util.tree_map(jnp.zeros_like, extras))


fused_render_components.defvjp(_comp_fwd, _comp_bwd)
