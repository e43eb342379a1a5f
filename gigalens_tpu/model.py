"""Physical and probabilistic models.

Re-implements the reference's L3 layer (``src/gigalens/jax/model.py``) on the
pure-JAX probability stack in :mod:`gigalens_tpu.prob`:

  * :class:`PhysicalModel` — bundles mass/light profile lists + fixed constants.
  * :class:`ForwardProbModel` — pixel and/or multiple-image-position likelihood
    with the forward-modeled Gaussian+Poisson noise map.
  * :class:`BackwardProbModel` — observed-image noise map + linear-amplitude
    (lstsq) simulation.

All log-densities are computed on the unconstrained matrix ``z`` of shape
``(bs, d)``; ``prior.constrain(z)`` maps to the physical params pytree and the
Jacobian factor is added exactly as in the reference (``jax/model.py:135-137``).
Unlike the reference there is no stateful ``init_centroids`` requirement: the
batch-leading broadcasting makes position stats shape-agnostic (the method is
kept as a no-op for API familiarity).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gigalens_tpu.prob.prior import Prior
from gigalens_tpu.profiles.base import LightProfile, MassProfile

_LOG_2PI = math.log(2.0 * math.pi)


class VersionedAttrs:
    """Bumps ``self._version`` on every attribute rebind.

    The inference drivers cache compiled programs keyed on
    ``(object identity, _version)`` (``inference/hmc.py::_cached_log_prob_fn``,
    ``ModellingSequence._sim``), so rebinding an attribute between fits —
    e.g. ``pm.observed_image = new_img`` — invalidates the cached posterior
    instead of silently sampling against the stale baked-in data. In-place
    mutation of an attribute's NumPy buffer is not detected: treat attribute
    values as immutable (replace, don't edit)."""

    def __setattr__(self, name, value):
        object.__setattr__(self, name, value)
        object.__setattr__(self, "_version", getattr(self, "_version", 0) + 1)


class PhysicalModel(VersionedAttrs):
    """Deflector + light profile lists with optional fixed constants.

    Constants are per-profile dicts of parameters excluded from inference
    (reference: ``src/gigalens/model.py:36-44``). Constant leaves are converted
    to ``jnp`` arrays once, here.

    Multi-plane lensing (beyond the single-plane reference): pass
    ``lens_redshifts`` (one per deflector, ascending) plus ``z_source`` to
    ray-trace through deflectors at different distances — foreground
    deflections shift where rays pierce the background planes
    (``LensSimulator.beta`` runs the recursion; see
    :func:`gigalens_tpu.cosmology.multiplane_factors` for the convention —
    profiles keep their ordinary source-plane-reduced parameterization).
    Deflectors at equal redshift co-add exactly as in single-plane mode.
    """

    def __init__(
        self,
        lenses: List[MassProfile],
        lens_light: List[LightProfile],
        source_light: List[LightProfile],
        lenses_constants: Optional[List[Dict]] = None,
        lens_light_constants: Optional[List[Dict]] = None,
        source_light_constants: Optional[List[Dict]] = None,
        lens_redshifts=None,
        z_source: Optional[float] = None,
        cosmology=None,
    ):
        self.lenses = list(lenses)
        self.lens_light = list(lens_light)
        self.source_light = list(source_light)

        def _conv(consts, profiles):
            if consts is None:
                consts = [dict() for _ in profiles]
            return [{k: jnp.asarray(v) for k, v in d.items()} for d in consts]

        self.lenses_constants = _conv(lenses_constants, lenses)
        self.lens_light_constants = _conv(lens_light_constants, lens_light)
        self.source_light_constants = _conv(source_light_constants, source_light)

        if lens_redshifts is not None:
            from gigalens_tpu.cosmology import multiplane_factors

            if z_source is None:
                raise ValueError("lens_redshifts requires z_source")
            if len(lens_redshifts) != len(self.lenses):
                raise ValueError(
                    f"need one redshift per deflector: "
                    f"{len(lens_redshifts)} vs {len(self.lenses)} lenses"
                )
            self.mp_factors = multiplane_factors(
                lens_redshifts, z_source, cosmology
            ).astype(np.float32)
            self.lens_redshifts = [float(z) for z in lens_redshifts]
            self.z_source = float(z_source)
        else:
            self.mp_factors = None


# days per (Mpc * arcsec^2): the Fermat-potential -> time-delay conversion
# Delta_t = _TD_DAYS * D_dt[Mpc] * Delta_tau[arcsec^2]
_MPC_KM = 3.085677581491367e19
_ARCSEC_RAD = math.pi / (180.0 * 3600.0)
_TD_DAYS = _MPC_KM / 299792.458 * _ARCSEC_RAD**2 / 86400.0


class ForwardProbModel(VersionedAttrs):
    """Forward-modeled likelihood over pixels and/or multiple-image positions,
    optionally with point-source **time delays** and **image fluxes** (both
    beyond the reference — the lensed-quasar / time-delay-cosmography data
    products; see docs/pointsource.md)."""

    def __init__(
        self,
        prior: Prior,
        observed_image=None,
        background_rms=None,
        exp_time=None,
        error_map=None,
        centroids_x=None,
        centroids_y=None,
        centroids_errors_x=None,
        centroids_errors_y=None,
        include_pixels=None,
        include_positions=None,
        delays=None,
        delay_errors=None,
        time_delay_distance=None,
        z_lens=None,
        z_source=None,
        cosmology=None,
        image_fluxes=None,
        image_flux_errors=None,
    ):
        self.prior = prior
        # Auto-detect from the provided data unless explicitly toggled.
        if include_pixels is None:
            include_pixels = observed_image is not None or error_map is not None
        if include_positions is None:
            include_positions = centroids_x is not None
        self.include_pixels = bool(include_pixels)
        self.include_positions = bool(include_positions)
        self.include_delays = delays is not None
        self.include_fluxes = image_fluxes is not None

        self.observed_image = None
        self.error_map = None
        self.background_rms = None
        self.exp_time = None

        if self.include_pixels:
            self.observed_image = jnp.asarray(observed_image, jnp.float32)
            if error_map is not None:
                self.error_map = jnp.asarray(error_map, jnp.float32)
            else:
                self.background_rms = jnp.float32(background_rms)
                self.exp_time = jnp.float32(exp_time)

        if self.include_positions:
            self.centroids_x = [jnp.asarray(c, jnp.float32) for c in centroids_x]
            self.centroids_y = [jnp.asarray(c, jnp.float32) for c in centroids_y]
            self.centroids_errors_x = [
                jnp.asarray(c, jnp.float32) for c in centroids_errors_x
            ]
            self.centroids_errors_y = [
                jnp.asarray(c, jnp.float32) for c in centroids_errors_y
            ]
            self.n_position = 2 * int(
                sum(np.size(np.asarray(c)) for c in centroids_x)
            )
        else:
            self.n_position = 0

        if self.include_delays or self.include_fluxes:
            if centroids_x is None or len(centroids_x) != 1:
                raise ValueError(
                    "time delays / image fluxes attach to the observed image "
                    "positions: pass exactly one centroids group"
                )
            n_img = int(np.size(np.asarray(centroids_x[0])))
        if self.include_delays:
            self.delays = jnp.asarray(delays, jnp.float32).reshape(-1)
            self.delay_errors = jnp.asarray(
                delay_errors, jnp.float32
            ).reshape(-1)
            if self.delays.shape[0] != n_img - 1:
                raise ValueError(
                    f"delays are relative to the first image: expected "
                    f"{n_img - 1} values for {n_img} images, got "
                    f"{self.delays.shape[0]}"
                )
            # D_dt resolution order: explicit value; (z_lens, z_source) via
            # the cosmology; else sampled from a cosmo=[dict(D_dt=...)]
            # prior group at every likelihood call (H0 inference).
            if time_delay_distance is not None:
                self.time_delay_distance = float(time_delay_distance)
            elif z_lens is not None and z_source is not None:
                from gigalens_tpu.cosmology import FlatLambdaCDM

                cosmo = cosmology if cosmology is not None else FlatLambdaCDM()
                dl = cosmo.angular_diameter_distance(z_lens)
                ds = cosmo.angular_diameter_distance(z_source)
                dls = cosmo.angular_diameter_distance(z_lens, z_source)
                self.time_delay_distance = (1.0 + z_lens) * dl * ds / dls
            elif isinstance(prior.tree, dict) and "cosmo" in prior.tree:
                self.time_delay_distance = None  # sampled
            else:
                raise ValueError(
                    "delays need a time-delay distance: pass "
                    "time_delay_distance, or (z_lens, z_source), or sample "
                    "it via a cosmo=[dict(D_dt=...)] prior group"
                )
        if self.include_fluxes:
            self.image_fluxes = jnp.asarray(
                image_fluxes, jnp.float32
            ).reshape(-1)
            self.image_flux_errors = jnp.asarray(
                image_flux_errors, jnp.float32
            ).reshape(-1)
            if self.image_fluxes.shape[0] != n_img:
                raise ValueError(
                    f"expected {n_img} image fluxes, got "
                    f"{self.image_fluxes.shape[0]}"
                )

    # API-compat no-op (the reference pre-tiles centroid arrays per batch size;
    # batch-leading broadcasting makes that unnecessary here).
    def init_centroids(self, bs):
        return None

    def event_size(self, simulator) -> int:
        """Number of observed scalars; normalizes the MAP loss."""
        n = 0
        if self.include_pixels:
            n += simulator.n_live_pix
        if self.include_positions:
            n += self.n_position
        if self.include_delays:
            n += int(self.delays.shape[0])
        if self.include_fluxes:
            n += int(self.image_fluxes.shape[0])
        return n

    # ------------------------------------------------------------------
    def stats_pixels(self, simulator, params):
        """(log_like, reduced_chi2) of the pixel data for constrained params."""
        im_sim = simulator.simulate(params)  # (bs, H, W)
        if self.error_map is not None:
            err_map = self.error_map
        else:
            # model-based Poisson term, clipped at zero flux: profiles with
            # signed components (shapelets) can render pixels below
            # -background_rms^2 * exp_time, where an unclipped variance goes
            # negative and sqrt -> NaN poisons the whole posterior (caught by
            # the cluster full-posterior bench). The reference clips its
            # (observed-image) Poisson term the same way (jax/model.py:171).
            err_map = jnp.sqrt(
                self.background_rms**2
                + jnp.clip(im_sim, 0.0, np.inf) / self.exp_time
            )
        mask = simulator.img_region
        resid = (im_sim - self.observed_image) / err_map
        chi2 = jnp.sum(resid**2 * mask, axis=(-2, -1))
        normalization = jnp.sum(
            jnp.log(2 * np.pi * err_map**2) * mask, axis=(-2, -1)
        )
        log_like = -0.5 * (chi2 + normalization)
        red_chi2 = chi2 / simulator.n_live_pix
        return log_like, red_chi2

    def stats_positions(self, simulator, params):
        """(log_like, reduced_chi2) of multiple-image positions.

        Image-plane centroids are ray-traced to the source plane; spread about
        their barycentre is penalized with magnification-scaled errors
        (reference: ``jax/model.py:92-114``).
        """
        lens_params = params["lens_mass"]
        chi2 = 0.0
        log_like = 0.0
        for cx, cy, cex, cey in zip(
            self.centroids_x,
            self.centroids_y,
            self.centroids_errors_x,
            self.centroids_errors_y,
        ):
            beta_x, beta_y = simulator.beta(cx, cy, lens_params)  # (bs, n_img)
            beta = jnp.stack([beta_x, beta_y], axis=-2)  # (bs, 2, n_img)
            barycentre = jnp.mean(beta, axis=-1, keepdims=True)
            # err = centroid_err / |mu| = centroid_err * |det A|, computed
            # from the Hessian WITHOUT ever forming mu = 1/det: a candidate
            # lens putting a centroid on its critical curve has det = 0,
            # where 1/det is inf and even clip(|1/det|) leaves a 0 * inf NaN
            # in the backward pass. det itself is a finite polynomial of the
            # deflection Hessian, so clamping |det| gives finite value AND
            # gradient everywhere (the reference leaves this div-by-zero
            # open: jax/model.py:92-114, simulator.py:86). Bounds are far
            # outside any physical strong-lensing magnification.
            f_xx, f_xy, f_yx, f_yy = simulator.hessian(cx, cy, lens_params)
            det_a = (1 - f_xx) * (1 - f_yy) - f_xy * f_yx
            det_abs = jnp.clip(jnp.abs(det_a), 1e-3, 1e3)
            err = jnp.stack(
                [cex * det_abs, cey * det_abs], axis=-2
            )  # (bs, 2, n_img)
            chi2_i = jnp.sum(((beta - barycentre) / err) ** 2, axis=(-2, -1))
            norm_i = jnp.sum(jnp.log(2 * np.pi * err**2), axis=(-2, -1))
            log_like = log_like + (-0.5) * (chi2_i + norm_i)
            chi2 = chi2 + chi2_i
        red_chi2 = chi2 / self.n_position
        return log_like, red_chi2

    def stats_time_delays(self, simulator, params):
        """(log_like, reduced_chi2) of the relative time delays.

        Fermat potentials are evaluated at the observed image positions with
        the shared source position set to the ray-traced barycentre (the same
        convention as :meth:`stats_positions`); model delays are relative to
        the first image. ``D_dt`` is the baked value or, when sampled, read
        from ``params["cosmo"][0]["D_dt"]`` per sample.
        """
        cx, cy = self.centroids_x[0], self.centroids_y[0]
        lens_params = params["lens_mass"]
        beta_x, beta_y = simulator.beta(cx, cy, lens_params)  # (bs, n)
        bxm = jnp.mean(beta_x, axis=-1, keepdims=True)
        bym = jnp.mean(beta_y, axis=-1, keepdims=True)
        tau = simulator.fermat_potential(cx, cy, lens_params, bxm, bym)
        if self.time_delay_distance is not None:
            d_dt = jnp.float32(self.time_delay_distance)
        else:
            d_dt = jnp.reshape(params["cosmo"][0]["D_dt"], (-1, 1))
        dt_model = _TD_DAYS * d_dt * (tau[..., 1:] - tau[..., :1])
        resid = (dt_model - self.delays) / self.delay_errors
        chi2 = jnp.sum(resid**2, axis=-1)
        norm = jnp.sum(jnp.log(2 * np.pi * self.delay_errors**2))
        return -0.5 * (chi2 + norm), chi2 / self.delays.shape[0]

    def stats_fluxes(self, simulator, params):
        """(log_like, reduced_chi2) of the point-source image fluxes.

        Model flux of image i is ``A * |mu(theta_i)|`` with the unlensed
        source flux ``A`` solved per sample by weighted least squares (a
        linear amplitude, like the lstsq light profiles) — the likelihood
        constrains the flux *ratios*, i.e. the magnification ratios.
        """
        cx, cy = self.centroids_x[0], self.centroids_y[0]
        lens_params = params["lens_mass"]
        # |mu| from a clamped |det A|, never 1/det: a candidate putting an
        # image on its critical curve otherwise yields inf flux and a NaN
        # gradient through the clip (same 0*inf trap as stats_positions;
        # high-magnification systems live close to this region by selection)
        f_xx, f_xy, f_yx, f_yy = simulator.hessian(cx, cy, lens_params)
        det_a = (1 - f_xx) * (1 - f_yy) - f_xy * f_yx
        mu = 1.0 / jnp.clip(jnp.abs(det_a), 1e-3, 1e3)  # (bs, n)
        w = 1.0 / self.image_flux_errors**2
        amp = jnp.sum(w * self.image_fluxes * mu, axis=-1) / jnp.maximum(
            jnp.sum(w * mu * mu, axis=-1), 1e-20
        )
        resid = (amp[..., None] * mu - self.image_fluxes) / self.image_flux_errors
        chi2 = jnp.sum(resid**2, axis=-1)
        norm = jnp.sum(jnp.log(2 * np.pi * self.image_flux_errors**2))
        return -0.5 * (chi2 + norm), chi2 / self.image_fluxes.shape[0]

    # ------------------------------------------------------------------
    def log_prob(self, simulator, z):
        """Unconstrained log posterior and reduced chi2; z shaped (bs, d)."""
        x = self.prior.constrain(z)
        log_like = jnp.zeros(z.shape[:-1])
        red_chi2 = jnp.zeros(z.shape[:-1])
        n_chi = 0
        if self.include_pixels:
            ll, rc = self.stats_pixels(simulator, x)
            log_like, red_chi2, n_chi = log_like + ll, red_chi2 + rc, n_chi + 1
        if self.include_positions:
            ll, rc = self.stats_positions(simulator, x)
            log_like, red_chi2, n_chi = log_like + ll, red_chi2 + rc, n_chi + 1
        if self.include_delays:
            ll, rc = self.stats_time_delays(simulator, x)
            log_like, red_chi2, n_chi = log_like + ll, red_chi2 + rc, n_chi + 1
        if self.include_fluxes:
            ll, rc = self.stats_fluxes(simulator, x)
            log_like, red_chi2, n_chi = log_like + ll, red_chi2 + rc, n_chi + 1
        red_chi2 = red_chi2 / max(n_chi, 1)
        log_prior = self.prior.log_prob(x) + self.prior.fldj(z)
        return log_like + log_prior, red_chi2

    def log_like(self, simulator, z):
        x = self.prior.constrain(z)
        total = jnp.zeros(z.shape[:-1])
        if self.include_pixels:
            total = total + self.stats_pixels(simulator, x)[0]
        if self.include_positions:
            total = total + self.stats_positions(simulator, x)[0]
        if self.include_delays:
            total = total + self.stats_time_delays(simulator, x)[0]
        if self.include_fluxes:
            total = total + self.stats_fluxes(simulator, x)[0]
        return total

    def log_prior(self, z):
        return self.prior.log_prob_z(z)

    # Reference-compatible facade: bij.forward == constrain, bij.inverse with
    # a constrained pytree == unconstrain.
    @property
    def bij(self):
        prior = self.prior

        class _Bij:
            forward = staticmethod(prior.constrain)
            inverse = staticmethod(prior.unconstrain)

        return _Bij()


class SurveyForwardProbModel(ForwardProbModel):
    """Scene-batched pixel likelihood: one probabilistic model scoring S
    independent observations in a single device program.

    Survey mode (beyond the reference, which fits one system per process):
    ``observed_images`` has shape (S, H, W) and every parameter batch ``z``
    must be **scene-major** with ``bs = S * K`` rows — K samples (MAP starts /
    ELBO draws / HMC chains) per scene, scene index varying slowest. Row
    ``s * K + k`` is scored against ``observed_images[s]``. All scenes share
    the camera geometry (``SimulatorConfig``) and the physical model family;
    ``background_rms``/``exp_time`` (or ``error_map`` of shape (S, H, W)) may
    be scalars shared across scenes or per-scene arrays of shape (S,).

    The pixel-stat math is identical to :class:`ForwardProbModel` — the
    renders are simply reshaped (S, K, H, W) against (S, 1, H, W) data — so
    per-sample log-likelihoods match the single-scene model exactly
    (tested in tests/test_survey.py). Multiple-image positions are supported
    with one image group per scene (``centroids_*`` as length-S lists of 1-D
    arrays; scenes may have different image counts — shorter scenes are
    padded and masked, see ``stats_positions``).
    """

    def __init__(
        self,
        prior: Prior,
        observed_images,
        background_rms=None,
        exp_time=None,
        error_map=None,
        centroids_x=None,
        centroids_y=None,
        centroids_errors_x=None,
        centroids_errors_y=None,
    ):
        observed_images = jnp.asarray(observed_images, jnp.float32)
        if observed_images.ndim != 3:
            raise ValueError(
                f"observed_images must be (S, H, W); got {observed_images.shape}"
            )
        super().__init__(
            prior,
            observed_image=observed_images,
            background_rms=(
                None if background_rms is None else jnp.asarray(background_rms)
            ),
            exp_time=None if exp_time is None else jnp.asarray(exp_time),
            error_map=error_map,
            include_pixels=True,
            include_positions=False,
        )
        # Per-scene multiple-image positions: one image group per scene,
        # given as length-S lists of 1-D arrays (image counts may differ —
        # scenes are padded to the longest with REPEATS OF THEIR OWN FIRST
        # IMAGE, masked out of every sum; repeating a valid position keeps
        # the padded rays/magnifications finite, where NaN padding would
        # poison the masked sums through 0 * inf).
        if centroids_x is not None:
            S = int(observed_images.shape[0])
            if len(centroids_x) != S:
                raise ValueError(
                    f"centroids_x must list {S} scenes; got {len(centroids_x)}"
                )
            n_max = max(int(np.size(np.asarray(c))) for c in centroids_x)

            for s, c in enumerate(centroids_x):
                if np.size(np.asarray(c)) == 0:
                    raise ValueError(
                        f"scene {s} has an empty centroid list; omit the "
                        "position data entirely or drop that scene from the "
                        "position-constrained catalogue"
                    )

            def pad(arrs, fill_from_first):
                out = np.zeros((S, n_max), np.float32)
                for s, a in enumerate(arrs):
                    a = np.asarray(a, np.float32).reshape(-1)
                    out[s, : a.size] = a
                    out[s, a.size:] = a[0] if fill_from_first else 1.0
                return jnp.asarray(out)

            self.pos_x = pad(centroids_x, True)
            self.pos_y = pad(centroids_y, True)
            self.pos_ex = pad(centroids_errors_x, False)
            self.pos_ey = pad(centroids_errors_y, False)
            self.pos_mask = jnp.asarray(
                np.arange(n_max)[None, :]
                < np.asarray([np.size(np.asarray(c)) for c in centroids_x])[:, None],
                jnp.float32,
            )
            self.include_positions = True
            # event-size contribution (MAP-loss normalization): the average
            # per-scene position count — per-sample event sizes must be a
            # single scalar under the scene-batched loss
            self.n_position = int(
                round(2 * float(np.asarray(self.pos_mask).sum()) / S)
            )
        self.n_scenes = int(observed_images.shape[0])
        if self.error_map is not None:
            # accept one (H, W) map shared by all scenes; anything else must
            # match (S, H, W) exactly — stats_pixels indexes error_map[:, None]
            if self.error_map.ndim == 2 and (
                self.error_map.shape == observed_images.shape[1:]
            ):
                self.error_map = jnp.broadcast_to(
                    self.error_map, observed_images.shape
                )
            if self.error_map.shape != observed_images.shape:
                raise ValueError(
                    f"error_map shape {self.error_map.shape} must be "
                    f"{observed_images.shape[1:]} (shared) or match "
                    f"observed_images {observed_images.shape}"
                )

    def stats_pixels(self, simulator, params):
        im_sim = simulator.simulate(params)  # (S*K, H, W)
        S = self.n_scenes
        if im_sim.shape[0] % S:
            raise ValueError(
                f"batch {im_sim.shape[0]} is not a multiple of n_scenes={S}"
            )
        K = im_sim.shape[0] // S
        im = im_sim.reshape(S, K, *im_sim.shape[1:])
        obs = self.observed_image[:, None]  # (S, 1, H, W)
        if self.error_map is not None:
            err_map = self.error_map[:, None]
        else:
            bkg = jnp.reshape(self.background_rms, (-1, 1, 1, 1))  # (S or 1,1,1,1)
            exp_t = jnp.reshape(self.exp_time, (-1, 1, 1, 1))
            # clip like ForwardProbModel.stats_pixels: signed-light profiles
            # can drive the unclipped variance negative -> NaN
            err_map = jnp.sqrt(bkg**2 + jnp.clip(im, 0.0, np.inf) / exp_t)
        mask = simulator.img_region
        resid = (im - obs) / err_map
        chi2 = jnp.sum(resid**2 * mask, axis=(-2, -1))  # (S, K)
        normalization = jnp.sum(
            jnp.log(2 * np.pi * err_map**2) * mask, axis=(-2, -1)
        )
        log_like = -0.5 * (chi2 + jnp.broadcast_to(normalization, chi2.shape))
        red_chi2 = chi2 / simulator.n_live_pix
        return log_like.reshape(S * K), red_chi2.reshape(S * K)

    def stats_positions(self, simulator, params):
        """Per-scene multiple-image position stats (masked, padded scenes).

        Same math as :meth:`ForwardProbModel.stats_positions` — ray-trace the
        image-plane centroids to the source plane, penalize spread about
        their barycentre with magnification-scaled errors — vectorized over
        scenes: per-scene coords broadcast as (S, 1, n) against per-sample
        lens params reshaped (S, K, 1), bypassing the simulator's flat
        ``_batched`` convention.
        """
        if not self.include_positions:
            raise ValueError("no centroids configured on this survey model")
        S = self.n_scenes
        lens_params = params["lens_mass"]
        bs = jnp.shape(jax.tree_util.tree_leaves(lens_params)[0])[0]
        K = bs // S

        def scene_batched(p):
            return {k: jnp.asarray(v).reshape(S, K, 1) for k, v in p.items()}

        x = self.pos_x[:, None, :]  # (S, 1, n)
        y = self.pos_y[:, None, :]
        beta_x, beta_y = x, y
        f_xx = f_xy = f_yx = f_yy = 0.0
        for lens, p, c in zip(
            simulator.phys_model.lenses, lens_params,
            simulator.phys_model.lenses_constants,
        ):
            pb = scene_batched(p)
            ax, ay = lens.deriv(x, y, **pb, **c)
            beta_x, beta_y = beta_x - ax, beta_y - ay
            a, b, c2, d = lens.hessian(x, y, **pb, **c)
            f_xx, f_xy, f_yx, f_yy = f_xx + a, f_xy + b, f_yx + c2, f_yy + d
        mag = 1.0 / ((1 - f_xx) * (1 - f_yy) - f_xy * f_yx)  # (S, K, n)

        w = self.pos_mask[:, None, :]  # (S, 1, n)
        n_img = jnp.sum(self.pos_mask, axis=-1)[:, None]  # (S, 1)
        beta = jnp.stack([beta_x, beta_y], axis=-2)  # (S, K, 2, n)
        bary = jnp.sum(beta * w[:, :, None, :], axis=-1, keepdims=True) / (
            n_img[..., None, None]
        )
        err = jnp.stack(
            [self.pos_ex[:, None, :] / mag, self.pos_ey[:, None, :] / mag],
            axis=-2,
        )  # (S, K, 2, n)
        wm = w[:, :, None, :]
        chi2 = jnp.sum(((beta - bary) / err) ** 2 * wm, axis=(-2, -1))  # (S, K)
        norm = jnp.sum(jnp.log(2 * np.pi * err**2) * wm, axis=(-2, -1))
        log_like = -0.5 * (chi2 + norm)
        red_chi2 = chi2 / (2.0 * n_img)
        return log_like.reshape(S * K), red_chi2.reshape(S * K)


class BackwardProbModel(VersionedAttrs):
    """Likelihood with observed-image noise and lstsq linear amplitudes."""

    def __init__(self, prior: Prior, observed_image, background_rms, exp_time):
        self.prior = prior
        observed_image = jnp.asarray(observed_image, jnp.float32)
        err_map = jnp.sqrt(
            background_rms**2 + jnp.clip(observed_image, 0.0, np.inf) / exp_time
        )
        self.observed_image = observed_image
        self.err_map = err_map
        self._log_norm = -0.5 * jnp.sum(jnp.log(2 * np.pi * err_map**2))
        self.include_pixels = True
        self.include_positions = False
        self.n_position = 0

    def init_centroids(self, bs):
        return None

    def event_size(self, simulator) -> int:
        return simulator.n_live_pix

    def stats_pixels(self, simulator, params):
        """(log_like, reduced_chi2) of the pixel data for constrained params.

        Same contract as :meth:`ForwardProbModel.stats_pixels` (used by the
        SMC driver's likelihood selector); linear amplitudes are solved by
        weighted least squares on the lstsq path.
        """
        im_sim = simulator.lstsq_simulate(params, self.observed_image, self.err_map)
        resid = (im_sim - self.observed_image) / self.err_map
        chi2_pix = resid**2
        log_like = -0.5 * jnp.sum(chi2_pix, axis=(-2, -1)) + self._log_norm
        red_chi2 = jnp.mean(chi2_pix, axis=(-2, -1))
        return log_like, red_chi2

    def stats_positions(self, simulator, params):
        raise NotImplementedError(
            "BackwardProbModel has no multiple-image position likelihood; "
            "use ForwardProbModel(include_positions=True) for position terms"
        )

    def log_prob(self, simulator, z):
        x = self.prior.constrain(z)
        log_like, red_chi2 = self.stats_pixels(simulator, x)
        log_prior = self.prior.log_prob(x) + self.prior.fldj(z)
        batch = z.shape[:-1]  # bs=1 squeeze leaves scalars; match Forward's shape
        return (
            jnp.broadcast_to(log_like + log_prior, batch),
            jnp.broadcast_to(red_chi2, batch),
        )

    def log_like(self, simulator, z):
        x = self.prior.constrain(z)
        im_sim = simulator.lstsq_simulate(x, self.observed_image, self.err_map)
        resid = (im_sim - self.observed_image) / self.err_map
        return -0.5 * jnp.sum(resid**2, axis=(-2, -1)) + self._log_norm

    def log_prior(self, z):
        return self.prior.log_prob_z(z)


class SurveyBackwardProbModel(BackwardProbModel):
    """Scene-batched lstsq (linear-amplitude) likelihood: the survey twin of
    :class:`BackwardProbModel`. ``observed_images`` is (S, H, W); every
    parameter batch is scene-major (``bs = S * K``); each sample's linear
    amplitudes are solved against its own scene's data
    (``LensSimulator.lstsq_simulate`` scene mode). ``background_rms`` /
    ``exp_time`` may be scalars or per-scene (S,) arrays.
    """

    def __init__(self, prior: Prior, observed_images, background_rms, exp_time):
        observed_images = jnp.asarray(observed_images, jnp.float32)
        if observed_images.ndim != 3:
            raise ValueError(
                f"observed_images must be (S, H, W); got {observed_images.shape}"
            )
        bkg = jnp.reshape(jnp.asarray(background_rms), (-1, 1, 1))
        exp_t = jnp.reshape(jnp.asarray(exp_time), (-1, 1, 1))
        err_map = jnp.sqrt(
            bkg**2 + jnp.clip(observed_images, 0.0, np.inf) / exp_t
        )
        self.prior = prior
        self.observed_image = observed_images
        self.err_map = err_map
        self._log_norm = -0.5 * jnp.sum(
            jnp.log(2 * np.pi * err_map**2), axis=(-2, -1)
        )  # (S,)
        self.include_pixels = True
        self.include_positions = False
        self.n_position = 0
        self.n_scenes = int(observed_images.shape[0])

    def stats_pixels(self, simulator, params):
        im_sim = simulator.lstsq_simulate(
            params, self.observed_image, self.err_map
        )  # (bs, H, W), scene-major
        S = self.n_scenes
        K = im_sim.shape[0] // S
        resid = (
            im_sim.reshape(S, K, *im_sim.shape[1:])
            - self.observed_image[:, None]
        ) / self.err_map[:, None]
        chi2_pix = resid**2
        log_like = (
            -0.5 * jnp.sum(chi2_pix, axis=(-2, -1)) + self._log_norm[:, None]
        )
        red_chi2 = jnp.mean(chi2_pix, axis=(-2, -1))
        return log_like.reshape(S * K), red_chi2.reshape(S * K)

    def log_prob(self, simulator, z):
        x = self.prior.constrain(z)
        log_like, red_chi2 = self.stats_pixels(simulator, x)
        log_prior = self.prior.log_prob(x) + self.prior.fldj(z)
        return log_like + log_prior, red_chi2

    def log_like(self, simulator, z):
        return self.stats_pixels(simulator, self.prior.constrain(z))[0]
