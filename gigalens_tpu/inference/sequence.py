"""ModellingSequence: the MAP -> SVI -> HMC (/ SMC) pipeline facade.

API parity with the reference ``ModellingSequence``
(``src/gigalens/jax/inference.py:23-311``), with every phase running as a
device-resident jitted program over a sample-sharded mesh. Each phase method
builds its own ``LensSimulator`` with the right batch size, like the reference.
"""
from __future__ import annotations


import jax
import optax

from gigalens_tpu.inference.hmc import _aot_desc, fit_hmc
from gigalens_tpu.inference.map import best_start, fit_map
from gigalens_tpu.inference.smc import fit_smc
from gigalens_tpu.inference.svi import fit_svi
from gigalens_tpu.parallel import mesh as pmesh
from gigalens_tpu.simulator import LensSimulator


def phase_simulator(cache: dict, sim_config, phys_model, bs: int,
                    exact: bool = False) -> LensSimulator:
    """Memoized phase simulator, shared by ``ModellingSequence`` and
    ``SurveySequence``. ``exact=True`` (HMC/SMC) pins the auto PSF path to
    an f32-exact convolution: the fast DFT matmul path runs single-pass
    bf16 on the MXU and carries ~0.3 nats of likelihood noise — harmless
    to the stochastic optimizers, fatal to Metropolis-Hastings acceptance
    (measured: leapfrog |dH| 0.2-0.6 under bf16-DFT vs 0.02-0.08 under
    FFT at identical step sizes, which collapses dual averaging).
    ``dft_hi`` (Precision.HIGHEST matmuls) is f32-exact in absolute terms
    but measured ~2x rougher than FFT along leapfrog trajectories
    (|dlogL| vs FFT 0.04-0.12 nats), which shrank the adapted step size
    0.143 -> 0.110 and cost 4x ESS on the benchmark for only a 6%
    per-gradient saving — so the exact path stays FFT.

    The fused Pallas render (with the FFT conv) *is* allowed on the exact
    path: a round-1 single-seed A/B attributed an ESS drop to it, but
    min-ESS has ~2x seed-to-seed spread and the 3-seed rerun
    (scripts/bench_hmc_ab_seeds.py, v5e) shows it matches or beats the
    unfused path in ESS/sec at every chain count — median 107 vs 88.6
    (100 vs 50 chains) with identical posterior quality, and its
    per-gradient cost scales flat to 800 samples (64 us/chain vs the
    unfused path's blow-up past 100). Explicit sim_config choices are
    always respected.

    Memo hit requires the SAME config/model objects (identity, plus the
    model's attribute version): rebinding seq.sim_config or seq.phys_model
    (or an attribute on the model) after a phase call must not silently
    reuse a simulator built from the old configuration. The value pins the
    keyed objects so a hit can verify identity (no id-recycling false
    positives)."""
    key = (bs, exact, getattr(phys_model, "_version", 0))
    hit = cache.get(key)
    if hit is not None and hit[0] is sim_config and hit[1] is phys_model:
        return hit[2]
    cfg = sim_config
    if exact:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            psf_mode="fft" if (cfg.psf_mode is None and cfg.use_fft is None)
            else cfg.psf_mode,
        )
    sim = LensSimulator(phys_model, cfg, bs=bs)
    cache[key] = (sim_config, phys_model, sim)
    return sim


class ModellingSequence:
    def __init__(self, phys_model, prob_model, sim_config, mesh=None):
        self.phys_model = phys_model
        self.prob_model = prob_model
        self.sim_config = sim_config
        self.mesh = mesh if mesh is not None else pmesh.default_mesh()
        # memoized per (bs, exact): a stable simulator object lets repeat
        # phase calls (e.g. multi-seed HMC) reuse compiled programs instead
        # of recompiling — on the axon backend every new closure is a full
        # remote compile (see inference/hmc.py::_hmc_programs)
        self._sims = {}

    def _sim(self, bs: int, exact: bool = False) -> LensSimulator:
        """See :func:`phase_simulator` for the exact/fast PSF-path policy."""
        return phase_simulator(self._sims, self.sim_config, self.phys_model,
                               bs, exact)

    def MAP(
        self,
        optimizer: optax.GradientTransformation,
        start=None,
        n_samples: int = 500,
        num_steps: int = 350,
        seed: int = 0,
        segment_steps: int = 0,
        progress=None,
    ):
        n_samples = pmesh.round_to_multiple(n_samples, self.mesh.size, "n_samples")
        sim = self._sim(n_samples)
        z, _ = fit_map(
            self.prob_model,
            sim,
            optimizer,
            start=start,
            n_samples=n_samples,
            num_steps=num_steps,
            seed=seed,
            mesh=self.mesh,
            segment_steps=segment_steps,
            progress=progress,
        )
        return z

    def best_map_start(self, z):
        """Highest-posterior MAP sample, shaped (1, d) for SVI."""
        sim = self._sim(z.shape[0])
        return best_start(self.prob_model, sim, z)

    def summarize(self, res):
        """Named physical-space posterior summary of an :class:`HMCResult`
        (see :func:`gigalens_tpu.utils.summarize_posterior`)."""
        from gigalens_tpu.utils import summarize_posterior

        return summarize_posterior(
            self.prob_model.prior, res.samples,
            divergences=getattr(res, "divergences", None),
        )

    def laplace_scale_tril(self, z_best, method: str = "fd"):
        """chol of the Laplace covariance at the MAP — the recommended
        ``init_scales`` for SVI (and a robust HMC preconditioner on its own).

        Both methods run on the host CPU backend: the computation is tiny
        (a handful of d-dimensional gradient/Hessian rows), so wall time is
        all program compilation — and the CPU compiles locally AND honors
        JAX's persistent compilation cache, while the axon TPU backend
        recompiles every program remotely on each fresh process. The default
        ``method="fd"`` (central differences of the gradient, one bs=2d
        first-order batch) compiles fastest (12 s cold / 5 s warm-cache on
        the benchmark scene vs 24 s cold for exact) and its floored
        scale_tril agrees with the exact reverse-over-reverse AD Hessian
        (``method="exact"``) to ~5% Frobenius — measured interchangeable as
        an SVI initializer / HMC preconditioner (equal ESS/sec medians)."""
        import dataclasses

        import numpy as np

        from gigalens_tpu.inference.map import laplace_scale_tril

        # second-order AD (and the FD gradient batch) cannot cross the fused
        # render's or the Pallas DFT conv's custom VJP on non-default
        # backends; pin the fft conv (linear jnp.fft primitives,
        # differentiable to any order) — cost is irrelevant here
        cfg = dataclasses.replace(
            self.sim_config, use_fused_render=False, psf_mode="fft"
        )
        d = int(np.asarray(z_best).size)
        bs = 2 * d if method == "fd" else 1
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            sim = LensSimulator(self.phys_model, cfg, bs=bs)
            L = laplace_scale_tril(
                self.prob_model, sim,
                jax.device_put(np.asarray(z_best), cpus[0]),
                method=method,
            )
        # hand back host data so downstream use re-commits to the
        # session's default (TPU) backend
        return np.asarray(L)

    def SVI(
        self,
        start,
        optimizer: optax.GradientTransformation,
        n_vi: int = 250,
        init_scales=1e-3,
        num_steps: int = 500,
        seed: int = 0,
        segment_steps: int = 0,
        full_rank: bool = True,
        progress=None,
    ):
        n_vi = pmesh.round_to_multiple(n_vi, self.mesh.size, "n_vi")
        sim = self._sim(n_vi)
        return fit_svi(
            self.prob_model,
            sim,
            start,
            optimizer,
            n_vi=n_vi,
            init_scales=init_scales,
            num_steps=num_steps,
            seed=seed,
            mesh=self.mesh,
            segment_steps=segment_steps,
            full_rank=full_rank,
            progress=progress,
        )

    def HMC(
        self,
        q_z,
        init_eps: float = 0.3,
        init_l: int = 3,
        n_hmc: int = 50,
        num_burnin_steps: int = 250,
        num_results: int = 750,
        max_leapfrog_steps: int = 30,
        trajectory_adaptation: str = "chees",
        mass_adaptation: bool = True,
        seed: int = 0,
        seeds=None,
        segment_steps: int = 0,
        progress=None,
    ):
        """``seeds`` (sequence) runs all replicas as ONE grouped device
        program (see :func:`gigalens_tpu.inference.hmc.fit_hmc`): G
        independent ``n_hmc``-chain posteriors for ~1x (not Gx) the wall."""
        n_hmc = pmesh.round_to_multiple(n_hmc, self.mesh.size, "n_hmc chains")
        n_total = n_hmc * (len(seeds) if seeds is not None and len(seeds) > 1
                           else 1)
        sim = self._sim(n_total, exact=True)
        return fit_hmc(
            self.prob_model,
            sim,
            q_z,
            init_eps=init_eps,
            init_l=init_l,
            n_hmc=n_hmc,
            num_burnin_steps=num_burnin_steps,
            num_results=num_results,
            max_leapfrog_steps=max_leapfrog_steps,
            trajectory_adaptation=trajectory_adaptation,
            mass_adaptation=mass_adaptation,
            seed=seed,
            seeds=seeds,
            mesh=self.mesh,
            segment_steps=segment_steps,
            progress=progress,
        )

    def SMC(
        self,
        start=None,
        num_particles: int = 1000,
        num_ensembles: int = 1,
        num_leapfrog_steps: int = 10,
        post_sampling_steps: int = 100,
        ess_threshold_ratio: float = 0.8,
        max_sampling_per_stage: int = 8,
        max_stage: int = 100,
        target: str = "pixels",
        auxiliar: str = "positions",
        precondition_moves: bool = True,
        seed: int = 1,
        segment_stages: int = 0,
        progress=None,
    ):
        num_particles = pmesh.round_to_multiple(num_particles, self.mesh.size, "num_particles")
        n = num_particles * num_ensembles
        sim = self._sim(n, exact=True)
        return fit_smc(
            self.prob_model,
            sim,
            start=start,
            num_particles=num_particles,
            num_ensembles=num_ensembles,
            num_leapfrog_steps=num_leapfrog_steps,
            post_sampling_steps=post_sampling_steps,
            ess_threshold_ratio=ess_threshold_ratio,
            max_sampling_per_stage=max_sampling_per_stage,
            max_stage=max_stage,
            target=target,
            auxiliar=auxiliar,
            precondition_moves=precondition_moves,
            seed=seed,
            mesh=self.mesh,
            segment_stages=segment_stages,
            progress=progress,
            aot_desc=_aot_desc(self.prob_model, sim, self.mesh),
        )

    def fit(
        self,
        n_samples: int = 500,
        map_steps: int = 350,
        n_vi: int = 1000,
        vi_steps: int = 300,
        n_hmc: int = 50,
        num_burnin_steps: int = 250,
        num_results: int = 750,
        map_lr: float = 1e-2,
        svi_lr: float = 3e-3,
        laplace_method: str = "fd",
        seed: int = 0,
        checkpoint_dir=None,
        progress=None,
    ):
        """One-call pipeline: MAP -> Laplace init -> SVI -> HMC.

        The sequence every demo/benchmark hand-rolls, with the measured-best
        recipe baked in (BASELINE.md round 2): multi-start Adam MAP under a
        polynomial-decay schedule, SVI initialized from the finite-difference
        Laplace covariance at the best MAP point (which cut the published
        1500-step budget to ~300 at equal-or-better preconditioner quality),
        and ChEES-adapted preconditioned HMC started from the surrogate.

        ``checkpoint_dir`` makes the run resumable per phase
        (:class:`gigalens_tpu.utils.PipelineCheckpointer`) — a preempted
        TPU job rerun with the same directory skips finished phases.
        ``progress(phase, step, value)`` receives live per-phase feedback.

        Returns a dict with the per-phase artifacts and wall-clock times:
        ``z_map, best, q_z, losses, hmc, summary, times``.
        """
        import time as _time

        import numpy as np

        ckpt = None
        if checkpoint_dir is not None:
            from gigalens_tpu.utils.checkpoint import PipelineCheckpointer

            ckpt = PipelineCheckpointer(checkpoint_dir)

        def _progress(phase):
            if progress is None:
                return None
            return lambda step, value: progress(phase, step, value)

        times = {}

        t0 = _time.time()
        # transition_steps == map_steps exactly: optax 0.2.6's
        # polynomial_schedule with power=0.5 returns NaN for count >
        # transition_steps under jit ((1 - count/T)^0.5 of a negative
        # number; the eager path clips) — never run it past its transition
        sched = optax.polynomial_schedule(-map_lr, -map_lr / 3, 0.5, map_steps)
        opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))

        def _map():
            z = self.MAP(opt, n_samples=n_samples, num_steps=map_steps,
                         seed=seed, progress=_progress("map"))
            return z, None

        z_map, _ = ckpt.run_map(_map) if ckpt else _map()
        jax.block_until_ready(z_map)
        best = self.best_map_start(z_map)
        times["map"] = _time.time() - t0

        t0 = _time.time()
        sched = optax.polynomial_schedule(
            -1e-6, -svi_lr, 2, max(vi_steps // 5, 1)
        )
        opt = optax.chain(optax.scale_by_adam(), optax.scale_by_schedule(sched))

        def _svi():
            L0 = self.laplace_scale_tril(best, method=laplace_method)
            return self.SVI(best, opt, n_vi=n_vi, num_steps=vi_steps,
                            init_scales=np.asarray(L0), seed=seed + 1,
                            progress=_progress("svi"))

        q_z, losses = ckpt.run_svi(_svi) if ckpt else _svi()
        jax.block_until_ready(losses)
        times["svi"] = _time.time() - t0

        t0 = _time.time()

        def _hmc():
            return self.HMC(q_z, n_hmc=n_hmc,
                            num_burnin_steps=num_burnin_steps,
                            num_results=num_results, seed=seed + 2,
                            progress=_progress("hmc"))

        res = ckpt.run_hmc(_hmc) if ckpt else _hmc()
        jax.block_until_ready(res.samples)
        times["hmc"] = _time.time() - t0

        return dict(z_map=z_map, best=best, q_z=q_z, losses=losses, hmc=res,
                    summary=self.summarize(res), times=times)
