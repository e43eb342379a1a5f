"""Multi-start MAP optimization.

Device-resident redesign of the reference MAP driver
(``src/gigalens/jax/inference.py:24-80``). The reference pays a host
round-trip every Adam step (``jnp.split`` -> pmap -> ``jnp.concatenate`` ->
host optax, ``:64-79``); here the entire optimization is ONE jitted
``lax.scan`` over steps with the sample batch sharded across the mesh, so the
only host sync is at the end. Loss convention matches the reference: mean over
samples of ``-log_prob / event_size``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from gigalens_tpu.parallel import mesh as pmesh


def fit_map(
    prob_model,
    simulator,
    optimizer: optax.GradientTransformation,
    start=None,
    n_samples: int = 500,
    num_steps: int = 350,
    seed: int = 0,
    mesh=None,
    return_history: bool = True,
    segment_steps: int = 0,
):
    """Runs multi-start Adam; returns (z, chi2_history).

    ``z`` is the (n_samples, d) unconstrained parameter matrix after
    ``num_steps`` updates; ``chi2_history`` is the per-step minimum reduced
    chi2 across samples (useful as a convergence trace).
    """
    event_size = float(prob_model.event_size(simulator))
    key = jax.random.PRNGKey(seed)

    if start is None:
        # jitted: eager dispatch is unreliable on the axon TPU backend
        @jax.jit
        def _init(key):
            return prob_model.prior.unconstrain(prob_model.prior.sample(key, n_samples))

        z0 = _init(key)
    else:
        z0 = jnp.asarray(start)

    if mesh is not None and mesh.size > 1:
        z0 = pmesh.shard_samples(z0, mesh)

    def loss_fn(z):
        lp, chisq = prob_model.log_prob(simulator, z)
        return -jnp.mean(lp) / event_size, chisq

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, _):
        z, opt_state = carry
        (_, chisq), grads = grad_fn(z)
        updates, opt_state = optimizer.update(grads, opt_state, z)
        z = optax.apply_updates(z, updates)
        z = pmesh.constrain_samples(z, mesh)
        return (z, opt_state), jnp.nanmin(chisq)

    n_seg = segment_steps if segment_steps > 0 else num_steps

    def make_runner(length):
        @jax.jit
        def run_segment(carry):
            return jax.lax.scan(step, carry, None, length=length)

        return run_segment

    run_full = make_runner(n_seg)

    @jax.jit
    def init_opt(z0):
        return optimizer.init(z0)

    carry = (z0, init_opt(z0))
    hists = []
    for _ in range(num_steps // n_seg):
        carry, hist = run_full(carry)
        hists.append(hist)
    rem = num_steps % n_seg
    if rem:
        carry, hist = make_runner(rem)(carry)
        hists.append(hist)
    z = carry[0]
    hist = jnp.concatenate(hists)
    return (z, hist) if return_history else z


def best_start(prob_model, simulator, z) -> jnp.ndarray:
    """Selects the highest-posterior sample; returns it shaped (1, d)."""

    @jax.jit
    def _best(z):
        lp, _ = prob_model.log_prob(simulator, z)
        return z[jnp.argmax(lp)][None, :]

    return _best(z)
