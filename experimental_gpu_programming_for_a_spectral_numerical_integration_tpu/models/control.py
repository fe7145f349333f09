"""Optimal control / trajectory optimization on the differentiable dynamics.

The reference is a single forward-kinematics experiment
(`/root/reference/main.cpp:181-205`) whose GPU aspiration was raw solve
throughput.  On TPU the same spectral stack is also end-to-end
DIFFERENTIABLE: :func:`~.dynamics.simulate` is a pure ``lax.scan`` of RK4
steps whose every ingredient (mass-matrix IFT tangents of the spectral
solve, the shared load pullback for tendons/magnets/tip wrenches) is
JAX-traced, so the gradient of ANY trajectory functional with respect to an
actuation protocol is one ``jax.grad`` — exact reverse-mode through the
whole time loop, at ~2x the rollout's cost.  This module packages that into
direct trajectory optimization (single shooting):

1. parameterize a protocol by KNOTS on a uniform time grid
   (:func:`protocol_from_knots` — linear interpolation, so the protocol
   stays inside every integrator's traced-callable drive interface);
2. roll out (:func:`rollout` — RK4 or implicit Newmark, any drive channel:
   tendon tensions, tip wrench, applied magnetic field, base motion);
3. score + descend (:func:`optimize_protocol` — the whole Adam loop is ONE
   device-resident ``lax.scan``; nothing returns to the host between
   iterations).

This is the capability the actuation layers beg for: `tendon.tendon_ik`
answers "what tensions hold this tip pose" (statics); here we answer "what
tension SCHEDULE swings the tip through this maneuver" (dynamics), with the
same exact-gradient machinery.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import dynamics as dynamics_mod

__all__ = [
    "protocol_from_knots",
    "rollout",
    "tip_positions",
    "tip_target_cost",
    "ControlSolution",
    "optimize_protocol",
]

# Drive channels of simulate/simulate_implicit a knot protocol may feed.
_CHANNELS = ("tension", "tip_force", "tip_moment", "base_accel", "b_field")


def protocol_from_knots(knots, horizon: float,
                        transform: Callable | None = None):
    """``knots (K, m)`` -> traced protocol ``t -> (m,)``.

    Piecewise-LINEAR interpolation on the uniform knot grid over
    ``[0, horizon]``, clamped at the ends (queries outside the horizon —
    e.g. the final RK4 stage at ``t + dt`` — hold the terminal knot).
    Linear in the knots, so protocol gradients are exact scatter weights;
    smooth drives come from more knots, not higher-order splines (a cubic
    through traced gather indices costs 2x the reads for no observed
    benefit in the gated maneuvers).

    ``transform`` post-composes a pointwise map on the interpolated value —
    the place to keep a physical constraint differentiable (e.g.
    ``jax.nn.softplus`` for nonnegative tendon tensions) rather than
    clipping gradients at a bound.
    """
    knots = jnp.asarray(knots)
    if not jnp.issubdtype(knots.dtype, jnp.floating):
        # integer knot lists would truncate the traced time (and leak an
        # integer state dtype into rollout's default qe0)
        knots = knots.astype(jnp.result_type(knots.dtype, jnp.float32))
    if knots.ndim != 2 or knots.shape[0] < 2:
        raise ValueError(f"knots must be (K >= 2, m), got {knots.shape}")
    k = knots.shape[0]

    def protocol(t):
        s = jnp.clip(jnp.asarray(t, knots.dtype) / horizon, 0.0, 1.0)
        s = s * (k - 1)
        i0 = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, k - 2)
        w = s - i0.astype(knots.dtype)
        val = (1.0 - w) * knots[i0] + w * knots[i0 + 1]
        return transform(val) if transform is not None else val

    return protocol


def rollout(knots, cfg: dynamics_mod.DynamicsConfig, dt: float, steps: int,
            channel: str = "tension", transform: Callable | None = None,
            qe0=None, qd0=None, implicit: bool = False, iters: int = 16,
            **sim_kwargs) -> dynamics_mod.Trajectory:
    """Integrate the rod under the knot-parameterized protocol.

    ``channel`` picks which drive of :func:`~.dynamics.simulate` (or
    ``simulate_implicit`` with ``implicit=True``) the protocol feeds; all
    other drives pass through ``sim_kwargs`` untouched (protocols compose —
    e.g. optimize ``tension`` while a fixed ``base_accel`` shakes the
    base).  Differentiable in ``knots`` end to end; batched over leading
    axes of ``qe0``/``qd0`` (one shared protocol driving a family of
    initial conditions).
    """
    if channel not in _CHANNELS:
        raise ValueError(f"channel {channel!r} not in {_CHANNELS}")
    if channel in sim_kwargs:
        raise ValueError(f"channel {channel!r} also passed in sim_kwargs")
    knots = jnp.asarray(knots)
    if not jnp.issubdtype(knots.dtype, jnp.floating):
        knots = knots.astype(jnp.result_type(knots.dtype, jnp.float32))
    # the knot grid spans the SIMULATED window [t0, t0 + dt*steps]
    t0 = sim_kwargs.get("t0", 0.0)
    base = protocol_from_knots(knots, dt * steps, transform)
    proto = (base if not t0 else (lambda t: base(t - t0)))
    record_energy = sim_kwargs.pop("record_energy", False)
    nq = cfg.nq
    if qe0 is None:
        qe0 = jnp.zeros((nq,), knots.dtype)
    qe0 = jnp.asarray(qe0)
    if qd0 is None:
        qd0 = jnp.zeros_like(qe0)
    sim = dynamics_mod.simulate_implicit if implicit else dynamics_mod.simulate
    return sim(qe0, qd0, cfg, dt=dt, steps=steps, iters=iters,
               record_energy=record_energy, **{channel: proto},
               **sim_kwargs)


def tip_positions(qes, cfg: dynamics_mod.DynamicsConfig, iters: int = 16):
    """World tip positions ``(..., 3)`` of strain states ``(..., nq)``
    (tip = grid point 0; the descending CGL order of
    `chebyshev_differentiation.h:26`)."""
    return dynamics_mod._positions_full(jnp.asarray(qes), cfg,
                                        iters)[..., 0, :]


def tip_target_cost(cfg: dynamics_mod.DynamicsConfig, target,
                    velocity_weight: float = 0.0,
                    effort_weight: float = 0.0, iters: int = 16,
                    transform: Callable | None = None):
    """Terminal-cost factory: squared tip-position miss at the final step,
    plus optional quadratic penalties on the terminal strain rate (arrive
    AT REST) and on the actuation effort.  Batched ``qe0`` families sum
    their misses (one protocol, many rods).

    ``transform`` must match the rollout's knot transform when
    ``effort_weight > 0``: the penalty applies to ``transform(knots)`` —
    the PHYSICAL drive values — not the raw knots (under a softplus
    tension map a fully slack cable has a large-negative knot; penalizing
    that raw value would push the optimizer TOWARD tension)."""
    target = jnp.asarray(target)

    def cost(traj: dynamics_mod.Trajectory, knots):
        tip = tip_positions(traj.qes[-1], cfg, iters)
        c = jnp.sum((tip - target.astype(tip.dtype)) ** 2)
        if velocity_weight:
            c = c + velocity_weight * jnp.sum(traj.qds[-1] ** 2)
        if effort_weight:
            drive = transform(knots) if transform is not None else knots
            c = c + effort_weight * jnp.mean(jnp.square(drive))
        return c

    return cost


class ControlSolution(NamedTuple):
    knots: jnp.ndarray      # (K, m) optimized protocol knots
    losses: jnp.ndarray     # (iterations,) loss after each Adam step
    grad_norm: jnp.ndarray  # () final gradient norm


def optimize_protocol(cost, knots0, cfg: dynamics_mod.DynamicsConfig,
                      dt: float, steps: int, channel: str = "tension",
                      transform: Callable | None = None, qe0=None, qd0=None,
                      iterations: int = 100, optimizer=None,
                      implicit: bool = False, iters: int = 16,
                      **sim_kwargs) -> ControlSolution:
    """Direct trajectory optimization: descend ``cost(rollout(knots))``.

    ``cost(traj, knots) -> scalar`` scores a rollout (see
    :func:`tip_target_cost`); gradients flow through the full time loop by
    reverse-mode AD.  The optimizer loop itself is a ``lax.scan`` under
    one ``jit``, so a 100-iteration optimization is a single device
    program — the TPU-native answer to host-looped shooting methods.
    Default optimizer: ``optax.adam(0.1)``.  ``losses[i]`` is the loss of
    the knots AFTER Adam step ``i + 1`` (``losses[-1]`` scores the
    returned ``knots``).

    RK4 only (``implicit=False``): reverse-mode through the implicit
    Newmark step would differentiate a ``while_loop`` Newton, which JAX
    does not support — the right tool there is an IFT custom VJP on the
    Newmark residual, not AD through the iteration (DESIGN.md §13).
    """
    if implicit:
        raise ValueError(
            "optimize_protocol requires the RK4 integrator "
            "(implicit=False): reverse-mode AD cannot differentiate "
            "simulate_implicit's while_loop Newton; wrap the Newmark "
            "residual in an IFT custom VJP if a stiff-implicit control "
            "path is needed")
    if optimizer is None:
        optimizer = optax.adam(0.1)
    knots0 = jnp.asarray(knots0)

    def loss_fn(kn):
        traj = rollout(kn, cfg, dt, steps, channel=channel,
                       transform=transform, qe0=qe0, qd0=qd0,
                       implicit=implicit, iters=iters, **sim_kwargs)
        return cost(traj, kn)

    vg = jax.value_and_grad(loss_fn)

    def adam_step(carry, _):
        kn, opt_state = carry
        loss, g = vg(kn)
        updates, opt_state = optimizer.update(g, opt_state, kn)
        return (optax.apply_updates(kn, updates), opt_state), loss

    @jax.jit
    def run(kn0):
        (kn, _), losses = jax.lax.scan(
            adam_step, (kn0, optimizer.init(kn0)), None, length=iterations)
        # adam_step records the loss BEFORE each update; shift by one and
        # close with the returned iterate's own loss (whose gradient also
        # serves as the convergence diagnostic).
        loss_f, g_f = vg(kn)
        losses = jnp.concatenate([losses[1:], loss_f[None]])
        return kn, losses, jnp.linalg.norm(g_f)

    kn, losses, gnorm = run(knots0)
    return ControlSolution(knots=kn, losses=losses, grad_norm=gnorm)
