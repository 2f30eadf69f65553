"""TPU-native (f32 on-chip) GNSS SPP + Doppler velocity.

The reference solves single point positioning directly on f64 ECEF states
(``gnssSpp.cpp:1335-1428`` position WLS, ``:1622-1708`` Doppler velocity) —
unrepresentable in f32, where 2.6e7 m magnitudes quantize at ~2 m. The
TPU-native reformulation splits the epoch into:

- **Host prep (f64, once per log)** — ``prep_epochs``: ephemeris
  evaluation at transmit time, elevation/CN0 masks, Klobuchar + troposphere
  corrections, and a per-satellite *linearization about a fixed ECEF anchor
  A*: unit line-of-sight vectors, the anchored pseudorange residual
  ``y = PR - rho0 - corrections`` (O(10^2) m — f32-exact to sub-mm), the
  curvature scale ``1/rho0`` and the Sagnac delta coefficients. Exactly the
  quantities whose *absolute* scale forces f64.
- **On-chip solve (f32, one ``lax.scan`` over epochs)** —
  ``solve_epochs_local``: Gauss-Newton over ``x = [delta, cb]`` (receiver
  position relative to the anchor + clock bias) with the second-order range
  correction

      rho(delta) - rho0 = -los.delta + (|delta|^2 - (los.delta)^2)/(2 rho0)

  whose truncation error is ``rho0 * (|delta|/rho0)^3`` — < 2e-9 m at
  |delta| = 100 m, < 2 mm even at 10 km — plus the delta part of the Sagnac
  term. Doppler velocity re-uses the anchored RHS with a first-order LOS
  correction ``dlos = -(delta - los (los.delta))/rho0``. DOP/covariance and
  the velocity validation chain (``:1711+``) run on-chip too.

Every on-chip quantity is O(1e3) or smaller, so the f32 path matches the
f64 ECEF pipeline to < 0.1 m (pinned by tests/test_gnss_local.py) while
running entirely on the TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.geodesy import (
    EARTH_ROTATION_RATE,
    SPEED_OF_LIGHT,
    ecef_to_enu_rotation,
    ecef_to_lla,
)
from toyslam_tpu.gnss import atmosphere, spp
from toyslam_tpu.gnss.ephemeris import sat_pos_vel_clock
from toyslam_tpu.gnss.pipeline import EphemerisStore, EpochConfig

_HP = jax.lax.Precision.HIGHEST


class LocalEpochs(NamedTuple):
    """Anchored, f32-safe epoch observations ([E, S] leaves).

    Everything here is either dimensionless, O(10^2-10^3) m, or a
    coefficient whose relative f32 error contributes < 1e-4 m to the
    solve (analysis in the module docstring).
    """

    los: jnp.ndarray  # [E, S, 3] unit anchor->satellite LOS
    y: jnp.ndarray  # [E, S] PR - rho0 - corrections(anchor), m
    inv_rho0: jnp.ndarray  # [E, S] 1 / anchor range
    sag_coef: jnp.ndarray  # [E, S, 2] d(sagnac)/d(delta_xy)
    sat_vel: jnp.ndarray  # [E, S, 3] ECEF satellite velocity
    z0: jnp.ndarray  # [E, S] Doppler RHS at the anchor, m/s
    weight: jnp.ndarray  # [E, S]
    valid: jnp.ndarray  # [E, S] bool (all masks applied)
    dop_valid: jnp.ndarray  # [E, S] bool (velocity channels)
    # Diagnostics for the skyplot/DOP record stream
    elevation: jnp.ndarray  # [E, S] rad (at the anchor)
    azimuth: jnp.ndarray  # [E, S] rad
    cn0: jnp.ndarray  # [E, S]
    prn: jnp.ndarray  # [E, S] int32
    iono_delay: jnp.ndarray  # [E, S] m
    trop_delay: jnp.ndarray  # [E, S] m
    # Frame data (f32): ENU rotation at the anchor for output conversion.
    R_enu: jnp.ndarray  # [3, 3]


def prep_epochs(store: EphemerisStore, iono: atmosphere.IonoParams,
                gps_tow, prn, pseudorange, doppler_ms, cn0, meas_valid,
                anchor_ecef, config: EpochConfig = EpochConfig(),
                out_dtype=jnp.float32) -> LocalEpochs:
    """Host-side f64 prep: linearize a whole epoch log about ``anchor_ecef``.

    Same input contract as ``pipeline.run_epochs`` ([E, S] channels); runs
    in the input dtype (use f64 on CPU — ECEF orbit evaluation needs it)
    and emits ``out_dtype`` (f32) leaves ready for ``solve_epochs_local``
    on the TPU.
    """
    anchor = jnp.asarray(anchor_ecef)
    dtype = pseudorange.dtype

    eph = store.lookup(prn)
    t_tx = gps_tow[:, None] - pseudorange / SPEED_OF_LIGHT
    sat = sat_pos_vel_clock(eph, t_tx)
    ok = meas_valid & sat["valid"]

    elevation, azimuth = spp.elevation_azimuth(sat["pos"], anchor)
    el_ok = (elevation >= jnp.deg2rad(config.cut_off_degree)) \
        | config.disable_elevation_filter
    cn0_ok = cn0 >= config.min_cn0
    used = ok & el_ok & cn0_ok

    lla0 = ecef_to_lla(anchor)
    iono_delay = jnp.where(
        config.apply_iono_correction,
        atmosphere.klobuchar_delay(iono, gps_tow[:, None], lla0[0], lla0[1],
                                   elevation, azimuth),
        0.0).astype(dtype)
    trop_delay = jnp.where(
        config.apply_tropo_correction,
        atmosphere.simple_troposphere_delay(elevation),
        0.0).astype(dtype)

    d = sat["pos"] - anchor
    rho0 = jnp.linalg.norm(d, axis=-1)
    rho0_safe = jnp.maximum(rho0, 1.0)
    los = d / rho0_safe[..., None]

    # Anchored residual: PR - predicted(anchor, cb=0)
    # (``GpsPseudorangeResidual``, ``gnssSpp.cpp:559-585``)
    sagnac0 = -EARTH_ROTATION_RATE * (
        anchor[0] * sat["pos"][..., 1] - anchor[1] * sat["pos"][..., 0]
    ) / SPEED_OF_LIGHT
    pred0 = (rho0 + sagnac0 + iono_delay + trop_delay
             - eph.tgd * SPEED_OF_LIGHT - sat["clock_bias"] * SPEED_OF_LIGHT)
    y = pseudorange - pred0

    # d(sagnac)/d(delta): -w/c * (dx * s_y - dy * s_x)
    w_c = EARTH_ROTATION_RATE / SPEED_OF_LIGHT
    sag_coef = jnp.stack(
        [-w_c * sat["pos"][..., 1], w_c * sat["pos"][..., 0]], axis=-1)

    # Doppler RHS at the anchor (``computeVelocitySolution``, ``:1622-1708``)
    sat_vel_proj = jnp.sum(los * sat["vel"], axis=-1)
    sagnac_rate0 = w_c * (sat["vel"][..., 0] * anchor[1]
                          - sat["vel"][..., 1] * anchor[0])
    z0 = (sat_vel_proj + sagnac_rate0
          - sat["clock_drift"] * SPEED_OF_LIGHT + doppler_ms)

    weight = spp.elevation_weight(elevation, cn0=cn0, min_cn0=config.min_cn0)

    # A NaN input channel on an already-masked satellite (e.g. PR = NaN for
    # a PRN absent from this epoch's log, the sim's own convention) must not
    # poison the dense solve: NaN * 0 is NaN, so one non-finite los/weight
    # row would spread through H = Jw^T Jw for the WHOLE epoch and freeze it
    # at the anchor while still reporting valid. Fold finiteness into the
    # masks and zero every masked solver channel. Velocity channels get
    # their own mask so a NaN doppler only drops the satellite from the
    # velocity solve, matching pipeline.run_epochs.
    pos_finite = (jnp.isfinite(y) & jnp.isfinite(rho0)
                  & jnp.all(jnp.isfinite(los), -1) & jnp.isfinite(weight))
    vel_finite = jnp.all(jnp.isfinite(sat["vel"]), -1) & jnp.isfinite(z0)
    used = used & pos_finite
    dop_used = used & vel_finite & config.use_doppler
    zero_rows = lambda a, m: jnp.where(m[..., None], a, 0.0)
    los = zero_rows(los, used)
    sag_coef = zero_rows(sag_coef, used)
    sat_vel = zero_rows(sat["vel"], dop_used)
    weight = jnp.where(used, weight, 0.0)
    inv_rho0 = jnp.where(used, 1.0 / rho0_safe, 0.0)

    R_enu = ecef_to_enu_rotation(lla0[0], lla0[1])

    f = lambda a: a.astype(out_dtype)
    return LocalEpochs(
        los=f(los), y=f(jnp.where(used, y, 0.0)),
        inv_rho0=f(inv_rho0), sag_coef=f(sag_coef),
        sat_vel=f(sat_vel), z0=f(jnp.where(dop_used, z0, 0.0)),
        weight=f(weight), valid=used,
        dop_valid=dop_used,
        elevation=f(elevation), azimuth=f(azimuth), cn0=f(cn0),
        prn=prn.astype(jnp.int32), iono_delay=f(iono_delay),
        trop_delay=f(trop_delay), R_enu=f(R_enu),
    )


class LocalSolution(NamedTuple):
    """Per-epoch ([E]-stacked) on-chip solution, anchor-relative."""

    delta: jnp.ndarray  # [E, 3] receiver ECEF position - anchor
    clock_bias: jnp.ndarray  # [E] m
    enu: jnp.ndarray  # [E, 3] (R_enu @ delta)
    covariance: jnp.ndarray  # [E, 4, 4]
    gdop: jnp.ndarray
    pdop: jnp.ndarray
    hdop: jnp.ndarray
    vdop: jnp.ndarray
    tdop: jnp.ndarray
    num_sats: jnp.ndarray  # [E]
    valid: jnp.ndarray  # [E]
    vel_ecef: jnp.ndarray  # [E, 3]
    clock_drift: jnp.ndarray  # [E] m/s
    vel_enu: jnp.ndarray  # [E, 3]
    vel_valid: jnp.ndarray  # [E]


def _solve_one(ep: LocalEpochs, x0, prev_vel, iterations: int):
    """One epoch: f32 GN over [delta(3), cb] + closed-form velocity."""
    dtype = ep.y.dtype
    w = ep.weight * ep.valid.astype(dtype)
    psr_std = spp.DEFAULT_PSEUDORANGE_NOISE / jnp.sqrt(jnp.maximum(w, 1e-6))
    vmask = ep.valid.astype(dtype)

    def model_and_jac(x):
        delta, cb = x[:3], x[3]
        ld = jnp.einsum("si,i->s", ep.los, delta, precision=_HP)
        d2 = jnp.dot(delta, delta)
        # second-order range correction (see module docstring)
        q = 0.5 * (d2 - ld * ld) * ep.inv_rho0
        sag = ep.sag_coef[:, 0] * delta[0] + ep.sag_coef[:, 1] * delta[1]
        pred = -ld + q + sag + cb
        # d(pred)/d(delta) = -los + (delta - los ld)/rho0 + [sag_coef, 0]
        Jd = (-ep.los + (delta[None, :] - ep.los * ld[:, None])
              * ep.inv_rho0[:, None])
        Jd = Jd.at[:, 0].add(ep.sag_coef[:, 0])
        Jd = Jd.at[:, 1].add(ep.sag_coef[:, 1])
        return pred, jnp.concatenate([Jd, jnp.ones_like(ld)[:, None]], 1)

    def gn_step(_, x):
        pred, J = model_and_jac(x)
        r = (ep.y - pred) / psr_std
        Jw = J / psr_std[:, None] * vmask[:, None]
        H = jnp.matmul(Jw.T, Jw, precision=_HP) + 1e-6 * jnp.eye(4, dtype=dtype)
        g = jnp.matmul(Jw.T, r * vmask, precision=_HP)
        chol = jax.scipy.linalg.cho_factor(H)
        dx = jax.scipy.linalg.cho_solve(chol, g)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return x + dx

    x = jax.lax.fori_loop(0, iterations, gn_step, x0.astype(dtype))
    delta, cb = x[:3], x[3]

    # DOP + covariance at the solution (``calculateGpsDOP``, ``:1510-1577``).
    # LOS at the solved position (first-order correction; ~4e-6 rad/100 m).
    ld = jnp.einsum("si,i->s", ep.los, delta, precision=_HP)
    dlos = -(delta[None, :] - ep.los * ld[:, None]) * ep.inv_rho0[:, None]
    los_c = ep.los + dlos
    G = jnp.concatenate([-los_c, jnp.ones_like(ld)[:, None]], 1)
    Gw = G * w[:, None]
    N = jnp.matmul(G.T, Gw, precision=_HP)
    cov = jnp.linalg.inv(N + 1e-8 * jnp.eye(4, dtype=dtype))
    diag = jnp.diagonal(cov)
    n_sats = jnp.sum(ep.valid.astype(jnp.int32))

    # ---- Doppler velocity (closed form, ``:1622-1708``) ----
    wv = ep.weight * ep.dop_valid.astype(dtype)
    # Anchored RHS corrected to the solved position: LOS change affects the
    # satellite-velocity projection; the Sagnac rate gains the delta term.
    z = (ep.z0 + jnp.sum(dlos * ep.sat_vel, axis=-1)
         + (EARTH_ROTATION_RATE / SPEED_OF_LIGHT)
         * (ep.sat_vel[:, 0] * delta[1] - ep.sat_vel[:, 1] * delta[0]))
    Gv = jnp.concatenate([los_c, jnp.ones_like(ld)[:, None]], 1)
    Gvw = Gv * wv[:, None]
    Nv = jnp.matmul(Gv.T, Gvw, precision=_HP) + 1e-6 * jnp.eye(4, dtype=dtype)
    zv = jnp.where(ep.dop_valid, z, 0.0)
    xv = jnp.linalg.solve(Nv, jnp.matmul(Gvw.T, zv, precision=_HP))
    nv = jnp.sum(ep.dop_valid.astype(jnp.int32))
    vel_ok = ((nv >= 4)
              & (jnp.linalg.norm(xv[:3]) <= spp.MAX_VELOCITY)
              & (jnp.linalg.norm(xv[:3] - prev_vel) <= spp.MAX_VEL_CHANGE))

    return dict(
        x=x, cov=cov, diag=diag, n_sats=n_sats,
        pos_ok=n_sats >= 4, vel=xv[:3], vel_drift=xv[3], vel_ok=vel_ok,
    )


def solve_epochs_local(epochs: LocalEpochs,
                       config: EpochConfig = EpochConfig(),
                       iterations: int | None = None) -> LocalSolution:
    """f32 on-chip epoch scan: each epoch warm-starts from the previous
    solution and chains velocity validation, mirroring
    ``pipeline.run_epochs`` semantics on the anchored formulation.

    jit this with static config; all leaves of ``epochs`` are f32, so the
    whole log solves on the TPU in one dispatch.
    """
    dtype = epochs.y.dtype
    iters = config.pos_iterations if iterations is None else iterations

    def step(carry, x):
        x_prev, v_prev = carry
        ep = epochs._replace(**x)  # per-epoch leaves; R_enu stays whole-log
        sol = _solve_one(ep, x_prev, v_prev, iters)
        x_next = jnp.where(sol["pos_ok"], sol["x"], x_prev)
        v_next = jnp.where(sol["vel_ok"], sol["vel"], v_prev)
        return (x_next, v_next), sol

    xs = {k: getattr(epochs, k) for k in LocalEpochs._fields if k != "R_enu"}
    (_, _), sols = jax.lax.scan(
        step, (jnp.zeros(4, dtype), jnp.zeros(3, dtype)), xs)

    delta = sols["x"][:, :3]
    diag = sols["diag"]
    enu = jnp.einsum("ij,ej->ei", epochs.R_enu, delta, precision=_HP)
    vel_enu = jnp.einsum("ij,ej->ei", epochs.R_enu, sols["vel"],
                         precision=_HP)
    return LocalSolution(
        delta=delta, clock_bias=sols["x"][:, 3], enu=enu,
        covariance=sols["cov"],
        gdop=jnp.sqrt(jnp.sum(diag, -1)),
        pdop=jnp.sqrt(diag[:, 0] + diag[:, 1] + diag[:, 2]),
        hdop=jnp.sqrt(diag[:, 0] + diag[:, 1]),
        vdop=jnp.sqrt(diag[:, 2]),
        tdop=jnp.sqrt(diag[:, 3]),
        num_sats=sols["n_sats"], valid=sols["pos_ok"],
        vel_ecef=sols["vel"], clock_drift=sols["vel_drift"],
        vel_enu=vel_enu, vel_valid=sols["vel_ok"],
    )
