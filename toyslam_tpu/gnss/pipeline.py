"""GNSS epoch pipeline: ephemeris store -> masks/weights -> SPP + velocity.

Capability port of the ``gnssSpp.cpp`` runtime composition (the piece
between the callbacks and the math modules):

- per-PRN ephemeris store with replace-on-update and age-based validity at
  use (``ephemCallback``/``MAX_EPH_AGE``, ``:60-82,741-797,40,345-356``);
- the epoch loop ``rawMeasCallback -> processPositionSolution ->
  processVelocitySolution`` (``:827-1128``): transmit-time satellite
  state, elevation/CN0 masks (``:973-979``), elevation x CN0 weights,
  Klobuchar iono + 2.3/sin(el) tropo corrections, iterated WLS position +
  DOP, closed-form Doppler velocity with validation chaining;
- per-satellite az/el/used records per epoch — the headless equivalent of
  the RViz skyplot stream (``RangingRC.cpp:1917-3497``), exported as
  JSONL by ``apps/gnss_demo.py``.

TPU design: the store is a fixed [32]-slot PRN-indexed structure; an epoch
is pure dense [S]-lane algebra; a whole log runs as one ``lax.scan`` with
the previous solution warm-starting the next epoch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.geodesy import SPEED_OF_LIGHT, ecef_to_enu_rotation, ecef_to_lla
from toyslam_tpu.gnss import atmosphere, spp
from toyslam_tpu.gnss.ephemeris import GpsEphemeris, sat_pos_vel_clock

_HP = jax.lax.Precision.HIGHEST

N_PRN = 32  # GPS PRN 1..32


class EphemerisStore(NamedTuple):
    """Per-PRN broadcast ephemeris slots (leaves [32])."""

    eph: GpsEphemeris

    def update(self, new: GpsEphemeris) -> "EphemerisStore":
        """Insert/replace the slot for ``new.sat`` (scalar leaves) —
        ``ephemCallback`` replace-on-update semantics."""
        i = (new.sat.astype(jnp.int32) - 1) % N_PRN
        eph = jax.tree_util.tree_map(
            lambda buf, v: buf.at[i].set(v.astype(buf.dtype)), self.eph, new)
        return EphemerisStore(eph=eph)

    def lookup(self, prn) -> GpsEphemeris:
        """Gather slots for PRN array [S] (invalid PRNs land on slot 0 with
        valid=False)."""
        i = jnp.clip(prn.astype(jnp.int32) - 1, 0, N_PRN - 1)
        eph = jax.tree_util.tree_map(lambda buf: buf[i], self.eph)
        match = self.eph.sat[i].astype(jnp.int32) == prn.astype(jnp.int32)
        return eph._replace(valid=eph.valid & match)


def store_init(dtype=jnp.float64) -> EphemerisStore:
    zeros = jnp.zeros((N_PRN,), dtype)
    eph = GpsEphemeris(
        sat=jnp.zeros((N_PRN,), jnp.int32), toe_sec=zeros, toc_sec=zeros,
        sqrta=zeros, e=zeros, m0=zeros, delta_n=zeros, omega=zeros,
        omg=zeros, omg_dot=zeros, i0=zeros, i_dot=zeros, cus=zeros,
        cuc=zeros, crs=zeros, crc=zeros, cis=zeros, cic=zeros,
        af0=zeros, af1=zeros, af2=zeros, tgd=zeros,
        valid=jnp.zeros((N_PRN,), bool),
    )
    return EphemerisStore(eph=eph)


def synthetic_constellation(n_sats: int = 24, dtype=jnp.float64,
                            toe: float = 0.0) -> GpsEphemeris:
    """Synthetic GPS constellation as broadcast ephemeris: the nominal
    24-slot Walker-style layout (6 planes x 4 slots, 55 deg inclination,
    GPS semi-major axis), which puts ~8-10 satellites above a mid-latitude
    horizon at any epoch. Drives closed-loop pipeline tests and the
    time-propagated urban-canyon simulator (``RangingRC.cpp:135-266``
    builds its satellites the same Keplerian way)."""
    i = jnp.arange(n_sats)
    plane = i // 4
    slot = i % 4
    zeros = jnp.zeros((n_sats,), dtype)
    return GpsEphemeris(
        sat=(i + 1).astype(jnp.int32),
        toe_sec=jnp.full((n_sats,), toe, dtype),
        toc_sec=jnp.full((n_sats,), toe, dtype),
        sqrta=jnp.full((n_sats,), jnp.sqrt(26559.8e3), dtype),
        e=zeros + 0.01,
        # in-plane anomaly spread + inter-plane phasing
        m0=(slot * (jnp.pi / 2.0) + plane * (jnp.pi / 12.0)).astype(dtype),
        delta_n=zeros,
        omega=zeros,
        omg=(plane * (jnp.pi / 3.0)).astype(dtype),
        omg_dot=zeros,
        i0=jnp.full((n_sats,), jnp.deg2rad(55.0), dtype),
        i_dot=zeros,
        cus=zeros, cuc=zeros, crs=zeros, crc=zeros, cis=zeros, cic=zeros,
        af0=zeros + 1e-5, af1=zeros + 1e-12, af2=zeros, tgd=zeros + 2e-9,
        valid=jnp.ones((n_sats,), bool),
    )


class EpochConfig(NamedTuple):
    """Masks/weights knobs (``gnssSpp.cpp:611-717`` param block)."""

    cut_off_degree: float = 10.0  # elevation mask (``:616``)
    min_cn0: float = 10.0  # dB-Hz (``:611``)
    disable_elevation_filter: bool = False
    apply_iono_correction: bool = True
    apply_tropo_correction: bool = True
    pos_iterations: int = 15
    use_doppler: bool = True


class EpochRecord(NamedTuple):
    """Per-satellite diagnostics for one epoch (headless skyplot/DOP
    stream)."""

    prn: jnp.ndarray  # [S]
    elevation: jnp.ndarray  # [S] rad
    azimuth: jnp.ndarray  # [S] rad
    cn0: jnp.ndarray  # [S]
    used: jnp.ndarray  # [S] bool (passed all masks, entered the solve)
    iono_delay: jnp.ndarray  # [S] m
    trop_delay: jnp.ndarray  # [S] m


class EpochSolution(NamedTuple):
    position: spp.SppSolution
    velocity: spp.VelocitySolution
    enu: jnp.ndarray  # [3] solution in ENU of the reference origin
    lla: jnp.ndarray  # [3] lat, lon, alt
    record: EpochRecord


def process_epoch(store: EphemerisStore, iono: atmosphere.IonoParams,
                  gps_tow, prn, pseudorange, doppler_ms, cn0, meas_valid,
                  approx_pos, ref_ecef=None,
                  config: EpochConfig = EpochConfig(),
                  prev_vel_ecef=None) -> EpochSolution:
    """One ``rawMeasCallback`` equivalent.

    prn/pseudorange/doppler_ms/cn0: padded [S] per-epoch channels with
    ``meas_valid``; ``doppler_ms`` is the range rate in m/s (doppler *
    wavelength). ``approx_pos`` warm-starts the WLS and anchors the
    elevation masks; ``ref_ecef`` is the ENU origin for the output (default
    = approx_pos).
    """
    dtype = pseudorange.dtype
    if ref_ecef is None:
        ref_ecef = approx_pos

    # Transmit-time satellite state from the per-PRN store (age gate inside)
    eph = store.lookup(prn)
    t_tx = gps_tow - pseudorange / SPEED_OF_LIGHT
    sat = sat_pos_vel_clock(eph, t_tx)
    ok = meas_valid & sat["valid"]

    elevation, azimuth = spp.elevation_azimuth(sat["pos"], approx_pos)
    el_ok = (elevation >= jnp.deg2rad(config.cut_off_degree)) \
        | config.disable_elevation_filter
    cn0_ok = cn0 >= config.min_cn0
    used = ok & el_ok & cn0_ok

    lla0 = ecef_to_lla(approx_pos)
    iono_delay = jnp.where(
        config.apply_iono_correction,
        atmosphere.klobuchar_delay(iono, gps_tow, lla0[0], lla0[1],
                                   elevation, azimuth),
        0.0).astype(dtype)
    trop_delay = jnp.where(
        config.apply_tropo_correction,
        2.3 / jnp.maximum(jnp.sin(jnp.abs(elevation)), 0.1),
        0.0).astype(dtype)

    weight = spp.elevation_weight(elevation, cn0=cn0, min_cn0=config.min_cn0)
    obs = spp.SatelliteObs(
        pos=sat["pos"], pseudorange=pseudorange,
        clock_bias=sat["clock_bias"], iono_delay=iono_delay,
        trop_delay=trop_delay, tgd=eph.tgd, weight=weight, valid=used)
    init = jnp.concatenate([approx_pos, jnp.zeros(1, dtype)])
    pos_sol = spp.solve_spp(obs, init, iterations=config.pos_iterations)

    dop = spp.DopplerObs(
        sat_pos=sat["pos"], sat_vel=sat["vel"],
        sat_clock_drift=sat["clock_drift"], range_rate=doppler_ms,
        weight=weight, valid=used & config.use_doppler)
    vel_sol = spp.solve_velocity(dop, pos_sol.state[:3])
    vel_ok = vel_sol.valid & spp.validate_velocity(vel_sol, prev_vel_ecef)
    vel_sol = vel_sol._replace(valid=vel_ok)

    lla = ecef_to_lla(pos_sol.state[:3])
    R_enu = ecef_to_enu_rotation(ecef_to_lla(ref_ecef)[0],
                                 ecef_to_lla(ref_ecef)[1])
    enu = jnp.matmul(R_enu, pos_sol.state[:3] - ref_ecef, precision=_HP)

    return EpochSolution(
        position=pos_sol, velocity=vel_sol, enu=enu, lla=lla,
        record=EpochRecord(prn=prn, elevation=elevation, azimuth=azimuth,
                           cn0=cn0, used=used, iono_delay=iono_delay,
                           trop_delay=trop_delay))


def run_epochs(store: EphemerisStore, iono: atmosphere.IonoParams,
               gps_tow, prn, pseudorange, doppler_ms, cn0, meas_valid,
               initial_pos, config: EpochConfig = EpochConfig()):
    """Scan over an epoch log ([E, S] channels): each epoch warm-starts
    from the previous solution and chains velocity validation (``:1711+``).
    Returns EpochSolution with [E]-stacked leaves."""

    def step(carry, inp):
        pos, vel = carry
        tow_e, prn_e, pr_e, dop_e, cn0_e, ok_e = inp
        sol = process_epoch(store, iono, tow_e, prn_e, pr_e, dop_e, cn0_e,
                            ok_e, pos, ref_ecef=initial_pos, config=config,
                            prev_vel_ecef=vel)
        pos_next = jnp.where(sol.position.valid, sol.position.state[:3], pos)
        vel_next = jnp.where(sol.velocity.valid, sol.velocity.vel_ecef, vel)
        return (pos_next, vel_next), sol

    dtype = pseudorange.dtype
    (_, _), sols = jax.lax.scan(
        step, (initial_pos.astype(dtype), jnp.zeros(3, dtype)),
        (gps_tow, prn, pseudorange, doppler_ms, cn0, meas_valid))
    return sols
