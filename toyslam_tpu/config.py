"""Typed configuration loading/saving (ROS param server replacement).

The reference configures nodes through the ROS param server + YAML
(``config/params.yaml``, ``launch/*.launch`` arg indirection,
``nh.param<T>(name, var, default)`` blocks). Here every pipeline/estimator
already carries a typed NamedTuple config with reference defaults; this
module round-trips those configs through plain dicts / JSON files so runs
are reproducible and parameterizable without code edits.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

_REGISTRY = {}


def _registry():
    """Name -> config class, built lazily to avoid import cycles."""
    if _REGISTRY:
        return _REGISTRY
    from toyslam_tpu.estimators import eskf, preintegration, trilateration, window
    from toyslam_tpu.gnss import pipeline as gnss_pipeline
    from toyslam_tpu.gnss import raim
    from toyslam_tpu.pipelines import batch_fusion, fusion, icp_slam, loam, odometry
    from toyslam_tpu.registration import gicp, icp, ndt
    from toyslam_tpu.sim import gps, sensors

    _REGISTRY.update({
        "ndt": ndt.NDTConfig,
        "icp": icp.ICPConfig,
        "gicp": gicp.GICPConfig,
        "odometry": odometry.OdometryConfig,
        "loam": loam.LoamConfig,
        "icp_slam": icp_slam.IcpSlamConfig,
        "fusion": fusion.FusionConfig,
        "batch_fusion": batch_fusion.BatchFusionConfig,
        "eskf": eskf.ESKFParams,
        "preintegration": preintegration.PreintegrationParams,
        "trilateration": trilateration.TrilaterationConfig,
        "window": window.WindowConfig,
        "raim": raim.RaimConfig,
        "gnss_epoch": gnss_pipeline.EpochConfig,
        "imu_sim": sensors.ImuSimParams,
        "gps_sim": gps.GpsSimConfig,
    })
    return _REGISTRY


def _is_config(value) -> bool:
    return hasattr(value, "_fields") and hasattr(value, "_replace")


def to_dict(config) -> dict:
    """NamedTuple config -> plain nested dict."""
    out = {}
    for field in config._fields:
        v = getattr(config, field)
        out[field] = to_dict(v) if _is_config(v) else v
    return out


def from_dict(cls, data: dict):
    """Build a config of type ``cls`` from a (possibly partial) dict;
    unspecified fields keep their reference defaults."""
    base = cls()
    updates: dict[str, Any] = {}
    for key, val in data.items():
        if key not in cls._fields:
            raise KeyError(f"{cls.__name__} has no parameter '{key}'")
        cur = getattr(base, key)
        if _is_config(cur) and isinstance(val, dict):
            updates[key] = from_dict(type(cur), val)
        elif isinstance(cur, tuple) and not _is_config(cur):
            updates[key] = tuple(val)
        else:
            updates[key] = val
    return base._replace(**updates)


def load(path: str | Path):
    """Load configs from a JSON file of {kind: {param: value}} sections.

    Returns {kind: config}. Unknown kinds raise; unknown params raise —
    typos fail loudly instead of silently using defaults (unlike ROS).
    """
    data = json.loads(Path(path).read_text())
    reg = _registry()
    out = {}
    for kind, params in data.items():
        if kind not in reg:
            raise KeyError(
                f"unknown config section '{kind}'; known: {sorted(reg)}")
        out[kind] = from_dict(reg[kind], params)
    return out


def save(path: str | Path, configs: dict) -> None:
    """Save {kind: config} to JSON."""
    Path(path).write_text(json.dumps(
        {k: to_dict(v) for k, v in configs.items()}, indent=2, sort_keys=True))


def default(kind: str):
    """The reference-default config for a kind."""
    return _registry()[kind]()
