#!/usr/bin/env python
"""A/B the packed-stats build: transposing gather vs MXU selector repack.

The fleet trace (dump_fleet_hlo.py) shows the [B*NK, 16] stats gather
running at ~26 ns/row instead of the isolated 8.2 ns/row
(profile_gather_modes.py): ``NeighborhoodStats.packed`` is built with
``stats[:, :9].T``, and XLA folds that transpose INTO the gather by
assigning it a dim-0-minor {0,1} output layout — every gathered 64-byte
row then lands strided. Candidates measured here, each producing the
same [10, NK] packed tensor from a [cap, 16] table + [NK] indices:

  a) transpose fused into the gather (current lowering)
  b) gather -> optimization_barrier -> transpose (does a barrier pin the
     row-major layout?)
  c) gather -> selector matmul: packed = E @ rows^T on the MXU
     (einsum 'ck,nk->cn' with a 0/1 E; exact, bandwidth-bound)

Modes run under vmap over B lanes (the fleet shape) and include the gate
computation so the consumer set matches gather_neighborhood exactly.
Prints one JSON line with ns/row per mode + bitwise equality vs (a).
"""

import sys
sys.path.insert(0, "/root/repo")

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _jit_with_probe, _timed

    B, cap, NK = 64, 8192, 57344
    rng = np.random.default_rng(0)
    table = rng.normal(size=(B, cap, 16)).astype(np.float32)
    # Realistic id/valid channels so the gate has work to do
    table[..., 9] = 1.0
    table[..., 10] = rng.integers(0, 65536, size=(B, cap))
    table[..., 11] = rng.integers(0, 4, size=(B, cap))
    idx0 = rng.integers(0, cap, size=(B, NK)).astype(np.int32)
    nvid0 = rng.integers(0, 1 << 18, size=(B, NK)).astype(np.int32)
    okm = (rng.random((B, NK)) < 0.9).astype(np.float32)
    tab_j = jax.device_put(jnp.asarray(table))
    okm_j = jax.device_put(jnp.asarray(okm))

    def gate_and_pack_t(stats, nvid, ok):
        """Current: column reads + transpose (ndt.py gather_neighborhood)."""
        vox_valid = (stats[:, 9] > 0.5) & (stats[:, 9] < 1.5)
        vid_match = ((stats[:, 10] == (nvid & 0xFFFF).astype(jnp.float32))
                     & (stats[:, 11] == (nvid >> 16).astype(jnp.float32)))
        gate = jnp.where(vid_match & vox_valid, ok, 0.0)
        return jnp.concatenate([stats[:, :9].T, gate[None]], axis=0)

    E = np.zeros((12, 16), np.float32)
    for c in range(12):
        E[c, c] = 1.0
    E_j = jnp.asarray(E)

    def gate_and_pack_mm(stats, nvid, ok):
        """Selector matmul: rows stay row-major, MXU does the transpose."""
        p12 = jnp.einsum("ck,nk->cn", E_j, stats,
                         precision=jax.lax.Precision.HIGHEST)
        vox_valid = (p12[9] > 0.5) & (p12[9] < 1.5)
        vid_match = ((p12[10] == (nvid & 0xFFFF).astype(jnp.float32))
                     & (p12[11] == (nvid >> 16).astype(jnp.float32)))
        gate = jnp.where(vid_match & vox_valid, ok, 0.0)
        return jnp.concatenate([p12[:9], gate[None]], axis=0)

    def consume(packed):
        # Consumer stand-in: channel-row reads like the Pallas kernel.
        return jnp.sum(packed, axis=1)

    def mode_a(i, nv, ok, t):
        return consume(gate_and_pack_t(t[i], nv, ok))

    def mode_b(i, nv, ok, t):
        g = t[i]
        (g,) = jax.lax.optimization_barrier((g,))
        return consume(gate_and_pack_t(g, nv, ok))

    def mode_c(i, nv, ok, t):
        return consume(gate_and_pack_mm(t[i], nv, ok))

    results = {}
    outs = {}
    for name, fn in [("a_transposed_gather", mode_a),
                     ("b_barrier", mode_b),
                     ("c_selector_matmul", mode_c)]:
        run = _jit_with_probe(jax.vmap(fn, in_axes=(0, 0, 0, 0)))
        sec, out = _timed(
            run,
            lambda r: (jax.device_put(jnp.asarray((idx0 + r) % cap)),
                       jax.device_put(jnp.asarray(nvid0)), okm_j, tab_j))
        results[name + "_ns_per_row"] = round(sec / (B * NK) * 1e9, 2)
        outs[name] = np.asarray(out)

    results["b_bitwise_equal"] = bool(
        (outs["a_transposed_gather"] == outs["b_barrier"]).all())
    results["c_bitwise_equal"] = bool(
        (outs["a_transposed_gather"] == outs["c_selector_matmul"]).all())
    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
