#!/usr/bin/env python
"""Micro-benchmark of row-gather lowerings for the fleet stats fetch.

The 64-way fleet spends ~63% of its program in [B, NK] -> [B, NK, 16]
batched stats gathers at ~26 ns/row (docs/TPU_NOTES.md), 2x the
single-lane rate. Candidate mechanisms measured here on the real chip,
with bench.py's elision-proof recipe (fresh index upload per run,
in-program checksum):

  a) single-lane gather rate vs table size (is 26 ns/row a table-size
     effect or a batching effect?)
  b) batched gather (the current fleet lowering)
  c) flattened single-level gather (ops/gatherflat.py)
  d) Pallas kernel: grid over lanes, per-lane [cap, 16] table block in
     VMEM, in-kernel dynamic gather

Every mode consumes the gathered rows into a [.., NK] row-sum (the
gather cannot be skipped; the 14 MB result is fetched nowhere — the
checksum fetch closes the timing window).

Prints one JSON line with ns/row for each mode + equality checks.
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
    idx0 = rng.integers(0, cap, size=(B, NK)).astype(np.int32)
    tab_j = jax.device_put(jnp.asarray(table))

    results = {}

    def fresh_idx(r, shape, hi):
        # r-dependent fresh upload: rotate the index space
        return jax.device_put(jnp.asarray((idx0.reshape(-1)[:np.prod(shape)]
                                           .reshape(shape) + r) % hi))

    REPS = 8  # in-program scan reps to amortize the relay dispatch cost

    def scanned(gather_once):
        """Run gather_once(idx + k) REPS times inside one lax.scan."""
        def f(i, t):
            def body(acc, k):
                g = gather_once((i + k) % cap, t)
                return acc + g, ()
            out, _ = jax.lax.scan(
                f=body, init=gather_once(i, t),
                xs=jnp.arange(1, REPS, dtype=jnp.int32))
            return out
        return f

    # (a) single-lane rate vs table size
    NK8 = NK * 8
    for rows in (8192, 32768, 524288, 2097152):
        t1 = jax.device_put(jnp.asarray(
            rng.normal(size=(rows, 16)).astype(np.float32)))
        big_idx = rng.integers(0, rows, size=(NK8,)).astype(np.int32)

        def one(i, t, rows=rows):
            def body(acc, k):
                return acc + jnp.sum(t[(i + k) % rows], axis=1), ()
            out, _ = jax.lax.scan(body, jnp.sum(t[i], axis=1),
                                  jnp.arange(1, REPS, dtype=jnp.int32))
            return out

        run = _jit_with_probe(one)
        sec, _ = _timed(
            run, lambda r: (jax.device_put(
                jnp.asarray((big_idx + r) % rows)), t1))
        results[f"single_tab{rows}_ns_per_row"] = round(
            sec / (NK8 * REPS) * 1e9, 2)

    # (b) batched gather — current fleet lowering
    run_b = _jit_with_probe(
        scanned(jax.vmap(lambda i, t: jnp.sum(t[i], axis=1))), probe=0)
    sec_b, out_b = _timed(
        run_b, lambda r: (fresh_idx(r, (B, NK), cap), tab_j))
    results["batched_ns_per_row"] = round(
        sec_b / (B * NK * REPS) * 1e9, 2)

    # (b2) batched gather with MATERIALIZED [B, NK, 16] carry (the fleet's
    # regather loop keeps the gathered stats in the while_loop carry)
    def mat_once(i, t):
        g = jax.vmap(lambda ii, tt: tt[ii])(i, t)  # [B, NK, 16]
        return g

    def mat_scan(i, t):
        def body(carry, k):
            g = mat_once((i + k) % cap, t)
            return g, ()
        out, _ = jax.lax.scan(body, mat_once(i, t),
                              jnp.arange(1, REPS, dtype=jnp.int32))
        return jnp.sum(out, axis=2)

    run_b2 = _jit_with_probe(mat_scan)
    sec_b2, _ = _timed(
        run_b2, lambda r: (fresh_idx(r, (B, NK), cap), tab_j))
    results["batched_carry_ns_per_row"] = round(
        sec_b2 / (B * NK * REPS) * 1e9, 2)

    # (c) flattened single-level gather
    flat_tab = jax.device_put(jnp.asarray(table.reshape(B * cap, 16)))

    def flat1(i, ft):
        fi = i + (jnp.arange(B, dtype=jnp.int32) * cap)[:, None]
        return jnp.sum(ft[fi], axis=2)

    run_c = _jit_with_probe(scanned(flat1))
    sec_c, out_c = _timed(
        run_c, lambda r: (fresh_idx(r, (B, NK), cap), flat_tab))
    results["flat_ns_per_row"] = round(sec_c / (B * NK * REPS) * 1e9, 2)
    results["flat_matches"] = bool(
        np.allclose(np.asarray(out_c), np.asarray(out_b),
                    rtol=1e-6, atol=1e-4))

    # (d) Pallas in-VMEM gather, grid over lanes
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        RN = NK // 128

        def kern(idx_ref, tab_ref, out_ref):
            ids = idx_ref[0]              # [RN, 128]
            tab = tab_ref[0]              # [cap, 16]
            ids2 = jnp.broadcast_to(
                ids.reshape(-1)[:, None], (RN * 128, 16))
            g = jnp.take_along_axis(tab, ids2, axis=0)  # [NK, 16]
            out_ref[0] = jnp.sum(g, axis=1).reshape(RN, 128)

        def pallas_gather(i, t):
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, RN, 128), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, cap, 16), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, RN, 128), lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, RN, 128), jnp.float32),
            )(i, t)

        run_e = _jit_with_probe(pallas_gather)
        sec_e, out_e = _timed(
            run_e, lambda r: (fresh_idx(r, (B, RN, 128), cap), tab_j))
        results["pallas_vmem_ns_per_row"] = round(
            sec_e / (B * NK) * 1e9, 2)
        results["pallas_matches"] = bool(
            np.allclose(np.asarray(out_e).reshape(B, NK),
                        np.asarray(out_b), rtol=1e-5, atol=1e-3))
    except Exception as e:  # noqa: BLE001
        results["pallas_error"] = f"{type(e).__name__}: {e}"[:300]

    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
