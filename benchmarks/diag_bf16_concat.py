#!/usr/bin/env python
"""Diagnose the Mosaic f32 "accuracy collapse" of the single-pass concat
ranking matmul (VERDICT r4 next-round item 6; docs/TPU_NOTES.md "bf16x3
compensated ranking matmul").

Round 3b measured a K=6 concat variant (hi|lo stacked along the
contraction dim, ONE MXU pass) at 0.73 ms but "bf16-level accuracy" and
parked it undiagnosed. Candidate root causes:

  H1  The K=6 operand pairing was algebraically wrong: stacking
      [s_hi | s_lo] against [t_hi ; t_hi] computes (s_hi+s_lo)@t_hi and
      silently DROPS every *@t_lo cross term, so the error is ~2^-9
      relative by construction — bf16-level, exactly as observed. The
      correct single-pass expansion needs all three products and is K=9:
      [s_hi | s_hi | s_lo] @ [t_hi ; t_lo ; t_hi].
  H2  Mosaic accumulates a single small-K bf16 matmul in bf16 (not f32),
      so even the correct K=9 stacking collapses.

This script separates H1 from H2 on the real chip: each variant runs
inside a Pallas kernel (same code shape as ops/nn_pallas._make_kernel),
errors are measured against a float64 NumPy oracle, and each variant is
timed at the GICP NN shape [16384, 16384] with the honest bench recipe.

The chip-run verdict is written up in docs/TPU_NOTES.md ("Root cause of
the r3b concat collapse").
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import bench as B


def _variant_kernel(mode: str):
    import jax
    import jax.numpy as jnp

    def kernel(s_ref, tt_ref, out_ref):
        s = s_ref[...]          # [TN, 3] f32
        t_t = tt_ref[...]       # [3, TM] f32
        s_hi = s.astype(jnp.bfloat16)
        s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = t_t.astype(jnp.bfloat16)
        t_lo = (t_t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if mode == "highest":
            st = jnp.dot(s, t_t, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        elif mode == "bf16":
            st = jnp.dot(s_hi, t_hi, preferred_element_type=jnp.float32)
        elif mode == "3pass":
            st = jnp.dot(s_hi, t_hi, preferred_element_type=jnp.float32)
            st += jnp.dot(s_hi, t_lo, preferred_element_type=jnp.float32)
            st += jnp.dot(s_lo, t_hi, preferred_element_type=jnp.float32)
        elif mode == "concat6":
            # The r3b variant under test: one K=6 pass. The only way to
            # reach K=6 with a hi|lo stack is to drop one cross term —
            # here *@t_lo (dropping s_lo@* instead is symmetric).
            s6 = jnp.concatenate([s_hi, s_lo], axis=1)          # [TN, 6]
            t6 = jnp.concatenate([t_hi, t_hi], axis=0)          # [6, TM]
            st = jnp.dot(s6, t6, preferred_element_type=jnp.float32)
        elif mode == "concat9":
            # Correct single-pass expansion: all three bf16x3 products in
            # one K=9 MXU pass, accumulated by the MXU instead of by two
            # f32 adds.
            s9 = jnp.concatenate([s_hi, s_hi, s_lo], axis=1)    # [TN, 9]
            t9 = jnp.concatenate([t_hi, t_lo, t_hi], axis=0)    # [9, TM]
            st = jnp.dot(s9, t9, preferred_element_type=jnp.float32)
        else:
            raise ValueError(mode)
        out_ref[...] = st

    return kernel


def run_variant(mode, s, t_t, interpret=False):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    N, M = s.shape[0], t_t.shape[1]
    tn, tm = 256, 2048
    grid = (N // tn, M // tm)
    return pl.pallas_call(
        _variant_kernel(mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        interpret=interpret,
    )(s, t_t)


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), file=sys.stderr)
    rng = np.random.default_rng(7)
    # GICP-representative coordinates: ~100 m magnitude urban points.
    N = M = 16384
    s_np = rng.uniform(-120.0, 120.0, (N, 3)).astype(np.float32)
    t_np = rng.uniform(-120.0, 120.0, (M, 3)).astype(np.float32)

    # Accuracy: small slab against the f64 oracle.
    n_acc = 2048
    oracle = s_np[:n_acc].astype(np.float64) @ t_np[:n_acc].T.astype(np.float64)
    scale = np.abs(oracle).max()
    s_acc = jnp.asarray(s_np[:n_acc])
    tt_acc = jnp.asarray(t_np[:n_acc].T.copy())

    s_dev = jnp.asarray(s_np)
    tt_dev = jnp.asarray(t_np.T.copy())

    results = {}
    for mode in ("highest", "3pass", "concat9", "concat6", "bf16"):
        got = np.asarray(jax.block_until_ready(
            jax.jit(lambda a, b, m=mode: run_variant(m, a, b))(s_acc, tt_acc)))
        rel = np.abs(got - oracle).max() / scale
        # Honest timing at the full NN shape: R reps inside one scan,
        # checksum-closed (bench._timed handles elision detection).
        R = 8

        def prog(sx, m=mode):
            def step(c, _):
                out = run_variant(m, sx, tt_dev)
                return c + out[0, 0] + out[-1, -1], None
            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=R)
            return acc

        runner = B._jit_with_probe(prog)
        sec, _ = B._timed(runner, lambda r: (jax.device_put(
            jnp.asarray(s_np + np.float32(1e-3 * r))),))
        ms = sec / R * 1e3
        results[mode] = (rel, ms)
        print(f"{mode:8s}  max_rel_err={rel:.3e}   {ms:7.3f} ms/pass",
              file=sys.stderr)

    import json
    print(json.dumps({m: {"max_rel_err": float(r), "ms_per_pass": round(t, 3)}
                      for m, (r, t) in results.items()}))


if __name__ == "__main__":
    main()
