"""Probe Mosaic lowering support + batched-row-sort cost on the real chip.

Feasibility probes for the Pallas merge sort (ROADMAP round-3 lever):
  A. lax.sort on (num_blocks, block) rows — the seed-run generator — vs the
     1-D cap-sized sort it would replace (13 columns each).
  B. in-kernel ops the merge kernel needs: leading-dim reshape compare-
     exchange, (128,128) transpose, lane flip (jnp.flip axis=-1), dynamic
     pltpu.roll, dynamic-offset DMA from an ANY-space operand.

Usage: python tools/probe_mosaic.py [--cap 1048576] [--block 16384]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_loop(make_body, iters=6, trials=3):
    def build(n):
        @jax.jit
        def loop():
            def body(i, acc):
                return acc + make_body(i)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return loop

    lo, hi = build(iters), build(2 * iters)
    jax.block_until_ready((lo(), hi()))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(lo())
        tlo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(hi())
        thi = time.perf_counter() - t0
        best = min(best, max(thi - tlo, 1e-9))
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cap", type=int, default=1 << 20)
    p.add_argument("--block", type=int, default=1 << 14)
    args = p.parse_args()
    cap, B = args.cap, args.block

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(junk * 1.0001)

    key = jax.random.PRNGKey(0)
    keys31 = jax.random.randint(key, (cap,), 0, 2 ** 31 - 1, jnp.int32)
    cols10 = jax.random.normal(jax.random.fold_in(key, 5), (12, cap))

    # ---- A: batched row sort vs 1-D sort, full-output sink
    def sort_rows(nblk):
        shape = (nblk, cap // nblk) if nblk > 1 else (cap,)
        axis = 1 if nblk > 1 else 0
        def body(i):
            k = jnp.bitwise_xor(keys31, i % 3).reshape(shape)
            ops = (k,) + tuple((cols10[j] + (i % 3)).reshape(shape)
                               for j in range(12))
            out = jax.lax.sort(ops, dimension=axis, num_keys=1,
                               is_stable=False)
            return sum(o.sum().astype(jnp.float32) for o in out)
        return body

    for nblk in (1, cap // (8 * B), cap // (2 * B), cap // B, cap // (B // 4)):
        if nblk < 1:
            continue
        ms = time_loop(sort_rows(max(nblk, 1))) * 1e3
        print(f"  sort13 rows=({max(nblk,1)},{cap//max(nblk,1)})"
              f"  {ms:8.3f} ms", flush=True)

    # ---- B: Mosaic op probes (each in a tiny kernel; report lower/run/fail)
    R = B // 128

    def probe(name, kernel, *inputs, **kw):
        try:
            out = pl.pallas_call(kernel, **kw)(*inputs)
            jax.block_until_ready(out)
            print(f"  [ok]   {name}", flush=True)
            return out
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"  [FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
            return None

    x = jnp.arange(R * 128, dtype=jnp.float32).reshape(R, 128)

    def k_reshape_cmp(x_ref, o_ref):
        v = x_ref[:]
        v4 = v.reshape(R // 2, 2, 128)
        lo = jnp.minimum(v4[:, 0], v4[:, 1])
        hi = jnp.maximum(v4[:, 0], v4[:, 1])
        o_ref[:] = jnp.stack([lo, hi], axis=1).reshape(R, 128)

    probe("leading-dim reshape cmp-exchange", k_reshape_cmp, x,
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))

    def k_transpose(x_ref, o_ref):
        v = x_ref[:128, :]
        o_ref[:128, :] = v.T

    probe("(128,128) in-kernel transpose", k_transpose, x,
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))

    def k_flip_lanes(x_ref, o_ref):
        o_ref[:] = jnp.flip(x_ref[:], axis=1)

    probe("lane flip (jnp.flip axis=1)", k_flip_lanes, x,
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))

    def k_flip_rows(x_ref, o_ref):
        o_ref[:] = jnp.flip(x_ref[:], axis=0)

    probe("sublane flip (jnp.flip axis=0)", k_flip_rows, x,
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))

    def k_roll_dyn(x_ref, s_ref, o_ref):
        flat = x_ref[:].reshape(1, R * 128)
        o_ref[:] = pltpu.roll(flat, shift=s_ref[0], axis=1).reshape(R, 128)

    probe("dynamic 1-D roll (flattened)", k_roll_dyn, x,
          jnp.array([37], jnp.int32),
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM)])

    def k_roll_lane(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    probe("dynamic lane roll (axis=1)", k_roll_lane, x,
          jnp.array([37], jnp.int32),
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM)])

    big = jnp.arange(cap, dtype=jnp.float32).reshape(cap // 128, 128)

    def k_dyn_dma(h_ref, s_ref, o_ref, sem):
        r0 = s_ref[0]
        cp = pltpu.make_async_copy(h_ref.at[pl.ds(r0, R), :], o_ref, sem)
        cp.start()
        cp.wait()

    out = probe("dynamic-offset row DMA (ANY->VMEM)", k_dyn_dma, big,
                jnp.array([513], jnp.int32),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                scratch_shapes=[pltpu.SemaphoreType.DMA])
    if out is not None:
        expect = big[513:513 + R]
        print(f"         dma correct: {bool(jnp.all(out == expect))}")

    def k_iota_gather(x_ref, o_ref):
        # static in-register lane reverse via take along lanes? (likely FAIL)
        idx = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        o_ref[:] = jnp.take_along_axis(x_ref[:], 127 - idx, axis=1)

    probe("lane gather take_along_axis", k_iota_gather, x,
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))


if __name__ == "__main__":
    main()
