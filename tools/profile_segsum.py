"""A/B the backward 'unsort + segment-sum' against alternatives on the chip.

The pipeline bwd must reduce d_feats_s (C=10, cap) given per-entry Gaussian
ids gid_s (cap,) into per-Gaussian rows (C, N). Today: lax.sort by expansion
index (11 operands) + cumsum + offset gathers (~4-6 ms at cap 2^20). This
probe times, with the marginal-cost method (ROADMAP finding #2):

  A. current: 11-operand lax.sort by eidx + cumsum_rows + offset diffs
  B. sort by gid (same op count; within-segment order irrelevant for sums)
  C. XLA scatter-add: zeros(C, N).at[:, gid].add(d)
  D. segment_sum with indices_are_sorted=False (same scatter path)

Usage: python tools/profile_segsum.py [--n 400000] [--cap 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

C = 10


def time_loop(make_body, iters=6, trials=3):
    def build(nit):
        @jax.jit
        def loop():
            def body(i, acc):
                return acc + make_body(i)
            return jax.lax.fori_loop(0, nit, body, 0.0)
        return loop

    lo, hi = build(iters), build(2 * iters)
    jax.block_until_ready((lo(), hi()))
    best_lo = best_hi = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.block_until_ready(lo())
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(hi())
        best_hi = min(best_hi, time.perf_counter() - t0)
    return max(best_hi - best_lo, 1e-9) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--cap", type=int, default=20)
    args = p.parse_args()
    n, cap = args.n, 2 ** args.cap

    from bilateral_driving_tpu.ops import scan_utils

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    # synthetic but structurally faithful: ~1.5 entries/gaussian, sorted by
    # a random permutation (tile-major order is random w.r.t. gid)
    counts = jax.random.randint(ks[0], (n,), 0, 4)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts).astype(jnp.int32)])
    gid_exp = jnp.searchsorted(offsets[1:], jnp.arange(cap), side="right")
    gid_exp = jnp.minimum(gid_exp, n).astype(jnp.int32)
    perm = jax.random.permutation(ks[1], cap)
    gid_s = gid_exp[perm]
    eidx_s = perm.astype(jnp.int32)
    d = jax.random.normal(ks[2], (C, cap), jnp.float32)
    num_isects = offsets[-1]

    def variant_a(i):
        dd = d + i * 1e-6
        unsorted = jax.lax.sort((eidx_s,) + tuple(dd[j] for j in range(C)),
                                dimension=0, num_keys=1, is_stable=False)
        de = jnp.stack(unsorted[1:], axis=0)
        valid = (jnp.arange(cap, dtype=jnp.int32) < num_isects)[None, :]
        de = jnp.where(valid, de, 0.0)
        cs = scan_utils.cumsum_rows(de)
        cs = jnp.concatenate([jnp.zeros((C, 1), cs.dtype), cs], axis=1)
        seg = cs[:, offsets]
        return jnp.sum(seg[:, 1:] - seg[:, :-1])

    def variant_b(i):
        dd = d + i * 1e-6
        srt = jax.lax.sort((gid_s,) + tuple(dd[j] for j in range(C)),
                           dimension=0, num_keys=1, is_stable=False)
        de = jnp.stack(srt[1:], axis=0)
        # gid-sorted layout == expansion layout for summation purposes
        cs = scan_utils.cumsum_rows(de)
        cs = jnp.concatenate([jnp.zeros((C, 1), cs.dtype), cs], axis=1)
        seg = cs[:, offsets]
        return jnp.sum(seg[:, 1:] - seg[:, :-1])

    def variant_c(i):
        dd = d + i * 1e-6
        out = jnp.zeros((C, n + 1), jnp.float32).at[:, gid_s].add(dd)
        return jnp.sum(out[:, :n])

    def variant_d(i):
        dd = d + i * 1e-6
        out = jax.ops.segment_sum(dd.T, gid_s, num_segments=n + 1)
        return jnp.sum(out[:n])

    for name, fn in [("A eidx-sort+cumsum", variant_a),
                     ("B gid-sort+cumsum", variant_b),
                     ("C scatter-add", variant_c),
                     ("D segment_sum", variant_d)]:
        try:
            dt = time_loop(fn)
            print(f"{name:22s} {dt * 1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
