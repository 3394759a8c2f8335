"""Component profile of the sort-path backward (_expand_sort_pallas_bwd).

Round-3 profiling attributed ~10.4 ms (cap 2^20) to "sort-path bwd" with
only the unsort sort itself (~5.5 ms) separated. This times each component
standalone (marginal in-program-loop method, tools/profile_prefix.py):

  A  unsort sort: lax.sort key=gid + 10 f32 payloads
  B  cumsum_rows over (10, cap)
  C  segment pick + diff + lane-major d_table build
  D  dside boundary merge (two .at[].add in rasterize_bwd's caller)
  E  projection bwd tail (d_table -> d_params) is NOT here (part of
     autodiff through projection; see profile_prefix P1)

Usage: python tools/profile_bwdpath.py [--n 400000] [--cap 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_loop(make_body, iters=8, trials=3):
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
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(hi())
        t_hi = time.perf_counter() - t0
        if t_hi - t_lo > 0:
            best = min(best, (t_hi - t_lo) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--cap", type=int, default=20)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from bilateral_driving_tpu.ops import scan_utils
    from bilateral_driving_tpu.ops.binning import CHUNK
    from bilateral_driving_tpu.ops.rasterize_pallas import FEAT

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(jax.jit(lambda x: (x * 1.5 + 2.0).sum())(junk))
    del junk

    n, cap = args.n, 2 ** args.cap
    NP = 10
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    # realistic shapes: gids uniform over n, ~90% of cap live
    live = int(cap * 0.9)
    gid_s = jnp.where(jnp.arange(cap) < live,
                      jax.random.randint(ks[0], (cap,), 0, n), n)
    gid_s = gid_s.astype(jnp.int32)
    d_feats = jax.random.normal(ks[1], (NP, cap), jnp.float32)
    counts = jax.random.randint(ks[2], (n,), 0, 5)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts).astype(jnp.int32)])
    n_tiles = 17 * 10 * 11  # 544x320 -> 17x10 tiles; fake factor for starts
    n_tiles = 170
    starts = jnp.sort(jax.random.randint(ks[3], (n_tiles,), 0, cap))
    cnts = jnp.concatenate([starts[1:] - starts[:-1],
                            jnp.array([cap - starts[-1]])]).astype(jnp.int32)
    dside = jax.random.normal(key, (n_tiles, 2, FEAT, CHUNK), jnp.float32)
    dfeats16 = jax.random.normal(key, (FEAT, cap), jnp.float32)

    def a_unsort(i):
        ops = (gid_s + (i & 1),) + tuple(d_feats[j] + i for j in range(NP))
        s = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=False)
        return sum(jnp.sum(x) for x in s[1:])

    def a2_unsort_key_only(i):
        s = jax.lax.sort((gid_s + (i & 1),
                          jnp.arange(cap, dtype=jnp.int32) + i),
                         dimension=0, num_keys=1, is_stable=False)
        return jnp.sum(s[1]).astype(jnp.float32)

    def b_cumsum(i):
        return jnp.sum(scan_utils.cumsum_rows(d_feats + i)[:, -1])

    def c_segdiff(i):
        cs = d_feats + i
        cs = jnp.concatenate([jnp.zeros((NP, 1), cs.dtype), cs], axis=1)
        seg = cs[:, offsets]
        d_rows = seg[:, 1:] - seg[:, :-1]
        d_table = jnp.zeros((16, n), d_rows.dtype)
        d_table = d_table.at[4:4 + NP, :].set(d_rows)
        return jnp.sum(d_table)

    def d_dside(i):
        capc = cap // CHUNK
        ends = starts + cnts
        fc = jnp.clip(starts // CHUNK, 0, capc - 1)
        lc = jnp.clip((ends + CHUNK - 1) // CHUNK - 1, 0, capc - 1)
        d3 = (dfeats16 + i).reshape(FEAT, capc, CHUNK)
        d3 = d3.at[:, fc, :].add(dside[:, 0].transpose(1, 0, 2))
        d3 = d3.at[:, lc, :].add(dside[:, 1].transpose(1, 0, 2))
        return jnp.sum(d3)

    def e_zeros(i):
        z = jnp.zeros((FEAT, cap), jnp.float32) + i
        return jnp.sum(z)

    from bilateral_driving_tpu.ops import segsum_pallas as sp

    d16 = jnp.concatenate([d_feats,
                           jnp.zeros((FEAT - NP, cap), jnp.float32)], 0)
    offs_c = jnp.minimum(offsets, cap)

    def f_segsum_kernel(i):
        return jnp.sum(sp.segment_sum(d16 + i, offs_c))

    def f2_segsum_split(i):
        rows = tuple(d_feats[j] + i for j in range(NP))
        return jnp.sum(sp.segment_sum_rows(rows, offs_c, row0=4))

    def f3_stack16(i):
        zrow = jnp.zeros((cap,), jnp.float32)
        d = jnp.stack([zrow] * 4 + [d_feats[j] + i for j in range(NP)]
                      + [zrow] * 2, axis=0)
        return jnp.sum(d[:, ::257])

    def g_bc_replacement(i):
        # what the kernel replaces: cumsum + boundary gather + diff
        cs = scan_utils.cumsum_rows(d_feats + i)
        cs = jnp.concatenate([jnp.zeros((NP, 1), cs.dtype), cs], axis=1)
        seg = cs[:, offs_c]
        return jnp.sum(seg[:, 1:] - seg[:, :-1])

    for name, fn in [("A unsort sort (1key+10pay)", a_unsort),
                     ("A2 sort key+iota only", a2_unsort_key_only),
                     ("B cumsum_rows (10,cap)", b_cumsum),
                     ("C seg pick+diff+d_table", c_segdiff),
                     ("D dside merge", d_dside),
                     ("E zeros(16,cap)", e_zeros),
                     ("F pallas segsum kernel", f_segsum_kernel),
                     ("F2 segsum split-input", f2_segsum_split),
                     ("F3 16-row stack alone", f3_stack16),
                     ("G cumsum+gather+diff (replaced)", g_bc_replacement)]:
        dt = time_loop(fn, iters=args.iters)
        print(f"{name:30s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
