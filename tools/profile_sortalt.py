"""Measure sort-replacement primitives on the real chip (honest method).

The 13-payload `lax.sort` + 11-payload bwd unsort is ~17.6 ms of a 36 ms
fwd+bwd at cap 2^20 (ROADMAP). Candidate replacements hinge on the rates of
a few XLA primitives this script measures in isolation:

  sort13 / sort11 / sort3 / sort2   payload-count scaling of lax.sort
  rowgather                         table[(N+1,14)][random ids (cap,)]
  rowscatter                        out[(cap,14)].at[perm].set(rows)
  rowscatter_add                    (N+1,10).at[ids].add rows (bwd segsum)
  colscatter                        one i32 column scatter (known ~2.7 ms)

Method per ROADMAP finding #2: junk-buffer preamble to force honest mode,
fori_loop at N and 2N trips, divide the difference; inputs varied per trip.

Usage: python tools/profile_sortalt.py [--n 400000] [--cap 655360]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
    p.add_argument("--cap", type=int, default=655_360)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()
    n, cap = args.n, args.cap

    junk = jnp.ones((64, 2 ** 20), jnp.float32)
    jax.block_until_ready(junk * 1.0001)

    key = jax.random.PRNGKey(0)
    keys31 = jax.random.randint(key, (cap,), 0, 2 ** 31 - 1, jnp.int32)
    gid = jax.random.randint(jax.random.fold_in(key, 1), (cap,), 0, n,
                             jnp.int32)
    perm = jax.random.permutation(jax.random.fold_in(key, 2), cap)
    table = jax.random.normal(jax.random.fold_in(key, 3), (n + 1, 14))
    rows14 = jax.random.normal(jax.random.fold_in(key, 4), (cap, 14))
    cols10 = jax.random.normal(jax.random.fold_in(key, 5), (10, cap))

    def vary(i, x):
        # cheap per-trip variation so the tunnel can't serve cached results
        return x + (i % 3).astype(x.dtype) if x.dtype != jnp.int32 \
            else jnp.bitwise_xor(x, i % 3)

    def sortP(p_count):
        def body(i):
            k = vary(i, keys31)
            ops = (k,) + tuple(vary(i, cols10[j % 10]) for j in
                               range(p_count - 1))
            out = jax.lax.sort(ops, dimension=0, num_keys=1, is_stable=False)
            return sum(o[0].astype(jnp.float32) if o.dtype != jnp.int32
                       else o[0].astype(jnp.float32) for o in out)
        return body

    def rowgather(i):
        g = jnp.abs(jnp.bitwise_xor(gid, i % 3)) % n
        out = table[g]                       # (cap, 14)
        return out[0].sum()

    def rowgather_T(i):
        # gather with table transposed (14, N+1) -> 14 column gathers
        g = jnp.abs(jnp.bitwise_xor(gid, i % 3)) % n
        out = table.T[:, g]
        return out[:, 0].sum()

    def rowscatter(i):
        src = vary(i, rows14)
        out = jnp.zeros((cap, 14)).at[perm].set(src, mode="drop",
                                                unique_indices=True)
        return out[0].sum()

    def rowscatter_add(i):
        g = jnp.abs(jnp.bitwise_xor(gid, i % 3)) % n
        src = vary(i, rows14[:, :10])
        out = jnp.zeros((n + 1, 10)).at[g].add(src, mode="drop")
        return out[0].sum()

    def colscatter(i):
        v = jnp.bitwise_xor(gid, i % 3)
        out = jnp.zeros((cap,), jnp.int32).at[perm].max(v, mode="drop")
        return out[0].astype(jnp.float32)

    def colgather(i):
        g = jnp.abs(jnp.bitwise_xor(gid, i % 3)) % n
        return table[:, 0][g][0]

    benches = [
        ("sort13", sortP(13)),
        ("sort3", sortP(3)),
        ("rowgather(cap,14)", rowgather),
        ("rowscatter_add->(N,10)", rowscatter_add),
        ("rowscatter(cap,14)", rowscatter),
        ("sort11", sortP(11)),
        ("sort2", sortP(2)),
        ("rowgather_T(14,cap)", rowgather_T),
        ("colscatter i32", colscatter),
        ("colgather f32", colgather),
    ]
    print(f"n={n} cap={cap} (marginal-cost method, {args.iters} iters)")
    for name, body in benches:
        try:
            ms = time_loop(body, iters=args.iters) * 1e3
            print(f"  {name:26s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:26s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
