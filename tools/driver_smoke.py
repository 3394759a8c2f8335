"""On-chip driver smoke: run the EXACT commands the round driver runs, plus
a compile+execute sweep over every Pallas kernel under every env-selectable
mode, on REAL hardware (never interpret).

Why this exists: round 4 shipped a segsum default whose kernel had only ever
run in interpret mode; Mosaic rejected it on the chip and the delivered
bench (BENCH_r04.json) recorded rc=1. CI runs on CPU, so Mosaic lowering
constraints are invisible to the test suite — this harness is the on-chip
gate. Policy: run `python tools/driver_smoke.py` after the LAST source
change of a round; no kernel/env default flips without a green run.

Sequential subprocesses (the axon tunnel is single-client): one probe
process per env-mode combination (modes are read at import time), then the
driver's literal `python bench.py`. Exits nonzero on any failure and prints
one JSON summary line.

Mode matrix (one-factor-at-a-time around the defaults):
  defaults           — BILATERAL_SEGSUM=mxu3, TRI/SUF=scan; also covers the
                       cubemap splat grad, the Pallas scans, and the
                       __graft_entry__.entry() compile in the same process
  segsum=split/highest/xla, tri=matmul/mxu3, suf=mxu3 — pipeline fwd+bwd
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MODE_MATRIX = [
    ("defaults", {}),
    ("segsum=split", {"BILATERAL_SEGSUM": "split"}),
    ("segsum=highest", {"BILATERAL_SEGSUM": "highest"}),
    ("segsum=xla", {"BILATERAL_SEGSUM": "xla"}),
    ("tri=matmul", {"BILATERAL_TRI_MODE": "matmul"}),
    ("tri=mxu3", {"BILATERAL_TRI_MODE": "mxu3"}),
    ("suf=mxu3", {"BILATERAL_SUF_MODE": "mxu3"}),
]


def _probe_pipeline():
    """Small-but-real fwd+bwd through the full Pallas pipeline on the chip:
    expansion kernel, 12-payload sort, rasterize fwd+bwd, unsort, segsum."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bilateral_driving_tpu.ops import pipeline

    assert jax.default_backend() in ("tpu", "axon"), (
        f"driver_smoke must run on the chip, got {jax.default_backend()}")
    rng = np.random.RandomState(0)
    n, W, H = 20_000, 256, 160
    means = jnp.asarray(
        rng.randn(n, 3) * np.array([2.0, 1.2, 1.0]) + np.array([0, 0, 6.0]),
        jnp.float32)
    quats = jnp.asarray(rng.randn(n, 4), jnp.float32)
    scales = jnp.asarray(np.exp(rng.randn(n, 3) * 0.3 - 3.0), jnp.float32)
    opac = jnp.asarray(1 / (1 + np.exp(-rng.randn(n))), jnp.float32)
    colors = jnp.asarray(rng.rand(n, 3), jnp.float32)
    K = jnp.array([[220.0, 0, W / 2], [0, 220.0, H / 2], [0, 0, 1]])
    view = jnp.eye(4)
    cfg = pipeline.RasterizeConfig(isect_capacity=2 ** 17)

    def loss(means, scales, colors, opac):
        out = pipeline.rasterize(means, quats, scales, opac, colors, view,
                                 K, W, H, cfg)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["depth"])

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))(
        means, scales, colors, opac)
    jax.block_until_ready(grads)
    leaves = [val] + list(jax.tree.leaves(grads))
    assert all(bool(jnp.isfinite(x).all()) for x in leaves), "non-finite"
    return {"loss": float(val),
            "grad_norm": float(sum(jnp.sum(g ** 2) for g in
                                   jax.tree.leaves(grads)) ** 0.5)}


def _probe_aux_kernels():
    """Cubemap window-splat gradient + Pallas blocked scans, on the chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bilateral_driving_tpu.models import sky
    from bilateral_driving_tpu.ops import scan_pallas

    key = jax.random.PRNGKey(0)
    params = sky.init_envlight(key, resolution=256)
    dirs = jax.random.normal(key, (4096, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def loss(p):
        return jnp.sum(sky.envlight_color(p, dirs) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    jax.block_until_ready(g)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))

    x = jnp.asarray(np.random.RandomState(0).randn(4, 1 << 16), jnp.float32)
    cs = jax.jit(lambda a: scan_pallas.scan_rows(a, "sum"))(x)
    cm = jax.jit(lambda a: scan_pallas.scan_rows(a, "max"))(x)
    jax.block_until_ready((cs, cm))
    np.testing.assert_allclose(np.asarray(cs), np.cumsum(np.asarray(x), 1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cm),
                               np.maximum.accumulate(np.asarray(x), 1))
    x1 = jnp.asarray(np.random.RandomState(1).randn(1 << 17), jnp.float32)
    c1 = jax.jit(lambda a: scan_pallas.scan1d(a, "sum"))(x1)
    np.testing.assert_allclose(np.asarray(c1), np.cumsum(np.asarray(x1)),
                               rtol=1e-4, atol=1e-2)

    # segsum kernels vs a dense numpy reference ON HARDWARE (the CPU suite
    # only exercises interpret mode — ADVICE r4 item 4): both the stacked
    # and the split-input entry points, asserted numerics not just compile
    from bilateral_driving_tpu.ops import segsum_pallas as sp
    if sp._MODE != "xla":
        rng = np.random.RandomState(7)
        cap, nseg = 1 << 17, 30_000
        counts = rng.randint(0, 9, nseg)
        offs = np.minimum(np.concatenate([[0], np.cumsum(counts)]),
                          cap).astype(np.int32)
        data = rng.randn(10, cap).astype(np.float32)
        ref = np.stack([data[:, offs[g]:offs[g + 1]].sum(1)
                        for g in range(nseg)], 1)
        d16 = np.zeros((sp.FEAT, cap), np.float32)
        d16[4:14] = data
        out_s = np.asarray(sp.segment_sum(jnp.asarray(d16),
                                          jnp.asarray(offs)))
        np.testing.assert_allclose(out_s[4:14], ref, atol=2e-5)
        rows = tuple(jnp.asarray(data[j]) for j in range(10))
        out_r = np.asarray(sp.segment_sum_rows(rows, jnp.asarray(offs),
                                               row0=4))
        np.testing.assert_allclose(out_r[4:14], ref, atol=2e-5)
    return {"aux": "ok"}


def _probe_entry():
    """Compile-check the driver's single-chip entry() exactly as it does."""
    import jax
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.jit(fn).lower(*args).compile()
    return {"entry": "compiled"}


def _run_probe(name, env, probes):
    cmd = [sys.executable, os.path.abspath(__file__), "--probe",
           ",".join(probes)]
    full_env = dict(os.environ, **env)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                           env=full_env, timeout=1800)
    except subprocess.TimeoutExpired:
        return {"name": name, "ok": False,
                "seconds": round(time.time() - t0, 1),
                "tail": "TIMEOUT (1800s)"}
    dt = time.time() - t0
    ok = r.returncode == 0
    tail = (r.stdout + r.stderr).strip().splitlines()[-1] if not ok else \
        r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    if not ok:
        print(f"[driver_smoke] FAIL {name} ({dt:.0f}s)", file=sys.stderr)
        print("\n".join((r.stdout + "\n" + r.stderr).splitlines()[-30:]),
              file=sys.stderr)
    return {"name": name, "ok": ok, "seconds": round(dt, 1), "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None,
                    help="internal: run probes in-process (comma list)")
    ap.add_argument("--skip-bench", action="store_true",
                    help="skip the final `python bench.py` run")
    ap.add_argument("--quick", action="store_true",
                    help="gate mode: defaults + the non-default segsum "
                         "kernel only (~25 min); the full matrix took "
                         "78 min on the tunnel (all-PASS r5 run in "
                         "ROADMAP) and is for kernel-change rounds")
    args = ap.parse_args()

    if args.probe:
        out = {}
        for p in args.probe.split(","):
            out[p] = {"pipeline": _probe_pipeline,
                      "aux": _probe_aux_kernels,
                      "entry": _probe_entry}[p]()
        print(json.dumps(out))
        return

    results = []
    matrix = MODE_MATRIX[:2] if args.quick else MODE_MATRIX
    for name, env in matrix:
        probes = ["pipeline", "aux", "entry"] if name == "defaults" else \
            ["pipeline"]
        results.append(_run_probe(name, env, probes))

    if not args.skip_bench:
        t0 = time.time()
        r = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                           capture_output=True, text=True, timeout=1200)
        bench_line = next((ln for ln in r.stdout.splitlines()
                           if ln.startswith("{")), "")
        results.append({"name": "bench.py", "ok": r.returncode == 0,
                        "seconds": round(time.time() - t0, 1),
                        "tail": bench_line})
        if r.returncode != 0:
            print("\n".join((r.stdout + "\n" + r.stderr).splitlines()[-30:]),
                  file=sys.stderr)

    ok = all(x["ok"] for x in results)
    print(json.dumps({"driver_smoke": "PASS" if ok else "FAIL",
                      "results": results}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
