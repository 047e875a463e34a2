"""Benchmark harness (BASELINE.md build-plan step 13).

Measures the two roofline kernels of the prover on the current JAX default
platform (the real TPU chip under the driver):

  * TPU MSM (curves/msm_tpu.py: sorted suffix-scan Pippenger over Pallas
    kernels) at 2^BENCH_LOGN points, 254-bit scalars — the Groth16 prover
    hot spot (reference src/groth16_prove.js:85-101).  Timing includes the
    host window combination, i.e. wall-clock to a finished host-side point.
  * radix-2 NTT over Fr at the same size (reference Fr.fft,
    src/groth16_prove.js:66-76), timed to forced materialization.

Timing methodology note: on this tunneled TPU backend `block_until_ready`
returns before execution completes, and a host fetch costs ~26 ms fixed.
Every timing below therefore forces a (tiny) device->host materialization
and the fixed fetch cost is measured and reported separately.

Headline JSON line: MSM G1 points/s.  `vs_baseline` divides by the
estimated throughput of the reference's WASM + worker-thread engine on one
multicore host (~1.0e6 points/s for bn128 g1m_multiexpAffine on a 16-core
machine; the reference publishes no numbers — see BASELINE.md).

Extended grid (2^20..2^24, G2, bls12-381, more NTT sizes): BENCH_FULL=1.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache so repeated driver runs skip XLA compile time
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BASELINE_MSM_PTS_PER_S = 1.0e6  # snarkjs WASM engine estimate (BASELINE.md)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fetch(x):
    """Force materialization of (a tiny slice of) a device array."""
    return np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[:1]


def build_points(cv, fq, n, distinct=512):
    """n affine points (Montgomery limb arrays) tiled from `distinct`
    small multiples of G — kernel work is data-independent, so tiling does
    not change measured throughput."""
    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.fields import fjnp

    pts = []
    acc = cv.g1
    for _ in range(distinct):
        pts.append(acc)
        acc = hc.g1_add(cv, acc, cv.g1)
    xs = fjnp.np_from_ints(fq, [fq.to_mont(p[0]) for p in pts])
    ys = fjnp.np_from_ints(fq, [fq.to_mont(p[1]) for p in pts])
    reps = -(-n // distinct)
    px = np.tile(xs, (1, reps))[:, :n]
    py = np.tile(ys, (1, reps))[:, :n]
    pinf = np.zeros(n, dtype=bool)
    return jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf)


def build_points_g2(cv, fq, n, distinct=64):
    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.fields import fjnp

    pts = []
    acc = cv.g2
    for _ in range(distinct):
        pts.append(acc)
        acc = hc.g2_add(cv, acc, cv.g2)
    reps = -(-n // distinct)

    def coords(idx, part):
        arr = fjnp.np_from_ints(fq, [fq.to_mont(p[idx][part]) for p in pts])
        return jnp.asarray(np.tile(arr, (1, reps))[:, :n])

    px = (coords(0, 0), coords(0, 1))
    py = (coords(1, 0), coords(1, 1))
    return px, py, jnp.asarray(np.zeros(n, dtype=bool))


def build_scalars(fr, n, seed=0):
    from snarkjs_tpu.fields import fjnp

    rng = np.random.default_rng(seed)
    k = min(n, 4096)
    ints = [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(k)]
    arr = fjnp.np_from_ints(fr, ints)
    reps = -(-n // k)
    return jnp.asarray(np.tile(arr, (1, reps))[:, :n]), ints


def time_msm(cv, group, log_n, iters=3):
    from snarkjs_tpu.curves import msm_tpu
    from snarkjs_tpu.fields import fjnp

    fr, fq = cv.fr, cv.fq
    n = 1 << log_n
    scalars, _ = build_scalars(fr, n)
    if group == "g1":
        px, py, pinf = build_points(cv, fq, n)
    else:
        px, py, pinf = build_points_g2(cv, fq, n)
    m = msm_tpu.get_msm(cv.name, group)
    t0 = time.time()
    res = m.run(px, py, pinf, scalars)
    log(f"  msm {group} 2^{log_n} warmup(+compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        res = m.run(px, py, pinf, scalars)
    dt = (time.time() - t0) / iters
    log(f"  msm {cv.name} {group} 2^{log_n}: {dt * 1e3:.1f} ms/iter = "
        f"{n / dt:,.0f} points/s")
    return n / dt, res


def check_msm_small(cv):
    """Cross-check the device MSM against host bigints on 2^12 points."""
    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.curves import msm as msm_mod
    from snarkjs_tpu.curves import msm_tpu
    from snarkjs_tpu.fields import fjnp

    fr, fq = cv.fr, cv.fq
    n = 1 << 12
    scalars, ints = build_scalars(fr, n)
    px, py, pinf = build_points(cv, fq, n)
    m = msm_tpu.get_msm(cv.name, "g1")
    got = msm_mod.host_jac_to_affine(fq, m.run(px, py, pinf, scalars))
    agg = {}
    for i in range(n):
        agg[i % 512] = (agg.get(i % 512, 0) + ints[i % len(ints)]) % fr.p
    pxh, pyh = np.asarray(px), np.asarray(py)
    want = None
    for i, s in agg.items():
        aff = (fq.from_mont(fjnp.np_to_ints(fq, pxh[:, i:i + 1])[0]),
               fq.from_mont(fjnp.np_to_ints(fq, pyh[:, i:i + 1])[0]))
        p = hc.g1_mul(cv, aff, s)
        want = p if want is None else hc.g1_add(cv, want, p)
    assert got == want, f"MSM mismatch: {got} != {want}"
    log("  msm correctness vs host bigint (2^12): OK")


def time_ntt(fr_name, log_n, iters=5):
    from snarkjs_tpu.fields import fjnp
    from snarkjs_tpu.ntt import ntt as nttmod
    from snarkjs_tpu.fields.params import get_params

    fr = get_params(fr_name)
    ctx = fjnp.get_ctx(fr_name)
    n = 1 << log_n
    rng = np.random.default_rng(1)
    k = min(n, 4096)
    vals = [int.from_bytes(rng.bytes(31), "little") for _ in range(k)]
    arr = fjnp.np_from_ints(fr, vals)
    a = jnp.asarray(np.tile(arr, (1, -(-n // k)))[:, :n])
    f = jax.jit(lambda a: nttmod.ntt(ctx, a))
    fetch(f(a))
    # measure fixed fetch overhead and subtract
    t0 = time.time()
    for _ in range(iters):
        fetch(a)
    over = (time.time() - t0) / iters
    t0 = time.time()
    for _ in range(iters):
        fetch(f(a))
    dt = (time.time() - t0) / iters - over
    log(f"  ntt {fr_name} 2^{log_n}: {dt * 1e3:.1f} ms/iter = "
        f"{n / dt:,.0f} elems/s (fetch overhead {over * 1e3:.0f} ms excluded)")
    return n / dt


def main():
    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    log(f"bench: platform={platform} devices={len(jax.devices())}")

    from snarkjs_tpu.curves import host_curve as hc

    cv = hc.BN254
    log_n = int(os.environ.get("BENCH_LOGN", 20 if on_accel else 14))
    full = os.environ.get("BENCH_FULL") == "1"

    check_msm_small(cv)
    rate, _ = time_msm(cv, "g1", log_n)
    ntt_rate = time_ntt("bn254_fr", log_n)

    if full:
        for extra_log in (22, 24):
            if extra_log > log_n:
                time_msm(cv, "g1", extra_log, iters=1)
        time_msm(cv, "g2", min(log_n, 18), iters=1)
        time_msm(hc.BLS12_381, "g1", min(log_n, 20), iters=1)
        time_ntt("bls12_381_fr", log_n)
        time_ntt("bn254_fr", min(log_n + 2, 22))

    print(json.dumps({
        "metric": f"msm_g1_bn254_points_per_s_2^{log_n}",
        "value": round(rate, 1),
        "unit": "points/s",
        "vs_baseline": round(rate / BASELINE_MSM_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
