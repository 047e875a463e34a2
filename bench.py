"""Benchmark harness (BASELINE.md build-plan step 13).

Measures the two roofline kernels of the prover on the current JAX default
platform (real TPU chip under the driver):

  * Pippenger G1 MSM points/s at 2^20 points, 254-bit scalars (the Groth16
    prover hot spot, reference src/groth16_prove.js:85-101), including the
    host jacobian window finishing.
  * radix-2 NTT elems/s at 2^20 (reference Fr.fft, src/groth16_prove.js:66-76)
    — reported on stderr as supplementary info.

Headline JSON line: MSM G1 points/s.  `vs_baseline` divides by the estimated
throughput of the reference's WASM + worker-thread engine on one multicore
host (~1.0e6 points/s for bn128 g1m_multiexpAffine on a 16-core machine; the
reference publishes no numbers — see BASELINE.md).  Target is >=5x.
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


def build_points(cv, fq, n, distinct=512):
    """n affine G1 points (Montgomery limb arrays) tiled from `distinct`
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


def main():
    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    log(f"bench: platform={platform} devices={len(jax.devices())}")

    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.curves import msm as msm_mod
    from snarkjs_tpu.fields import fjnp
    from snarkjs_tpu.ntt import ntt as nttmod

    cv = hc.BN254
    fr, fq = cv.fr, cv.fq
    frctx = fjnp.get_ctx(fr.name)
    fqctx = fjnp.get_ctx(fq.name)

    log_n = int(os.environ.get("BENCH_LOGN", 20 if on_accel else 14))
    n = 1 << log_n

    rng = np.random.default_rng(0)
    scal_ints = [int.from_bytes(rng.bytes(32), "little") % fr.p
                 for _ in range(min(n, 4096))]
    scal_np = fjnp.np_from_ints(fr, scal_ints)
    reps = -(-n // scal_np.shape[1])
    scalars = jnp.asarray(np.tile(scal_np, (1, reps))[:, :n])

    px, py, pinf = build_points(cv, fq, n)
    mctx = msm_mod.MSMContext(fqctx, fq)

    c = int(os.environ.get("BENCH_C", 8))
    R = int(os.environ.get("BENCH_R", 4096 if on_accel else 256))
    log(f"msm config: n=2^{log_n} c={c} R={R}; compiling...")
    t0 = time.time()
    res = mctx.run(px, py, pinf, scalars, c=c, R=R)
    log(f"msm warmup(+compile): {time.time() - t0:.1f}s")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        res = mctx.run(px, py, pinf, scalars, c=c, R=R)
    msm_dt = (time.time() - t0) / iters
    msm_rate = n / msm_dt
    # correctness spot check vs host bigint MSM on a small prefix
    k = 256
    px_h = np.asarray(px[:, :k])
    py_h = np.asarray(py[:, :k])
    sc_h = np.asarray(scalars[:, :k])
    want = None
    for i in range(k):
        aff = (fq.from_mont(fjnp.np_to_ints(fq, px_h[:, i:i+1])[0]),
               fq.from_mont(fjnp.np_to_ints(fq, py_h[:, i:i+1])[0]))
        p = hc.g1_mul(cv, aff, fjnp.np_to_ints(fr, sc_h[:, i:i+1])[0])
        want = p if want is None else hc.g1_add(cv, want, p)
    small = mctx.run(px[:, :k], py[:, :k], pinf[:k], scalars[:, :k], c=8)
    got = msm_mod.host_jac_to_affine(fq, small)
    assert got == want, f"MSM mismatch: {got} != {want}"
    log(f"msm 2^{log_n}: {msm_dt*1e3:.1f} ms/iter = {msm_rate:,.0f} points/s "
        "(verified vs host bigint on 256-pt prefix)")

    # NTT supplementary
    poly = jnp.asarray(fjnp.np_from_ints(
        fr, [int.from_bytes(rng.bytes(31), "little") for _ in range(4096)]))
    poly = jnp.asarray(np.tile(np.asarray(poly), (1, n // 4096))[:, :n])
    f = jax.jit(lambda a: nttmod.ntt(frctx, a))
    f(poly).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        f(poly).block_until_ready()
    ntt_dt = (time.time() - t0) / iters
    log(f"ntt 2^{log_n}: {ntt_dt*1e3:.1f} ms/iter = {n/ntt_dt:,.0f} elems/s")

    print(json.dumps({
        "metric": f"msm_g1_bn254_points_per_s_2^{log_n}",
        "value": round(msm_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_rate / BASELINE_MSM_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
