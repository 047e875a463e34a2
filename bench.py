"""Benchmark harness (BASELINE.md build-plan step 13).

Measures the prover's two roofline kernels plus (BENCH_FULL=1) the full
BASELINE grid and a synthetic 2^20-constraint Groth16 prove, on the current
JAX default platform (the real TPU chip under the driver).

Timing methodology (this tunneled TPU backend):
  * a host fetch of a whole array pays tunnel bandwidth (~30-90 MB/s) — so
    timings force materialization of a device-side 1-element slice only;
  * block_until_ready can return before execution completes here, so
    repeated NTT iterations are CHAINED (x = f(x)) and closed with one tiny
    fetch; the MSM returns host window partials every call, which is a
    natural synchronization point (wall-clock includes host combination).

Headline JSON line: MSM G1 points/s.  `vs_baseline` divides by the
estimated throughput of the reference's WASM + worker-thread engine on one
multicore host (~1.0e6 points/s for bn128 g1m_multiexpAffine on a 16-core
machine; the reference publishes no numbers — see BASELINE.md).
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

_tiny = jax.jit(lambda v: v.reshape(-1)[:1])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def tfetch(x):
    """Force completion via a device-side 1-element slice + 4-byte fetch."""
    return np.asarray(_tiny(jax.tree.leaves(x)[0]))


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


def check_msm_small(cv, group="g1", log_n=12):
    """Cross-check the device MSM against host bigints."""
    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.curves import msm as msm_mod
    from snarkjs_tpu.curves import msm_tpu
    from snarkjs_tpu.fields import fjnp

    fr, fq = cv.fr, cv.fq
    n = 1 << log_n
    scalars, ints = build_scalars(fr, n)
    distinct = 512 if group == "g1" else 64
    if group == "g1":
        px, py, pinf = build_points(cv, fq, n)
    else:
        px, py, pinf = build_points_g2(cv, fq, n)
    m = msm_tpu.get_msm(cv.name, group)
    got = msm_mod.host_jac_to_affine(
        fq, m.run(px, py, pinf, scalars), 1 if group == "g1" else 2)
    agg = {}
    for i in range(n):
        agg[i % distinct] = (agg.get(i % distinct, 0)
                             + ints[i % len(ints)]) % fr.p
    want = None
    gen = cv.g1 if group == "g1" else cv.g2
    mul = hc.g1_mul if group == "g1" else hc.g2_mul
    add = hc.g1_add if group == "g1" else hc.g2_add
    acc = gen
    base = []
    for _ in range(distinct):
        base.append(acc)
        acc = add(cv, acc, gen)
    for i, s in agg.items():
        p = mul(cv, base[i], s)
        want = p if want is None else add(cv, want, p)
    assert got == want, f"MSM {cv.name} {group} mismatch: {got} != {want}"
    log(f"  msm {cv.name} {group} correctness vs host bigint (2^{log_n}): OK")


def time_ntt(fr_name, log_n, iters=6):
    from snarkjs_tpu.fields import fjnp
    from snarkjs_tpu.ntt import ntt as nttmod
    from snarkjs_tpu.fields.params import get_params

    fr = get_params(fr_name)
    ctx = fjnp.get_ctx(fr_name)
    n = 1 << log_n
    rng = np.random.default_rng(1)
    k = min(n, 4096)
    vals = [int.from_bytes(rng.bytes(fr.n8 - 1), "little") for _ in range(k)]
    arr = fjnp.np_from_ints(fr, vals)
    a = jnp.asarray(np.tile(arr, (1, -(-n // k)))[:, :n])
    f = jax.jit(lambda a: nttmod.ntt(ctx, a))
    t0 = time.time()
    tfetch(f(a))
    log(f"  ntt {fr_name} 2^{log_n} warmup(+compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    x = a
    for _ in range(iters):
        x = f(x)                       # chained: forces serial execution
    tfetch(x)
    dt = (time.time() - t0) / iters
    log(f"  ntt {fr_name} 2^{log_n}: {dt * 1e3:.1f} ms/iter = "
        f"{n / dt:,.0f} elems/s")
    return n / dt


def time_groth16_prove(n_constraints=600_000):
    """Synthetic squaring-chain circuit: domain 2^20, ~600k variables.

    BASELINE config #1: full prove wall-clock (QAP + 4 nVars MSMs + H MSM),
    proof verified in-process.
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "__graft_entry__.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    from snarkjs_tpu.protocols import groth16, groth16_setup

    t0 = time.time()
    cv, r1cs, wit = g._tiny_circuit(n_constraints)
    zk = groth16_setup.setup_from_secrets(
        r1cs, tau=0xABCDE12345, alpha=5, beta=7, gamma=1, delta=11)
    log(f"  groth16 synthetic setup ({n_constraints} constraints, domain "
        f"{zk.domain_size}): {time.time() - t0:.1f}s")
    t0 = time.time()
    proof, publics = groth16.prove(zk, wit, r=123, s=456)
    log(f"  groth16 prove warmup(+compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    proof, publics = groth16.prove(zk, wit, r=123, s=456)
    dt = time.time() - t0
    vk = groth16.export_verification_key(zk)
    ok = groth16.verify(vk, publics, proof)
    log(f"  groth16 prove ({n_constraints} constraints): {dt:.2f} s/proof, "
        f"verified={ok}")
    return dt


def check_msm_sharded_cw16(cv, log_n=12):
    """Production run_sharded at cw=16 on a 1-device mesh of the real
    chip vs host bigints (the multi-chip code path, minus the ICI)."""
    from jax.sharding import Mesh

    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.curves import msm as msm_mod
    from snarkjs_tpu.curves import msm_tpu

    fr, fq = cv.fr, cv.fq
    n = 1 << log_n
    scalars, ints = build_scalars(fr, n)
    px, py, pinf = build_points(cv, fq, n)
    mesh = Mesh(np.array(jax.devices()[:1]), ("d",))
    m = msm_tpu.get_msm(cv.name, "g1")
    got = msm_mod.host_jac_to_affine(
        fq, m.run_sharded(mesh, px, py, pinf, scalars))
    distinct = 512
    agg = {}
    for i in range(n):
        agg[i % distinct] = (agg.get(i % distinct, 0)
                             + ints[i % len(ints)]) % fr.p
    base, acc = [], cv.g1
    for _ in range(distinct):
        base.append(acc)
        acc = hc.g1_add(cv, acc, cv.g1)
    want = None
    for i, s in agg.items():
        want = hc.g1_add(cv, want, hc.g1_mul(cv, base[i], s))
    assert got == want, "sharded cw=16 MSM mismatch"
    log(f"  msm run_sharded cw=16 (1-device mesh, 2^{log_n}): OK")


def _plonkish_circuit(n_constraints):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "__graft_entry__.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    return g._tiny_circuit(n_constraints)


def time_plonk_prove(n_constraints=60_000):
    """PLONK prove wall-clock, synthetic squaring chain (domain 2^16)."""
    from snarkjs_tpu.formats import zkey as zf
    from snarkjs_tpu.protocols import plonk, plonk_setup

    t0 = time.time()
    cv, r1cs, wit = _plonkish_circuit(n_constraints)
    zk = zf.read_plonk_zkey(plonk_setup.setup_from_secrets(r1cs, tau=0xFEED1))
    log(f"  plonk synthetic setup ({n_constraints} constraints, domain "
        f"{zk.domain_size}): {time.time() - t0:.1f}s")
    b = list(range(1, 13))
    t0 = time.time()
    proof, pub = plonk.prove(zk, wit, b=b)
    log(f"  plonk prove warmup(+compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    proof, pub = plonk.prove(zk, wit, b=b)
    dt = time.time() - t0
    ok = plonk.verify(plonk.export_verification_key(zk), pub, proof)
    log(f"  plonk prove ({n_constraints} constraints): {dt:.2f} s/proof, "
        f"verified={ok}")
    return dt


def time_fflonk_prove(n_constraints=60_000):
    """FFLONK prove wall-clock (9n+18 SRS, 4 MSMs), domain 2^16."""
    from snarkjs_tpu.formats import zkey as zf
    from snarkjs_tpu.protocols import fflonk, fflonk_setup

    t0 = time.time()
    cv, r1cs, wit = _plonkish_circuit(n_constraints)
    zk = zf.read_fflonk_zkey(
        fflonk_setup.setup_from_secrets(r1cs, tau=0xFEED2))
    log(f"  fflonk synthetic setup ({n_constraints} constraints, domain "
        f"{zk.domain_size}): {time.time() - t0:.1f}s")
    b = list(range(1, 11))
    t0 = time.time()
    proof, pub = fflonk.prove(zk, wit, b=b)
    log(f"  fflonk prove warmup(+compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    proof, pub = fflonk.prove(zk, wit, b=b)
    dt = time.time() - t0
    ok = fflonk.verify(fflonk.export_verification_key(zk), pub, proof)
    log(f"  fflonk prove ({n_constraints} constraints): {dt:.2f} s/proof, "
        f"verified={ok}")
    return dt


def time_group_lagrange(power=16):
    """preparePhase2's group IFFT at 2^power on the current device."""
    from snarkjs_tpu.ceremony import ptau_ops
    from snarkjs_tpu.curves import host_curve as hc
    from snarkjs_tpu.formats import points as pcodec
    from snarkjs_tpu.fields import fjnp

    cv = hc.BN254
    fq = cv.fq
    n = 1 << power
    px, py, pinf = build_points(cv, fq, n)
    lem = pcodec.g1_lem_to_bytes(fq, np.asarray(px), np.asarray(py),
                                 np.asarray(pinf))
    t0 = time.time()
    ptau_ops.group_lagrange_lem(cv, lem, n, g2=False, force_device=True)
    log(f"  group lagrange 2^{power} warmup(+compile): "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    ptau_ops.group_lagrange_lem(cv, lem, n, g2=False, force_device=True)
    dt = time.time() - t0
    log(f"  group lagrange (preparePhase2) 2^{power}: {dt:.2f} s = "
        f"{n / dt:,.0f} points/s")
    return dt


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
        check_msm_sharded_cw16(cv)
        check_msm_small(cv, "g2", 10)
        check_msm_small(hc.BLS12_381, "g1", 10)
        time_msm(cv, "g2", min(log_n - 2, 18), iters=1)
        time_msm(hc.BLS12_381, "g1", min(log_n, 20), iters=1)
        for extra_log in (22,):
            if extra_log > log_n:
                time_msm(cv, "g1", extra_log, iters=1)
                time_ntt("bn254_fr", extra_log, iters=2)
        time_ntt("bls12_381_fr", log_n, iters=2)
        time_groth16_prove()
        time_plonk_prove()
        time_fflonk_prove()
        time_group_lagrange()

    print(json.dumps({
        "metric": f"msm_g1_bn254_points_per_s_2^{log_n}",
        "value": round(rate, 1),
        "unit": "points/s",
        "vs_baseline": round(rate / BASELINE_MSM_PTS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
