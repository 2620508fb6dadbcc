"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measurement notes (learned on the axon-tunneled backend):
  * `block_until_ready()` does NOT actually block — force completion by
    reading back one element and subtract the measured round-trip latency.
  * Full-array readback rides a ~14 MB/s tunnel; never read back 64 MB.
  * The tunnel can be DOWN (jax.devices() hangs forever). Every device
    stage therefore runs in a child process under a hard timeout; on a
    dead tunnel the parent still prints one honest JSON line.

Headline: 2^20 Fr NTT wall-clock (the inner-circuit domain size, reference
README.md:21 / BASELINE.md). Implementation: the fused four-step tile
engine (ops/ntt_tile.py; ~30 ms measured on TPU v5 lite) with the
limb-major butterfly path (ops/ntt_fast.py; 140 ms) and the scan engine
(ops/ntt.py; 424 ms) as fallbacks. Secondary (in "extra"): device MSM
bucket-kernel throughput at 2^16 points (ops/msm_tile.py). The reference
publishes no numbers; vs_baseline uses a ~0.35 s estimate for the rayon
radix-2 FFT at 2^20 on a server CPU (halo2 fork, SURVEY.md L1). >1 means
faster.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (shared with tests' .jax_cache):
    the axon tunnel's compile+dispatch latency is highly variable (a no-op
    jit was measured at 6 s and at 111 s on the same day), so every stage
    re-compiling from scratch can blow its timeout. Warm runs during the
    round populate the cache; the driver's round-end run then loads
    serialized executables instead of recompiling."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these knobs: run uncached


RUST_CPU_NTT_2POW20_S = 0.35  # estimated reference anchor (no published number)
RUST_CPU_MSM_2POW16_S = 0.35  # ~0.19 Mpts/s/thread * 16 threads ≈ 3 Mpts/s est.
K = 20
MSM_K = 16
REPS = 6

# per-stage hard timeouts (s): first-compile on the tunneled backend is
# 20-40 s/kernel and the tile engine builds several
STAGE_TIMEOUT = {
    "probe": 300, "tiled": 420, "fast": 300, "scan": 240, "msm": 420,
    "msm20": 560, "quotient20": 560, "prove20": 580, "chunk20": 60,
    "ntt24": 560, "msm24": 560, "cpu": 420, "golden": 300,
}
# the tunnel's dispatch latency is wildly variable (a no-op jit measured
# 6 s and 111 s the same day) and the service restarts itself after worker
# crashes — probe generously and retry once before declaring it down
PROBE_RETRIES = 2

# VERDICT round-4 weak #1: a round's perf story must not hinge on tunnel
# luck at capture time. If the probe fails, keep re-probing with backoff
# inside this wall-clock window (the tunnel service self-restarts after
# worker crashes; observed recovery times are minutes, not hours) before
# conceding to the CPU fallback — and even then the fallback is emitted
# as a clearly-labelled separate metric, never as the TPU headline.
TUNNEL_WAIT_S = float(os.environ.get("SPT_BENCH_TUNNEL_WAIT_S", "900"))


def _wait_for_tunnel() -> bool:
    """Probe until alive or the TUNNEL_WAIT_S window closes."""
    t0 = time.time()
    delay = 15.0
    while True:
        if _run_stage("probe") is not None:
            return True
        if time.time() - t0 >= TUNNEL_WAIT_S:
            return False
        time.sleep(min(delay, max(0.0, TUNNEL_WAIT_S - (time.time() - t0))))
        delay = min(delay * 2, 120.0)


def _force(x) -> None:
    np.asarray(x[0, 0])


def _data(k: int):
    import jax.numpy as jnp

    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.ops import field_ops as fo

    rng = np.random.default_rng(0)
    x = jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << k))
    xm = fo.to_mont(FR_LIMB, x)
    _force(xm)
    return xm


def _rtt(xm) -> float:
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda v: v + jnp.uint32(0))
    _force(tiny(xm))
    t0 = time.perf_counter()
    _force(tiny(xm))
    return time.perf_counter() - t0


def _bench_ntt(dom_factory) -> float:
    xm = _data(K)
    dom = dom_factory()
    _force(dom.ntt(xm))  # compile + warm (one-time)
    rtt = _rtt(xm)
    y = xm
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = dom.ntt(y)
    _force(y)
    return max((time.perf_counter() - t0) - rtt, 1e-9) / REPS


def stage_tiled() -> float:
    from scroll_prover_tpu.ops.ntt_tile import TiledDomain

    return _bench_ntt(lambda: TiledDomain(K))


def stage_fast() -> float:
    from scroll_prover_tpu.ops.ntt_fast import FastDomain

    return _bench_ntt(lambda: FastDomain(K))


def stage_scan() -> float:
    import jax

    from scroll_prover_tpu.ops.ntt import EvaluationDomain

    xm = _data(K)
    dom = EvaluationDomain(K)

    @jax.jit
    def chained(v):
        for _ in range(4):
            v = dom.ntt(v)
        return v

    _force(chained(xm))
    rtt = _rtt(xm)
    t0 = time.perf_counter()
    _force(chained(xm))
    return max((time.perf_counter() - t0) - rtt, 1e-9) / 4


def stage_cpu() -> float:
    """Honest CPU-backend fallback for a dead TPU tunnel."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    return stage_scan()


def stage_probe() -> float:
    """Is the device backend alive at all? (tunnel can hang forever)"""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.uint32)
    _force(jax.jit(lambda v: v + jnp.uint32(1))(x))
    return 1.0


def stage_msm() -> float:
    """One 2^16-point G1 MSM (device bucket kernel + host tail fold)."""
    import jax.numpy as jnp

    from scroll_prover_tpu.curves.bn254_curve import g1_generator, G1
    from scroll_prover_tpu.fields.limbs import FR_LIMB, FQ_LIMB, ints_to_limbs
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.msm_tile import msm_v2_host

    n = 1 << MSM_K
    rng = np.random.default_rng(1)
    # n distinct points: small multiples of G (host; cheap doubling chain)
    g = g1_generator()
    pts = []
    p = g
    for _ in range(min(n, 1024)):
        pts.append(p)
        p = G1.add(p, g)
    xs = ints_to_limbs(np.array([q[0] for q in pts], dtype=object))
    ys = ints_to_limbs(np.array([q[1] for q in pts], dtype=object))
    pa = np.stack([xs, ys], axis=1)  # (1024, 2, L)
    pa = np.tile(pa, (n // min(n, 1024), 1, 1))
    points = fo.to_mont(FQ_LIMB, jnp.asarray(pa.reshape(n, 2, -1)))
    scalars = jnp.asarray(fo.rand_elements(FR_LIMB, rng, n))
    _force(points)
    msm_v2_host(points, scalars)  # compile + warm
    t0 = time.perf_counter()
    msm_v2_host(points, scalars)  # host fold forces completion
    return max(time.perf_counter() - t0, 1e-9)


def _msm_at(k: int) -> float:
    import jax.numpy as jnp

    from scroll_prover_tpu.curves.bn254_curve import g1_generator, G1
    from scroll_prover_tpu.fields.limbs import FR_LIMB, FQ_LIMB, ints_to_limbs
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.msm_tile import msm_v2_host

    n = 1 << k
    rng = np.random.default_rng(1)
    g = g1_generator()
    pts = []
    p = g
    for _ in range(min(n, 1024)):
        pts.append(p)
        p = G1.add(p, g)
    xs = ints_to_limbs(np.array([q[0] for q in pts], dtype=object))
    ys = ints_to_limbs(np.array([q[1] for q in pts], dtype=object))
    pa = np.stack([xs, ys], axis=1)
    pa = np.tile(pa, (n // min(n, 1024), 1, 1))
    points = fo.to_mont(FQ_LIMB, jnp.asarray(pa.reshape(n, 2, -1)))
    scalars = jnp.asarray(fo.rand_elements(FR_LIMB, rng, n))
    _force(points)
    msm_v2_host(points, scalars)  # compile + warm
    t0 = time.perf_counter()
    msm_v2_host(points, scalars)
    return max(time.perf_counter() - t0, 1e-9)


def stage_msm20() -> float:
    """2^20-point G1 MSM — the inner-circuit column-commit size
    (VERDICT round-2 item 2: MSM Mpoints/s at production scale)."""
    return _msm_at(20)


def stage_quotient20() -> float:
    """One quotient-shaped prover step at k=20: coset-NTT a column to the
    extended domain, square it there (gate-eval stand-in), divide by the
    vanishing polynomial shape via pointwise ops, and interpolate back —
    the inner prover's per-column hot path (SURVEY.md section 3.1).

    Deliberately NOT one outer jit: this backend compiles through a remote
    service whose pipe breaks on monolithic 2^22-size programs; the prover
    itself composes small jitted kernels eagerly, so the stage measures
    exactly that composition."""
    import jax.numpy as jnp

    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.ntt import EvaluationDomain

    xm = _data(K)
    dom = EvaluationDomain(K, j=2)

    def step(v):
        pad = jnp.zeros((dom.extended_n - dom.n, v.shape[1]), v.dtype)
        ev = dom.ntt_extended(jnp.concatenate([v, pad]))
        ev = fo.mont_mul(FR_LIMB, ev, ev)
        return dom.intt_extended(ev)

    _force(step(xm))
    rtt = _rtt(xm)
    t0 = time.perf_counter()
    for _ in range(3):
        out = step(xm)
    _force(out)
    return max((time.perf_counter() - t0) - rtt, 1e-9) / 3


def stage_prove20() -> float:
    """FULL PLONK prove at k=20 on the chip, host-verified (VERDICT round-2
    item 2: 'inner-proof wall-clock at k=20'). Real protocol work at the
    reference's inner degree: 2^20 domain, 2^22 extended coset quotient,
    ~16 device MSMs at 2^20 points, batched column NTTs, device grand
    products. The circuit is a gate+lookup+copy workload (the protocol cost
    is set by the degree and column count, not the gate content); SRS is
    synthesized on device (ops/fixed_base.py)."""
    from scroll_prover_tpu.fields.bn254 import FR_MOD
    from scroll_prover_tpu.proof_system import kzg
    from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem
    from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
    from scroll_prover_tpu.proof_system.plonk.keygen import keygen
    from scroll_prover_tpu.proof_system.plonk.prover import prove
    from scroll_prover_tpu.proof_system.plonk.verifier import verify

    ROWS = 4096

    class BenchCircuit(Circuit):
        def configure(self, cs):
            self.a = cs.advice_column()
            self.b = cs.advice_column()
            self.c = cs.advice_column()
            self.sel = cs.selector()
            self.tbl = cs.fixed_column()
            self.pi = cs.instance_column()
            cs.gate(
                "mul",
                self.sel.query()
                * (self.a.query() * self.b.query() - self.c.query()),
            )
            cs.lookup(
                "a_range", [self.sel.query() * self.a.query()], [self.tbl.query()]
            )

        def assign(self, cs, n, instance):
            fixed = empty_assignment(cs.num_fixed, n)
            advice = empty_assignment(cs.num_advice, n)
            pi0 = int(instance[self.pi.index][0])
            for i in range(ROWS):
                a = (pi0 + i) % (2 * ROWS)
                b = i + 5
                advice[self.a.index][i] = a
                advice[self.b.index][i] = b
                advice[self.c.index][i] = a * b % FR_MOD
                fixed[self.sel.index][i] = 1
            for i in range(2 * ROWS):
                fixed[self.tbl.index][i] = i
            cs.copy(self.pi, 0, self.a, 0)  # idempotent (cs dedupes)
            return {"fixed": fixed, "advice": advice}

    instance = [[7]]
    circ = BenchCircuit()
    srs = kzg.SRS.generate_fast(20)
    pk, vk = keygen(srs, 20, circ, instance)
    t0 = time.perf_counter()
    proof = prove(srs, pk, circ, instance)
    dt = time.perf_counter() - t0
    assert verify(srs, vk, instance, proof), "k=20 proof failed verification"
    return dt


def stage_ntt24() -> float:
    """2^24 Fr NTT on the tile engine — the layer1/layer4 compression-
    domain scale (reference layer configs use degrees 24/25/26;
    VERDICT round-3 item 8: nothing above 2^22 had ever run)."""
    import jax.numpy as jnp

    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.ntt_tile import TiledDomain

    rng = np.random.default_rng(0)
    x = jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << 24))
    xm = fo.to_mont(FR_LIMB, x)
    _force(xm)
    dom = TiledDomain(24)
    _force(dom.ntt(xm))
    rtt = _rtt(xm)
    t0 = time.perf_counter()
    y = dom.ntt(xm)
    _force(y)
    return max((time.perf_counter() - t0) - rtt, 1e-9)


def stage_msm24() -> float:
    """2^24-point G1 MSM over a device-synthesized SRS — a layer4/6-sized
    commit (2^24 points = 2.1 GB of affine limbs resident in HBM)."""
    import jax
    import jax.numpy as jnp

    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.fixed_base import fixed_base_mul_dev
    from scroll_prover_tpu.ops.msm_tile import msm_v2_host
    from scroll_prover_tpu.ops import poly as poly_ops
    from scroll_prover_tpu.curves.bn254_curve import g1_generator
    from scroll_prover_tpu.fields.bn254 import FR_MOD
    from scroll_prover_tpu.fields.limbs import ints_to_limbs

    n = 1 << 24
    rng = np.random.default_rng(2)
    tau_m = jnp.asarray(ints_to_limbs([0x1234567 * (1 << 256) % FR_MOD])[0])
    pow_m = poly_ops.powers_mont(FR_LIMB, tau_m, n)
    points = fixed_base_mul_dev(g1_generator(), fo.from_mont(FR_LIMB, pow_m))
    _force(points)
    scalars = jnp.asarray(fo.rand_elements(FR_LIMB, rng, n))
    _force(scalars)
    msm_v2_host(points, scalars)  # compile + warm
    t0 = time.perf_counter()
    msm_v2_host(points, scalars)
    return max(time.perf_counter() - t0, 1e-9)


def stage_chunk20() -> float:
    """Real-fixture chunk proof at INNER_DEGREE=20 (VERDICT round-3 #1).

    A full run (witness + keygen + prove on the chip) takes longer than
    any driver stage budget, so the measurement is CHECKPOINTED: running
    `python scripts/prove_chunk20.py --prove` mid-round records the
    per-phase walls plus the proof bytes/vk id under .bench_cache/ and
    outputs/. This stage's validation is SHAPE-AND-HASH ONLY (ADVICE
    round-4): the pairing re-verification happened inside prove_chunk20
    (record field "verified", asserted there); here we check the recorded
    sha256 matches the dumped proof bytes, k == 20, and the run verified —
    a stale or corrupt checkpoint reports -1, not a wall-clock."""
    import glob as _glob
    import hashlib as _hashlib

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache", "chunk20.json"
    )
    if not os.path.exists(path):
        return -1.0
    with open(path) as fh:
        rec = json.load(fh)
    if rec.get("k") != 20 or rec.get("verified") is not True:
        return -1.0
    outs = sorted(
        _glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "outputs", "chunk20_*", "proof.hex")
        )
    )
    want = rec.get("proof_sha256")
    for p in outs[::-1]:
        with open(p) as fh:
            proof = bytes.fromhex(fh.read().strip())
        if want and _hashlib.sha256(proof).hexdigest() == want:
            return float(rec["chunk_inner_wall_s"])
    return -1.0


def stage_golden() -> float:
    """Golden conformance, CPU-only (works with the tunnel down): replay
    the reference release's proof.data+pi.data against its released
    evm_verifier.bin in the mini-EVM (calldata spliced at byte 384,
    reference unit_tests.rs:32) and report the verification GAS. Returns
    -1 when the artifacts are absent or the proof is rejected."""
    rel = "/root/reference/release-v0.13.1"
    try:
        with open(os.path.join(rel, "evm_verifier.bin"), "rb") as f:
            code = f.read()
        with open(os.path.join(rel, "proof.data"), "rb") as f:
            proof = f.read()
        with open(os.path.join(rel, "pi.data"), "rb") as f:
            pi = f.read()
    except OSError:
        return -1.0
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from scroll_prover_tpu.evm.interpreter import deploy_and_call

    gas = deploy_and_call(code, proof[:384] + pi + proof[384:])
    return float(gas)


STAGES = {
    "probe": stage_probe,
    "tiled": stage_tiled,
    "fast": stage_fast,
    "scan": stage_scan,
    "msm": stage_msm,
    "msm20": stage_msm20,
    "quotient20": stage_quotient20,
    "prove20": stage_prove20,
    "ntt24": stage_ntt24,
    "msm24": stage_msm24,
    "chunk20": stage_chunk20,
    "golden": stage_golden,
    "cpu": stage_cpu,
}


def _run_stage(name: str) -> float | None:
    """Run one stage in a child process under a hard timeout; None on any
    failure (import error, compile rejection, dead tunnel)."""
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--stage", name],
            capture_output=True,
            text=True,
            timeout=STAGE_TIMEOUT[name],
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None
    if out.returncode != 0:
        return None
    for line in out.stdout.splitlines()[::-1]:
        try:
            return float(line.strip())
        except ValueError:
            continue
    return None


def main():
    extra = {}
    impl, dt = None, None
    probe_ok = any(_run_stage("probe") is not None for _ in range(PROBE_RETRIES))
    if not probe_ok:
        probe_ok = _wait_for_tunnel()
    if probe_ok:
        for name in ("tiled", "fast", "scan"):
            dt = _run_stage(name)
            if dt is not None:
                impl = {"tiled": "pallas-tile", "fast": "pallas", "scan": "scan"}[name]
                break
        if dt is None and _wait_for_tunnel():
            # stages can die to a mid-run tunnel drop even when the probe
            # passed; one more attempt after the backoff window
            dt = _run_stage("tiled")
            impl = "pallas-tile" if dt is not None else None
    if dt is None:
        # TPU unreachable: the CPU number is reported as its own clearly
        # labelled metric in extra, and the headline stays "unavailable"
        # rather than masquerading a host measurement as a TPU result
        cpu_dt = _run_stage("cpu")
        chk = _run_stage("chunk20")
        out = {
            "metric": f"ntt_fr_2pow{K}_wall_s_unavailable",
            "value": -1,
            "unit": "s",
            "vs_baseline": 0.0,
        }
        ex = {}
        if cpu_dt is not None:
            ex["ntt_fr_2pow20_cpu_fallback_wall_s"] = round(cpu_dt, 6)
        if chk is not None and chk > 0:
            ex["chunk_inner_wall_s"] = round(chk, 3)
        g_dt = _run_stage("golden")
        if g_dt is not None and g_dt > 0:
            ex["golden_replay_gas"] = int(g_dt)
        if ex:
            out["extra"] = ex
        print(json.dumps(out))
        return
    if impl.startswith(("pallas", "scan")):
        # speed-of-light accounting (SURVEY.md section 5 tracing: per-kernel
        # achieved vs ceiling): the tiled NTT is HBM-bound — ~6 full passes
        # over the (n, 16)-u32 limb array (3 kernel levels + 2 twiddle muls
        # + final gather), each pass read+write of 64 MB at 819 GB/s on the
        # v5 lite chip.
        hbm_gbs = 819.0
        passes = 6
        sol = passes * 2 * ((1 << K) * 16 * 4) / (hbm_gbs * 1e9)
        extra["ntt_sol_est_s"] = round(sol, 6)
        extra["ntt_sol_frac"] = round(sol / dt, 3)
        msm_dt = _run_stage("msm")
        if msm_dt is not None:
            extra["msm_g1_2pow16_wall_s"] = round(msm_dt, 6)
            extra["msm_g1_mpoints_s"] = round((1 << MSM_K) / msm_dt / 1e6, 3)
            extra["msm_vs_baseline"] = round(RUST_CPU_MSM_2POW16_S / msm_dt, 3)
        msm20_dt = _run_stage("msm20")
        if msm20_dt is not None:
            extra["msm_g1_2pow20_wall_s"] = round(msm20_dt, 6)
            extra["msm_g1_2pow20_mpoints_s"] = round((1 << 20) / msm20_dt / 1e6, 3)
            if msm_dt is not None and msm20_dt > msm_dt:
                # marginal accumulate throughput: strips the size-independent
                # tunnel-RTT + host-fold latency shared by both sizes (the
                # per-commit floor on this tunneled backend, docs/PERF.md)
                extra["msm_g1_marginal_mpoints_s"] = round(
                    ((1 << 20) - (1 << MSM_K)) / (msm20_dt - msm_dt) / 1e6, 3
                )
        q_dt = _run_stage("quotient20")
        if q_dt is not None:
            # coset-NTT -> gate eval -> iNTT at the inner-circuit size: the
            # per-column prover hot path (VERDICT round-2 item 2)
            extra["quotient_step_2pow20_wall_s"] = round(q_dt, 6)
        p_dt = _run_stage("prove20")
        if p_dt is not None:
            # full verified PLONK proof at the reference inner degree
            extra["plonk_prove_k20_wall_s"] = round(p_dt, 3)
        n24 = _run_stage("ntt24")
        if n24 is not None:
            extra["ntt_2pow24_wall_s"] = round(n24, 4)
        m24 = _run_stage("msm24")
        if m24 is not None:
            extra["msm_g1_2pow24_wall_s"] = round(m24, 3)
            extra["msm_g1_2pow24_mpoints_s"] = round((1 << 24) / m24 / 1e6, 3)
        c_dt = _run_stage("chunk20")
        if c_dt is not None and c_dt > 0:
            # real-fixture (batch_3/chunk_10) inner proof at k=20,
            # checkpointed by scripts/prove_chunk20.py --prove
            extra["chunk_inner_wall_s"] = round(c_dt, 3)
        g_dt = _run_stage("golden")
        if g_dt is not None and g_dt > 0:
            # mini-EVM accepts the reference's released proof against its
            # released verifier bytecode (byte-exact conformance)
            extra["golden_replay_gas"] = int(g_dt)
    print(
        json.dumps(
            {
                "metric": f"ntt_fr_2pow{K}_wall_s_{impl}",
                "value": round(dt, 6),
                "unit": "s",
                "vs_baseline": round(RUST_CPU_NTT_2POW20_S / dt, 3),
                **({"extra": extra} if extra else {}),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--stage":
        _enable_compile_cache()
        print(STAGES[sys.argv[2]]())
    else:
        main()
