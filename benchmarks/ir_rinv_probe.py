"""Long-run IR cost with the explicit R⁻¹ (VERDICT r2 #5 done-criterion).

The round-2 verdict asked: either show the shared-QR linear path sustains a
sol_frac materially above 46% on runs with ≥10 refinement steps once the
per-step triangular solve is replaced by GEMVs against an explicit R⁻¹, or
commit the measurement showing R⁻¹ loses even there.

This probe measures, at N=4096 c64 on the real chip:
  * the components of one IR inner step (Qᴴr GEMV, trsm vs R⁻¹·y GEMV,
    incremental A·d GEMV), each amortized inside one fori_loop program;
  * a full ≥10-step `refine_split` wall time with rinv ON vs OFF
    (same operand, tol=0 so the loop runs its full budget);
and prints JSON. Run solo on the chip:  python benchmarks/ir_rinv_probe.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def main(n: int = 4096, steps: int = 12, reps: int = 3):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import jax.scipy.linalg as jsla

    from maus_tpu.ops.batched_solve import factor_qr, solve_qr
    from maus_tpu.ops.refine import SplitComplex, refine_split

    hi = jax.lax.Precision.HIGHEST
    key = jax.random.PRNGKey(0)
    f32z = jnp.asarray(0.0, jnp.float32)

    def cplx(k, shape):
        ka, kb = jax.random.split(k)
        return jax.lax.complex(jax.random.normal(ka, shape, jnp.float32),
                               jax.random.normal(kb, shape, jnp.float32))

    A = cplx(key, (n, n)) + n * jnp.eye(n, dtype=jnp.complex64)
    b = cplx(jax.random.fold_in(key, 1), (n,))

    overhead_fn = jax.jit(lambda v: v + 1.0)
    float(overhead_fn(jnp.asarray(1.0, jnp.float32)))
    t0 = time.perf_counter()
    float(overhead_fn(jnp.asarray(1.0, jnp.float32)))
    overhead = time.perf_counter() - t0

    def timed(fn, *args, inner: int = 1):
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append((time.perf_counter() - t0 - overhead) / inner)
        return float(np.median(ts))

    fac = jax.jit(lambda a: factor_qr(a, with_rinv=True))(A)
    jax.block_until_ready(fac.q)
    R = 256

    def chain_gemv(op):
        """Time one N² GEMV-shaped op amortized over R chained iterations."""
        @jax.jit
        def f(q, r, rinv, v):
            from maus_tpu.ops.batched_solve import QRFactors
            fac_ = QRFactors(q, r, rinv)

            def body(i, carry):
                acc, v_ = carry
                v_ = v_ * (1.0 + 1e-6)
                y = op(fac_, v_)
                return acc + jnp.abs(jnp.sum(y)).real.astype(jnp.float32), v_
            acc, _ = jax.lax.fori_loop(0, R, body, (f32z, v))
            return acc
        return timed(f, fac.q, fac.r, fac.rinv, b, inner=R)

    t_qh = chain_gemv(lambda f_, v: jnp.matmul(jnp.conj(f_.q.T), v,
                                               precision=hi))
    t_trsm = chain_gemv(lambda f_, v: jsla.solve_triangular(f_.r, v,
                                                            lower=False))
    t_rinv = chain_gemv(lambda f_, v: jnp.matmul(f_.rinv, v, precision=hi))
    t_ad = chain_gemv(lambda f_, v: jnp.matmul(f_.q, v, precision=hi))
    t_solve_plain = chain_gemv(
        lambda f_, v: solve_qr(type(f_)(f_.q, f_.r, None), v))
    t_solve_rinv = chain_gemv(lambda f_, v: solve_qr(f_, v))

    # one-time inversion cost (amortized over every subsequent solve)
    from maus_tpu.ops.batched_solve import invert_triangular

    @jax.jit
    def inv_once(r):
        return jnp.abs(jnp.sum(invert_triangular(r))).real \
            .astype(jnp.float32)

    t_inv = timed(inv_once, fac.r)

    # ---- full ≥10-step refine_split, rinv ON vs OFF ------------------------
    A64 = SplitComplex(A.real.astype(jnp.float64), A.imag.astype(jnp.float64))
    b64 = SplitComplex(b.real.astype(jnp.float64), b.imag.astype(jnp.float64))

    def run_refine(with_rinv):
        fac_ = jax.jit(lambda a: factor_qr(a, with_rinv=with_rinv))(A)
        x0 = solve_qr(fac_, b)
        jax.block_until_ready(x0)

        def f():
            t0 = time.perf_counter()
            xs, rel = refine_split(A64, fac_, b64, x0, steps=steps, tol=0.0)
            float(rel)
            return time.perf_counter() - t0
        f()                                     # compile + warm
        return float(np.median([f() for _ in range(reps)])), fac_

    t_ref_plain, _ = run_refine(False)
    t_ref_rinv, _ = run_refine(True)

    gemv_bytes = 8.0 * n * n                    # one c64 N² operand read
    bw = 664e9                                  # measured stream (mfu_v5e)
    out = {
        "n": n, "steps": steps,
        "gemv_bound_s": round(gemv_bytes / bw, 5),
        "qh_gemv_s": round(t_qh, 5),
        "trsm_s": round(t_trsm, 5),
        "rinv_gemv_s": round(t_rinv, 5),
        "a_d_gemv_s": round(t_ad, 5),
        "solve_plain_s": round(t_solve_plain, 5),
        "solve_rinv_s": round(t_solve_rinv, 5),
        "invert_triangular_once_s": round(t_inv, 4),
        "refine12_plain_s": round(t_ref_plain, 4),
        "refine12_rinv_s": round(t_ref_rinv, 4),
        "solve_speedup": round(t_solve_plain / t_solve_rinv, 2),
        "refine_speedup": round(t_ref_plain / t_ref_rinv, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
