"""Host-side matrix diagnosis — the reference's ``_diagnose_matrix_initial``
(AMS:374-404), run once before tracing.

The results are *static* (Python values): Hermitian-ness selects an entirely
different compiled path (the shared-eigh fast path), so it must be known at trace
time. Unlike the reference, the condition number is an *estimate* for large N
(power + inverse-power iteration) instead of a full O(N³) SVD, and it is computed
for sparse-classified inputs too (the reference skips it there and then treats
cond=∞ as Critical — the identity-matrix quirk of SURVEY.md §0.1).
"""
from __future__ import annotations

import numpy as np

from ..core.types import RANK_REL_CUT, ProblemKnowledge, ProblemType


def _to_dense_numpy(A) -> np.ndarray:
    """Accept numpy arrays, jax arrays, and scipy.sparse matrices; return dense
    ndarray (sparse CSC/CSR inputs map to dense TPU layouts per BASELINE.json)."""
    if hasattr(A, "toarray"):          # scipy.sparse without importing scipy
        return np.asarray(A.toarray())
    return np.asarray(A)


def estimate_cond(A: np.ndarray, exact_below: int = 512, iters: int = 30) -> float:
    """2-norm condition estimate: exact SVD for small matrices, randomized power /
    inverse-power iteration above ``exact_below`` (reference uses exact
    ``np.linalg.cond`` always, AMS:400 — O(N³) at any size)."""
    n = min(A.shape)
    if n == 0:
        return 1.0
    if max(A.shape) <= exact_below:
        try:
            c = np.linalg.cond(A)
            return float(c) if np.isfinite(c) else np.inf
        except np.linalg.LinAlgError:
            return np.inf
    rng_ = np.random.default_rng(0)
    x = rng_.standard_normal(A.shape[1]) + 1j * rng_.standard_normal(A.shape[1])
    for _ in range(iters):
        x = A.conj().T @ (A @ x)
        nx = np.linalg.norm(x)
        if nx == 0:
            return np.inf
        x /= nx
    smax = float(np.sqrt(np.linalg.norm(A.conj().T @ (A @ x))))
    # smallest singular value via inverse power iteration on AᴴA. Iterating on
    # A itself (the r1 bug) converges to 1/|λ_min|, which for non-normal
    # matrices can exceed 1/σ_min by orders of magnitude and misclassifies
    # near-singular operands as STABLE. Square inputs apply (AᴴA)⁻¹ = A⁻¹A⁻ᴴ
    # as two triangular solves against ONE LU of A — never forming the Gram
    # matrix, whose κ² conditioning floors the estimate at √(1/eps) ≈ 1e8.
    try:
        import scipy.linalg as sla
        y = rng_.standard_normal(A.shape[1]) + 1j * rng_.standard_normal(A.shape[1])
        if A.shape[0] == A.shape[1]:
            lu_piv = sla.lu_factor(A)

            def gram_inv(z):          # (AᴴA)⁻¹ z = A⁻¹ (A⁻ᴴ z)
                return sla.lu_solve(lu_piv, sla.lu_solve(lu_piv, z, trans=2))
        else:
            lu_piv = sla.lu_factor(A.conj().T @ A)

            def gram_inv(z):
                return sla.lu_solve(lu_piv, z)
        for _ in range(iters):
            y = gram_inv(y)
            ny = np.linalg.norm(y)
            if not np.isfinite(ny) or ny == 0:
                return np.inf
            y /= ny
        sminsq_inv = np.linalg.norm(gram_inv(y))
        smin = float(np.sqrt(1.0 / sminsq_inv)) if sminsq_inv > 0 else 0.0
    except Exception:
        return np.inf
    return smax / smin if smin > 0 else np.inf


# ---------------------------------------------------------------------------
# On-device condition probe (VERDICT r1 #10): no host LAPACK for large N
# ---------------------------------------------------------------------------

def _cond_probe_device(Ac, Are, Aim, key, power_iters: int = 16,
                       inv_iters: int = 6, ir_steps: int = 10):
    """Device program: (σ_max, amplification g ≈ 1/σ_min², first-solve backward
    residual, final IR residual). All O(N²) work per step after one O(N³) QR.

    The IR residuals double as a conditioning signal: a backward-stable c64
    solve leaves an f64-measured relative residual ≈ ε_f32·κ(A), which keeps
    growing past the point where the inverse-power estimate floors at the
    factorization's accuracy (κ ≈ 1/ε_f32)."""
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsla

    n = Ac.shape[0]
    f64 = Are.dtype

    with jax.default_matmul_precision("highest"):
        kr, ki, k2r, k2i = jax.random.split(key, 4)
        x = jax.lax.complex(jax.random.normal(kr, (n,), jnp.float32),
                            jax.random.normal(ki, (n,), jnp.float32)) \
            .astype(Ac.dtype)
        x = x / jnp.linalg.norm(x)

        def pstep(_, x):
            z = jnp.conj(Ac.T) @ (Ac @ x)
            return z / jnp.maximum(jnp.linalg.norm(z), 1e-30)

        x = jax.lax.fori_loop(0, power_iters, pstep, x)
        smax = jnp.sqrt(jnp.linalg.norm(jnp.conj(Ac.T) @ (Ac @ x)))

        q, r = jnp.linalg.qr(Ac)

        def qr_solve(b):                    # A x = b
            return jsla.solve_triangular(r, jnp.conj(q.T) @ b, lower=False)

        def qr_solve_adj(b):                # Aᴴ x = b
            return q @ jsla.solve_triangular(r, b, lower=False, trans=2)

        from ..ops.refine import (SplitComplex, slice_split_matrix,
                                  sliced_matvec_batch, use_sliced_matvecs)

        A64sp = SplitComplex(Are, Aim)
        huge_accel = jax.default_backend() != "cpu" \
            and not use_sliced_matvecs(A64sp) and n > 12288
        if huge_accel:
            # Past the exact-slicing ladder limit on an accelerator BOTH f64
            # matvec routes bust HBM next to the probe's own QR factors: the
            # dense bf16 ladder is ~24·2·N² B (~13 GB at 16384²) and XLA's
            # emulated-f64 GEMV materializes f32[8,N,N] temps (probed at
            # 16384²: 46.15 GB program vs 15.75 available, driver log
            # benchmarks/results/r5/spectral16k.log). Measure the IR
            # residuals in c64 instead — the estimate stays honest because
            # estimate_cond_device widens its certification gate to what
            # c64 arithmetic can resolve and returns ∞ (Critical) beyond.
            def mv(xre, xim):
                y = Ac @ jax.lax.complex(xre.astype(jnp.float32),
                                         xim.astype(jnp.float32)).astype(Ac.dtype)
                return y.real.astype(f64), y.imag.astype(f64)

            def mv_adj(xre, xim):
                y = jnp.conj(Ac.T) @ jax.lax.complex(
                    xre.astype(jnp.float32),
                    xim.astype(jnp.float32)).astype(Ac.dtype)
                return y.real.astype(f64), y.imag.astype(f64)
        elif not use_sliced_matvecs(A64sp):
            def mv(xre, xim):               # A x, split f64 (native GEMVs)
                return Are @ xre - Aim @ xim, Aim @ xre + Are @ xim

            def mv_adj(xre, xim):           # Aᴴ x, split f64
                return Are.T @ xre + Aim.T @ xim, Are.T @ xim - Aim.T @ xre
        else:
            # emulated-f64 GEMVs are ~50× below bandwidth on TPU; the probe's
            # ~80 IR matvecs were most of MausSolver's construction time at
            # 4096² — exact-slicing bf16 MXU matvecs instead (refine.py)
            sp = slice_split_matrix(A64sp)

            def mv(xre, xim):
                Y = sliced_matvec_batch(sp, SplitComplex(xre[None], xim[None]))
                return Y.re[0], Y.im[0]

            def mv_adj(xre, xim):
                Y = sliced_matvec_batch(sp, SplitComplex(xre[None], xim[None]),
                                        adjoint=True)
                return Y.re[0], Y.im[0]

        def _ir(bre, bim, matvec, solve):
            """Solve to f64 accuracy with the c64 factorization; returns
            (xre, xim, rel_first, rel_final)."""
            bnorm = jnp.maximum(jnp.sqrt(jnp.sum(bre * bre + bim * bim)),
                                jnp.asarray(1e-300, f64))

            def to_c(re_, im_):
                return jax.lax.complex(re_.astype(jnp.float32),
                                       im_.astype(jnp.float32)).astype(Ac.dtype)

            xc = solve(to_c(bre, bim))
            xre = xc.real.astype(f64)
            xim = xc.imag.astype(f64)
            are0, aim0 = matvec(xre, xim)
            rre, rim = bre - are0, bim - aim0
            rel_first = jnp.sqrt(jnp.sum(rre * rre + rim * rim)) / bnorm

            def body(_, carry):
                xre, xim, rel = carry
                are_, aim_ = matvec(xre, xim)
                rre, rim = bre - are_, bim - aim_
                dc = solve(to_c(rre, rim))
                xre2 = xre + dc.real.astype(f64)
                xim2 = xim + dc.imag.astype(f64)
                are2, aim2 = matvec(xre2, xim2)
                rel2 = jnp.sqrt(jnp.sum((bre - are2) ** 2
                                        + (bim - aim2) ** 2)) / bnorm
                better = rel2 < rel
                return (jnp.where(better, xre2, xre),
                        jnp.where(better, xim2, xim),
                        jnp.minimum(rel2, rel))

            xre, xim, rel = jax.lax.fori_loop(0, ir_steps, body,
                                              (xre, xim, rel_first))
            return xre, xim, rel_first, rel

        yre = jax.random.normal(k2r, (n,), f64)
        yim = jax.random.normal(k2i, (n,), f64)

        def inv_step(i, carry):
            yre, yim, g, rel_first, rel_final = carry
            nrm = jnp.maximum(jnp.sqrt(jnp.sum(yre * yre + yim * yim)), 1e-300)
            yre, yim = yre / nrm, yim / nrm
            ure, uim, rf1, rl1 = _ir(yre, yim, mv_adj, qr_solve_adj)
            zre, zim, rf2, rl2 = _ir(ure, uim, mv, qr_solve)
            g_new = jnp.sqrt(jnp.sum(zre * zre + zim * zim))
            # max over iterations: later RHSs align with the smallest singular
            # direction, which maximizes the ε_f32·κ backward-residual signal
            rel_first = jnp.maximum(rel_first, jnp.maximum(rf1, rf2))
            rel_final = jnp.maximum(rel_final, jnp.maximum(rl1, rl2))
            return zre, zim, g_new, rel_first, rel_final

        init = (yre, yim, jnp.asarray(1.0, f64), jnp.asarray(0.0, f64),
                jnp.asarray(0.0, f64))
        _, _, g, rel_first, rel_final = jax.lax.fori_loop(0, inv_iters,
                                                          inv_step, init)
        return smax.astype(f64), g, rel_first, rel_final


_cond_probe_jit = None


def estimate_cond_device(A_dev) -> float:
    """Condition estimate computed entirely on device (one c64 QR + O(N²)
    iterations) — replaces the reference's host ``np.linalg.cond`` (AMS:400,
    full O(N³) LAPACK SVD) for large operands, so a plain ``MausSolver(A)``
    constructor at 4096² never stalls on host linear algebra."""
    global _cond_probe_jit
    import jax
    import jax.numpy as jnp

    if _cond_probe_jit is None:
        def _stacked(Ac, key):
            # derive the f64 planes INSIDE the program and stack the scalar
            # outputs: separate eager ops + per-scalar readbacks each pay the
            # full dispatch/fence RPC (measured ~1 s each at 4096²)
            f64_ = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            Are_ = Ac.real.astype(f64_)
            Aim_ = Ac.imag.astype(f64_)
            smax_, g_, rf_, rl_ = _cond_probe_device(Ac, Are_, Aim_, key)
            return jnp.stack([smax_.astype(jnp.float64),
                              g_.astype(jnp.float64),
                              rf_.astype(jnp.float64),
                              rl_.astype(jnp.float64)])
        _cond_probe_jit = jax.jit(_stacked)

    out = np.asarray(_cond_probe_jit(A_dev, jax.random.PRNGKey(0)), np.float64)
    smax, g, rel_final = float(out[0]), float(out[1]), float(out[3])
    if not (np.isfinite(smax) and np.isfinite(g)) or g <= 0:
        return np.inf
    cond_lo = smax * np.sqrt(g)      # √g → 1/σ_min as inverse power converges
    # "resolved" means the mixed-precision IR drove the solve residual to the
    # residual arithmetic's floor — then √g is trustworthy. Measured (n=256):
    # accurate within 4× up to κ ≈ 1/ε of the compute dtype. Beyond that the
    # factorization carries NO information distinguishing κ=1e10 from exactly
    # singular (all probes saturate at ≈ n/ε), so the honest answer is ∞:
    # Critical regime + iterative/GMRES-IR handling, which is also the only
    # machinery that can actually solve such a system in this precision.
    eps_res = float(np.finfo(np.float64 if jax.config.jax_enable_x64
                             else np.float32).eps)
    gate = max(1e-6, 100.0 * eps_res)
    if jax.default_backend() != "cpu" and max(A_dev.shape) > 12288:
        # past the ladder limit the probe measures IR residuals in c64 (see
        # _cond_probe_device's huge_accel branch): the measurement floor is
        # ~√N·ε_f32 regardless of the true solve quality, so certify only
        # what c64 can resolve (κ up to ~1e4) and answer ∞ beyond — the same
        # honest-∞ contract as the κ > 1/ε_f32 regime at smaller N
        gate = 3e-3
    if rel_final <= gate:
        return cond_lo
    return np.inf


# module-level jit caches: a fresh jax.jit wrapper per call would recompile
# every diagnose() (measured 4.5 s of silent recompiles per constructor call)
_structure_jit = None
_chol_jit = None


def _structure_probe(Ad):
    """(hermitian defect, symmetric defect, nnz) in ONE program / ONE fetch —
    each separate scalar readback pays the full dispatch+fence RPC."""
    global _structure_jit
    import jax
    import jax.numpy as jnp

    if _structure_jit is None:
        @jax.jit
        def probe(a):
            # nnz returns as its own int32 output: routing the count through
            # a float32 stack slot rounds it above 2^24 entries (> 4096²)
            return (jnp.stack([
                jnp.max(jnp.abs(a - jnp.conj(a).T)).astype(jnp.float32),
                jnp.max(jnp.abs(a - a.T)).astype(jnp.float32)]),
                jnp.sum((jnp.abs(a) > 1e-12).astype(jnp.int32)))
        _structure_jit = probe
    out, nnz = _structure_jit(Ad)
    out = np.asarray(out, np.float64)
    return float(out[0]), float(out[1]), int(nnz)


_nnz_jit = None
_svd_probe_jit = None


def _nnz_probe_dev(Ad) -> int:
    """Device nnz count (rectangular operands — no host copy exists)."""
    global _nnz_jit
    import jax
    import jax.numpy as jnp

    if _nnz_jit is None:
        _nnz_jit = jax.jit(
            lambda a: jnp.sum((jnp.abs(a) > 1e-12).astype(jnp.int32)))
    return int(_nnz_jit(Ad))


def _svd_probe_dev(Ad) -> np.ndarray:
    """Singular-value sketch entirely on device: exact (jnp.linalg.svd) for
    small operands, randomized range-finder + small SVD above 512. Returns a
    descending f64 host vector (real readback is fine on this runtime; only
    complex cannot cross)."""
    global _svd_probe_jit
    import jax
    import jax.numpy as jnp

    if _svd_probe_jit is None:
        @jax.jit
        def probe(a):
            with jax.default_matmul_precision("highest"):
                m_, n_ = a.shape
                k_ = min(m_, n_)
                if k_ <= 512:
                    s = jnp.linalg.svd(a, compute_uv=False)
                else:
                    key = jax.random.PRNGKey(1)
                    G = jax.random.normal(key, (n_, min(64, k_)),
                                          jnp.float32).astype(a.dtype)
                    Q, _ = jnp.linalg.qr(a @ G)
                    s = jnp.linalg.svd(jnp.conj(Q.T) @ a, compute_uv=False)
                return s.real.astype(jnp.float32)
        _svd_probe_jit = probe
    return np.asarray(_svd_probe_jit(Ad), np.float64)


def _chol_ok_dev(Ad) -> bool:
    global _chol_jit
    import jax
    import jax.numpy as jnp

    if _chol_jit is None:
        @jax.jit
        def probe(a):
            L = jnp.linalg.cholesky(a)
            return jnp.all(jnp.isfinite(L.real) & jnp.isfinite(L.imag))
        _chol_jit = probe
    return bool(_chol_jit(Ad))


_structure64_jit = None


def _structure_probe_f64(re64, im64):
    """Structure + density from the FULL-PRECISION device planes: the defects
    are measured on the user's own f64 data, so the reference's absolute
    1e-9 threshold applies verbatim even for matrices a c64 copy could not
    resolve (entrywise c64 rounding is ~6e-8·|a|)."""
    global _structure64_jit
    import jax
    import jax.numpy as jnp

    if _structure64_jit is None:
        @jax.jit
        def probe(re, im):
            herm2 = (re - re.T) ** 2 + (im + im.T) ** 2
            sym2 = (re - re.T) ** 2 + (im - im.T) ** 2
            # nnz as its own int32 output (float32 is exact only to 2^24)
            nnz = jnp.sum((re * re + im * im > 1e-24).astype(jnp.int32))
            return (jnp.stack([jnp.sqrt(jnp.max(herm2)).astype(jnp.float32),
                               jnp.sqrt(jnp.max(sym2)).astype(jnp.float32)]),
                    nnz)
        _structure64_jit = probe
    out, nnz = _structure64_jit(re64, im64)
    out = np.asarray(out, np.float64)
    return float(out[0]), float(out[1]), int(nnz)


def diagnose(A, problem_type: ProblemType,
             sparse_density_threshold: float = 0.25,
             device_operand=None, device_planes=None,
             device_exact: bool = False) -> ProblemKnowledge:
    """Classify the operand: density, Hermitian / complex-symmetric structure,
    conditioning, singularity (AMS:374-404 semantics, estimation fixed).

    ``device_operand``: optional device-resident copy of A. When provided and
    the operand is large, the condition estimate runs on device
    (:func:`estimate_cond_device`) instead of host LAPACK.
    ``device_planes``: optional (re64, im64) full-precision device planes —
    structure checks then run on the exact data. ``device_exact``: the c64
    device copy IS the user's exact data (float32/complex64 input).

    ``A=None``: DEVICE-RESIDENT diagnosis — the operand exists only as
    ``device_operand`` (complex arrays cannot cross the host boundary on this
    TPU runtime, and fetching a large operand over the ~70 MB/s tunnel would
    dominate construction); every probe runs on device."""
    if A is None:
        if device_operand is None:
            raise ValueError("diagnose needs either a host operand or "
                             "device_operand")
        was_sparse = False
        Ad = None
        if device_operand.ndim != 2:
            raise ValueError(f"expected a 2-D operand, got shape "
                             f"{device_operand.shape}")
        m, n = device_operand.shape
    else:
        was_sparse = hasattr(A, "toarray")
        Ad = _to_dense_numpy(A)
        if Ad.ndim != 2:
            raise ValueError(f"expected a 2-D operand, got shape {Ad.shape}")
        m, n = Ad.shape
    big = m * n > 10_000_000
    is_hermitian = False
    is_complex_symmetric = False
    is_positive_definite = False
    if m == n and device_planes is not None:
        # structure + density in ONE device program / ONE fetch, on the
        # FULL-PRECISION planes — the reference's absolute 1e-9 threshold
        # applies verbatim, and (beyond its 1e7-element densify guard) large
        # Hermitian operands now reach the shared-eigh fast path
        dh, ds, nnz = _structure_probe_f64(*device_planes)
        is_hermitian = dh <= 1e-9
        if not is_hermitian:
            is_complex_symmetric = ds <= 1e-9
        if is_hermitian:
            is_positive_definite = bool(_chol_ok_dev(device_operand))
    elif m == n and device_operand is not None and (device_exact or not big):
        # exact c64 input (the device copy IS the data), or a small operand
        # where a misclassification risk from c64 rounding does not arise
        # because the host check below would see the same values anyway —
        # prefer the device probe (one program, no 0.3 s host scans)
        if device_exact or Ad is None:
            dh, ds, nnz = _structure_probe(device_operand)
            is_hermitian = dh <= 1e-9
            if not is_hermitian:
                is_complex_symmetric = ds <= 1e-9
            if is_hermitian:
                is_positive_definite = bool(_chol_ok_dev(device_operand))
        else:
            # small + possibly-rounded device copy: use the host data
            nnz = int(np.count_nonzero(np.abs(Ad) > 1e-12))
            is_hermitian = bool(np.allclose(Ad, Ad.conj().T, atol=1e-9))
            if not is_hermitian and np.iscomplexobj(Ad):
                is_complex_symmetric = bool(np.allclose(Ad, Ad.T, atol=1e-9))
            if is_hermitian:
                try:
                    np.linalg.cholesky(Ad)
                    is_positive_definite = True
                except np.linalg.LinAlgError:
                    is_positive_definite = False
    elif m == n and device_operand is not None:
        # big operand, only a (possibly rounded) c64 copy: the 1e-9 absolute
        # test is not resolvable at c64 precision in either direction (a
        # truly non-Hermitian matrix with defect ~5e-8 can round to a zero
        # measured defect), and a wrong Hermitian classification would force
        # real eigenvalues — classify as general (correct, just not
        # fast-pathed). Density still comes from the device count.
        _, _, nnz = _structure_probe(device_operand)
    elif Ad is None:
        # rectangular device-resident operand (SVD): density from a device
        # count, structure flags stay False (not meaningful off-square)
        nnz = _nnz_probe_dev(device_operand)
    else:
        nnz = int(np.count_nonzero(np.abs(Ad) > 1e-12))
        if m == n and not big:                  # densify guard (AMS:390-395)
            is_hermitian = bool(np.allclose(Ad, Ad.conj().T, atol=1e-9))
            if not is_hermitian and np.iscomplexobj(Ad):
                is_complex_symmetric = bool(np.allclose(Ad, Ad.T, atol=1e-9))
            if is_hermitian:
                try:
                    np.linalg.cholesky(Ad)
                    is_positive_definite = True
                except np.linalg.LinAlgError:
                    is_positive_definite = False
    density = nnz / max(1, m * n)
    is_sparse = was_sparse or density < sparse_density_threshold

    dev_sketch = None   # device σ sketch, computed at most once
    if device_operand is not None and m == n and (max(m, n) > 512
                                                  or Ad is None):
        cond = estimate_cond_device(device_operand)
    elif Ad is None:
        # rectangular device-resident operand: σ ratio from the device
        # sketch. Above min(m,n)=512 the sketch captures only the top ~64
        # σ's, so this is a LOWER bound on κ — it can miss singularity; for
        # SVD (the only rectangular consumer) misclassification only softens
        # the initial Ψ aggression, which the strategy loop re-adapts.
        dev_sketch = _svd_probe_dev(device_operand)
        cond = float(dev_sketch[0] / dev_sketch[-1]) \
            if dev_sketch[-1] > 0 else np.inf
    else:
        cond = estimate_cond(Ad)
    is_singular = (not np.isfinite(cond)) or cond > 1e15

    effective_rank = None
    if problem_type == ProblemType.SVD:
        # cheap rank probe from a few power iterations' worth of singular values:
        # exact for small operands, top-k randomized sketch otherwise
        k = min(m, n)
        if Ad is None:
            s = dev_sketch if dev_sketch is not None \
                else _svd_probe_dev(device_operand)
        elif k <= 512:
            s = np.linalg.svd(Ad, compute_uv=False)
        else:
            rng_ = np.random.default_rng(1)
            Q = np.linalg.qr(Ad @ rng_.standard_normal((n, min(64, k))))[0]
            s = np.linalg.svd(Q.conj().T @ Ad, compute_uv=False)
        smax = s[0] if len(s) else 1.0
        effective_rank = int(np.sum(s / max(smax, 1e-300) > RANK_REL_CUT)) or 1

    return ProblemKnowledge(
        shape=(m, n), is_hermitian=is_hermitian,
        is_complex_symmetric=is_complex_symmetric,
        is_positive_definite=is_positive_definite,
        is_sparse_input=is_sparse, density=float(density),
        cond_estimate=float(cond) if np.isfinite(cond) else float("inf"),
        is_singular=bool(is_singular), effective_rank=effective_rank)
