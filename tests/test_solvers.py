"""Iterative solver tests (CG, BiCGSTAB, power iteration, PageRank)
against scipy/numpy oracles, driven through the CSR5 XLA executor."""

import numpy as np
import scipy.sparse as sp

from benchmark_spmv_using_csr5_tpu import build_csr5, csr5_spmv_xla, csr_from_scipy
from benchmark_spmv_using_csr5_tpu.models import solvers
from benchmark_spmv_using_csr5_tpu.utils import synth


def _spd(m=120, seed=0):
    a = synth.banded(m, 5, dtype=np.float64, seed=seed)
    a = (a + a.T) * 0.5 + sp.eye(m) * (np.abs(a).sum(axis=1).max() + 1.0)
    return sp.csr_matrix(a)


def _spmv_fn(a_sp):
    a5 = build_csr5(csr_from_scipy(a_sp))
    return lambda v: csr5_spmv_xla(a5, v)


def test_cg_solves_spd():
    a_sp = _spd()
    b = np.ones(a_sp.shape[0])
    x, res = solvers.conjugate_gradient(_spmv_fn(a_sp), b, iters=200)
    assert float(res) < 1e-6
    np.testing.assert_allclose(a_sp @ np.asarray(x), b, atol=1e-5)


def test_bicgstab_solves_general():
    a_sp = _spd(seed=3)
    # break symmetry mildly; keep it well-conditioned
    a_sp = sp.csr_matrix(a_sp + sp.diags(np.linspace(0, 0.5, a_sp.shape[0])))
    b = np.ones(a_sp.shape[0])
    x, res = solvers.bicgstab(_spmv_fn(a_sp), b, iters=200)
    np.testing.assert_allclose(a_sp @ np.asarray(x), b, atol=1e-5)


def test_iterative_refinement_reaches_f64_accuracy():
    import jax.numpy as jnp

    a64 = _spd(m=150, seed=7)  # f64
    a32 = sp.csr_matrix(a64).astype(np.float32)
    b = np.ones(150, np.float64)

    spmv_hi = _spmv_fn(a64)
    spmv_lo = _spmv_fn(a32)

    # f32-only CG plateaus near f32 roundoff; refinement goes far below
    x32, _ = solvers.conjugate_gradient(
        spmv_lo, jnp.asarray(b, jnp.float32), iters=300
    )
    res32 = np.linalg.norm(a64 @ np.asarray(x32, np.float64) - b)

    x_ir, res_ir = solvers.iterative_refinement(
        spmv_lo, spmv_hi, jnp.asarray(b), outer_iters=4, inner_iters=100
    )
    assert x_ir.dtype == jnp.float64
    assert float(res_ir) < 1e-10
    assert float(res_ir) < res32 / 10


def test_power_iteration_dominant_eig():
    import jax.numpy as jnp

    a_sp = _spd(m=80, seed=5)
    lam, v = solvers.power_iteration(
        _spmv_fn(a_sp), a_sp.shape[0], iters=300, dtype=jnp.float64
    )
    from scipy.sparse.linalg import eigsh

    lam_ref = eigsh(a_sp, k=1, which="LM", return_eigenvectors=False)[0]
    np.testing.assert_allclose(float(lam), lam_ref, rtol=1e-4)


def test_pagerank_sums_to_one():
    import jax.numpy as jnp

    m = 100
    a_sp = sp.random(m, m, 0.05, random_state=7, format="csr")
    a_sp.data[:] = 1.0
    # column-stochastic transition: T = (A / outdeg)^T, dangling -> uniform
    out = np.asarray(a_sp.sum(axis=1)).ravel()
    scale = np.divide(1.0, out, out=np.zeros_like(out), where=out > 0)
    t_sp = sp.csr_matrix(sp.diags(scale) @ a_sp).T.tocsr()
    spmv_t = _spmv_fn(t_sp)
    pr = solvers.pagerank(spmv_t, m, iters=100, dtype=jnp.float64)
    pr = np.asarray(pr)
    assert pr.shape == (m,)
    np.testing.assert_allclose(pr.sum(), 1.0, atol=1e-4)
    assert (pr >= 0).all()


def test_gmres_nonsymmetric():
    # GMRES on a diagonally dominant nonsymmetric matrix
    rng = np.random.default_rng(7)
    m = 200
    a_sp = sp.csr_matrix(
        sp.diags(
            [rng.uniform(4, 5, m), rng.uniform(-1, 1, m - 1), rng.uniform(-1, 1, m - 3)],
            [0, 1, -3],
        )
    ).astype(np.float32)
    a5 = build_csr5(csr_from_scipy(a_sp))
    b = rng.uniform(-1, 1, m).astype(np.float32)
    spmv = lambda v: csr5_spmv_xla(a5, v)  # noqa: E731
    x, res = solvers.gmres(spmv, b, restart=25, outer_iters=4)
    x = np.asarray(x)
    assert float(res) < 1e-3
    np.testing.assert_allclose(a_sp @ x, b, atol=1e-3)


def test_lanczos_extremal_eigs():
    import jax.numpy as jnp

    # SPD tridiagonal with known spectrum ~ [2-2cos(pi k/(m+1))] * scale
    m = 150
    a_sp = sp.csr_matrix(
        sp.diags([2 * np.ones(m), -np.ones(m - 1), -np.ones(m - 1)], [0, 1, -1])
    ).astype(np.float32)
    a5 = build_csr5(csr_from_scipy(a_sp))
    spmv = lambda v: csr5_spmv_xla(a5, v)  # noqa: E731
    v0 = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, m).astype(np.float32))
    _, _, evals = solvers.lanczos(spmv, v0, iters=40)
    lam_max_true = 2 - 2 * np.cos(np.pi * m / (m + 1))
    # Lanczos converges to extremal eigenvalues first
    assert abs(float(evals[-1]) - lam_max_true) < 0.01 * lam_max_true
