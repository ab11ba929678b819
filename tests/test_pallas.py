"""Pallas kernel correctness (interpret mode on CPU — identical kernel code
runs compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pypic_tpu.ops.cic import _deposit_scatter, gather
from pypic_tpu.ops.pallas_cic import (
    deposit_pallas,
    gather_pallas,
    picard_iteration_pallas,
    picard_finalize_pallas,
)


@pytest.mark.parametrize("ng,periodic", [(200, True), (129, True), (51, False), (800, False)])
def test_deposit_pallas_matches_scatter(ng, periodic):
    rng = np.random.default_rng(3)
    n = 5000
    cells = ng if periodic else ng - 1
    p = jnp.asarray(rng.uniform(0, cells, n), jnp.float32)
    val = jnp.asarray(rng.normal(size=n), jnp.float32)
    a = _deposit_scatter(p, val, ng, periodic)
    b = deposit_pallas(p, val, ng, periodic=periodic)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("ng,periodic", [(200, True), (51, False)])
def test_gather_pallas_matches_take(ng, periodic):
    rng = np.random.default_rng(5)
    n = 5000
    cells = ng if periodic else ng - 1
    p = jnp.asarray(rng.uniform(0, cells, n), jnp.float32)
    f = jnp.asarray(rng.normal(size=ng), jnp.float32)
    a = gather(f, p, periodic=periodic, method="take")
    b = gather_pallas(f, p, periodic=periodic)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_picard_matches_composed():
    """The fused kernel's (gather -> CN -> half-step deposit) pass reproduces
    the op-by-op composition, including non-block-multiple n (mask check)."""
    rng = np.random.default_rng(7)
    ng, n = 200, 4097
    qm, w, dt, dx = -1.7e11, -3.2e-9, 1e-7, 0.05
    p0 = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=n) * 1e5, jnp.float32)
    ps = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
    e = jnp.asarray(rng.normal(size=ng) * 1e3, jnp.float32)

    ep = gather(e, ps, periodic=True, method="take")
    dt_dx = dt / dx
    p1r = p0 + dt_dx * v0 + 0.5 * qm * dt * dt_dx * ep
    v1r = v0 + qm * dt * ep
    phr = jnp.mod(0.5 * (p0 + p1r), ng)
    vhr = 0.5 * (v0 + v1r)
    jhr = _deposit_scatter(phr, w * vhr, ng, True)

    ph, jh = picard_iteration_pallas(e, ps, p0, v0, ng, qm=qm, w=w, dt=dt, dx=dx)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(phr), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jh), np.asarray(jhr),
        atol=2e-5 * float(jnp.abs(jhr).max()),
    )

    p1, v1, j1 = picard_finalize_pallas(e, ps, p0, v0, ng, qm=qm, w=w, dt=dt, dx=dx)
    j1r = _deposit_scatter(jnp.mod(p1r, ng), w * v1r, ng, True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(jnp.mod(p1r, ng)), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(v1), np.asarray(v1r),
        atol=1e-4 * float(jnp.abs(v1r).max()),
    )
    np.testing.assert_allclose(
        np.asarray(j1), np.asarray(j1r),
        atol=2e-5 * float(jnp.abs(j1r).max()),
    )


@pytest.mark.parametrize("ng", [64, 200, 129])
def test_leapfrog_gather_push_matches_composed(ng):
    """Fused gather + leapfrog + wrap kernel vs the op-by-op composition,
    non-block-multiple n."""
    from pypic_tpu.ops.pallas_cic import leapfrog_gather_push_pallas

    rng = np.random.default_rng(11)
    n = 4099
    qm, dt, dx = -1.7e11, 1e-7, 0.05
    p = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
    v = jnp.asarray(rng.normal(size=n) * 1e5, jnp.float32)
    e = jnp.asarray(rng.normal(size=ng) * 1e3, jnp.float32)

    ep = gather(e, p, periodic=True, method="take")
    vh = v + 0.5 * qm * dt * ep
    p1r = jnp.mod(p + vh * (dt / dx), ng)
    v1r = vh + 0.5 * qm * dt * ep

    p1, v1 = leapfrog_gather_push_pallas(e, p, v, qm=jnp.float32(qm),
                                         dt=dt, dx=dx)
    assert p1.shape == (n,) and v1.shape == (n,)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p1r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v1r),
                               atol=1e-4 * float(jnp.abs(v1r).max()))


@pytest.mark.parametrize("ng", [64, 200])
def test_explicit_cycle_kernel_matches_composed(ng):
    """The one-kernel explicit cycle (gather + leapfrog + wrap + deposit +
    in-epilogue field solve via precomputed contractions) reproduces the
    composed op pipeline including the solved next-step field."""
    from pypic_tpu.ops.cic import _deposit_scatter
    from pypic_tpu.ops.fd import grad_periodic
    from pypic_tpu.ops.poisson import solve_periodic_neutralized
    from pypic_tpu.ops.pallas_cic import (
        explicit_cycle_matrices,
        explicit_cycle_pallas,
    )

    rng = np.random.default_rng(17)
    n = 4099
    qm, w, dt, dx = -1.7e11, 3.2e-9, 1e-7, 0.05
    p = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
    v = jnp.asarray(rng.normal(size=n) * 1e5, jnp.float32)
    e = jnp.asarray(rng.normal(size=ng) * 1e3, jnp.float32)

    ep = gather(e, p, periodic=True, method="take")
    vh = v + 0.5 * qm * dt * ep
    p1r = jnp.mod(p + vh * (dt / dx), ng)
    v1r = vh + 0.5 * qm * dt * ep
    rho_r = _deposit_scatter(p1r, jnp.full((n,), w, jnp.float32), ng, True)
    e1_r = -grad_periodic(solve_periodic_neutralized(rho_r, dx), dx)

    fold_mat, me_mat = explicit_cycle_matrices(ng, dx)
    p1, v1, rho, e1 = explicit_cycle_pallas(
        e, p, v, ng, qm=jnp.float32(qm), w=jnp.float32(w), dt=dt, dx=dx,
        fold_mat=fold_mat, me_mat=me_mat,
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p1r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v1r),
                               atol=1e-4 * float(jnp.abs(v1r).max()))
    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_r),
                               rtol=2e-4, atol=2e-5 * float(rho_r.max()))
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e1_r),
        atol=5e-4 * float(jnp.abs(e1_r).max()))


def test_blocked_inputs_match_flat():
    """Pre-blocked (nb, 1, block) particle inputs (block_particles) produce
    bit-identical results to the flat (n,) path, including deposit masking
    of the pad tail (n not a block multiple)."""
    from pypic_tpu.ops.pallas_cic import (
        block_particles,
        picard_finalize_nodep_pallas,
        unblock_particles,
    )

    rng = np.random.default_rng(13)
    ng, n = 200, 4097
    qm, w, dt, dx = -1.7e11, -3.2e-9, 1e-7, 0.05
    p0 = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=n) * 1e5, jnp.float32)
    ps = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
    e = jnp.asarray(rng.normal(size=ng) * 1e3, jnp.float32)

    ph_f, jh_f = picard_iteration_pallas(e, ps, p0, v0, ng, qm=qm, w=w,
                                         dt=dt, dx=dx)
    (ps_b, p0_b, v0_b), _ = block_particles([ps, p0, v0])
    ph_b, jh_b = picard_iteration_pallas(e, ps_b, p0_b, v0_b, ng, qm=qm,
                                         w=w, dt=dt, dx=dx, n_valid=n)
    np.testing.assert_array_equal(np.asarray(unblock_particles(ph_b, n)),
                                  np.asarray(ph_f))
    np.testing.assert_array_equal(np.asarray(jh_b), np.asarray(jh_f))

    p1_f, v1_f = picard_finalize_nodep_pallas(e, ps, p0, v0, ng, qm=qm,
                                              dt=dt, dx=dx)
    p1_b, v1_b = picard_finalize_nodep_pallas(e, ps_b, p0_b, v0_b, ng,
                                              qm=qm, dt=dt, dx=dx, n_valid=n)
    np.testing.assert_array_equal(np.asarray(unblock_particles(p1_b, n)),
                                  np.asarray(p1_f))
    np.testing.assert_array_equal(np.asarray(unblock_particles(v1_b, n)),
                                  np.asarray(v1_f))

    # missing n_valid with blocked inputs is an error, not silence
    with pytest.raises(ValueError):
        picard_iteration_pallas(e, ps_b, p0_b, v0_b, ng, qm=qm, w=w,
                                dt=dt, dx=dx)


def test_deposit_pallas_padding_mask():
    """Padding particles (n not a multiple of the block) contribute nothing."""
    p = jnp.asarray([5.5], jnp.float32)
    val = jnp.asarray([2.0], jnp.float32)
    out = deposit_pallas(p, val, 64, periodic=True)
    assert np.isclose(float(out.sum()), 2.0)
    assert np.isclose(float(out[5]), 1.0) and np.isclose(float(out[6]), 1.0)


def test_histogram_add_matches_bincount():
    from pypic_tpu.ops import histogram_add

    rng = np.random.default_rng(0)
    nbins = 3200
    idx = jnp.asarray(rng.integers(0, nbins, 100_000), jnp.int32)
    vals = jnp.asarray(rng.uniform(0, 1, 100_000), jnp.float32)
    # masked rows contribute nothing
    vals = vals.at[::7].set(0.0)
    out = histogram_add(idx, vals, nbins)
    expect = np.bincount(np.asarray(idx), weights=np.asarray(vals),
                         minlength=nbins)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-4)


def test_deposit2_matches_two_deposits():
    from pypic_tpu.ops import deposit
    from pypic_tpu.ops.pallas_cic import deposit2_pallas

    rng = np.random.default_rng(1)
    ng = 600
    p = jnp.asarray(rng.uniform(0, ng - 1, 50_000), jnp.float32)
    va = jnp.asarray(rng.normal(size=50_000), jnp.float32)
    vb = jnp.asarray(rng.uniform(0, 2, 50_000), jnp.float32)
    a, b = deposit2_pallas(p, va, vb, ng, periodic=False)
    a1 = deposit(p, va, ng, periodic=False, method="scatter")
    b1 = deposit(p, vb, ng, periodic=False, method="scatter")
    np.testing.assert_allclose(np.asarray(a), np.asarray(a1),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b1),
                               rtol=2e-4, atol=1e-3)


def test_boris_gather_push_matches_composed_ops():
    from pypic_tpu.constants import E_CHARGE, M_PROTON
    from pypic_tpu.ops import gather
    from pypic_tpu.ops.pallas_cic import boris_gather_push_pallas
    from pypic_tpu.push import boris_push_dt

    rng = np.random.default_rng(2)
    ng, n = 128, 20_000
    dx, dt = 1e-5, 1e-10
    field = jnp.asarray(rng.normal(0, 100, ng), jnp.float32)
    p = jnp.asarray(rng.uniform(0, ng - 1, n), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1e4, (n, 3)), jnp.float32)
    cs = jnp.asarray(rng.integers(1, 3, n), jnp.float32)
    m = jnp.full((n,), 2.0 * M_PROTON, jnp.float32)
    act = jnp.asarray(rng.uniform(size=n) < 0.9, jnp.float32)
    b = (1.2, 0.7, -0.3)

    p1, vx1, vy1, vz1 = boris_gather_push_pallas(
        field, p, v[:, 0], v[:, 1], v[:, 2],
        (0.5 * dt * E_CHARGE) * cs / m, act, b=b, dt=dt, dt_dx=dt / dx,
    )
    e_p = jnp.where(act > 0, gather(field, p, periodic=False, method="take"),
                    0.0)
    x1r, _, v1r = boris_push_dt(p * dx, jnp.zeros((n, 2)), v, e_p,
                                jnp.asarray(b, jnp.float32), cs, m, dt)
    is_act = np.asarray(act) > 0
    # p + vx*dt/dx vs (x + vx*dt)/dx round differently at f32
    np.testing.assert_allclose(np.asarray(p1)[is_act],
                               np.asarray(x1r)[is_act] / dx, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vx1)[is_act],
                               np.asarray(v1r)[is_act, 0], rtol=1e-4,
                               atol=1e-2)
    # inactive particles hold their state exactly
    np.testing.assert_array_equal(np.asarray(p1)[~is_act],
                                  np.asarray(p)[~is_act])
    np.testing.assert_array_equal(np.asarray(vy1)[~is_act],
                                  np.asarray(v)[~is_act, 1])


def test_picard_shared_window_matches_separate_at_seam():
    """The shared-window Picard pass computes the SAME function of
    (field, ps, p0, v0) as the separate-window pass — the deposit merely
    routes through ps's widened window instead of its own decomposition —
    so (ph, jh) must agree elementwise, including for particles whose
    midpoint iterate wraps the periodic seam (the nearest-image delta
    path) and for a carried iterate far from p0 (seeding differences are
    an ENGINE concern; the kernel contract is position-for-position)."""
    from pypic_tpu.ops.pallas_cic import picard_iteration_pallas

    ng = 64
    rng = np.random.default_rng(3)
    n = 4096
    # cluster positions at the seam so tents and midpoints cross it
    p0 = np.concatenate([
        rng.uniform(ng - 1.0, ng, n // 2),  # just below the seam
        rng.uniform(0.0, 1.0, n // 2),      # just above
    ]).astype(np.float32)
    # velocities large enough that ph crosses the boundary both ways
    v0 = rng.normal(0.0, 1.0, n).astype(np.float32)
    dt, dx = 0.8, 1.0  # dt/dx ~ cell-scale displacement per step
    field = rng.normal(0.0, 0.5, ng).astype(np.float32)
    ps = (p0 + 0.5 * (dt / dx) * v0) % ng  # wrapped free-streaming seed

    kw = dict(qm=jnp.float32(1.0), w=jnp.float32(0.5), dt=dt, dx=dx)
    ph_sep, jh_sep = picard_iteration_pallas(
        jnp.asarray(field), jnp.asarray(ps), jnp.asarray(p0),
        jnp.asarray(v0), ng, **kw,
    )
    ph_sh, jh_sh, ncl = picard_iteration_pallas(
        jnp.asarray(field), jnp.asarray(ps), jnp.asarray(p0),
        jnp.asarray(v0), ng, share_window=True, **kw,
    )
    assert int(ncl) == 0, "nothing should clamp at cell-scale offsets"
    np.testing.assert_allclose(np.asarray(ph_sh), np.asarray(ph_sep),
                               rtol=1e-6, atol=1e-5)
    scale = np.abs(np.asarray(jh_sep)).max()
    np.testing.assert_allclose(np.asarray(jh_sh) / scale,
                               np.asarray(jh_sep) / scale, atol=2e-6)
    # exact charge-weighted total either way (tents always sum to 1)
    np.testing.assert_allclose(np.asarray(jh_sh).sum(),
                               np.asarray(jh_sep).sum(), rtol=1e-5)


def test_newton_boltzmann_pallas_matches_xla():
    """The one-kernel PCR Newton solve (ops.pallas_newton) reaches the same
    converged phi as ops.poisson.solve_boltzmann_dirichlet (same algorithm,
    different tridiagonal summation order), cold and warm started."""
    from pypic_tpu.constants import E_CHARGE
    from pypic_tpu.ops.poisson import solve_boltzmann_dirichlet
    from pypic_tpu.ops.pallas_newton import boltzmann_dirichlet_pallas

    rng = np.random.default_rng(11)
    te, dx, n0 = 11600.0 * 10.0, 2e-5, np.float32(1e17)
    for ng in (600, 301, 128):
        dens = (1e17 * (1.0 + 0.3 * rng.standard_normal(ng))).clip(1e15)
        rho = jnp.asarray((E_CHARGE * dens).astype(np.float32))
        ref = solve_boltzmann_dirichlet(rho, n0, te, dx, tol=1e-9)
        new = boltzmann_dirichlet_pallas(rho, n0, te, dx, tol=1e-9)
        assert float(new.residual) <= 1e-9
        assert int(new.iterations) <= int(ref.iterations) + 1
        scale = float(jnp.max(jnp.abs(ref.phi)))
        np.testing.assert_allclose(np.asarray(new.phi), np.asarray(ref.phi),
                                   atol=3e-5 * scale)
        # warm start from the converged answer: both exit in one sweep
        ref_w = solve_boltzmann_dirichlet(rho, n0, te, dx, tol=1e-9,
                                          phi0=ref.phi)
        new_w = boltzmann_dirichlet_pallas(rho, n0, te, dx, tol=1e-9,
                                           phi0=ref.phi)
        assert int(new_w.iterations) == int(ref_w.iterations)
        np.testing.assert_allclose(np.asarray(new_w.phi),
                                   np.asarray(ref_w.phi), atol=3e-5 * scale)


def test_newton_boltzmann_pallas_neutral_plasma():
    """Neutral plasma gives phi ~ 0 (pygcpic.py:1010-1019 analog) at
    physical scales. The f32 kernel can't run the original doctest's
    unnormalized constants (n0 = 1/e makes c0 ~ 1e11 whose f32 ulp noise
    floors |dphi|^2 above tol); at SI sheath scales it converges to a
    potential ~1e5x below the te scale."""
    from pypic_tpu.constants import E_CHARGE, K_BOLTZMANN
    from pypic_tpu.ops.pallas_newton import boltzmann_dirichlet_pallas

    n0, te, dx = np.float32(1e17), 11600.0 * 10.0, 2e-5
    rho = jnp.full(129, E_CHARGE * 1e17, jnp.float32)
    res = boltzmann_dirichlet_pallas(rho, n0, te, dx, tol=1e-9)
    te_volts = K_BOLTZMANN * te / E_CHARGE  # 10 V
    assert float(jnp.max(jnp.abs(res.phi))) < 1e-4 * te_volts


def test_newton_boltzmann_dn_pallas_matches_xla():
    """The one-kernel D-N Newton (Sherman-Morrison on a 2-RHS PCR) reaches
    the same converged phi as ops.poisson.solve_boltzmann_dirichlet_neumann
    through the dirichlet_neumann_test engine envelope (tol 1e-3,
    pygcpic.py:1079-1080)."""
    from pypic_tpu.constants import E_CHARGE
    from pypic_tpu.ops.poisson import solve_boltzmann_dirichlet_neumann
    from pypic_tpu.ops.pallas_newton import boltzmann_dn_pallas

    rng = np.random.default_rng(13)
    te, dx = 11600.0 * 10.0, 2e-5
    for ng in (600, 257):
        dens = (1e17 * (1.0 + 0.3 * rng.standard_normal(ng))).clip(1e15)
        n = jnp.asarray(dens.astype(np.float32))
        n0 = np.float32(0.9e17)
        phi0 = jnp.zeros(ng, jnp.float32)
        ref = solve_boltzmann_dirichlet_neumann(n, n0, te, dx, phi0,
                                                tol=1e-3, maxiter=100)
        new = boltzmann_dn_pallas(n, n0, te, dx, phi0, tol=1e-3, maxiter=100)
        assert abs(int(new.iterations) - int(ref.iterations)) <= 1
        scale = float(jnp.max(jnp.abs(ref.phi)))
        np.testing.assert_allclose(np.asarray(new.phi), np.asarray(ref.phi),
                                   atol=5e-4 * scale)
        # warm start from the converged answer
        ref_w = solve_boltzmann_dirichlet_neumann(n, n0, te, dx, ref.phi,
                                                  tol=1e-3, maxiter=100)
        new_w = boltzmann_dn_pallas(n, n0, te, dx, ref.phi,
                                    tol=1e-3, maxiter=100)
        assert int(new_w.iterations) == int(ref_w.iterations)


def test_explicit_resident_matches_scanned():
    """run_resident (S full PIC cycles per kernel invocation, VMEM-resident
    population) reproduces the scanned one-kernel cycle trajectory
    bit-for-bit (same in-kernel math; only the metric reductions reorder),
    including a non-multiple remainder chunk."""
    from pypic_tpu.constants import (
        E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON,
    )
    from pypic_tpu.grid import GridSpec
    from pypic_tpu import initialize as init
    from pypic_tpu.engines import explicit
    from pypic_tpu.runner import run

    density, te = 1e10, 0.1 * 11600.0
    debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
    grid = GridSpec(200, 15.0 * debye, "periodic")
    x, v, params = init.initialize_periodic(
        "two-stream", 4097, density, 1, 0.05, grid, te, te, seed=2)
    cfg = explicit.ExplicitConfig(grid, 0.1 / params.wp, params.p2c,
                                  backend="fused")
    st = explicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
    fin1, m1 = run(explicit.make_step(cfg), st, 37)
    fin2, m2 = explicit.run_resident(cfg, st, 37, steps_per_call=16)
    np.testing.assert_array_equal(np.asarray(fin2.p), np.asarray(fin1.p))
    np.testing.assert_array_equal(np.asarray(fin2.v), np.asarray(fin1.v))
    np.testing.assert_array_equal(np.asarray(fin2.rho), np.asarray(fin1.rho))
    np.testing.assert_array_equal(np.asarray(fin2.e), np.asarray(fin1.e))
    assert int(fin2.step) == 37
    fe1 = np.asarray(m1.field_energy, np.float64)
    np.testing.assert_allclose(np.asarray(m2.field_energy, np.float64), fe1,
                               rtol=1e-6)
    ke1 = np.asarray(m1.kinetic_energy, np.float64)
    np.testing.assert_allclose(np.asarray(m2.kinetic_energy, np.float64),
                               ke1, rtol=1e-5)
    with pytest.raises(ValueError, match="scalar q/m"):
        st_bad = st.replace(q=jnp.full(4097, float(st.q)))
        explicit.run_resident(cfg, st_bad, 4)


def test_implicit_resident_matches_scanned():
    """implicit.run_resident (full CN-Picard steps in one kernel, baked
    smoothing/window/fold contractions) tracks the scanned fused path:
    identical Picard iteration counts, energies to f32 contraction
    rounding — for both the plain and the conserving
    (extrapolate+anderson fixed-4) configurations."""
    from pypic_tpu.constants import (
        E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON,
    )
    from pypic_tpu.grid import GridSpec
    from pypic_tpu import initialize as init
    from pypic_tpu.engines import implicit
    from pypic_tpu.runner import run

    density, te, ti = 1e5, 100.0 * 11600.0, 0.1 * 11600.0
    debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
    grid = GridSpec(200, 22.0 * debye, "periodic")
    x, v, params = init.initialize_periodic(
        "landau-damping", 9001, density, 1, 0.8, grid, te, ti, seed=1)
    for accel, mode, tol, maxi in (
        ("none", "field", 1e-9, 50),
        ("anderson", "extrapolate", 1e-30, 4),
    ):
        cfg = implicit.ImplicitConfig(
            grid, 1e-5, params.p2c, tol=tol, maxiter=maxi, backend="fused",
            picard_init=mode, picard_accel=accel)
        st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
        fin1, m1 = run(implicit.make_step(cfg), st, 25)
        fin2, m2 = implicit.run_resident(cfg, st, 25, steps_per_call=8)
        np.testing.assert_array_equal(np.asarray(m2.picard_iters),
                                      np.asarray(m1.picard_iters))
        np.testing.assert_allclose(
            np.asarray(m2.field_energy, np.float64),
            np.asarray(m1.field_energy, np.float64), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(m2.kinetic_energy, np.float64),
            np.asarray(m1.kinetic_energy, np.float64), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fin2.p), np.asarray(fin1.p),
                                   atol=5e-3)
        assert int(fin2.step) == 25
    with pytest.raises(ValueError, match="finalize"):
        bad = implicit.ImplicitConfig(grid, 1e-5, params.p2c,
                                      finalize="iterate")
        implicit.run_resident(bad, st, 2)


def test_newton_pallas_maxiter_cap():
    """The in-kernel while_loop respects the maxiter envelope and reports
    the unconverged residual honestly."""
    from pypic_tpu.constants import E_CHARGE
    from pypic_tpu.ops.pallas_newton import boltzmann_dirichlet_pallas

    rng = np.random.default_rng(3)
    dens = (1e17 * (1.0 + 0.3 * rng.standard_normal(301))).clip(1e15)
    rho = jnp.asarray((E_CHARGE * dens).astype(np.float32))
    res = boltzmann_dirichlet_pallas(rho, np.float32(1e17), 11600.0 * 10.0,
                                     2e-5, tol=1e-30, maxiter=2)
    assert int(res.iterations) == 2
    assert float(res.residual) > 1e-30


def _adversarial_positions(rng, n, cells):
    """Uniform positions salted with the geometry's worst cases: exact
    node hits, window-seam neighborhoods (stride multiples +/- 1 ulp),
    and the domain edges."""
    p = rng.uniform(0, cells, n).astype(np.float32)
    k = n // 4
    p[:k] = rng.integers(0, cells, k)  # exact nodes (w_R = 0)
    edge = np.float32(cells) - np.float32(1e-3)
    p[k:k + 8] = [0.0, edge, np.nextafter(np.float32(cells), np.float32(0)),
                  1.0, cells - 1, cells / 2, np.nextafter(np.float32(0), np.float32(1)),
                  min(cells - 1e-3, 2.0)]
    return p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_window_geometry_fuzz_deposit_gather(seed):
    """Randomized sweep of the windowed-tent geometry (_choose_window
    stride/width envelope + selector/fold) across grid sizes the fixed
    parametrizations never hit, with adversarial positions (exact nodes,
    seams, edges). Pallas deposit/gather must match the XLA scatter/take
    references for every (ng, periodic, n) drawn — including n that is
    not a multiple of the particle block."""
    rng = np.random.default_rng(100 + seed)
    for _ in range(6):
        ng = int(rng.integers(9, 1200))
        periodic = bool(rng.integers(0, 2))
        n = int(rng.integers(100, 9000))
        cells = ng if periodic else ng - 1
        p = jnp.asarray(_adversarial_positions(rng, n, cells))
        val = jnp.asarray(rng.normal(size=n), jnp.float32)
        a = _deposit_scatter(p, val, ng, periodic)
        b = deposit_pallas(p, val, ng, periodic=periodic)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=3e-5 * max(1.0, float(jnp.abs(a).max())),
            err_msg=f"deposit ng={ng} periodic={periodic} n={n}")
        f = jnp.asarray(rng.normal(size=ng), jnp.float32)
        ga = gather(f, p, periodic=periodic, method="take")
        gb = gather_pallas(f, p, periodic=periodic)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=1e-5,
            err_msg=f"gather ng={ng} periodic={periodic} n={n}")


@pytest.mark.parametrize("ng", [23, 97, 541])
def test_fused_picard_fuzz_odd_grids(ng):
    """The fused Picard pass on grid sizes off the calibrated path (prime
    ngs force every stride/width remainder case at the last window)."""
    rng = np.random.default_rng(ng)
    n = 4097
    qm, w, dt, dx = -1.7e11, -3.2e-9, 1e-7, 0.05
    p0 = jnp.asarray(_adversarial_positions(rng, n, ng))
    v0 = jnp.asarray(rng.normal(size=n) * 1e5, jnp.float32)
    ps = jnp.asarray(_adversarial_positions(rng, n, ng))
    e = jnp.asarray(rng.normal(size=ng) * 1e3, jnp.float32)

    ep = gather(e, ps, periodic=True, method="take")
    dt_dx = dt / dx
    p1r = p0 + dt_dx * v0 + 0.5 * qm * dt * dt_dx * ep
    v1r = v0 + qm * dt * ep
    phr = jnp.mod(0.5 * (p0 + p1r), ng)
    jhr = _deposit_scatter(phr, w * 0.5 * (v0 + v1r), ng, True)

    ph, jh = picard_iteration_pallas(e, ps, p0, v0, ng, qm=qm, w=w,
                                     dt=dt, dx=dx)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(phr), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jh), np.asarray(jhr),
        atol=3e-5 * float(jnp.abs(jhr).max()))
