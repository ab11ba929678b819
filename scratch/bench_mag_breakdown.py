"""Breakdown of the magnetized step cost at 1e6 particles, ng=600 (pic_iead
workload scaled). Each component amortized over `iters` inside one dispatch."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from pypic_tpu.presets import pic_iead

N_PER = 1_000_000 // 6
ITERS = 50

preset = pic_iead(n_per_species=N_PER)
cfg, st = preset.config, preset.state
step = preset.make_step()
n = st.p.shape[0]
print(f"n={n}, ng={cfg.grid.ng}, backend={jax.default_backend()}", file=sys.stderr)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args); jax.block_until_ready(r)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = f(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    el = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {el:8.3f} ms/pass   (compile {compile_t:.1f}s)")
    return el

from pypic_tpu.ops import deposit, gather, grad_neg_bounded, smooth_bounded, solve_boltzmann_dirichlet
from pypic_tpu.push import boris_push_dt
from pypic_tpu import sources
from pypic_tpu.constants import E_CHARGE

grid = cfg.grid; ng = grid.ng; dx = grid.dx; dt = cfg.dt
b = jnp.asarray(cfg.b, jnp.float32)

# full step
def full(st):
    def body(i, s):
        s, _ = step(s)
        return s
    return lax.fori_loop(0, ITERS, body, st).phi.sum()
timeit("FULL STEP", full, st)

# deposits x2
def deps(p, w1, w2):
    def body(i, acc):
        r = deposit(p + 0.0*acc[0], w1, ng, periodic=False)
        nd = deposit(p, w2, ng, periodic=False)
        return (r.sum(), acc[1] + nd.sum())
    return lax.fori_loop(0, ITERS, body, (jnp.float32(0), jnp.float32(0)))
w1 = st.charge_state * E_CHARGE * st.p2c / dx
w2 = st.p2c / dx
timeit("deposit rho+n", deps, st.p, w1, w2)

# Newton solve (13ish iters) - use a representative rho/n0
rho = deposit(st.p, w1, ng, periodic=False)
nd = deposit(st.p, w2, ng, periodic=False)
n0 = 0.9 * jnp.mean(nd)
def solve(rho, n0):
    def body(i, acc):
        res = solve_boltzmann_dirichlet(rho + acc*0, n0, cfg.te, dx,
                                        tol=cfg.newton_tol, maxiter=cfg.newton_maxiter)
        return acc + res.phi.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))
timeit("newton boltzmann solve", solve, rho, n0)

res = solve_boltzmann_dirichlet(rho, n0, cfg.te, dx, tol=cfg.newton_tol, maxiter=cfg.newton_maxiter)
print(f"  newton iters: {int(res.iterations)}")

# gather + boris
e_field = grad_neg_bounded(res.phi, dx)
def gpush(e_field, st):
    def body(i, acc):
        e_p = gather(e_field + acc*0, st.p, periodic=False)
        x1, yz1, v1 = boris_push_dt(st.p * dx, st.yz, st.v, e_p, b,
                                    st.charge_state, st.m, dt)
        return acc + v1.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))
timeit("gather + boris", gpush, e_field, st)

# IEAD accumulate
def iead_f(st):
    ne_, na_ = cfg.iead_bins
    def body(i, acc):
        v = st.v
        energy_ev = 0.5 * st.m * jnp.sum(v*v, -1) / E_CHARGE + acc*0
        vyz = jnp.sqrt(v[:,1]**2 + v[:,2]**2)
        angle = jnp.arctan2(vyz, jnp.abs(v[:,0])) * (180/np.pi)
        hit = st.p < 0.001
        ei = jnp.clip((energy_ev * (ne_/cfg.iead_energy_max)).astype(jnp.int32), 0, ne_-1)
        ai = jnp.clip((angle * (na_/cfg.iead_angle_max)).astype(jnp.int32), 0, na_-1)
        flat = st.species_idx * (ne_*na_) + ei*na_ + ai
        upd = jnp.zeros((2*ne_*na_,), jnp.float32).at[flat].add(jnp.where(hit, 1.0, 0.0))
        return acc + upd.sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))
timeit("iead scatter", iead_f, st)

# source resampling (full-capacity batch)
def src_f(st):
    def body(i, acc):
        k = jax.random.fold_in(st.rng, i)
        batch = sources.sample_source_6d(k, n, grid, cfg.source.ti, cfg.source.mass)
        return acc + batch["v"].sum()
    return lax.fori_loop(0, ITERS, body, jnp.float32(0))
timeit("source sampling (full cap)", src_f, st)
