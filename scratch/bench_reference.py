"""Measure the REFERENCE's own CPU throughput (BASELINE.md says we must).

Replicates the pic_iead() per-step body (pygcpic.py:1200-1264) minus
plotting and the end-of-run F-TRIDYN budget: weight_to_grid_boltzmann ->
Newton-Boltzmann phi solve -> E -> per-particle gather/push_6D/BCs with
wall IEAD collection and reactivation. 6 species lists x N particles, the
reference's own config (density 1e20, ng=600, dt=1e-10, Ti=Te=10 eV).

Only pygcpic.py runs on modern Python (pypic.py needs numba, absent;
PIC_L*.py are Python-2-era) — so this is the one reference engine whose
throughput can be measured in this environment.

Usage: python scratch/bench_reference.py [N_per_species] [timesteps]
"""
import os
import sys
import time

os.environ.setdefault("MPLBACKEND", "Agg")
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import pygcpic  # noqa: E402
from pygcpic import (  # noqa: E402
    Grid, Particle, source_distribution_6D, kb, e, epsilon0, mp, me,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
timesteps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

density = 1e20
densities_boron = [1e11, 1e12, 1e12, 1e11, 1e13]
ng = 600
dt = 1e-10
Ti = 10.0 * 11600.0
Te = 10.0 * 11600.0
LD = np.sqrt(kb * Te * epsilon0 / e / e / density)
L = 300.0 * LD
p2c = density * L / N
p2cs_boron = [db * L / N for db in densities_boron]
alpha = 86.0 * np.pi / 180.0
B0 = np.array([2.0 * np.cos(alpha), 2.0 * np.sin(alpha), 0.0])
E0 = np.zeros(3)
num_energies = num_angles = 40
phi_floating = (Te / 11600.0) * 0.5 * np.log(
    1.0 * mp / 2.0 / np.pi / me / (1.0 + Ti / Te))

np.random.seed(1)
grid = Grid(ng, L, Te, bc="dirichlet-dirichlet")
species = [(2.0 * mp, e, p2c, 1)] + [
    (10.81 * mp, (i + 1) * e, p2cs_boron[i], 5) for i in range(5)
]
particles = [
    Particle(m, q, w, Ti, Z=z, B0=B0, E0=E0, grid=grid)
    for (m, q, w, z) in species for _ in range(N)
]
source_distribution = source_distribution_6D(grid, Ti, mp)
impurity_distribution = source_distribution_6D(grid, Ti, 10.81 * mp)
iead_D = np.zeros((num_energies, num_angles))
iead_B = np.zeros((num_energies, num_angles))
ntot = len(particles)

t_weight = t_solve = t_push = 0.0
pushes = 0
t_all0 = time.perf_counter()
for time_index in range(timesteps + 1):
    energies_D, angles_D, energies_B, angles_B = [], [], [], []
    t0 = time.perf_counter()
    grid.weight_particles_to_grid_boltzmann(particles, dt)
    grid.reset_added_particles()
    t1 = time.perf_counter()
    grid.solve_for_phi_dirichlet_boltzmann()
    grid.differentiate_phi_to_E_dirichlet()
    t2 = time.perf_counter()
    for particle in particles:
        if particle.is_active():
            pushes += 1
            particle.interpolate_electric_field_dirichlet(grid)
            particle.push_6D(dt)
            particle.apply_BCs_dirichlet(grid)
            if not particle.is_active():
                if particle.Z == 1:
                    energies_D.append(particle.kinetic_energy / e)
                    angles_D.append(particle.get_angle_wrt_wall())
                if particle.Z == 5:
                    energies_B.append(particle.kinetic_energy / e)
                    angles_B.append(particle.get_angle_wrt_wall())
        else:
            if np.random.choice((True, True), p=(1.0 / 6.0, 5.0 / 6.0)):
                particle.reactivate(
                    source_distribution, grid, 0.0, p2c, 1.0 * mp,
                    1.0 * e, 1)
            else:
                cs = np.random.choice((1, 2, 3, 4, 5))
                particle.reactivate(
                    impurity_distribution, grid, 0.0, p2cs_boron[cs - 1],
                    10.81 * mp, cs * e, 5)
    t3 = time.perf_counter()
    t_weight += t1 - t0
    t_solve += t2 - t1
    t_push += t3 - t2
    h_D, er, ar = np.histogram2d(
        energies_D, angles_D, bins=(num_energies, num_angles),
        range=[[0.0, 4.0 * phi_floating], [0.0, 90.0]])
    h_B, _, _ = np.histogram2d(
        energies_B, angles_B, bins=(num_energies, num_angles),
        range=[[0.0, 4.0 * phi_floating], [0.0, 90.0]])
    iead_D += h_D
    iead_B += h_B
    print(f"step {time_index}: weight {t1-t0:.3f}s solve {t2-t1:.3f}s "
          f"push-loop {t3-t2:.3f}s", flush=True)
elapsed = time.perf_counter() - t_all0
nsteps = timesteps + 1
print(f"REFERENCE pic_iead ({ntot} particles, ng={ng}, {nsteps} steps): "
      f"{elapsed/nsteps*1e3:.1f} ms/step, "
      f"{pushes/elapsed:.3e} pushes/s "
      f"(weight {t_weight/nsteps*1e3:.1f} solve {t_solve/nsteps*1e3:.1f} "
      f"push {t_push/nsteps*1e3:.1f} ms/step)")
