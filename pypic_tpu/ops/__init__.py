"""Grid kernels: CIC gather/deposit, finite differences, field solvers."""

from .cic import cic_indices_weights, gather, deposit, histogram_add  # noqa: F401
from .fd import (  # noqa: F401
    smooth_periodic,
    smooth_bounded,
    grad_periodic,
    grad_neg_bounded,
    integrate_neg_trapz,
    differentiate_time_series,
)
from .tridiag import (  # noqa: F401
    solve_tridiag,
    solve_tridiag_rank1,
    solve_cyclic_tridiag,
)
from .poisson import (  # noqa: F401
    NewtonResult,
    solve_periodic_neutralized,
    solve_dirichlet,
    solve_boltzmann_dirichlet,
    solve_boltzmann_dirichlet_neumann,
    solve_newton_boltzmann_bounded,
    solve_newton_boltzmann_periodic,
)
