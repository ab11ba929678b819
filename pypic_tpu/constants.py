"""SI physical constants shared by every module.

The reference duplicates these module globals in every file
(reference: pypic.py:22-26, PIC_L.py:26-30, PIC_L_DD.py:26-30, pygcpic.py:13-17);
here they live in exactly one place. Values are kept bit-identical to the
reference so that derived plasma parameters (wp, Debye length, p2c, analytic
growth/damping rates) agree to the last digit.
"""

EPSILON_0 = 8.854e-12  # vacuum permittivity [F/m]
E_CHARGE = 1.602e-19   # elementary charge [C]
M_PROTON = 1.67e-27    # proton mass [kg]
M_ELECTRON = 9.11e-31  # electron mass [kg]
K_BOLTZMANN = 1.38e-23  # Boltzmann constant [J/K]

# Conversion used pervasively by the reference: temperature given in eV units
# of 11600 K (e.g. pypic.py:853-854, pygcpic.py:1316-1317).
EV_TO_K = 11600.0
