"""Engine families: one jitted step function per reference generation.

* explicit  — periodic leapfrog cycle (PIC_L.py main / pypic explicit intent)
* implicit  — periodic CN-Picard energy-conserving engine (pypic.py)
* sheath    — bounded 2-species 1d3v implicit sheath engine (PIC_L_DD.py)
* magnetized — Boltzmann-electron magnetized sheath engine (pygcpic.py)
"""

from . import explicit, implicit, sheath, magnetized  # noqa: F401
