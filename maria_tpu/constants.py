"""Physical constants (SI).

Mirrors the constant set of the reference simulator (reference:
maria/constants.py:1-28) so that all radiometric formulas agree to the
last digit. Values are CODATA-2018 exact where applicable.
"""

# speed of light (m s^-1)
c = 2.99792458e8

# standard gravity (m s^-2)
g = 9.806651

# Planck's constant (J s)
h = 6.62607015e-34

# reduced Planck's constant (J s)
hbar = h / 6.283185307179586

# Boltzmann's constant (J K^-1)
k_B = 1.380649e-23

# CMB monopole temperature (K)
T_CMB = 2.72548

# equatorial radius of the earth (m)
EARTH_RADIUS = 6.378137e6

# specific gas constants (J K^-1 kg^-1)
DRY_AIR_SPECIFIC_GAS_CONSTANT = 287.05
WATER_VAPOR_SPECIFIC_GAS_CONSTANT = 461.495

# global frequency support of the framework
MIN_NU_HZ = 1e6  # 1 MHz
MAX_NU_HZ = 15e12  # 15 THz

# back-compat aliases matching the reference names
MARIA_MIN_NU_HZ = MIN_NU_HZ
MARIA_MAX_NU_HZ = MAX_NU_HZ
