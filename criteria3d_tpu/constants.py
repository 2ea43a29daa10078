"""Physical constants and numeric sentinels.

Values mirror the reference's agrolib/mathFunctions/commonConstants.h and the
solver-local epsilons in agrolib/soilFluxes3D (water.cpp:14, commonConstants.h:252,267)
so that numerical parity tests can pass bit-for-bit where possible.
"""

NODATA = -9999.0

# --- physics (commonConstants.h) ---
GRAVITY = 9.80665            # [m s-2]
WATER_DENSITY = 1000.0       # [kg m-3]
ZEROCELSIUS = 273.15         # [K]
R_GAS = 8.31447215           # [J K-1 mol-1]
MH2O = 0.018                 # [kg mol-1] molecular mass of water
HEAT_CAPACITY_WATER = 4182000.0   # [J m-3 K-1]
HEAT_CAPACITY_AIR = 1290.0        # [J m-3 K-1]
HEAT_CAPACITY_SNOW = 2100000.0    # [J m-3 K-1]
LATENT_HEAT_VAPORIZATION = 2480000.0  # [J kg-1] (at about 10 degC)
STEFAN_BOLTZMANN = 5.670373e-8    # [W m-2 K-4]
VON_KARMAN = 0.41

DAY_SECONDS = 86400.0
HOUR_SECONDS = 3600.0

# --- solver epsilons ---
EPSILON = 1e-5               # commonConstants.h:252
EPSILON_METER = 1e-5         # [m] 10 micrometres (water.cpp:14)
EPSILON_RUNOFF = 1e-3        # [m] 1 mm (commonConstants.h:267)
MIN_INFILTRATION_RATE = 2.78e-11  # [m s-1] = 0.0001 mm/hour (water.cpp:531)
DBL_EPSILON = 2.220446049250313e-16

PI = 3.141592653589793
DEG_TO_RAD = PI / 180.0
RAD_TO_DEG = 180.0 / PI
