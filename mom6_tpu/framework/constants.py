"""Physical constants (reference: config_src/infra/FMS2/MOM_constants.F90)."""

OMEGA = 7.2921e-5          # Earth rotation rate [s-1]
GRAV = 9.80                # gravitational acceleration [m s-2] (MOM6 default G_EARTH)
RHO_0 = 1035.0             # Boussinesq reference density [kg m-3]
EARTH_RADIUS = 6.378e6     # [m]
CP_OCEAN = 3991.87         # seawater heat capacity [J kg-1 K-1] (MOM6 C_P default)
PI = 3.141592653589793
