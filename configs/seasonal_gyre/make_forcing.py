"""Generate forcing_monthly.nc for the seasonal_gyre config: 12 monthly
records of wind stress and net heat flux on a coarse source grid, in the
model's horizontal coordinates (km for cartesian grids).

Run:  python configs/seasonal_gyre/make_forcing.py [outdir]
"""

import os
import sys

import numpy as np


def write_forcing(path, *, len_lon=2000.0, len_lat=2000.0,
                  n_lon=9, n_lat=8, tau0=0.1, q0=80.0):
    from mom6_tpu.io.netcdf import NCWriter
    lon = np.linspace(-0.05 * len_lon, 1.05 * len_lon, n_lon)
    lat = np.linspace(-0.05 * len_lat, 1.05 * len_lat, n_lat)
    # record times at month centers [days]
    time = (np.arange(12) + 0.5) * (365.0 / 12.0)
    yfrac = (lat[:, None] - lat.min()) / (lat.max() - lat.min())
    taux = np.empty((12, n_lat, n_lon))
    heat = np.empty((12, n_lat, n_lon))
    for m in range(12):
        season = np.cos(2 * np.pi * (time[m] - 15.0) / 365.0)  # +1 winter
        taux[m] = -tau0 * (1.0 + 0.4 * season) * \
            np.cos(2 * np.pi * yfrac) * np.ones((1, n_lon))
        heat[m] = q0 * (np.cos(np.pi * yfrac) - 0.6 * season) * \
            np.ones((1, n_lon))
    w = NCWriter(path)
    w.define_var("time", [("time", 12)], units="days")[:] = time
    w.define_var("lon", [("lon", n_lon)], units="km")[:] = lon
    w.define_var("lat", [("lat", n_lat)], units="km")[:] = lat
    dims = [("time", 12), ("lat", n_lat), ("lon", n_lon)]
    w.define_var("STRESS_X", dims, units="Pa")[:] = taux
    w.define_var("STRESS_Y", dims, units="Pa")[:] = np.zeros_like(taux)
    w.define_var("heat", dims, units="W m-2")[:] = heat
    w.close()
    return path


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.dirname(os.path.abspath(__file__))
    p = write_forcing(os.path.join(outdir, "forcing_monthly.nc"))
    print("wrote", p)
