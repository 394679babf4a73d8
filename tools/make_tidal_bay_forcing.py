"""Generate the file-driven open-boundary forcing for configs/tidal_bay:
an M2 sea-surface-height oscillation prescribed along the western
boundary (the reference's tidal_bay user config forced through
update_OBC_segment_data file series)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from mom6_tpu.io.netcdf import NCWriter     # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "configs/tidal_bay"
M2_DAYS = 12.4206012 / 24.0
t = np.arange(0.0, 4.0, 0.01)               # days; periodic series
ssh = 0.5 * np.sin(2.0 * np.pi * t / M2_DAYS)
w = NCWriter(os.path.join(OUT, "obc_forcing.nc"))
w.define_var("time", [("time", len(t))], units="days")[:] = t
w.define_var("ssh", [("time", len(t))], units="m")[:] = ssh
w.close()
print("wrote", os.path.join(OUT, "obc_forcing.nc"))
