#!/usr/bin/env python
"""Generate this run dir's grid inputs (ocean_hgrid.nc, ocean_topog.nc).

The half-degree tripolar mosaic is ~46 MB, so it is generated on demand
rather than committed (tools/make_global_grid.py is the single source
of truth for the supergrid + coarse-Earth topography).  The solo driver
and bench.py invoke this automatically when the files are missing.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _find_repo():
    """Repo root even when this run dir was copied elsewhere: prefer the
    importable mom6_tpu package, fall back to MOM6_TPU_REPO or the
    in-place configs/ layout."""
    try:
        import mom6_tpu
        return os.path.dirname(os.path.dirname(
            os.path.abspath(mom6_tpu.__file__)))
    except ImportError:
        pass
    env = os.environ.get("MOM6_TPU_REPO")
    if env:
        return env
    return os.path.dirname(os.path.dirname(HERE))


def main(outdir=HERE):
    repo = _find_repo()
    sys.path.insert(0, os.path.join(repo, "tools"))
    sys.path.insert(0, repo)
    from make_global_grid import write_mosaic
    write_mosaic(outdir, nx=720, ny_reg=336, ny_cap=64)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else HERE)
