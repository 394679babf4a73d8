"""Calendar / time-manager tests (FMS time_manager + the solo driver's
ocean_solo.res segment protocol, MOM_driver.F90:225-300,606-680)."""

import os

from mom6_tpu.framework import time_manager as tm


def test_calendar_roundtrip_all():
    dates = [(1, 1, 1, 0, 0, 0), (1999, 12, 31, 23, 59, 59),
             (2000, 2, 29, 6, 30, 0), (2024, 7, 4, 12, 0, 1)]
    for cal in (tm.JULIAN, tm.GREGORIAN, tm.NOLEAP,
                tm.THIRTY_DAY_MONTHS):
        for d in dates:
            if d[1:3] == (2, 29) and cal == tm.NOLEAP:
                continue
            if d[2] == 31 and cal == tm.THIRTY_DAY_MONTHS:
                continue
            t = tm.set_date(cal, *d)
            assert tm.get_date(cal, t) == d, (cal, d)


def test_leap_rules():
    # Gregorian: 2000 leap, 1900 not; Julian: both leap; noleap: neither
    def feb_len(cal, year):
        mar = tm.set_date(cal, year, 3, 1)
        feb = tm.set_date(cal, year, 2, 1)
        return mar.days - feb.days

    assert feb_len(tm.GREGORIAN, 2000) == 29
    assert feb_len(tm.GREGORIAN, 1900) == 28
    assert feb_len(tm.JULIAN, 1900) == 29
    assert feb_len(tm.NOLEAP, 2000) == 28
    assert feb_len(tm.THIRTY_DAY_MONTHS, 2000) == 30


def test_increment_across_boundaries():
    t = tm.set_date(tm.GREGORIAN, 1999, 12, 31, 23, 0, 0)
    t2 = t.add_seconds(2 * 3600.0)
    assert tm.get_date(tm.GREGORIAN, t2) == (2000, 1, 1, 1, 0, 0)
    # a noleap year is exactly 365 days
    y0 = tm.set_date(tm.NOLEAP, 5, 1, 1)
    y1 = tm.set_date(tm.NOLEAP, 6, 1, 1)
    assert y1.days - y0.days == 365


def test_ocean_solo_res_roundtrip(tmp_path):
    p = str(tmp_path / "ocean_solo.res")
    start = tm.set_date(tm.NOLEAP, 1990, 1, 1)
    cur = tm.set_date(tm.NOLEAP, 1990, 3, 15, 6, 0, 0)
    tm.write_ocean_solo_res(p, tm.NOLEAP, start, cur)
    cal, s2, c2 = tm.read_ocean_solo_res(p)
    assert cal == tm.NOLEAP and s2 == start and c2 == cur
    # the file is line-compatible with the reference's reader: first
    # token of each line parses as the integers it expects
    lines = open(p).read().splitlines()
    assert int(lines[0].split()[0]) == tm.NOLEAP
    assert [int(x) for x in lines[1].split()[:6]] == [1990, 1, 1, 0, 0, 0]


def test_date_stamp():
    t = tm.set_date(tm.GREGORIAN, 2024, 7, 4, 12, 30, 5)
    assert tm.date_stamp(tm.GREGORIAN, t) == "20240704.123005"


def test_solo_segment_calendar(tmp_path):
    """Two chained solo segments: the second starts at the date the
    first ended (the ocean_solo.res protocol), and the RESTART/ dir
    carries a date-stamped restart."""
    from mom6_tpu.drivers.solo import main as solo_main

    rundir = str(tmp_path)
    with open(os.path.join(rundir, "MOM_input"), "w") as f:
        f.write("""
NIGLOBAL = 8
NJGLOBAL = 8
NK = 2
LENLON = 10.0
LENLAT = 10.0
MAXIMUM_DEPTH = 1000.0
TOPO_CONFIG = flat
DT = 1800.0
CALENDAR = NOLEAP
START_DATE = 2001,1,1,0,0,0
DAYMAX = 1.0
""")
    solo_main([rundir])
    res = os.path.join(rundir, "RESTART", "ocean_solo.res")
    cal, start, cur = tm.read_ocean_solo_res(res)
    assert cal == tm.NOLEAP
    assert tm.get_date(cal, start) == (2001, 1, 1, 0, 0, 0)
    assert tm.get_date(cal, cur) == (2001, 1, 2, 0, 0, 0)
    stamped = [f for f in os.listdir(os.path.join(rundir, "RESTART"))
               if f.endswith(".MOM.res.nc")]
    assert stamped == ["20010102.000000.MOM.res.nc"]
    # continue the segment: copy the stamp into the rundir and rerun
    import shutil
    shutil.copy(res, os.path.join(rundir, "ocean_solo.res"))
    solo_main([rundir, "--restart-in",
               os.path.join(rundir, "MOM.res.nc")])
    _, start2, cur2 = tm.read_ocean_solo_res(res)
    assert tm.get_date(cal, start2) == (2001, 1, 1, 0, 0, 0)
    assert tm.get_date(cal, cur2) == (2001, 1, 3, 0, 0, 0)
    assert os.path.exists(os.path.join(rundir, "time_stamp.out"))
