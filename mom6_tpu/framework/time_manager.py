"""Model calendar and date arithmetic (FMS time_manager analogue).

The reference's stack is date-aware end to end: the solo driver reads a
calendar + start date, `ocean_solo.res` carries the segment's calendar
and current date across restarts, and restart/diag files are
date-stamped (reference: config_src/drivers/solo_driver/
MOM_driver.F90:225-300,606-660 and FMS time_manager).

Host-side pure Python by design: model time is driver control flow, not
traced device data.  ``ModelTime`` mirrors FMS ``time_type`` as integer
(days, seconds) since the calendar epoch 0001-01-01 00:00:00; the five
FMS calendars are supported with their leap rules.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

__all__ = ["NO_CALENDAR", "THIRTY_DAY_MONTHS", "JULIAN", "GREGORIAN",
           "NOLEAP", "calendar_from_name", "calendar_name", "ModelTime",
           "set_date", "get_date", "month_name", "date_stamp",
           "write_ocean_solo_res", "read_ocean_solo_res",
           "write_time_stamp"]

# FMS calendar codes (MOM_driver.F90:645-647 comment line)
NO_CALENDAR = 0
THIRTY_DAY_MONTHS = 1
JULIAN = 2
GREGORIAN = 3
NOLEAP = 4

_NAMES = {NO_CALENDAR: "NO_CALENDAR", THIRTY_DAY_MONTHS: "THIRTY_DAY",
          JULIAN: "JULIAN", GREGORIAN: "GREGORIAN", NOLEAP: "NOLEAP"}
_MONTH_DAYS = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
_MONTH_NAMES = ("January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December")


def calendar_from_name(name: str) -> int:
    """Parse a calendar name the way the solo driver does
    (MOM_driver.F90:254-264: prefix match, case-insensitive)."""
    u = name.strip().upper()
    if u.startswith("JULIAN"):
        return JULIAN
    if u.startswith("GREGORIAN"):
        return GREGORIAN
    if u.startswith("NOLEAP") or u.startswith("NO_LEAP"):
        return NOLEAP
    if u.startswith("THIRTY_DAY"):
        return THIRTY_DAY_MONTHS
    if u.startswith("NO_CALENDAR") or u == "":
        return NO_CALENDAR
    raise ValueError(f"invalid calendar {name!r}")


def calendar_name(cal: int) -> str:
    return _NAMES[cal]


class ModelTime(NamedTuple):
    """Integer (days, seconds-within-day) since 0001-01-01 00:00:00 of
    the governing calendar (FMS time_type)."""
    days: int = 0
    seconds: int = 0

    @staticmethod
    def from_seconds(total: float) -> "ModelTime":
        total = int(round(total))
        return ModelTime(total // 86400, total % 86400)

    def total_seconds(self) -> int:
        return self.days * 86400 + self.seconds

    def add_seconds(self, sec: float) -> "ModelTime":
        return ModelTime.from_seconds(self.total_seconds()
                                      + int(round(sec)))

    def __lt__(self, other):        # noqa: D105 — tuple order is fine,
        return self.total_seconds() < other.total_seconds()  # be explicit

    def __le__(self, other):
        return self.total_seconds() <= other.total_seconds()


def _is_leap(cal: int, year: int) -> bool:
    if cal == JULIAN:
        return year % 4 == 0
    if cal == GREGORIAN:
        return year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
    return False


def _days_in_year(cal: int, year: int) -> int:
    if cal == THIRTY_DAY_MONTHS:
        return 360
    return 366 if _is_leap(cal, year) else 365


def _days_in_month(cal: int, year: int, month: int) -> int:
    if cal == THIRTY_DAY_MONTHS:
        return 30
    d = _MONTH_DAYS[month - 1]
    if month == 2 and _is_leap(cal, year):
        d += 1
    return d


def month_name(month: int) -> str:
    return _MONTH_NAMES[month - 1]


def set_date(cal: int, year: int, month: int, day: int, hour: int = 0,
             minute: int = 0, second: int = 0) -> ModelTime:
    """Date -> ModelTime (epoch 0001-01-01; FMS set_date)."""
    if cal == NO_CALENDAR:
        # interpret (year, month, day) literally as elapsed units of
        # (360 d, 30 d, 1 d) so round-tripping stays consistent
        days = (year - 1) * 360 + (month - 1) * 30 + (day - 1)
    else:
        days = 0
        if cal == THIRTY_DAY_MONTHS:
            days = (year - 1) * 360 + (month - 1) * 30 + (day - 1)
        else:
            for y in range(1, year):
                days += _days_in_year(cal, y)
            for m in range(1, month):
                days += _days_in_month(cal, year, m)
            days += day - 1
    return ModelTime(days, hour * 3600 + minute * 60 + second)


def get_date(cal: int, t: ModelTime) -> Tuple[int, int, int, int, int,
                                              int]:
    """ModelTime -> (year, month, day, hour, minute, second)."""
    days = t.days
    if cal in (NO_CALENDAR, THIRTY_DAY_MONTHS):
        year = days // 360 + 1
        days %= 360
        month = days // 30 + 1
        day = days % 30 + 1
    else:
        year = 1
        while days >= _days_in_year(cal, year):
            days -= _days_in_year(cal, year)
            year += 1
        month = 1
        while days >= _days_in_month(cal, year, month):
            days -= _days_in_month(cal, year, month)
            month += 1
        day = days + 1
    hour = t.seconds // 3600
    minute = (t.seconds % 3600) // 60
    second = t.seconds % 60
    return year, month, day, hour, minute, second


def date_stamp(cal: int, t: ModelTime) -> str:
    """FMS-style filename stamp YYYYMMDD.HHMMSS."""
    y, mo, d, h, mi, s = get_date(cal, t)
    return f"{y:04d}{mo:02d}{d:02d}.{h:02d}{mi:02d}{s:02d}"


def write_ocean_solo_res(path: str, cal: int, start: ModelTime,
                         current: ModelTime) -> None:
    """Write the solo segment restart stamp (write_ocean_solo_res,
    MOM_driver.F90:636-659; same fixed-width ASCII layout)."""
    with open(path, "w") as f:
        f.write(f"{cal:6d}        (Calendar: no_calendar=0, "
                "thirty_day_months=1, julian=2, gregorian=3, "
                "noleap=4)\n")
        for t, label in ((start, "Model start time:   "),
                         (current, "Current model time: ")):
            y, mo, d, h, mi, s = get_date(cal, t)
            f.write(f"{y:6d}{mo:6d}{d:6d}{h:6d}{mi:6d}{s:6d}        "
                    f"{label}year, month, day, hour, minute, second\n")


def read_ocean_solo_res(path: str) -> Tuple[int, ModelTime, ModelTime]:
    """Read (calendar, start_time, current_time) back
    (MOM_driver.F90:239-252)."""
    with open(path) as f:
        cal = int(f.readline().split()[0])
        d0 = [int(x) for x in f.readline().split()[:6]]
        d1 = [int(x) for x in f.readline().split()[:6]]
    return cal, set_date(cal, *d0), set_date(cal, *d1)


def write_time_stamp(rundir: str, cal: int, t: ModelTime,
                     t_end: ModelTime) -> None:
    """Append the FMS time_stamp.out record (MOM_driver.F90:663-680)."""
    with open(os.path.join(rundir, "time_stamp.out"), "a") as f:
        for tt in (t, t_end):
            y, mo, d, h, mi, s = get_date(cal, tt)
            f.write(f"{y:4d}{mo:4d}{d:4d}{h:4d}{mi:4d}{s:4d}  "
                    f"{month_name(mo)[:3]}\n")
