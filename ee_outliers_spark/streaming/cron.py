"""Daemon cron loop (ref ST1; /root/reference/app/outliers.py:103-198 runs
analyzers on a croniter schedule, sleeping between fires).

Minimal 5-field cron (minute hour dom month dow) supporting ``*``, ``*/n``,
``a-b``, lists — enough for every schedule the reference's docs show
(default ``0 0 * * *``). The loop takes an injectable clock + sleeper so
tests drive it deterministically; each fire calls ``tick`` (typically
config.run_all over the rolling history window).
"""

from __future__ import annotations

import datetime as dt
import time as _time
from collections.abc import Callable


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
        out.update(range(a, b + 1, step))
    return {v for v in out if lo <= v <= hi}


class CronSchedule:
    def __init__(self, expr: str):
        f = expr.split()
        if len(f) != 5:
            raise ValueError(f"need 5 cron fields, got {expr!r}")
        self.minutes = _parse_field(f[0], 0, 59)
        self.hours = _parse_field(f[1], 0, 23)
        self.doms = _parse_field(f[2], 1, 31)
        self.months = _parse_field(f[3], 1, 12)
        # standard cron (and croniter, which the reference daemon uses)
        # numbers day-of-week 0-7 with BOTH 0 and 7 = Sunday; normalize to
        # Sunday-based 0-6 via v % 7
        self.dows = {v % 7 for v in _parse_field(f[4], 0, 7)}

    def matches(self, t: dt.datetime) -> bool:
        # python weekday(): 0 = Monday … 6 = Sunday → cron Sunday-based
        cron_dow = (t.weekday() + 1) % 7
        return (t.minute in self.minutes and t.hour in self.hours
                and t.day in self.doms and t.month in self.months
                and cron_dow in self.dows)

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        for _ in range(366 * 24 * 60):  # ≤ one year scan, minute steps
            if self.matches(t):
                return t
            t += dt.timedelta(minutes=1)
        raise ValueError("no fire within a year")


def daemon_loop(
    schedule: str,
    tick: Callable[[dt.datetime], object],
    max_ticks: int | None = None,
    clock: Callable[[], dt.datetime] = dt.datetime.now,
    sleeper: Callable[[float], None] = _time.sleep,
) -> int:
    """Fire ``tick(fire_time)`` on each schedule match (ref outliers.py
    daemon mode). Returns the number of ticks executed. ``max_ticks`` bounds
    the loop (None = forever); clock/sleeper injectable for tests."""
    sched = CronSchedule(schedule)
    n = 0
    while max_ticks is None or n < max_ticks:
        now = clock()
        nxt = sched.next_fire(now)
        wait = (nxt - now).total_seconds()
        if wait > 0:
            sleeper(wait)
        tick(nxt)
        n += 1
    return n
