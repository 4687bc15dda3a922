"""Time parsing/encoding conveniences.

reference: external/vcm/vcm/convenience.py — ``encode_time`` /
``parse_datetime_from_str`` / ``parse_timestep_str_from_path`` /
``round_time`` using the FV3 timestamp convention %Y%m%d.%H%M%S.
"""
from __future__ import annotations

import datetime
import re

TIME_FMT = "%Y%m%d.%H%M%S"
TIMESTEP_RE = re.compile(r"(\d{8}\.\d{6})")


def encode_time(time: datetime.datetime) -> str:
    """datetime -> '20160801.003000' (reference convenience.encode_time)."""
    return time.strftime(TIME_FMT)


def parse_datetime_from_str(time_str: str) -> datetime.datetime:
    return datetime.datetime.strptime(time_str, TIME_FMT)


def parse_timestep_str_from_path(path: str) -> str:
    """Extract the timestamp token from a path like
    .../artifacts/20160801.003000/RESTART (reference
    convenience.parse_timestep_str_from_path)."""
    match = TIMESTEP_RE.search(path)
    if match is None:
        raise ValueError(f"no timestep found in {path!r}")
    return match.group(1)


def parse_current_date_from_str(time_str: str):
    """[Y, M, D, h, m, s] list as used by model namelists."""
    t = parse_datetime_from_str(time_str)
    return [t.year, t.month, t.day, t.hour, t.minute, t.second]


def shift_timestamp(time: str, seconds: float) -> str:
    """Add an offset in seconds to a '%Y%m%d.%H%M%S' timestamp
    (reference convenience.py:139-143)."""
    shifted = parse_datetime_from_str(time) + datetime.timedelta(seconds=seconds)
    return encode_time(shifted)


def round_time(t: datetime.datetime, to: float = 1.0) -> datetime.datetime:
    """Round to the nearest ``to`` seconds (reference convenience.round_time)."""
    epoch = datetime.datetime(1900, 1, 1)
    seconds = (t - epoch).total_seconds()
    rounded = round(seconds / to) * to
    return epoch + datetime.timedelta(seconds=rounded)
