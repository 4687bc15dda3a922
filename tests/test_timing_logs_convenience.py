"""Timer, run-log parsing, time conveniences."""
import datetime
import time

import numpy as np
import pytest

from fv3net_tpu.core import convenience as conv
from fv3net_tpu.runtime.logs import loads
from fv3net_tpu.runtime.timing import Timer, log_times


def test_timer_accumulates():
    t = Timer()
    with t.clock("dynamics"):
        time.sleep(0.01)
    with t.clock("dynamics"):
        time.sleep(0.01)
    with t.clock("physics"):
        time.sleep(0.005)
    assert t.hits["dynamics"] == 2
    assert t.times["dynamics"] >= 0.02
    report = log_times(t)
    assert report["physics"]["hits"] == 1
    with pytest.raises(ValueError):
        t.start("x")
        t.start("x")


def test_runlog_parsing():
    text = """
some preamble
{"time": "2016-08-01 00:15:00", "PRATEsfc": 1.0, "note": "str ignored"}
{"time": "2016-08-01 00:30:00", "PRATEsfc": 2.0, "extra": 5.0}
not json
"""
    log = loads(text)
    assert len(log.times) == 2
    np.testing.assert_allclose(log.scalars["PRATEsfc"], [1.0, 2.0])
    assert np.isnan(log.scalars["extra"][0]) and log.scalars["extra"][1] == 5.0


def test_time_roundtrip():
    t = datetime.datetime(2016, 8, 1, 0, 30, 0)
    s = conv.encode_time(t)
    assert s == "20160801.003000"
    assert conv.parse_datetime_from_str(s) == t
    assert conv.parse_timestep_str_from_path(
        "/runs/x/artifacts/20160801.003000/RESTART"
    ) == "20160801.003000"
    assert conv.parse_current_date_from_str(s) == [2016, 8, 1, 0, 30, 0]
    rounded = conv.round_time(
        datetime.datetime(2016, 8, 1, 0, 0, 7), to=15.0
    )
    assert rounded == datetime.datetime(2016, 8, 1, 0, 0, 0)


def test_tracking_query_cli(tmp_path, capsys):
    from fv3net_tpu.fit import tracking

    run = tracking.init(project="proj1", name="runA", config={"lr": 0.1},
                        dir=str(tmp_path))
    run.log({"loss": 1.0})
    run.log({"loss": 0.5, "r2": 0.9})
    run.finish()
    run2 = tracking.init(project="proj2", name="runB", config={},
                         dir=str(tmp_path))
    run2.log({"loss": 2.0})
    run2.finish()

    recs = list(tracking.query_runs(str(tmp_path)))
    assert [r["name"] for r in recs] == ["runA", "runB"]
    assert recs[0]["steps"] == 2
    assert recs[0]["summary"]["loss"] == 0.5
    assert recs[0]["summary"]["r2"] == 0.9
    assert recs[0]["config"] == {"lr": 0.1}

    # project + regex filters
    assert [r["name"] for r in tracking.query_runs(
        str(tmp_path), project="proj2")] == ["runB"]
    assert [r["name"] for r in tracking.query_runs(
        str(tmp_path), name_regex="A$")] == ["runA"]

    # CLI surface
    assert tracking.main(["--dir", str(tmp_path), "-o", "json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    import json as _json

    assert len(out) == 2 and _json.loads(out[0])["name"] == "runA"
