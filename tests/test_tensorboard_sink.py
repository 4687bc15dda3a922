"""TensorBoard diagnostics sink: event-file framing + manager routing.

reference: workflows/prognostic_c48_run/runtime/diagnostics/
tensorboard.py, manager.py:54-56, tests/test_tensorboard.py.
The test decodes the written TFRecord/protobuf bytes with an
independent minimal parser, so the file format (not just roundtrip
symmetry) is what is asserted.
"""
import jax

jax.config.update("jax_enable_x64", True)

import datetime  # noqa: E402
import glob  # noqa: E402
import os  # noqa: E402
import struct  # noqa: E402

import numpy as np  # noqa: E402

from fv3net_tpu.core.quantity import Quantity  # noqa: E402
from fv3net_tpu.runtime.config import DiagnosticFileConfig, TimeConfig  # noqa: E402
from fv3net_tpu.runtime.diagnostics.manager import DiagnosticsManager  # noqa: E402
from fv3net_tpu.runtime.diagnostics.tensorboard import (  # noqa: E402
    TensorBoardSink,
    read_events,
)
from fv3net_tpu.runtime.diagnostics.times import (  # noqa: E402
    time_container_from_config,
)


def _parse_fields(buf: bytes):
    """Minimal protobuf wire parser -> list of (field, wire, value)."""
    out = []
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.append((field, wire, v))
        elif wire == 1:
            out.append((field, wire, struct.unpack("<d", buf[i:i + 8])[0]))
            i += 8
        elif wire == 5:
            out.append((field, wire, struct.unpack("<f", buf[i:i + 4])[0]))
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.append((field, wire, buf[i:i + ln]))
            i += ln
        else:  # pragma: no cover
            raise ValueError(f"wire type {wire}")
    return out


def _decode_scalars(event_bytes: bytes):
    """{tag: simple_value} plus the step from one Event."""
    step = None
    scalars = {}
    images = {}
    for field, _w, val in _parse_fields(event_bytes):
        if field == 2:
            step = val
        elif field == 5:  # Summary
            for f2, _w2, v2 in _parse_fields(val):
                if f2 != 1:
                    continue
                tag, simple, image = None, None, None
                for f3, _w3, v3 in _parse_fields(v2):
                    if f3 == 1:
                        tag = v3.decode()
                    elif f3 == 2:
                        simple = v3
                    elif f3 == 4:
                        image = v3
                if simple is not None:
                    scalars[tag] = simple
                if image is not None:
                    images[tag] = image
    return step, scalars, images


def test_sink_writes_decodable_events(tmp_path):
    times = time_container_from_config(
        TimeConfig(kind="every"), datetime.datetime(2020, 1, 1)
    )
    sink = TensorBoardSink(
        str(tmp_path), ["air_temperature", "precip"], times
    )
    T = Quantity(
        np.linspace(250.0, 300.0, 6 * 4 * 4).reshape(6, 4, 4),
        ("tile", "y", "x"),
        "K",
    )
    p = Quantity(np.full((6, 4, 4), 2.0), ("tile", "y", "x"))
    sink.observe(
        datetime.datetime(2020, 1, 1, 0, 15),
        {"air_temperature": T, "precip": p, "unselected": p},
    )
    sink.observe(
        datetime.datetime(2020, 1, 1, 0, 30), {"precip": p}
    )
    sink.close()

    paths = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(paths) == 1
    events = read_events(paths[0])  # CRC-verified framing
    # first event is the brain.Event:2 version stamp
    fields = _parse_fields(events[0])
    assert any(
        f == 3 and v == b"brain.Event:2" for f, _w, v in fields
    )
    step0, scalars0, images0 = _decode_scalars(events[1])
    assert step0 == 0
    np.testing.assert_allclose(
        scalars0["air_temperature/mean"], 275.0, rtol=1e-6
    )
    np.testing.assert_allclose(scalars0["precip/mean"], 2.0, rtol=1e-6)
    assert "unselected/mean" not in scalars0
    # images are PNGs of the 2-D cube mosaic
    assert images0["air_temperature"].startswith(b"")
    png = None
    for f3, _w3, v3 in _parse_fields(images0["air_temperature"]):
        if f3 == 4:
            png = v3
    assert png is not None and png[:8] == b"\x89PNG\r\n\x1a\n"
    step1, scalars1, _ = _decode_scalars(events[2])
    assert step1 == 1 and set(scalars1) == {"precip/mean"}


def test_manager_routes_tensorboard_config(tmp_path):
    cfgs = [
        DiagnosticFileConfig(
            name="unused.zarr",
            variables=["a"],
            times=TimeConfig(kind="every"),
            tensorboard=True,
        ),
        DiagnosticFileConfig(
            name="diags.zarr", variables=["a"], times=TimeConfig(kind="every")
        ),
    ]
    mgr = DiagnosticsManager(
        cfgs, datetime.datetime(2020, 1, 1), str(tmp_path)
    )
    q = Quantity(np.ones((6, 2, 2)), ("tile", "y", "x"))
    mgr.observe(datetime.datetime(2020, 1, 1, 0, 15), {"a": q})
    mgr.close()
    tb = glob.glob(
        os.path.join(str(tmp_path), "tensorboard", "events.out.tfevents.*")
    )
    assert len(tb) == 1
    assert len(read_events(tb[0])) == 2  # version stamp + one step
    assert os.path.isdir(os.path.join(str(tmp_path), "diags.zarr"))
