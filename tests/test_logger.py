"""Logger + TensorBoard event-file tests (ref utils/logger.py:61-75)."""

import os
import struct

import numpy as np


def test_crc32c_known_vector():
    from instance_segmentation_tpu.utils.tb_writer import _crc32c
    # RFC 3720 test vector
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0


def _read_records(path):
    from instance_segmentation_tpu.utils.tb_writer import _masked_crc
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data)
            records.append(data)
    return records


def _parse_fields(buf):
    """Minimal proto wire-format parse -> {field_num: [(wire_type, value)]}."""
    out = {}
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]; i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        num, wt = key >> 3, key & 7
        if wt == 0:
            v = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wt == 1:
            v = struct.unpack("<d", buf[i:i + 8])[0]; i += 8
        elif wt == 5:
            v = struct.unpack("<f", buf[i:i + 4])[0]; i += 4
        elif wt == 2:
            ln = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]; i += ln
        else:
            raise AssertionError(f"wire type {wt}")
        out.setdefault(num, []).append((wt, v))
    return out


def test_event_file_roundtrip(tmp_path):
    from instance_segmentation_tpu.utils.tb_writer import SummaryWriter
    d = str(tmp_path / "tb")
    w = SummaryWriter(d)
    w.add_scalar("train/loss", 1.25, 3)
    w.add_scalar("val/ap", 0.5, 7)
    w.close()

    files = [f for f in os.listdir(d) if f.startswith("events.out.tfevents")]
    assert len(files) == 1
    recs = _read_records(os.path.join(d, files[0]))
    assert len(recs) == 3                     # version + 2 scalars

    ver = _parse_fields(recs[0])
    assert ver[3][0][1] == b"brain.Event:2"

    ev = _parse_fields(recs[1])
    assert ev[2][0][1] == 3                   # step
    summary = _parse_fields(ev[5][0][1])
    value = _parse_fields(summary[1][0][1])
    assert value[1][0][1] == b"train/loss"
    np.testing.assert_allclose(value[2][0][1], 1.25)

    ev2 = _parse_fields(recs[2])
    assert ev2[2][0][1] == 7
    value2 = _parse_fields(_parse_fields(ev2[5][0][1])[1][0][1])
    assert value2[1][0][1] == b"val/ap"
    np.testing.assert_allclose(value2[2][0][1], 0.5)


def test_logger_scalar_goes_to_jsonl_and_tb(tmp_path):
    import json
    from instance_segmentation_tpu.utils.logger import Logger
    d = str(tmp_path / "run")
    lg = Logger(d)
    lg.scalar_summary("train/total_loss", 2.0, 1)
    lg.close()
    log_dir = os.path.join(d, "logs")
    lines = open(os.path.join(log_dir, "metrics.jsonl")).read().strip().splitlines()
    assert json.loads(lines[0])["tag"] == "train/total_loss"
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(log_dir))
