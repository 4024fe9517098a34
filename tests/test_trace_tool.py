"""scripts/summarize_trace.py: device-track selection, family grouping,
and HLO op_name/source-line mapping — on a synthetic Chrome trace (no jax)."""

import gzip
import importlib.util
import json
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.smoke  # compile-light fast tier (scripts/check.sh gate)

_SPEC = importlib.util.spec_from_file_location(
    "summarize_trace",
    Path(__file__).resolve().parents[1] / "scripts" / "summarize_trace.py",
)
st = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(st)


def _trace(tmp_path, name="t.trace.json.gz"):
    events = [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "python host"}},
        # device track: two fusion instances of one family + a matmul
        {"ph": "X", "pid": 3, "ts": 0, "dur": 100, "name": "fusion.1"},
        {"ph": "X", "pid": 3, "ts": 120, "dur": 300, "name": "fusion.2"},
        {"ph": "X", "pid": 3, "ts": 500, "dur": 600, "name": "dot_general.7"},
        # host track must be excluded when a device track exists
        {"ph": "X", "pid": 1, "ts": 0, "dur": 10_000, "name": "host_noise"},
    ]
    p = tmp_path / name
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return p


def test_device_track_selected_and_families_grouped(tmp_path):
    p = _trace(tmp_path)
    events = st.load_events(str(p))
    pids = st.device_pids(events)
    assert list(pids) == [3]  # host pid filtered out
    totals, wall = st.summarize(events, pids, group=True)
    assert totals["fusion"] == [400.0, 2]  # .1 + .2 aggregated
    assert totals["dot_general"] == [600.0, 1]
    assert "host_noise" not in totals
    assert wall == 1100.0  # ts 0 .. 500+600


def test_find_trace_picks_newest_in_dir(tmp_path):
    old = _trace(tmp_path, "a.trace.json.gz")
    new = _trace(tmp_path / "sub", "b.trace.json.gz") if (
        (tmp_path / "sub").mkdir() or True) else None
    import os
    os.utime(old, (1, 1))
    assert st.find_trace(str(tmp_path)) == str(new)


def test_hlo_mapping_annotates_fusions(tmp_path, capsys):
    hlo = tmp_path / "hlo.txt"
    hlo.write_text(
        '  %fusion.2 = f32[8]{0} fusion(...), kind=kLoop, '
        'metadata={op_name="jit(score)/encoder/gelu" '
        'source_file="/repo/models/xlsr.py" source_line=412}\n'
        '  %dot_general.7 = f32[8,8]{1,0} dot(...), '
        'metadata={op_name="jit(score)/encoder/dot_general"}\n'
    )
    mapping = st.load_hlo_map(str(hlo))
    assert mapping["fusion.2"] == "jit(score)/encoder/gelu (xlsr.py:412)"
    assert mapping["dot_general.7"] == "jit(score)/encoder/dot_general"

    rc = st.main([str(_trace(tmp_path)), "--hlo", str(hlo)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "jit(score)/encoder/gelu (xlsr.py:412)" in out
    # --hlo implies per-instance names so the lookup can hit
    assert "fusion.2" in out


def test_no_device_events_exits_with_diagnostic(tmp_path):
    p = tmp_path / "empty.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 3,
             "args": {"name": "/device:TPU:0"}},
        ]}, f)
    with pytest.raises(SystemExit):
        st.main([str(p)])
