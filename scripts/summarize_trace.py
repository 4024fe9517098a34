#!/usr/bin/env python
"""Summarize a jax.profiler device trace: time by op, fusions mapped to source.

Turns the manual workflow this repo's profiling notes describe (load the
``*.trace.json.gz`` Chrome trace, sum ``dur`` by event name on the device
track, map fusion ids to model ops via the compiled HLO's metadata) into one
command:

    python scripts/summarize_trace.py /tmp/profile_dir            # newest trace
    python scripts/summarize_trace.py trace.json.gz --top 30
    python scripts/summarize_trace.py trace.json.gz --hlo compiled.txt

``--hlo`` takes the text of ``jax.jit(f).lower(...).compile().as_text()``;
fusion/custom-call names are then annotated with the ``op_name``/source-line
metadata XLA recorded for their root instruction, so "fusion.123" becomes
attributable to e.g. "jit(score)/.../dot_general" and a model source line.

Stdlib-only (no pandas/perfetto), usable on any host that holds the dump —
including this repo's tunnel setup, where the trace is produced remotely but
analyzed here.  The reference has no profiling tooling at all; its vendored
profiler variant (nn_manager_profile.py) only wraps torch.profiler's own
tensorboard dump.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    """Accept a trace file or a profile dir (jax.profiler.start_trace dir)."""
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no *.trace.json.gz under {path!r}")
    return hits[-1]


def load_events(trace_path: str):
    opener = gzip.open if trace_path.endswith(".gz") else open
    with opener(trace_path, "rt") as f:
        doc = json.load(f)
    return doc.get("traceEvents", doc if isinstance(doc, list) else [])


def device_pids(events) -> dict:
    """pid -> process name, for processes that look like accelerator tracks.

    Falls back to every pid that has duration events when no name matches —
    a CPU-backend trace still summarizes (its "device" is the host thread).
    """
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    dev = {
        pid: n
        for pid, n in names.items()
        if re.search(r"tpu|gpu|device|/device:", n, re.I)
    }
    return dev or names


_TRAILING_ID = re.compile(r"[.\-_]\d+$")


def summarize(events, pids, group: bool):
    """name -> [total_us, count] over complete (ph=X) events on these pids."""
    totals = collections.defaultdict(lambda: [0.0, 0])
    wall_lo, wall_hi = float("inf"), float("-inf")
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "?")
        if group:
            name = _TRAILING_ID.sub("", name)
        dur = float(e.get("dur", 0.0))
        t = totals[name]
        t[0] += dur
        t[1] += 1
        ts = float(e.get("ts", 0.0))
        wall_lo = min(wall_lo, ts)
        wall_hi = max(wall_hi, ts + dur)
    wall = (wall_hi - wall_lo) if wall_hi > wall_lo else 0.0
    return totals, wall


# compiled-HLO metadata:  %fusion.123 = ... metadata={op_name="..." ...
#                         source_file="/repo/models/xlsr.py" source_line=412 }
_HLO_META = re.compile(
    r"%?([\w.\-]+)\s*=\s*[^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\""
    r"(?:[^}]*source_file=\"([^\"]+)\"[^}]*source_line=(\d+))?"
)


def load_hlo_map(hlo_path: str) -> dict:
    """fusion/instruction name -> 'op_name (file:line)' from compiled HLO."""
    text = open(hlo_path).read()
    mapping = {}
    for name, op, src, line in _HLO_META.findall(text):
        where = f" ({os.path.basename(src)}:{line})" if src else ""
        mapping[name] = f"{op}{where}"
    return mapping


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
    )
    ap.add_argument("trace", help="*.trace.json.gz file or a profile dir")
    ap.add_argument("--top", type=int, default=25, help="rows to print")
    ap.add_argument("--no-group", action="store_true",
                    help="keep per-instance names (fusion.1, fusion.2, ...) "
                         "instead of aggregating families")
    ap.add_argument("--hlo", default=None, metavar="TXT",
                    help="compiled HLO text (jit(f).lower(...).compile()"
                         ".as_text()) to annotate fusion names with op_name/"
                         "source-line metadata (implies --no-group for lookup)")
    ap.add_argument("--pid", type=int, default=None,
                    help="restrict to one trace pid (default: device tracks)")
    args = ap.parse_args(argv)

    path = find_trace(args.trace)
    events = load_events(path)
    pids = ({args.pid: "explicit"} if args.pid is not None
            else device_pids(events))
    group = not (args.no_group or args.hlo)
    totals, wall = summarize(events, pids, group)
    if not totals:
        tracks = device_pids(events)
        sys.exit(f"no duration events on pids {sorted(pids)}; "
                 f"tracks present: {tracks}")

    hlo_map = load_hlo_map(args.hlo) if args.hlo else {}
    grand = sum(t[0] for t in totals.values())
    print(f"{path}")
    print(f"tracks: " + ", ".join(f"{p}={n!r}" for p, n in sorted(pids.items())))
    print(f"total device-op time {grand/1e3:.3f} ms over span {wall/1e3:.3f} ms"
          f" ({len(totals)} distinct names)\n")
    print(f"{'total ms':>10} {'%':>6} {'count':>7}  name")
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    for name, (us, n) in rows[: args.top]:
        note = hlo_map.get(name) or hlo_map.get(name.lstrip("%"))
        label = f"{name}  ->  {note}" if note else name
        print(f"{us/1e3:>10.3f} {100*us/grand:>6.1f} {n:>7}  {label}")
    rest = rows[args.top:]
    if rest:
        us = sum(t[0] for _, t in rest)
        print(f"{us/1e3:>10.3f} {100*us/grand:>6.1f} {'':>7}  "
              f"... {len(rest)} more")
    return 0


if __name__ == "__main__":
    sys.exit(main())
