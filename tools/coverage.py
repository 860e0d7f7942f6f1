"""Line-coverage harness for the test suite (sys.monitoring, Python 3.12).

The reference enforces a 95% line-coverage bar via llvm-cov/nextest
(reference: Makefile:196-215, README.md:481-486). No coverage package is
installed here, so this uses the stdlib ``sys.monitoring`` LINE events —
low overhead, no dependencies.

Usage:
    python tools/coverage.py [pytest args...]       # run suite + report
    python tools/coverage.py --report cov.json      # re-print a saved run

Emits a per-module table and writes COVERAGE.json at the repo root.
"""

import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "whisper_apr_tpu")
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)  # `python tools/coverage.py` puts tools/ first

TOOL_ID = 4  # sys.monitoring free tool slot
executed = defaultdict(set)


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        executed[fn].add(line)
    return sys.monitoring.DISABLE  # only need each line once


def _executable_lines(path):
    """Lines that carry executable code, from the compiled code objects."""
    import dis
    try:
        with open(path) as f:
            src = f.read()
        top = compile(src, path, "exec")
    except (SyntaxError, OSError):
        return set()
    lines = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, line in code.co_lines():
            if line is not None:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def _report_from_executed():
    data = {}
    for dirpath, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, ROOT)
            exe = _executable_lines(path)
            hit = executed.get(path, set()) & exe
            data[rel] = {"executable": len(exe), "covered": len(hit),
                         "pct": round(100.0 * len(hit) / len(exe), 1)
                         if exe else 100.0}
    total_e = sum(v["executable"] for v in data.values())
    total_c = sum(v["covered"] for v in data.values())
    data["__total__"] = {"executable": total_e, "covered": total_c,
                         "pct": round(100.0 * total_c / max(total_e, 1), 1)}
    return data


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--report":
        data = json.load(open(sys.argv[2]))
        _print_table(data)
        return

    if len(sys.argv) > 2 and sys.argv[1] == "--merge":
        # merge raw executed-line dumps (from --dump shards and subprocess
        # workers) into one report — long single runs can die to flaky XLA
        # CPU compiler segfaults, so the suite is shardable
        for path in sys.argv[2:]:
            dump = json.load(open(path))
            for fn, lines in dump.items():
                executed[fn].update(lines)
        data = _report_from_executed()
        with open(os.path.join(ROOT, "COVERAGE.json"), "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        _print_table(data)
        return

    dump_path = None
    if "--dump" in sys.argv:
        i = sys.argv.index("--dump")
        dump_path = sys.argv[i + 1]
        del sys.argv[i: i + 2]

    show_missing = None
    if "--missing" in sys.argv:
        i = sys.argv.index("--missing")
        show_missing = sys.argv[i + 1]
        del sys.argv[i: i + 2]

    mon = sys.monitoring
    mon.use_tool_id(TOOL_ID, "apr-coverage")
    mon.set_events(TOOL_ID, mon.events.LINE)
    mon.register_callback(TOOL_ID, mon.events.LINE, _on_line)

    # subprocess workers (the 2-process DCN test) dump their own executed
    # lines here via tools/subproc_coverage.maybe_enable
    import tempfile
    sub_dir = tempfile.mkdtemp(prefix="aprcov-")
    os.environ["APR_COVERAGE_OUT"] = sub_dir

    import pytest
    args = sys.argv[1:] or ["tests/", "-q", "-x"]
    rc = pytest.main(args)

    mon.set_events(TOOL_ID, 0)
    mon.free_tool_id(TOOL_ID)

    for f in os.listdir(sub_dir):
        try:
            dump = json.load(open(os.path.join(sub_dir, f)))
        except (OSError, json.JSONDecodeError):
            continue
        for fn, lines in dump.items():
            executed[fn].update(lines)

    if dump_path:
        with open(dump_path, "w") as f:
            json.dump({k: sorted(v) for k, v in executed.items()}, f)

    data = _report_from_executed()
    with open(os.path.join(ROOT, "COVERAGE.json"), "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    _print_table(data)
    if show_missing:
        path = os.path.join(ROOT, show_missing)
        exe = _executable_lines(path)
        missing = sorted(exe - executed.get(path, set()))
        print(f"\nmissing lines in {show_missing}:")
        print(_ranges(missing))
    sys.exit(rc)


def _ranges(lines):
    out, start, prev = [], None, None
    for n in lines:
        if start is None:
            start = prev = n
        elif n == prev + 1:
            prev = n
        else:
            out.append(f"{start}-{prev}" if prev > start else str(start))
            start = prev = n
    if start is not None:
        out.append(f"{start}-{prev}" if prev > start else str(start))
    return ", ".join(out)


def _print_table(data):
    rows = sorted((k, v) for k, v in data.items() if k != "__total__")
    for k, v in rows:
        print(f"{k:<55} {v['covered']:>5}/{v['executable']:<5} {v['pct']:5.1f}%")
    t = data["__total__"]
    print(f"{'TOTAL':<55} {t['covered']:>5}/{t['executable']:<5} {t['pct']:5.1f}%")


if __name__ == "__main__":
    main()
