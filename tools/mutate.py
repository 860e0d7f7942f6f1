"""Mutation-testing harness (the reference enforces >=85% mutation kill
via cargo-mutants, Makefile:340; no mutation package exists in this
environment, so this is a from-scratch AST mutator + runner).

For a target module, generates one mutant per applicable AST site:

  - comparison flips:  <  <->  <=,  >  <->  >=,  ==  <->  !=
  - arithmetic swaps:  +  <->  -,  *  <->  //? (kept to + and -)
  - boolean swaps:     and <-> or
  - constant nudges:   integer C -> C + 1 (skipping 0/1 axis-like args is
    deliberately NOT attempted — naive nudges there create equivalent
    mutants; the comparison/boolean classes carry the signal)

then runs the focused test command per mutant and reports killed /
survived. Survivors are printed with their site so they become new tests.

Usage:
    python tools/mutate.py whisper_apr_tpu/format/checksum.py \
        tests/test_format.py -k crc
    python tools/mutate.py --max 40 whisper_apr_tpu/audio/ring_buffer.py \
        tests/test_streaming.py

Writes MUTATION.json at the repo root (per-module kill rates).
"""

import argparse
import ast
import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CMP_SWAP = {ast.Lt: ast.LtE, ast.LtE: ast.Lt, ast.Gt: ast.GtE,
             ast.GtE: ast.Gt, ast.Eq: ast.NotEq, ast.NotEq: ast.Eq}
_ARITH_SWAP = {ast.Add: ast.Sub, ast.Sub: ast.Add,
               ast.BitXor: ast.BitAnd, ast.BitAnd: ast.BitOr,
               ast.RShift: ast.LShift, ast.Mod: ast.FloorDiv}
_BOOL_SWAP = {ast.And: ast.Or, ast.Or: ast.And}


def find_mutations(tree):
    """Yield (node, describe, mutate_fn) for every applicable site."""
    sites = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            op = node.ops[0]
            new = _CMP_SWAP.get(type(op))
            if new:
                sites.append((node.lineno, f"cmp {type(op).__name__}->"
                              f"{new.__name__} @{node.lineno}",
                              lambda n=node, nw=new: n.ops.__setitem__(
                                  0, nw())))
        elif isinstance(node, ast.BinOp):
            new = _ARITH_SWAP.get(type(node.op))
            if new:
                sites.append((node.lineno, f"arith {type(node.op).__name__}"
                              f"->{new.__name__} @{node.lineno}",
                              lambda n=node, nw=new: setattr(n, "op", nw())))
        elif isinstance(node, ast.BoolOp):
            new = _BOOL_SWAP.get(type(node.op))
            if new:
                sites.append((node.lineno, f"bool {type(node.op).__name__}"
                              f"->{new.__name__} @{node.lineno}",
                              lambda n=node, nw=new: setattr(n, "op", nw())))
    return sites


def _install_restore_signals():
    """SIGTERM/SIGINT must run the ``finally`` restore: a default SIGTERM
    (e.g. from ``timeout``) kills the process between mutant-write and
    restore, leaving a MUTANT on disk as the next run's baseline."""
    import signal

    def _raise(signum, frame):
        raise SystemExit(128 + signum)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _raise)


def run_mutations(target: str, test_cmd, max_mutants=None, timeout=300,
                  only=None):
    _install_restore_signals()
    src_path = os.path.join(ROOT, target)

    # Crash-safe journal: SIGKILL (e.g. ``timeout -k``) bypasses every
    # handler and ``finally``, and once left a live And->Or mutant on disk.
    # Keep the pristine source in a sidecar for the WHOLE run and restore
    # from it on the next startup if it is still present.
    backup = src_path + ".mutorig"
    if os.path.exists(backup):
        print(f"restoring {target} from crash journal {backup}")
        shutil.copyfile(backup, src_path)
        os.remove(backup)
    original = open(src_path).read()
    with open(backup, "w") as f:
        f.write(original)

    # baseline sanity: the focused suite must PASS on the unmutated file,
    # else every result is noise (classic cause: a prior killed run left a
    # mutant on disk)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", "--no-header",
         *test_cmd],
        cwd=ROOT, capture_output=True, timeout=timeout,
        env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"})
    if r.returncode != 0:
        print("BASELINE FAILED — focused suite does not pass on the "
              "unmutated file; aborting (is the target file clean vs git?)")
        print("rc:", r.returncode)
        print(r.stdout.decode(errors="replace")[-2000:])
        print(r.stderr.decode(errors="replace")[-2000:])
        os.remove(backup)  # clean exit — no mutant was ever on disk
        raise SystemExit(2)

    tree = ast.parse(original)
    sites = find_mutations(tree)
    if only:
        # resweep mode: only the named survivor sites (exact description
        # match). Cheap way to re-adjudicate prior survivors after killer
        # tests land, without paying the full-sweep CPU again.
        missing = [d for d in only if d not in {s[1] for s in sites}]
        if missing:
            print("--only descriptions not found (line drift?):", missing)
            os.remove(backup)
            raise SystemExit(2)
        sites = [s for s in sites if s[1] in set(only)]
    if max_mutants:
        step = max(1, len(sites) // max_mutants)
        sites = sites[::step][:max_mutants]
    print(f"{target}: {len(sites)} mutants")

    killed, survived = 0, []
    try:
        for lineno, desc, apply_fn in sites:
            tree = ast.parse(original)      # fresh tree per mutant
            for ln, d, fn in find_mutations(tree):
                if d == desc:
                    fn()
                    break
            mutated = ast.unparse(tree)
            with open(src_path, "w") as f:
                f.write(mutated)
            try:
                r = subprocess.run(
                    [sys.executable, "-m", "pytest", "-x", "-q",
                     "--no-header", *test_cmd],
                    cwd=ROOT, capture_output=True, timeout=timeout,
                    env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"})
                failed = r.returncode != 0
            except subprocess.TimeoutExpired:
                # a hanging suite means the mutant broke termination —
                # that IS a kill (cargo-mutants counts timeouts the same)
                failed = True
            if failed:
                killed += 1
                mark = "killed"
            else:
                survived.append(desc)
                mark = "SURVIVED"
            print(f"  {desc:<40} {mark}", flush=True)
    finally:
        with open(src_path, "w") as f:
            f.write(original)
        if os.path.exists(backup):
            os.remove(backup)

    total = killed + len(survived)
    rate = killed / total if total else 1.0
    print(f"{target}: {killed}/{total} killed ({100*rate:.0f}%)")
    if survived:
        print("survivors (add tests for these):")
        for s in survived:
            print(f"  - {s}")
    return {"target": target, "mutants": total, "killed": killed,
            "kill_rate": round(rate, 3), "survivors": survived}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", help="module path relative to repo root")
    ap.add_argument("--max", type=int, default=None)
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--only", action="append", default=None,
                    metavar="DESC",
                    help="resweep only this mutant description (exact, "
                         "repeatable); result MERGES into the existing "
                         "MUTATION.json entry instead of replacing it")
    # everything after the target (that isn't --max/--timeout) is passed
    # verbatim to pytest, INCLUDING flags like -k/-x
    ap.add_argument("tests", nargs=argparse.REMAINDER,
                    help="pytest args for the focused suite")
    args = ap.parse_args()
    if not args.tests:
        ap.error("no pytest args given")
    result = run_mutations(args.target, args.tests, args.max, args.timeout,
                           only=args.only)
    out = os.path.join(ROOT, "MUTATION.json")
    data = {}
    if os.path.exists(out):
        try:
            data = json.load(open(out))
        except json.JSONDecodeError:
            data = {}
    if args.only and args.target in data:
        # merge a survivor resweep into the full-sweep record: previously
        # killed mutants stay killed (the test set only grows), the
        # resweep re-adjudicates exactly the named survivors
        prev = data[args.target]
        resweep = set(args.only)
        keep = [s for s in prev["survivors"] if s not in resweep]
        survivors = keep + result["survivors"]
        killed = prev["mutants"] - len(survivors)
        result = {"target": args.target, "mutants": prev["mutants"],
                  "killed": killed,
                  "kill_rate": round(killed / prev["mutants"], 3),
                  "survivors": survivors}
    data[args.target] = result
    with open(out, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
