"""Mechanical end-of-round CLOSING block (VERDICT r10 'What's wrong' #2).

Runs (or ingests logs of) the four closing gates and APPENDS a populated
CLOSING block to the round ledger — so the final-HEAD gate numbers are a
script step, not a prose intention that can be forgotten.

Gates:
  1. full-catalog oracle check at sf0.01       (tools/check.py)
  2. full-catalog robustness check at sf0.1    (SPARK_GRAFT_CHECK_SF=...)
  3. full pytest incl. slow tiers              (python -m pytest tests/ -q --runslow)
  4. full bench, alone on the box              (python bench.py)

Usage:
  python tools/closing_gates.py ROUND_FILE.md [--reuse gate=/path/to.log ...]

--reuse lets a gate that ALREADY ran at this exact HEAD feed its log in
instead of re-running (the sha is recorded either way; reusing a stale log
across commits is on the operator). Gate keys: check001, check01, pytest,
bench. Without --reuse, every gate runs fresh, serially, bench last.
Exits non-zero (and appends nothing) if any gate fails.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, log=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=ROOT, env=e, capture_output=True, text=True)
    out = p.stdout + p.stderr
    if log:
        with open(log, "w") as fh:
            fh.write(out)
    return p.returncode, out


def gate_check(reuse, sf_env=None):
    if reuse:
        out = open(reuse).read()
        rc = 0 if re.search(r"\n(\d+) pass, 0 fail", out) else 1
    else:
        rc, out = run([sys.executable, "tools/check.py"],
                      env=sf_env)
    m = re.search(r"(\d+) pass, (\d+) fail", out)
    return rc, (m.group(0) if m else "NO SUMMARY LINE")


def gate_pytest(reuse):
    if reuse:
        rc, out = 0, open(reuse).read()
    else:
        # --runslow: the closing gate runs the FULL suite including the
        # @pytest.mark.slow tiers that a default (driver-window) run skips
        rc, out = run([sys.executable, "-m", "pytest", "tests/", "-q",
                       "--runslow"])
    lines = out.strip().splitlines()
    if not lines:
        return 1, "NO PYTEST OUTPUT"
    last = lines[-1]
    m = re.search(r"(\d+) passed.*", last)
    # same (stripped) summary line feeds both the passed-count and the
    # failed/error check; a live run's exit code gates too
    ok = bool(m) and "failed" not in last and "error" not in last and rc == 0
    return (0 if ok else 1), (m.group(0) if m else last)


def gate_bench(reuse):
    if reuse:
        rc, out = 0, open(reuse).read()
    else:
        rc, out = run([sys.executable, "bench.py"])
    line = [l for l in out.splitlines() if l.strip().startswith("{")]
    if not line:
        return 1, "NO JSON LINE"
    d = json.loads(line[-1])
    if d.get("n_errors") or rc != 0:
        return 1, f"n_errors={d.get('n_errors')} rc={rc}"
    return 0, (f"headline {d['value']}s over {d['n_queries_timed']} queries; "
               f"stable30 {d['stable30_total']}s (min5 {d['stable30_total_min5']}, "
               f"drift_adj {d['stable30_drift_adj']}; probes st="
               f"{d['calibration_probe_sec']} mt={d['calibration_probe_mt_sec']})")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round_file")
    ap.add_argument("--reuse", action="append", default=[],
                    metavar="gate=log", help="gate keys: check001, check01, pytest, bench")
    args = ap.parse_args()
    reuse = dict(kv.split("=", 1) for kv in args.reuse)

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    results = {}
    rc1, results["check sf0.01"] = gate_check(reuse.get("check001"))
    rc2, results["check sf0.1"] = gate_check(
        reuse.get("check01"), sf_env={"SPARK_GRAFT_CHECK_SF": "/root/testdata/sf0.1"})
    rc3, results["pytest"] = gate_pytest(reuse.get("pytest"))
    rc4, results["bench"] = gate_bench(reuse.get("bench"))

    bad = [k for k, rc in zip(results, (rc1, rc2, rc3, rc4)) if rc]
    if bad:
        print(f"CLOSING REFUSED — failing gates: {bad}", file=sys.stderr)
        for k, v in results.items():
            print(f"  {k}: {v}", file=sys.stderr)
        return 1

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    block = [f"\n## CLOSING (HEAD `{head}`, {stamp})\n"]
    for k, v in results.items():
        src = " (reused log)" if k.replace(" sf0.01", "001").replace(
            " sf0.1", "01").replace("check", "check") in reuse else ""
        block.append(f"- **{k}**: {v}{src}")
    reused = ", ".join(sorted(reuse)) or "none"
    block.append(f"- reused logs: {reused}")
    with open(os.path.join(ROOT, args.round_file), "a") as fh:
        fh.write("\n".join(block) + "\n")
    print(f"CLOSING block appended to {args.round_file} at HEAD {head}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
