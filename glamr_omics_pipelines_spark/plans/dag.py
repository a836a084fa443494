"""Layer-A analog: a declarative stage DAG with run ledger (SURVEY §3.1).

The reference's Snakefile is a wildcard-pattern DAG of ~150 rules dispatched
to SLURM, with post-production replaying the run log into a checkout ledger
(Snakefile:52-4689; pypelib/post.py:235-374). In the Spark engine the data
plane is one lazy Catalyst plan — what remains of Snakemake is the *control*
plane: named stages, dependencies, incremental skip, and an auditable ledger.

This module provides exactly that, deliberately small:
  - ``Stage``: name + fn(spark, ctx) -> DataFrame, with upstream deps.
  - ``StageDAG.run``: topological execution; each stage's DataFrame lands in
    ``ctx`` for downstream stages (handoff is a DataFrame reference — i.e.
    shuffle/exchange, not files on a shared FS like the reference).
  - per-stage ledger rows (stage, started, seconds, rows) appended to a
    JSON-lines ledger — the checkout-file/benchmark-table analog
    (pypelib/post.py:763-935).
  - ``skip_if``: incremental gate (e.g. "output partition already loaded"),
    the checkpoint/anti-join semantics of the reference's loaders.

The reference's checkpoint-driven DAG re-evaluation (Snakefile:308-312,
3970-4048 — plan depends on data) maps to ordinary driver-side control flow:
a stage fn may inspect upstream results and emit different plans; the DAG
only fixes the stage ORDER, not the plans inside.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, dict], DataFrame | None]
    deps: list[str] = field(default_factory=list)
    skip_if: Callable[[SparkSession, dict], bool] | None = None
    materialize: bool = False   # count() the result for the ledger


class StageDAG:
    def __init__(self, ledger_path: str | None = None):
        self.stages: dict[str, Stage] = {}
        self.ledger_path = ledger_path

    def stage(self, name: str, deps: list[str] | None = None,
              skip_if=None, materialize: bool = False):
        """Decorator: register a stage function."""
        def wrap(fn):
            if name in self.stages:
                raise ValueError(f"duplicate stage {name}")
            self.stages[name] = Stage(name, fn, deps or [], skip_if, materialize)
            return fn
        return wrap

    def _order(self) -> list[str]:
        seen: dict[str, int] = {}   # 0=visiting, 1=done
        out: list[str] = []

        def visit(n: str):
            if seen.get(n) == 1:
                return
            if seen.get(n) == 0:
                raise ValueError(f"cycle through {n}")
            if n not in self.stages:
                raise ValueError(f"unknown dep {n}")
            seen[n] = 0
            for d in self.stages[n].deps:
                visit(d)
            seen[n] = 1
            out.append(n)

        for n in self.stages:
            visit(n)
        return out

    def _log(self, row: dict) -> None:
        if self.ledger_path:
            with open(self.ledger_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    def run(self, spark: SparkSession, ctx: dict | None = None,
            targets: list[str] | None = None) -> dict:
        """Execute (a subgraph of) the DAG; returns the ctx with each stage's
        DataFrame under its name. ``targets`` limits execution to the listed
        stages plus their transitive deps (snakemake-target semantics)."""
        ctx = dict(ctx or {})
        order = self._order()
        if targets:
            needed: set[str] = set()

            def pull(n: str):
                if n in needed:
                    return
                needed.add(n)
                for d in self.stages[n].deps:
                    pull(d)
            for t in targets:
                pull(t)
            order = [n for n in order if n in needed]
        for name in order:
            st = self.stages[name]
            if st.skip_if and st.skip_if(spark, ctx):
                self._log({"stage": name, "skipped": True, "ts": time.time()})
                continue
            t0 = time.time()
            df = st.fn(spark, ctx)
            rows = None
            if df is not None:
                ctx[name] = df
                if st.materialize:
                    rows = df.count()
            self._log({"stage": name, "skipped": False, "ts": t0,
                       "seconds": round(time.time() - t0, 3), "rows": rows})
        return ctx


def read_ledger(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
