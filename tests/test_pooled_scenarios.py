"""Thread-pooled runner for the heavy independent scenario tests.

``pytest tests/ -q`` wall time is dominated by the LATENCY of many
tiny sequential Spark jobs, not CPU (user+sys is ~2 of ~6 wall
minutes), and the oracle-parity suite already pools its cases for
exactly this reason (test_oracle_parity.py). This extends the same
pattern to the other expensive tests that are audited pool-safe (see
pooled_cases.py for the audit criteria): each pooled case is the
ORIGINAL test function called directly — same body, same assertions —
with its fixtures resolved manually (fresh tmp dirs per case) and the
calls submitted concurrently to the shared local Spark scheduler.
Hypothesis-driven cases run on the main thread while the pool drains.

``SPARK_GRAFT_PARITY_SERIAL=1`` restores per-case serial mode (better
isolation and ``-x`` bisection); conftest's collection hook skips the
originals only in pooled mode, so nothing ever runs twice and nothing
is ever skipped in both modes.
"""

from __future__ import annotations

import importlib
import inspect
import os
import pathlib
import tempfile

import pytest

from pooled_cases import MAIN_THREAD_CASES, POOLED_CASES

_SERIAL = bool(os.environ.get("SPARK_GRAFT_PARITY_SERIAL"))


class _TmpFactory:
    """Stand-in for pytest's tmp_path_factory: fresh real dirs, left
    to the OS tmp reaper (the suite writes a few MB total)."""

    def mktemp(self, name: str) -> pathlib.Path:
        return pathlib.Path(tempfile.mkdtemp(prefix=f"pooled-{name}-"))


def _resolve_kwargs(fn, env: dict) -> dict:
    """Build the kwargs a test function would get from pytest: the
    well-known fixtures come from ``env``; anything else must be a
    same-module @pytest.fixture whose unwrapped builder we call
    recursively (pure builders only — audited in pooled_cases.py)."""
    mod = inspect.getmodule(fn)
    kwargs = {}
    for name in inspect.signature(fn).parameters:
        if name in env:
            kwargs[name] = env[name]
        elif name == "tmp_path":
            kwargs[name] = pathlib.Path(tempfile.mkdtemp(prefix="pooled-"))
        elif name == "tmp_path_factory":
            kwargs[name] = _TmpFactory()
        else:
            fixture = getattr(mod, name, None)
            builder = getattr(fixture, "__wrapped__", None)
            if builder is None:
                raise RuntimeError(
                    f"{fn.__name__}: no resolver for fixture {name!r}"
                )
            kwargs[name] = builder(**_resolve_kwargs(builder, env))
    return kwargs


def _param_sets(fn) -> list[dict]:
    """Expand @pytest.mark.parametrize marks into kwarg dicts (cross
    product across stacked marks), so a pooled case runs every variant
    exactly as pytest would — e.g. the commit-protocol tests run once
    per CommitBackend."""
    sets: list[dict] = [{}]
    for mark in getattr(fn, "pytestmark", []):
        if mark.name != "parametrize":
            continue
        names, values = mark.args[0], mark.args[1]
        if isinstance(names, str):
            names = [n.strip() for n in names.split(",")]
        expanded = []
        for base in sets:
            for v in values:
                vals = (
                    list(v)
                    if isinstance(v, (tuple, list)) and len(names) > 1
                    else [v]
                )
                expanded.append({**base, **dict(zip(names, vals))})
        sets = expanded
    return sets


def _run_case(module: str, test: str, env: dict) -> str | None:
    try:
        fn = getattr(importlib.import_module(module), test)
        for params in _param_sets(fn):
            # fresh tmp dirs per variant: _resolve_kwargs mints them
            fn(**_resolve_kwargs(fn, {**env, **params}))
        return None
    except Exception as ex:  # noqa: BLE001 — reported, not swallowed
        return f"{module}::{test}: {type(ex).__name__}: {ex}"


def _run_hypo_case(module: str, test: str, env: dict) -> str | None:
    """Hypothesis wrappers: pass only the fixture params (the @given
    params are filled by the engine); signature still lists both, so
    filter to names we can actually provide."""
    try:
        fn = getattr(importlib.import_module(module), test)
        kwargs = {}
        for name in inspect.signature(fn).parameters:
            if name in env:
                kwargs[name] = env[name]
            elif name == "tmp_path_factory":
                kwargs[name] = _TmpFactory()
            else:
                mod = inspect.getmodule(fn)
                fixture = getattr(mod, name, None)
                builder = getattr(fixture, "__wrapped__", None)
                if builder is not None:
                    kwargs[name] = builder(**_resolve_kwargs(builder, env))
                # else: a @given-supplied param — leave to hypothesis
        fn(**kwargs)
        return None
    except Exception as ex:  # noqa: BLE001
        return f"{module}::{test}: {type(ex).__name__}: {ex}"


@pytest.mark.skipif(_SERIAL, reason="serial mode runs these per-case")
def test_pooled_scenarios(spark, sf_small, sf_oracle):
    from concurrent.futures import ThreadPoolExecutor

    env = {"spark": spark, "sf_small": sf_small, "sf_oracle": sf_oracle}
    workers = int(os.environ.get("SPARK_GRAFT_PARITY_THREADS", "8"))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = [
            ex.submit(_run_case, m, t, env) for m, t in POOLED_CASES
        ]
        # hypothesis cases on the main thread while the pool drains
        hypo_results = [
            _run_hypo_case(m, t, env) for m, t in MAIN_THREAD_CASES
        ]
        results = [f.result() for f in futures] + hypo_results
    failures = [r for r in results if r is not None]
    assert not failures, (
        f"{len(failures)}/{len(results)} pooled-scenario failures:\n"
        + "\n".join(failures)
    )
