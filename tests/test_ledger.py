"""Tests for the stale-green ledger gate (scripts/gen_ledger.py).

The r06 verdict's item 2: the per-query source hash missed edits to
shared same-package helpers (the ``_shingles`` episode — a semantics-
relevant helper changed after certification and the mechanical gate
stayed silent). These tests prove the transitive hash closes that
blind spot: editing a helper (or a referenced module-level constant)
in a scratch package flips every consumer's hash, and the status
computation then fires STALE GREEN for any consumer outside the
current window.

No Spark session needed — pure hashing + status logic.
"""

from __future__ import annotations

import importlib
import os
import sys
import textwrap

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.gen_ledger import _source_hash, compute_statuses  # noqa: E402

_PKG_V1 = '''
_SCALE = 3

def _helper(x):
    return x * _SCALE

def query_a(spark, sf_dir):
    return _helper(1)

def query_b(spark, sf_dir):
    return 42
'''

_PKG_HELPER_EDIT = _PKG_V1.replace("return x * _SCALE", "return x * _SCALE + 1")
_PKG_CONST_EDIT = _PKG_V1.replace("_SCALE = 3", "_SCALE = 4")
_PKG_LAMBDA = '''
_SCALE = 3

def _helper(x):
    return x * _SCALE

def query_a(spark, sf_dir):
    return (lambda v: _helper(v))(1)

def query_b(spark, sf_dir):
    return 42
'''


def _load_scratch_pkg(tmp_path, name: str, body: str):
    """Write a one-module scratch package and import its module fresh."""
    pkg = tmp_path / name
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "ops.py").write_text(textwrap.dedent(body))
    sys.path.insert(0, str(tmp_path))
    try:
        for m in (name, f"{name}.ops"):
            sys.modules.pop(m, None)
        mod = importlib.import_module(f"{name}.ops")
    finally:
        sys.path.pop(0)
    return mod


def _hashes(tmp_path, name, body):
    mod = _load_scratch_pkg(tmp_path, name, body)
    return {
        "query_a": _source_hash(mod.query_a, "SELECT 1", package=name),
        "query_b": _source_hash(mod.query_b, "SELECT 2", package=name),
    }


def test_helper_edit_flips_consumer_hash(tmp_path):
    """Editing a helper's BODY (the query's own source unchanged) must
    flip the consumer's hash — the exact _shingles failure mode."""
    h1 = _hashes(tmp_path / "a", "scratchpkg1", _PKG_V1)
    h2 = _hashes(tmp_path / "b", "scratchpkg1", _PKG_HELPER_EDIT)
    assert h1["query_a"] != h2["query_a"], "helper edit invisible to consumer"
    assert h1["query_b"] == h2["query_b"], "non-consumer must be unaffected"


def test_constant_edit_flips_consumer_hash(tmp_path):
    """Module-level constants referenced transitively (_MAX_DF-class)
    are part of the hash."""
    h1 = _hashes(tmp_path / "a", "scratchpkg2", _PKG_V1)
    h2 = _hashes(tmp_path / "b", "scratchpkg2", _PKG_CONST_EDIT)
    assert h1["query_a"] != h2["query_a"], "constant edit invisible"
    assert h1["query_b"] == h2["query_b"]


def test_helper_reference_inside_lambda_is_seen(tmp_path):
    """References from nested code objects (lambdas — the dominant
    shape in this package's zip_with/transform pipelines) count."""
    h1 = _hashes(tmp_path / "a", "scratchpkg3", _PKG_LAMBDA)
    h2 = _hashes(
        tmp_path / "b",
        "scratchpkg3",
        _PKG_LAMBDA.replace("return x * _SCALE", "return x * _SCALE + 1"),
    )
    assert h1["query_a"] != h2["query_a"]


def test_stale_green_fires_outside_window(tmp_path):
    """End-to-end status logic: a green query whose transitive hash
    changed and which is NOT in the window must be STALE GREEN (the
    nonzero-exit condition in gen_ledger.main)."""
    h1 = _hashes(tmp_path / "a", "scratchpkg4", _PKG_V1)
    h2 = _hashes(tmp_path / "b", "scratchpkg4", _PKG_HELPER_EDIT)
    names = ["query_a", "query_b"]
    oracled = {"query_a", "query_b"}
    last_green = {"query_a": 6, "query_b": 6}
    stored = {n: {"green_round": 6, "hash": h1[n]} for n in names}
    # window holds neither → the edited consumer must be flagged
    rows, backlog, stale = compute_statuses(
        names, oracled, last_green, stored, h2, window=set(), cur=7
    )
    assert stale == ["query_a"]
    assert backlog == []
    status = dict((n, s) for n, _, s in rows)
    assert "STALE GREEN" in status["query_a"]
    assert status["query_b"] == "green, unchanged"
    # re-queued into the window → clean
    rows, backlog, stale = compute_statuses(
        names, oracled, last_green, stored, h2, window={"query_a"}, cur=7
    )
    assert stale == [] and backlog == []


def test_real_package_transitivity_shingles():
    """The motivating case on the real package: _shingles' source is a
    hash input for every consumer the r06 ledger missed."""
    from impala_refresher_spark.queries import ORACLES, QUERIES
    from scripts.gen_ledger import _collect_sources
    import inspect
    from impala_refresher_spark.operators import dedup

    shingle_src = inspect.getsource(dedup._shingles)
    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_minhash_incremental",
        "decontaminate_train_set",
        "quote_containment_join",
    ):
        parts: list[str] = []
        _collect_sources(QUERIES[name], "impala_refresher_spark", set(), parts)
        assert shingle_src in parts, f"{name} hash misses _shingles"
    # and a non-consumer does not pull it in
    parts = []
    _collect_sources(
        QUERIES["dedup_exact"], "impala_refresher_spark", set(), parts
    )
    assert shingle_src not in parts
