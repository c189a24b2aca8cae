"""plans/fingerprint.py — the source-fingerprint resolver behind the
derived changed-code re-gate rule.  These pin the resolution CLAIMS the
module's docstring makes (each was a real bug or blind spot during
round 9's build):

* ``module.attr`` access (LOAD_GLOBAL/LOAD_ATTR pairs) resolves to the
  attribute FUNCTION, giving function-granularity — an edit to one
  star.py function must not drag all ~21 star entries;
* lazy in-function imports (IMPORT_NAME/IMPORT_FROM) resolve — the
  genstore-from-inside-a-reader pattern (missed by a plain globals walk,
  and the level const sits TWO LOAD_CONSTs before IMPORT_NAME);
* module-level constants referenced by reached functions are hashed by
  repr, so changing MINCOST_TYPE re-gates Q2 without a function edit;
* fingerprints are deterministic within a process and sensitive to each
  recorded dependency kind.
"""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark.plans import fingerprint as fp
from hadoop_pyspark_streaming_analytics_spark.plans.catalog import CATALOG


def _spec(name):
    return next(s for s in CATALOG if s.name == name)


def _deps(name):
    return fp.builder_deps(_spec(name).builder)


def test_module_attr_access_resolves_to_function_granularity():
    deps = _deps("star_min_cost_supplier")
    fns = {k for k in deps if k.startswith("fn:")}
    assert any(k.endswith(".min_cost_supplier") for k in fns)
    # function granularity: Q1-shape star functions are NOT dependencies
    assert not any(k.endswith(".pricing_summary") for k in fns)
    # the constants the function reads are value-deps
    vals = {k for k in deps if k.startswith("val:")}
    assert any(k.endswith(".MINCOST_TYPE") for k in vals)
    assert any(k.endswith(".MINCOST_REGION") for k in vals)


def test_lazy_in_function_imports_resolve():
    """load_pq_index / load_text_index import genstore INSIDE the
    function body — the walk must still see genstore functions (this was
    missed twice: once by the globals-only walk, once by reading the
    wrong LOAD_CONST as the import level)."""
    for entry in ("ann_ivf_pq_search_indexed", "retrieval_bm25_indexed"):
        deps = _deps(entry)
        gen_fns = {
            k
            for k in deps
            if k.startswith("fn:") and ".sources.genstore." in k
        }
        assert gen_fns, f"{entry}: no genstore function deps resolved"
        assert any(k.endswith(".load_manifest") for k in gen_fns)


def test_fingerprint_deterministic_and_distinct():
    a1 = fp.entry_fingerprint(_spec("star_min_cost_supplier"))
    a2 = fp.entry_fingerprint(_spec("star_min_cost_supplier"))
    b = fp.entry_fingerprint(_spec("star_pricing_summary"))
    assert a1 == a2
    assert a1 != b


def test_recorded_hashes_cover_every_catalog_entry():
    recorded = fp.load_recorded()
    missing = [s.name for s in CATALOG if s.name not in recorded]
    assert not missing, f"run scripts/update_entry_hashes.py: {missing}"


def test_version_mismatch_rerecords_without_regating(monkeypatch, tmp_path):
    """ADVICE r9: fingerprints walk CPython bytecode, so a record made
    under another minor version can mismatch with UNCHANGED source.  A
    refresh under a different interpreter must re-record hashes WITHOUT
    stamping a re-gate; the same mismatch under the SAME interpreter is
    a real code change and must stamp one."""
    import json

    spec = _spec("star_min_cost_supplier")
    path = tmp_path / "entry_hashes.json"
    monkeypatch.setattr(fp, "HASHES_PATH", str(path))

    path.write_text(json.dumps({
        "__meta__": {"python": "3.9"},
        spec.name: {"hash": "deadbeef", "regate_round": 5},
    }))
    records, changed = fp.refresh_hashes([spec])
    assert spec.name not in changed  # environment drift, not a code change
    assert records[spec.name]["regate_round"] == 5
    assert records[spec.name]["hash"] == fp.entry_fingerprint(spec)
    assert records["__meta__"]["python"] == fp.PY_VERSION

    path.write_text(json.dumps({
        "__meta__": {"python": fp.PY_VERSION},
        spec.name: {"hash": "deadbeef", "regate_round": 5},
    }))
    records, changed = fp.refresh_hashes([spec])
    assert spec.name in changed  # same interpreter: a real change


def test_last_green_counts_rows_only_driver_rows():
    """The driver records oracle-less entries with null matches and
    err='no_oracle' — those rows are green for staleness purposes (the
    r4 sketch_daily_user_hll row), while a row with a real err is not."""
    greens = fp.last_green_rounds()
    assert greens.get("sketch_daily_user_hll", 0) >= 4
