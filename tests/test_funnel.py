"""plans/funnel.py: catalog-materialized audit table (VERDICT r4 #8) —
persisted-verdict join == inline composed query, and resume recomputes
only changed-config stages."""

from __future__ import annotations

from axora_spark.plans import funnel

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_materialized_equals_inline(spark, catalog):
    from axora_spark.queries import q_pipeline_funnel
    ran = funnel.materialize_funnel(spark, catalog, SF)
    assert sorted(ran) == sorted(funnel._BOOL_T)  # cold build runs all
    got = funnel.read_funnel(spark, catalog)
    want = q_pipeline_funnel(spark, SF)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_resume_skips_current_stages(spark, catalog):
    funnel.materialize_funnel(spark, catalog, SF)
    snaps = {s: catalog.current_snapshot(f"funnel_{s}")
             for s in funnel._BOOL_T}
    # unchanged config -> nothing recomputes, snapshots untouched
    assert funnel.materialize_funnel(spark, catalog, SF) == []
    assert snaps == {s: catalog.current_snapshot(f"funnel_{s}")
                     for s in funnel._BOOL_T}
    # one stage's config changes -> ONLY that stage recomputes
    ran = funnel.materialize_funnel(spark, catalog, SF,
                                    config={"gopher": {"v": 2}})
    assert ran == ["gopher"]
    for s in funnel._BOOL_T:
        cur = catalog.current_snapshot(f"funnel_{s}")
        assert (cur != snaps[s]) == (s == "gopher"), s


def test_crash_between_commit_and_meta(spark, catalog):
    # a crash AFTER a stage's snapshot commit but BEFORE its meta tag
    # just recomputes that one stage — simulate by dropping the tag
    funnel.materialize_funnel(spark, catalog, SF)
    meta = funnel._load_meta(catalog)
    del meta["exact"]
    funnel._save_meta(catalog, meta)
    assert funnel.materialize_funnel(spark, catalog, SF) == ["exact"]
    from axora_spark.queries import q_pipeline_funnel
    assert _rows(funnel.read_funnel(spark, catalog)) == \
        _rows(q_pipeline_funnel(spark, SF))
