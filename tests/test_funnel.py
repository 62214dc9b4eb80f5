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


def test_config_knobs_change_verdicts(spark, catalog):
    # code-review r5: config must be load-bearing, not a write-only
    # cache key — a tighter quality threshold flips real verdicts
    funnel.materialize_funnel(spark, catalog, SF)
    base_pass = {r.doc_id for r in
                 catalog.read(spark, "funnel_quality")
                 .filter("passes_quality").collect()}
    # fixture scores cluster at 24-30, so the reference threshold 67
    # passes nobody; LOWERING it must admit documents
    ran = funnel.materialize_funnel(
        spark, catalog, SF, config={"quality": {"threshold": 25.0}})
    assert ran == ["quality"]
    loose = {r.doc_id for r in
             catalog.read(spark, "funnel_quality")
             .filter("passes_quality").collect()}
    assert base_pass < loose  # strictly more pass at 25
    # token window knob too: widening [75,480] to [1,10**6] flips docs
    ran = funnel.materialize_funnel(
        spark, catalog, SF,
        config={"quality": {"threshold": 25.0},
                "tokens": {"lo": 1, "hi": 1_000_000}})
    assert ran == ["tokens"]
    wide = catalog.read(spark, "funnel_tokens") \
        .filter("tokens_in_window").count()
    assert wide == 500  # every fixture doc has >= 1 token


def test_corpus_change_invalidates_all_stages(spark, catalog):
    # code-review r5: sf_dir is part of the cache key — switching
    # corpora must rebuild every stage, never join mixed verdicts
    funnel.materialize_funnel(spark, catalog, SF)
    ran = funnel.materialize_funnel(spark, catalog,
                                    "/root/testdata/sf0.01")
    assert sorted(ran) == sorted(funnel._BOOL_T)
