"""Driver-contract invariants: the queries()/oracle_sql() registry."""

import re


def test_registry_shape():
    from titan_spark.plans.catalog import ORACLE_SQL, QUERIES

    # every oracle belongs to a registered query
    assert set(ORACLE_SQL) <= set(QUERIES)
    # every registered query is value-checked except the documented
    # rows-only entries — pca_project's eigendecomposition is not
    # SQL-expressible (its covariance input is value-checked by
    # embed_covariance; axes/projection by closed-form pytest)
    assert set(QUERIES) - set(ORACLE_SQL) == {"pca_project"}
    # the driver checks only the first 50 entries: current-round
    # flagships must sit inside the checked region (r6 seventh wave:
    # the six r5-overflow flagships rotated in — each demoted query
    # keeps a family sibling in slots 1-50 per COVERAGE.md)
    first50 = list(QUERIES)[:50]
    for k in (
        "path_strings",
        "motif_unification",
        "sessionize_events",
        "lm_perplexity",
        "ivfpq_ann",
        "asof_view_before_purchase",
        "range_join_clicks",
        "betweenness",
        "cms_heavy_hitters",
        "pq_codes",
        "harmonic_centrality",
        "mis_geo",
        "topo_levels",
        "event_funnel",
        "cube_order_stats",
        "closeness_centrality",
        "local_top3_sum",
        "map_nation_counts",
        "quota_by_source",
        "random_walk_corpus",
    ):
        assert k in first50


def test_driver_slots_have_scalar_columns(spark, sf_dir):
    """The driver's canonicalizer (pandas sort_values → factorize)
    cannot hash array/map/struct cells — an ArrayType output column
    turns a correct query into a red driver row (CORRECTNESS_r05
    pq_codes, ``unhashable type: 'list'``). Every driver-checked slot
    (first 50 catalog entries) must therefore emit scalar columns
    only; queries producing collections project them as joined
    strings or exploded rows before registration."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from titan_spark.plans.catalog import QUERIES

    bad = []
    for name in list(QUERIES)[:50]:
        df = QUERIES[name](spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"driver-slot queries with non-scalar columns: {bad}"


def test_coverage_references_real_queries():
    from titan_spark.plans.catalog import QUERIES

    with open("COVERAGE.md") as f:
        text = f.read()
    referenced = set(re.findall(r"`([a-z0-9_]+)` (?:✓|rows)", text))
    missing = referenced - set(QUERIES)
    assert not missing, f"COVERAGE.md references unknown queries: {sorted(missing)}"


def test_entry_module_exports():
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert callable(m.entry) and len(q) >= 50 and set(o) <= set(q)
