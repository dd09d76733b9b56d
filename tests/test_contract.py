"""Driver-contract invariants: the queries()/oracle_sql() registry."""

import re


def test_registry_shape():
    from titan_spark.plans.catalog import ORACLE_SQL, QUERIES

    # every oracle belongs to a registered query
    assert set(ORACLE_SQL) <= set(QUERIES)
    # every registered query is value-checked — since r7 even
    # pca_project has an oracle (quadratic-form invariants vs the
    # closed-form zero table; the eigendecomposition itself is not
    # SQL-expressible but its defining properties are)
    assert set(QUERIES) - set(ORACLE_SQL) == set()
    # the driver checks only the first 50 entries: current-round
    # flagships must sit inside the checked region (r11 thirteenth
    # wave: the seven r10-overflow flagships rotated in — each demoted
    # query keeps a family sibling in slots 1-50 per COVERAGE.md)
    first50 = list(QUERIES)[:50]
    for k in (
        "path_strings",
        "motif_unification",
        "sessionize_events",
        "ivfpq_ann",
        "asof_view_before_purchase",
        "range_join_clicks",
        "betweenness",
        "local_top3_sum",
        "map_nation_counts",
        "feature_smooth",
        # tenth wave (r8)
        "louvain_cliques",
        "graph_diameter",
        "dedup_weights",
        "condensation_dag",
        "k_hop_ego",
        "prop_meta_filter",
        # eleventh wave (r9)
        "pagerank_traversal_top",
        "value_quantiles_sketch",
        # twelfth wave (r10)
        "quality_classifier",
        "dsir_select",
        # thirteenth wave (r11)
        "exact_substring_dedup",
        "phash_dup_pairs",
        "ccnet_buckets",
        "minimum_spanning_tree",
        "kmv_user_days",
        "node2vec_corpus",
        # fourteenth wave (r12) — displaced: bigram_perplexity,
        # text_contains, temperature_mix, transitivity,
        # bloom_decontaminate, boilerplate_removal, pii_redact (each
        # keeps a family sibling in slots 1-50 per COVERAGE.md)
        "kn_perplexity",
        "url_dedup_groups",
        "domain_quota",
        "local_clustering",
        "ngram_novelty",
        "eval_containment",
        "secrets_scan",
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
