"""Driver-contract invariants: the queries()/oracle_sql() registry."""

import re


def test_registry_shape():
    from titan_spark.plans.catalog import ORACLE_SQL, QUERIES

    # every oracle belongs to a registered query
    assert set(ORACLE_SQL) <= set(QUERIES)
    # rows-only entries are exactly the hash-bound ones (xxhash64 has
    # no DuckDB twin); everything else must be value-checked
    assert set(QUERIES) - set(ORACLE_SQL) == {"minhash_lsh_pairs", "simhash_sig"}


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
