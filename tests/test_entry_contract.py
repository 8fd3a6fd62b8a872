"""Driver-contract guards for __ray_entry__.py.

The round-4 driver sweep recorded exactly 50 of 51 queries — the
last dict key was silently dropped, so the sweep evidently caps at
50 entries.  These tests pin the contract so a future addition
can't silently push a query out of the CORRECTNESS gate again.
"""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry_mod

DRIVER_QUERY_CAP = 50


def test_query_count_within_driver_cap():
    qs = entry_mod.queries()
    assert len(qs) <= DRIVER_QUERY_CAP, (
        f"queries() has {len(qs)} entries; the driver sweep records at "
        f"most {DRIVER_QUERY_CAP} — merge or drop before adding more"
    )


def test_every_oracle_key_has_a_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    dangling = set(oracles) - set(qs)
    assert not dangling, f"oracle_sql() keys without a queries() entry: {dangling}"


def test_oracle_coverage_is_documented():
    """Every queries() key either has a SQL oracle or is one of the
    known rows-only ops (sketch/LSH families with pytest error-bound
    coverage)."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    allowed = {
        "fingerprint", "dedup_simhash", "ann_lsh",
        "dedup_embedding_lsh", "approx_distinct_terms", "ann_ivf",
    }
    assert rows_only <= allowed, (
        f"new queries without oracles (add SQL or whitelist): {rows_only - allowed}"
    )
