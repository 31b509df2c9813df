"""The driver-window ordering contract of __spark_entry__.py.

The driver records a bounded prefix (50 rows) of ``queries()`` per
round, so ordering bugs silently cost a round of correctness rows.
The invariants, derived (not hand-maintained) since r4:

1. every catalog query appears exactly once;
2. every not-yet-driver-proven query precedes every proven one;
3. within each block, catalog insertion order is preserved — and
   because rounds only append to QUERY_CATALOG, insertion order is
   chronological, so an older unproven query can never be displaced
   out of the window by a newer one;
4. oracle_sql() covers exactly the oracled subset, same ordering.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def test_ordering_properties():
    mod = _entry_module()
    from kafkaconnect_spark.queries import QUERY_CATALOG

    names = list(mod.queries())
    catalog = list(QUERY_CATALOG)

    # 1. exactly the catalog, no dupes / drops
    assert sorted(names) == sorted(catalog)
    assert len(names) == len(set(names))

    covered = mod._driver_covered()
    changed = set(mod._REPROVE_CHANGED) & covered
    uncovered_block = [n for n in names if n not in covered]
    changed_block = [n for n in names if n in changed]
    covered_block = [n for n in names if n in covered and n not in changed]

    # 2. all-uncovered-first; then the semantics-changed re-proof
    #    block; then the stable covered tail — contiguous blocks, so a
    #    re-proof entry can never displace an unproven query
    assert names == uncovered_block + changed_block + covered_block

    # 3. each block preserves catalog insertion order
    idx = {n: i for i, n in enumerate(catalog)}
    assert uncovered_block == sorted(uncovered_block, key=idx.__getitem__)
    assert changed_block == sorted(changed_block, key=idx.__getitem__)
    assert covered_block == sorted(covered_block, key=idx.__getitem__)

    # _REPROVE_CHANGED may only name already-covered catalog queries
    assert set(mod._REPROVE_CHANGED) <= set(catalog)


def test_oracles_match_queries():
    mod = _entry_module()
    from kafkaconnect_spark.queries import QUERY_CATALOG

    names = list(mod.queries())
    oracles = mod.oracle_sql()
    expected = [n for n in names if QUERY_CATALOG[n].oracle is not None]
    assert list(oracles) == expected
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())


def test_covered_requires_strongest_check(tmp_path, monkeypatch):
    """A rows-only match does NOT cover an oracled query (it must
    hash-match), and a failed row re-enters the front of the window."""
    mod = _entry_module()
    from kafkaconnect_spark.queries import QUERY_CATALOG

    oracled = next(n for n in QUERY_CATALOG if QUERY_CATALOG[n].oracle)
    import json

    fake = {
        oracled: {"rows_match": True, "schema_match": True, "hash_match": False}
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(fake))
    monkeypatch.setattr(mod, "_ROOT", str(tmp_path))
    assert oracled not in mod._driver_covered()
    fake[oracled]["hash_match"] = True
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(fake))
    assert oracled in mod._driver_covered()


def test_round_catalogs_pairwise_disjoint():
    """r4 ADVICE: a name collision between round catalogs would make
    the _merge() update silently replace fn/oracle while keeping the
    old window position. _merge raises; this pins the current rounds
    pairwise-disjoint explicitly."""
    from kafkaconnect_spark.queries_r3 import R3_CATALOG
    from kafkaconnect_spark.queries_r3b import R3B_CATALOG
    from kafkaconnect_spark.queries_r4 import R4_CATALOG
    from kafkaconnect_spark.queries_r5 import R5_CATALOG
    from kafkaconnect_spark.queries_tpch import TPCH_CATALOG

    rounds = {
        "tpch": set(TPCH_CATALOG),
        "r3": set(R3_CATALOG),
        "r3b": set(R3B_CATALOG),
        "r4": set(R4_CATALOG),
        "r5": set(R5_CATALOG),
    }
    names = list(rounds)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            assert not rounds[a] & rounds[b], (a, b, rounds[a] & rounds[b])


def test_merge_rejects_collision():
    from kafkaconnect_spark import queries
    from kafkaconnect_spark.query_base import QueryDef

    existing = next(iter(queries.QUERY_CATALOG))
    try:
        queries._merge({existing: QueryDef(lambda s, d: None, None)})
    except AssertionError:
        pass
    else:
        raise AssertionError("_merge accepted a duplicate name")
