"""Registry hygiene guard (round-4 verdict #7).

The grading driver correctness-checks only the FIRST 50 entries of
``queries()``. Round 2 lost driver coverage for several operator
families by silently registering past the cap; round 3 fixed it with
the two-tier registry. This guard makes the fix structural: every
SURVEY §2 row in COVERAGE.md that is verified by driver queries must
keep at least one name in the PRIMARY tier — directly, or through the
documented family consolidation below. Registering a new query that
pushes a family out of the driver window now fails CI instead of
silently going dark for a round.
"""

from __future__ import annotations

import re

import pytest

from open_source_search_engine_spark.operators import registry

# §2 rows whose own queries are extended-tier: the primary query that
# carries their operator family through the driver window (the
# consolidation documented in registry.py's tier comment).
FAMILY_PRIMARY = {
    "A7": "wand_and",          # multi-termlist fetch = every bm25/wand scan
    "B6": "meta_filters",      # family_filter folded in
    "B8": "meta_filters",      # filetype_filter folded in
    "C11": "doc_enrich",       # lang_id folded into the one-pass enricher
    "C14": "site_inlink_rank",  # site_rank(_web) variants
    "D5": "wand_and",          # OR = same two code paths as the AND rows
    "D12": "facet_rollup",     # facet_by_source/lang = same facet_counts
    "E3": "site_inlink_rank",  # inlink_counts variants ride the same path
    # round-5 rotation (r4 verdict #4): the D17/D18 pair folded into
    # ONE combined slot (page 2 of spelling suggestions exercises both
    # code paths) and I5's session window rides the tumbling-window
    # primary — freeing driver slots for the two 2.x fringe
    # subsystems (section_boilerplate, category_rollup)
    "D17": "suggest_paged",
    "D18": "suggest_paged",
    "I5": "events_windowed",
}


def _coverage_rows():
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    txt = open(path).read()
    for line in txt.splitlines():
        m = re.match(
            r"^\|\s*([A-I]\d+(?:/[A-I]?\d+)?)\b[^|]*\|[^|]*\|[^|]*\|"
            r"([^|]*)\|",
            line,
        )
        if m:
            rid, verified_by = m.group(1).strip(), m.group(2)
            yield rid, verified_by


def test_every_coverage_row_keeps_a_driver_slot():
    prim = set(registry.spark_queries())
    ext = set(registry.extended_queries())
    rows = list(_coverage_rows())
    assert len(rows) >= 60, "COVERAGE.md table parse broke"
    missing = []
    for rid, ver in rows:
        if "queries" not in ver:
            continue  # pytest-only verification (codecs, streaming state)
        cited = [
            n for n in re.findall(r"`([a-z0-9_]+)`", ver)
            if n in prim or n in ext
        ]
        if any(n in prim for n in cited):
            continue
        fam = FAMILY_PRIMARY.get(rid)
        if fam in prim:
            continue
        missing.append((rid, cited, fam))
    assert not missing, (
        f"§2 rows with NO primary-tier driver query (family lost its "
        f"driver slot — the round-2 failure mode): {missing}"
    )


def test_coverage_cites_no_stale_query_names():
    """Every backticked snake_case name COVERAGE.md cites after the
    word 'queries' must exist in some tier — stale docs fail here."""
    prim = set(registry.spark_queries())
    ext = set(registry.extended_queries())
    stale = []
    for rid, ver in _coverage_rows():
        seg = ver.split("queries", 1)
        if len(seg) < 2:
            continue
        # names cited as driver queries (before any ';'-separated
        # pytest reference)
        for n in re.findall(r"`([a-z0-9_]+)`", seg[1].split(";")[0]):
            if n not in prim and n not in ext:
                stale.append((rid, n))
    assert not stale, f"COVERAGE.md cites unknown query names: {stale}"


def test_primary_tier_exactly_at_or_under_cap():
    prim = registry.spark_queries()
    assert len(prim) <= registry.DRIVER_QUERY_CAP
    # the map above must point at live primaries
    for rid, fam in FAMILY_PRIMARY.items():
        assert fam in prim, (rid, fam)


def test_every_primary_query_is_oracle_paired():
    """No silent rows-only entries in the driver window: each primary
    query ships an oracle (the driver's hash gate) unless explicitly
    exempted here."""
    exempt = set()  # all 50 are oracle-paired as of round 3
    prim = set(registry.spark_queries())
    oracles = set(registry.oracle_queries())
    assert prim - oracles == exempt
