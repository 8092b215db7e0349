"""The 10×-disposition ledger must cover the registry EXACTLY (VERDICT
r7 #6): a new registration fails here until it has been swept at the 10×
stand-in and classified in ``scale_ledger.DISPOSITIONS`` — the
"all registered queries swept" claim is a test invariant, not prose.
Likewise the rows-only residue ledger (VERDICT r10 #7): every
oracle-less registration must name its non-replayable ingredient and an
existing pinning test."""

import os
import re

from graphdb_neo4j_spark.registry import all_queries
from graphdb_neo4j_spark.rows_only_ledger import ROWS_ONLY
from graphdb_neo4j_spark.scale_ledger import DISPOSITIONS, VALID_CLASSES


def test_every_registered_query_has_a_disposition():
    registered = set(all_queries())
    unswept = registered - set(DISPOSITIONS)
    assert not unswept, (
        f"registered queries without a 10×-sweep disposition: "
        f"{sorted(unswept)} — sweep them at the 10× stand-in (PLANS.md "
        f"protocol) and classify in scale_ledger.py"
    )


def test_no_stale_ledger_entries():
    registered = set(all_queries())
    stale = set(DISPOSITIONS) - registered
    assert not stale, f"ledger entries for unregistered queries: {sorted(stale)}"


def test_dispositions_are_well_formed():
    registered = set(all_queries())
    for name, d in DISPOSITIONS.items():
        assert d.cls in VALID_CLASSES, f"{name}: unknown class {d.cls!r}"
        assert d.note.strip(), f"{name}: empty note"
        if d.cls == "exactness-baseline":
            assert d.twin, f"{name}: exactness-baseline needs a twin"
            assert d.twin in registered, (
                f"{name}: twin {d.twin!r} is not a registered query"
            )
        else:
            assert d.twin is None, f"{name}: twin only valid on baselines"


def test_rows_only_ledger_covers_oracle_less_registry_exactly():
    rows_only = {n for n, rq in all_queries().items() if rq.oracle is None}
    missing = rows_only - set(ROWS_ONLY)
    assert not missing, (
        f"oracle-less registrations without a rows-only ledger entry: "
        f"{sorted(missing)} — name the non-replayable ingredient and the "
        f"pinning test in rows_only_ledger.py (or give them an oracle)"
    )
    stale = set(ROWS_ONLY) - rows_only
    assert not stale, (
        f"rows-only ledger entries whose query now has an oracle (or is "
        f"unregistered): {sorted(stale)}"
    )


def test_rows_only_pins_name_existing_tests():
    """Every ``pinned_by`` must point at a real test function in a real
    file — the ledger's audit value dies the day a pin rots."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, e in ROWS_ONLY.items():
        assert e.why.strip(), f"{name}: empty why"
        path, _, fn = e.pinned_by.partition("::")
        assert fn, f"{name}: pinned_by must be 'file::test_fn'"
        full = os.path.join(repo, path)
        assert os.path.exists(full), f"{name}: pin file {path} missing"
        with open(full) as f:
            src = f.read()
        assert re.search(rf"^def {re.escape(fn)}\(", src, re.M), (
            f"{name}: pin test {fn} not found in {path}"
        )
