"""The 10×-disposition ledger must cover the registry EXACTLY (VERDICT
r7 #6): a new registration fails here until it has been swept at the 10×
stand-in and classified in ``scale_ledger.DISPOSITIONS`` — the
"all registered queries swept" claim is a test invariant, not prose."""

from graphdb_neo4j_spark.registry import all_queries
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
