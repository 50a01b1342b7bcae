"""The driver contract surface must be the ORGANIC registry, verbatim.

Rounds 2–3 published early-sorting ``a0_`` aliases to steer the driver's
sorted-prefix sample window; round-3 advice flagged that as subverting the
independent audit, so the mechanism was removed.  These tests pin the
honest contract: ``__spark_entry__.queries()`` is exactly
``registry.all_queries()``, with no alias prefixes and no extra or missing
names, so whatever subset an external checker samples, it samples from the
same catalog the tests and bench iterate.
"""

import __spark_entry__ as entrymod

from energy_emissions_lakehouse_spark.registry import (
    all_oracle_sql,
    all_queries,
    all_specs,
)


def test_entry_queries_is_the_organic_registry():
    assert list(entrymod.queries()) == list(all_queries())


def test_entry_oracles_match_registry():
    assert entrymod.oracle_sql() == all_oracle_sql()


def test_no_steering_aliases():
    for name in all_specs():
        assert not name.startswith("a0_"), name
        assert "window_alias" not in all_specs()[name].tags


def test_every_oracle_name_is_a_query():
    qs = set(entrymod.queries())
    for name in entrymod.oracle_sql():
        assert name in qs
