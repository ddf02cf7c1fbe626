"""Plan inspection and scale lints (SURVEY.md §4).

The engine has no custom Catalyst rules (§4: none are required — the
declarative DataFrame surface lets Catalyst do pushdown, pruning,
reordering, AQE). What IS engine code is *verifying* those properties
hold: at 100 TB a scan that stopped pruning columns or a join that
silently fell back from broadcast to sort-merge is an outage, not a
nuance. :mod:`plans.inspect` captures physical plans and asserts the
properties; tests/test_plans.py pins them for the headline queries.
"""

from tcga_query_project_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    has_operator,
    pushed_filters,
    read_schemas,
    scale_lint,
)
