"""The reference's three entry points (SURVEY.md §3) as composed
DataFrame DAGs over the star schema of §1.4."""
