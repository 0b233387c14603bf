"""Analytics query layer (SURVEY.md §2.5) — plain Spark SQL over the
sink table, filtered by compiled SML predicates."""

from .analytics import (  # noqa: F401
    approx_distinct,
    count_distinct,
    entity_filter,
    paginated_scan,
    timeseries,
    topn,
    topn_pop,
)
